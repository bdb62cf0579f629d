"""Deterministic sampling + ordering operators for training-data assembly.

Every operator here is a pure function of (row identity, seed): no RNG
state, no ``F.rand`` — so results are identical across engines, re-runs,
re-shards, and cluster sizes (the reproducibility contract a training
pipeline needs for ablations).  The hash is the same 60-bit md5 family
the dedup operators use (functions/hashing.md5_long).

- :func:`stratified_sample` — per-stratum keep-fractions via a hash
  threshold: one narrow map, no shuffle, exact in expectation with
  deterministic membership.
- :func:`mixture_sample` — target domain mixture with temperature
  rescaling (the LLM data-recipe step), solved as per-domain fractions
  from ONE count agg, then delegated to :func:`stratified_sample`.
- :func:`training_shuffle` — global pseudo-random order: range-partition
  + in-partition sort on a salted hash.  The standard "shuffle the
  corpus once, stream it forever" step; cost is one range exchange, the
  same as any sorted write.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long

# Hash values land uniformly in [0, 2^60); a fraction f keeps rows whose
# hash falls below f * 2^60.  60 bits ≫ any corpus size, so realized
# fractions concentrate tightly around f.
_HASH_SPACE = float(1 << 60)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    doc_id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Keep a per-stratum deterministic fraction of rows.

    ``fractions`` maps stratum value → keep fraction in [0, 1]; strata not
    listed are dropped (explicit is safer than a silent 1.0 for a
    data-mixing step).  Membership is ``hash(doc_id, seed) < f·2^60`` —
    reproducible, and INDEPENDENT of the stratum column so re-labelling a
    document's stratum never resamples it.
    """
    for k, f in fractions.items():
        if not (0.0 <= f <= 1.0):
            raise ValueError(f"fraction for {k!r} must be in [0,1], got {f}")
    h = md5_long(F.col(doc_id_col).cast("string"), salt=seed)
    thresh = F.create_map(
        *[
            x
            for k, f in fractions.items()
            for x in (F.lit(k), F.lit(int(f * _HASH_SPACE)))
        ]
    )[F.col(strata_col)]
    return df.where(thresh.isNotNull() & (h < thresh))


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    weights: Mapping[str, float],
    temperature: float = 1.0,
    doc_id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Sample the corpus toward a target domain mixture — the data-recipe
    step of LLM pretraining (domain weights, optionally temperature-
    flattened as in multilingual/LLaMA-style recipes).

    ``weights[d]`` is the RELATIVE target share of domain ``d``;
    ``temperature`` T rescales shares as ``w^(1/T)`` (T > 1 flattens the
    mix toward uniform, T = 1 leaves it unchanged).  The achievable mix is
    bounded by the data actually available per domain, so the sampler
    solves for the largest total corpus at which no domain is
    oversubscribed (downsampling-only — no row is ever duplicated), then
    delegates membership to :func:`stratified_sample`'s deterministic
    hash threshold.

    Cost: ONE count aggregation over the corpus (the per-domain counts) +
    one narrow filter map — no shuffle of the data itself.  Driver state
    is O(|domains|).  Domains absent from ``weights`` are dropped,
    matching :func:`stratified_sample`'s explicit-only contract.
    """
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    if not weights:
        raise ValueError("weights must name at least one domain")
    for d, w in weights.items():
        if w < 0:
            raise ValueError(f"weight for {d!r} must be >= 0, got {w}")
    shares = {d: w ** (1.0 / temperature) for d, w in weights.items()}
    z = sum(shares.values())
    if z == 0:
        raise ValueError("all weights are zero")
    shares = {d: s / z for d, s in shares.items()}

    counts = {
        r["d"]: r["n"]
        for r in df.groupBy(F.col(domain_col).alias("d"))
        .agg(F.count("*").alias("n"))
        .collect()
        if r["d"] in shares
    }
    # Largest total N with share_d·N ≤ count_d for every requested domain
    # that has any data: N = min(count_d / share_d).  Domains requested
    # but absent contribute nothing (and can't — downsampling only).
    feasible = [
        counts[d] / s for d, s in shares.items() if s > 0 and d in counts
    ]
    if not feasible:
        return df.where(F.lit(False))
    total = min(feasible)
    fractions = {
        d: min(1.0, (shares[d] * total) / counts[d])
        for d in shares
        if d in counts and counts[d] > 0
    }
    return stratified_sample(
        df, domain_col, fractions, doc_id_col=doc_id_col, seed=seed
    )


def training_shuffle(
    df: DataFrame,
    doc_id_col: str = "doc_id",
    seed: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Global deterministic pseudo-random order for dataloader streaming.

    Sort key = salted hash of doc_id: uniformly distributed, so
    ``repartitionByRange`` + in-partition sort yields balanced partitions
    and a total order that is a pure function of (corpus, seed).  Write
    the result with ``sources.parquet.write_sorted_parquet`` to get
    N files any dataloader can stream sequentially.
    """
    key = md5_long(F.col(doc_id_col).cast("string"), salt=seed)
    out = df.withColumn("_shuffle_key", key)
    n = num_partitions or out.sparkSession.sparkContext.defaultParallelism
    return (
        out.repartitionByRange(n, "_shuffle_key")
        .sortWithinPartitions("_shuffle_key")
        .drop("_shuffle_key")
    )


def curriculum_order(
    df: DataFrame,
    score_col: str,
    n_stages: int = 4,
    doc_id_col: str = "doc_id",
    seed: int = 0,
    ascending_difficulty: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Curriculum data ordering: stage by score quantile, shuffled
    WITHIN each stage.

    The standard curriculum/annealing recipe (easy→hard, or
    high-quality-last for annealed pretraining).  Stage boundaries come
    from ONE ``percentile_approx`` aggregation (KLL sketch — only
    sketches cross the wire; a global-window ``ntile`` would collapse
    the whole corpus into a single sort task, the classic unpartitioned-
    window scale bug); stage assignment is then a narrow comparison
    against the broadcast thresholds, and the output is ordered
    (stage, salted doc_id hash) via ``repartitionByRange`` +
    in-partition sort — a dataloader streaming the files sees stage 1
    fully before stage 2, deterministic pseudo-random inside each
    stage.  A pure function of (corpus, seed): re-sharding the input
    cannot change the curriculum — :func:`training_shuffle`'s
    reproducibility bar.  Approximate equal-frequency: sketch rank
    error plus score-value ties move band edges, never a row's
    relative order within its band.

    ``ascending_difficulty=True`` streams LOW scores first (score =
    difficulty); flip it when the score is quality and the recipe wants
    best-data-last annealing.  Adds ``stage`` (1-based) for audit.
    """
    if n_stages < 1:
        raise ValueError(f"n_stages must be >= 1, got {n_stages}")
    qs = [i / n_stages for i in range(1, n_stages)]
    thresholds = (
        df.agg(
            F.percentile_approx(
                F.col(score_col).cast("double"), qs, 10_000
            ).alias("t")
        ).first()["t"]
        if qs
        else []
    )
    # empty input (or all-null scores): percentile_approx yields null —
    # a single degenerate stage is the well-defined answer
    thresholds = thresholds or []
    s = F.col(score_col).cast("double")
    stage = F.lit(1)
    for t in thresholds:
        stage = stage + (s > F.lit(float(t))).cast("int")
    if not ascending_difficulty:
        stage = F.lit(n_stages + 1) - stage
    h = md5_long(F.col(doc_id_col).cast("string"), salt=seed)
    staged = df.withColumn("stage", stage).withColumn("_shuffle_key", h)
    n = num_partitions or staged.sparkSession.sparkContext.defaultParallelism
    return (
        staged.repartitionByRange(n, "stage", "_shuffle_key")
        .sortWithinPartitions("stage", "_shuffle_key")
        .drop("_shuffle_key")
    )
