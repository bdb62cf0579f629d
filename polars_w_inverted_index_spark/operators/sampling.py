"""Deterministic sampling + ordering operators for training-data assembly.

Every operator here is a pure function of (row identity, seed): no RNG
state, no ``F.rand`` — so results are identical across engines, re-runs,
re-shards, and cluster sizes (the reproducibility contract a training
pipeline needs for ablations).  The hash is the same 60-bit md5 family
the dedup operators use (functions/hashing.md5_long).

- :func:`stratified_sample` — per-stratum keep-fractions via a hash
  threshold: one narrow map, no shuffle, exact in expectation with
  deterministic membership.
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
