"""Materialized ANN index: trained IVF centroids + cell-partitioned
inverted file, persisted as parquet artifacts and served with ZERO
corpus scans per query.

The inline :func:`..operators.similarity.ivf_topk` re-derives its
inverted file on every call (since r11 through the same GEMM assign
shape as this module; ``assign="expr"`` keeps its pure-expression twin)
— correct, but at 100 TB the corpus assignment pass is the dominant
cost and it is a pure function of the corpus content, so it belongs in
a reusable artifact exactly like the postings index
(`plans/catalog.py`, SURVEY.md §4's "one custom piece"; the reference
likewise rebuilds its postings map per query, main.rs:325-385 —
materialization is the same fix applied to vectors).

Layout under ``root``::

    centroids/                 parquet [cid int, centv array<double>, centn double]
    cells/cell=<c>/ingest_batch=<b>/  parquet [vec_id long, cv array<float>, cn double]
    _ann_meta.json             {n_centroids, n_iters, dims, id_col, vec_col}

The second partition level tags WHICH write produced each file: the
initial build uses ``ingest_batch=-1`` and every streaming micro-batch
its checkpoint batch id — so a batch whose append committed but whose
marker write crashed can be removed exactly (delete its
``ingest_batch=<b>`` directories) before the replay re-appends, making
streaming ingest idempotent (streaming/ann_ingest.py).  Serving never
filters on it; pruning stays on ``cell``.

``cells`` is **partition-by-cell**: a probe of ``nprobe`` cells prunes
to those directories at the file-listing level (static partition
pruning — the probe cell set is collected from the tiny centroid
ranking, never from the corpus), so per-query I/O is
O(corpus · nprobe / n_centroids) regardless of corpus size.

Centroid training is Lloyd's refinement written as DataFrame ops:

- assignment: one narrow Arrow-batched GEMM pass (collected bounded
  centroid matrix in the closure, per-batch numpy matmul + argmax —
  zero shuffle; see ``_assign_cells``), the only corpus-wide work per
  iteration;
- update: ``posexplode`` the assigned vectors, average per (cell, dim),
  re-assemble — shuffle keys bounded by n_centroids × dims, independent
  of corpus size;
- seeding: the ``n_centroids`` lowest-id vectors (deterministic, no RNG —
  same discipline as the LSH hyperplanes / minhash family: reproducible
  across engines and runs).

``localCheckpoint`` truncates lineage between iterations (iterative
plans otherwise stack one join+agg per round until analysis cost
explodes — same lesson as dedup_clusters' label propagation).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.arrow_batches import decode_list_matrix
from ..functions.pickling import by_value
from ..functions.vectors import cosine_with_norms, norm


def _centroid_frame(corpus: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return corpus.select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).cast("array<double>").alias("centv"),
    )


def kmeans_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 5,
) -> DataFrame:
    """``[cid, centv array<double>, centn double]`` after ``n_iters``
    Lloyd refinements of the deterministic lowest-id seed.

    Spherical-ish k-means: assignment by cosine, update by coordinate
    mean (cosine scoring is norm-invariant, so the un-normalized mean
    centroid ranks cells identically to the normalized one).  A cell
    that captures no vectors keeps its previous centroid (classic empty-
    cluster rule), so the centroid count is stable across iterations.
    ``n_iters=0`` returns the seed — on a dense-id NULL-free corpus
    exactly the inline ``ivf_topk`` centroid set (ids < n_centroids),
    making that operator the verifier twin there; with sparse ids or
    NULL vectors the seeds differ (this takes the n lowest-id non-NULL
    rows, ivf keeps its value-based id cut).
    """
    # seed from the lowest-id NON-NULL vectors: NULL vecs are masked
    # out of the Lloyd update (r10 ADVICE), so letting one seed a
    # centroid would crash _collect_centroids (iterating None) — the
    # same never-a-candidate rule applies to seeding (r11 fuzz)
    seed = (
        corpus.where(F.col(vec_col).isNotNull())
        .orderBy(F.col(id_col).asc())
        .limit(n_centroids)
    )
    cent = _centroid_frame(seed, id_col, vec_col)
    # cid values are the seed vectors' ids (not 0..n-1): stable,
    # deterministic labels — renumbering would break nothing but adds a
    # window pass for no benefit.
    for _ in range(n_iters):
        c = cent.select(
            "cid", "centv", norm(F.col("centv")).alias("centn")
        )
        # Update step (r9): per-PARTITION partial sums instead of
        # exploding the assigned corpus.  The pre-r9 form posexploded
        # |corpus| × dims rows into the (cell, pos) shuffle — at 10⁹
        # rows × 64 dims that is a 64-billion-row exchange per Lloyd
        # iteration.  _cell_partial_sums accumulates (cell → Σvec, n)
        # across every Arrow batch of a partition and emits ≤
        # n_centroids rows per partition, so the shuffle carries
        # partitions × cells × dims rows pre-combine (map-side combine
        # collapses further) — independent of corpus row count.
        sums = _cell_partial_sums(
            corpus, c, vec_col, round_digits=round_digits
        )
        counts = sums.groupBy("cell").agg(F.sum("n").alias("cnt"))
        means = (
            sums.select("cell", F.posexplode("psum").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.sum("x").alias("sx"))
            .join(counts, "cell")
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "pos",
                                (F.col("sx") / F.col("cnt")).alias("m"),
                            )
                        )
                    ),
                    lambda s: s.getField("m"),
                ).alias("centv")
            )
            .select(F.col("cell").alias("cid"), "centv")
        )
        # empty-cluster rule: keep the old centroid where no vector landed
        cent = (
            cent.alias("old")
            .join(means.alias("new"), "cid", "left")
            .select(
                "cid",
                F.coalesce(F.col("new.centv"), F.col("old.centv")).alias(
                    "centv"
                ),
            )
        ).localCheckpoint(eager=True)
    return cent.select("cid", "centv", norm(F.col("centv")).alias("centn"))


_MAX_COLLECTED_CENTROIDS = 65_536


def _half_up(a, digits: int):
    """Round half AWAY FROM ZERO, like Spark's ``F.round`` (BigDecimal
    HALF_UP).  ``np.round`` is half-to-even, which diverges from the SQL
    twins on cosines landing exactly on a .5 boundary at round_digits —
    reachable with dyadic-rational vectors (e.g. cos = 0.25 rounded to 1
    digit: np.round → 0.2, F.round → 0.3) — flipping the last digit and
    potentially the rank/tie order vs a hash-matched oracle (r9 ADVICE).
    Worker closures inline the same two-line formula (self-contained
    pickling convention, functions/pickling.py)."""
    import numpy as np

    p = 10.0 ** int(digits)
    return np.sign(a) * np.floor(np.abs(a) * p + 0.5) / p


def _arrow_schema(ddl: str):
    """Driver-side: the pyarrow schema for a Spark DDL string, so a
    ``mapInArrow`` closure can build output RecordBatches with exactly
    the declared field types (inference on empty/py-object lists would
    flip types batch-to-batch).  pa.Schema pickles by value into the
    closure."""
    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import StructType

    return to_arrow_schema(StructType.fromDDL(ddl))


def _collect_centroids(centroids: DataFrame):
    """Bounded driver-side centroid matrix for the GEMM closures:
    ``(cids, cmat, cns, n_dims)`` sorted by cid (argmax first-hit ==
    lowest cid).  Loud guard — 4096 × 64-dim doubles is 2 MB."""
    cent_rows = (
        centroids.select("cid", "centv", "centn")
        .limit(_MAX_COLLECTED_CENTROIDS + 1)
        .collect()
    )
    if len(cent_rows) > _MAX_COLLECTED_CENTROIDS:
        raise ValueError(
            f"centroid frame collected for GEMM scoring exceeds "
            f"{_MAX_COLLECTED_CENTROIDS} rows — shard the index."
        )
    if not cent_rows:
        raise ValueError("empty centroid frame")
    cent_rows.sort(key=lambda r: r["cid"])
    cids = [r["cid"] for r in cent_rows]
    cmat = [[float(x) for x in r["centv"]] for r in cent_rows]
    cns = [float(r["centn"]) for r in cent_rows]
    n_dims = max(len(c) for c in cmat)
    # ragged seed widths (mixed-dim corpora) must still form one dense
    # GEMM matrix: zero-pad to the max width — padding changes neither
    # dots nor the stored norms (r11 fuzz)
    cmat = [c + [0.0] * (n_dims - len(c)) for c in cmat]
    return cids, cmat, cns, n_dims


def _null_elem_flags(vec_lists, width):
    """Driver-side per-row "has a NULL element within the ``width``
    prefix" flags for COLLECTED vectors — the numpy conversion turns
    None into NaN, indistinguishable from a NaN element, but Spark
    branches them apart (NULL norm → the guard's otherwise-0; NaN norm
    → scored NaN, ranked first)."""
    import numpy as np

    w = int(width)
    return np.array(
        [
            any(x is None for x in (v[:w] if v is not None else []))
            for v in vec_lists
        ],
        dtype=bool,
    )


def _probe_rank(q_mat, cmat, cns, nprobe: int, round_digits: int,
                q_zero=None):
    """Driver-side probe ranking: ``(|Q|, min(nprobe, n_cells))``
    CENTROID INDICES (index order == sorted-cid order), same GEMM +
    tie rule as ``_assign_cells`` (round before rank, stable sort →
    lowest cid wins ties).  Runs on the ALREADY-collected query matrix
    so serving never executes the query plan a second time — a
    nondeterministic query frame (sample/limit/rand) would otherwise
    return different ids on the probe pass than on the collect
    (r9 review finding)."""
    import numpy as np

    n_dims = q_mat.shape[1]
    C = np.zeros((len(cmat), n_dims), dtype=np.float64)
    for i, c in enumerate(cmat):
        a = np.asarray(c, dtype=np.float64)[:n_dims]
        C[i, : len(a)] = a
    cn = np.asarray(cns, dtype=np.float64)
    cn_safe = np.where(cn > 0, cn, 1.0)
    qn = np.linalg.norm(q_mat, axis=1)
    qn_safe = np.where(qn > 0, qn, 1.0)
    cos = (q_mat @ C.T) / np.outer(qn_safe, cn_safe)
    # Spark-branch zero mask (r12): NULL-element queries (via q_zero,
    # passed from the collected rows) and zero queries probe like zero
    # vectors — 0.0 everywhere, ties to the lowest cids; NaN norms
    # (NaN/±inf elements) stay scored, their NaN cos remapped below
    cos[(qn == 0) if q_zero is None else q_zero, :] = 0.0
    cos[:, cn == 0] = 0.0  # centroids come from the gated lifecycle
    cos = _half_up(cos, round_digits)
    # NaN cos (an inf-element query): rank those cells FIRST (Spark's
    # NaN-largest rule, the serve tie-tier) — argsort would rank NaN
    # last; cell choice only steers recall, but keep one ordering rule
    cos = np.where(np.isnan(cos), np.inf, cos)
    k = min(int(nprobe), len(cmat))
    return np.argsort(-cos, axis=1, kind="stable")[:, :k]


def _cell_partial_sums(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str,
    round_digits: int = 5,
) -> DataFrame:
    """``[cell, psum array<double>, n long]`` — the Lloyd update's
    map side: assign each row to its best cell (same GEMM + tie rule
    as ``_assign_cells`` keep_n=1) and accumulate per-cell vector sums
    ACROSS every Arrow batch of the partition, emitting at most
    ``n_centroids`` rows per partition.  The reduce side then sums ≤
    partitions × cells × dims rows — independent of corpus size.
    Arrow-native decode (``mapInArrow``) like :func:`_assign_cells` —
    this is the per-Lloyd-iteration corpus pass, so the per-row pandas
    object cost it avoids is paid ``n_iters`` times otherwise."""
    cids, cmat, cns, n_dims = _collect_centroids(centroids)
    cell_ddl = centroids.schema["cid"].dataType.simpleString()
    rd = int(round_digits)
    out_ddl = f"cell {cell_ddl}, psum array<double>, n long"
    out_pa_schema = _arrow_schema(out_ddl)
    dec = by_value(decode_list_matrix)  # canonical decode (r12)
    hup = by_value(_half_up)

    def _sums(batches):
        # SELF-CONTAINED worker closure (repo convention)
        import numpy as np
        import pyarrow as pa

        C = np.zeros((len(cmat), n_dims), dtype=np.float64)
        for i, c in enumerate(cmat):
            C[i, : len(c)] = c[:n_dims]
        cn = np.asarray(cns, dtype=np.float64)
        cn_safe = np.where(cn > 0, cn, 1.0)
        acc = np.zeros((len(cmat), n_dims), dtype=np.float64)
        cnt = np.zeros(len(cmat), dtype=np.int64)
        for rb in batches:
            n = rb.num_rows
            if not n:
                continue
            col = rb.column(0)
            # NULL vecs are EXCLUDED from the Lloyd update (numerator
            # AND denominator) — the pre-r9 posexplode form emitted no
            # rows for them, and counting a zero row dilutes the
            # lowest-cid centroid's mean toward zero (r9 ADVICE).
            # Genuine zero VECTORS still count (they did pre-r9 too).
            full, live, _lens = dec(col, n, width=n_dims)
            if not live.any():
                continue
            mat = full[live]  # compact to live rows for the accumulate
            vn = np.linalg.norm(mat, axis=1)
            vn_safe = np.where(vn > 0, vn, 1.0)
            cos = (mat @ C.T) / np.outer(vn_safe, cn_safe)
            # gate-clean inputs (the lifecycle refuses NULL/NaN/inf
            # elements), so norms are finite and ~(>0) == (== 0) —
            # genuine zero vectors take the guard's zero branch
            cos[~(vn > 0), :] = 0.0
            cos[:, ~(cn > 0)] = 0.0
            cos = hup(cos, rd)
            best = cos.argmax(axis=1)
            np.add.at(acc, best, mat)
            np.add.at(cnt, best, 1)
        hit = np.nonzero(cnt > 0)[0]
        if len(hit):
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(
                        [cids[i] for i in hit],
                        type=out_pa_schema.field(0).type,
                    ),
                    pa.array(
                        [acc[i].tolist() for i in hit],
                        type=out_pa_schema.field(1).type,
                    ),
                    pa.array(cnt[hit], type=out_pa_schema.field(2).type),
                ],
                schema=out_pa_schema,
            )

    return df.select(F.col(vec_col).alias("v")).mapInArrow(
        _sums, out_ddl
    )


def _assign_cells(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    keep_n: int,
    round_digits: int = 5,
) -> DataFrame:
    """``[<id>, cell, crank, v, vn]`` — each vector's ``keep_n`` best
    centroids by cosine (ties → lowest cid, rounding before ranking for
    tie stability — same discipline as similarity.py).

    ONE vectorized Arrow pass: the centroid matrix is collected once
    (bounded — a loud guard at 65,536; 4096 × 64-dim doubles is 2 MB)
    and each batch scores as a single numpy GEMM,
    ``(batch × dims) @ (dims × n_centroids)``.  ZERO shuffle —
    the previous form crossJoined the corpus against the broadcast
    centroid frame and folded every pair through interpreted
    ``zip_with``/``aggregate`` lambdas (higher-order expressions never
    enter whole-stage codegen), which measured out at tens of MINUTES
    for 1M rows × 32 centroids on local[32] (r9 crossover run) and
    then still paid a |corpus|-row shuffle for the argmax.  The inline
    ``similarity.ivf_topk`` defaults to the same GEMM assign shape
    since r11 (its ``assign="expr"`` mode keeps the pure-expression
    twin that cross-engine fuzz compares against); this operator stays
    the scale path because its assignment is a REUSABLE artifact.

    r10: ``mapInArrow``, not ``mapInPandas`` — the pandas bridge
    materializes every vector as its own numpy OBJECT and the pad loop
    touches each row in Python, which measured ~2 s per million rows
    (the dominant serve/assign cost at 10 M rows, r10 crossover run);
    the Arrow list column decodes to the (batch × dims) matrix with one
    ``flatten().reshape()`` — zero per-row Python — and the id/vector
    columns pass through as Arrow arrays untouched.

    Vectors are zero-pad/truncated to the centroid width (the
    ``_pad_matrix`` contract); zero-norm rows/centroids score 0.0.
    """
    cids, cmat, cns, n_dims = _collect_centroids(centroids)
    id_ddl = df.schema[id_col].dataType.simpleString()
    vec_ddl = df.schema[vec_col].dataType.simpleString()
    cell_ddl = centroids.schema["cid"].dataType.simpleString()
    kn, rd = int(keep_n), int(round_digits)
    out_ddl = (
        f"_id {id_ddl}, cell {cell_ddl}, crank int, v {vec_ddl}, vn double"
    )
    out_pa_schema = _arrow_schema(out_ddl)
    dec = by_value(decode_list_matrix)  # the canonical list→matrix
    # decode (functions/arrow_batches, r12 consolidation — this closure
    # inlined its own copy r10–r11), shipped by value per the
    # self-contained pickling convention
    hup = by_value(_half_up)  # one rounding implementation (r12)

    def _gemm(batches):
        # SELF-CONTAINED worker closure (repo convention: imports inside,
        # everything else a closure VALUE — a module-level helper would
        # pickle by reference and executors would need the repo on path)
        import numpy as np
        import pyarrow as pa

        C = np.zeros((len(cmat), n_dims), dtype=np.float64)
        for i, c in enumerate(cmat):
            C[i, : len(c)] = c[:n_dims]
        cn = np.asarray(cns, dtype=np.float64)
        cn_safe = np.where(cn > 0, cn, 1.0)
        cell_t = out_pa_schema.field(1).type
        for rb in batches:
            n = rb.num_rows
            if not n:
                continue
            id_arr = rb.column(0)
            v_arr = rb.column(1)
            # NULL vec -> zero row (scores 0); width pins to n_dims
            # (truncate/zero-pad, the _pad_matrix contract)
            mat, _live, _lens = dec(v_arr, n, width=n_dims)
            vn = np.linalg.norm(mat, axis=1)
            vn_safe = np.where(vn > 0, vn, 1.0)
            cos = (mat @ C.T) / np.outer(vn_safe, cn_safe)
            # gate-clean inputs (the lifecycle refuses NULL/NaN/inf
            # elements), so norms are finite and ~(>0) == (== 0) —
            # genuine zero vectors take the guard's zero branch
            cos[~(vn > 0), :] = 0.0
            cos[:, ~(cn > 0)] = 0.0
            cos = hup(cos, rd)
            if kn == 1:
                best = cos.argmax(axis=1)  # first max == lowest cid
                yield pa.RecordBatch.from_arrays(
                    [
                        id_arr,
                        pa.array([cids[i] for i in best], type=cell_t),
                        pa.array(
                            np.ones(n, dtype=np.int32),
                            type=out_pa_schema.field(2).type,
                        ),
                        v_arr,
                        pa.array(vn, type=out_pa_schema.field(4).type),
                    ],
                    schema=out_pa_schema,
                )
                continue
            k = min(kn, len(cids))
            # stable sort on -cos keeps index (== cid) order on ties
            top = np.argsort(-cos, axis=1, kind="stable")[:, :k]
            take = pa.array(np.repeat(np.arange(n, dtype=np.int64), k))
            yield pa.RecordBatch.from_arrays(
                [
                    id_arr.take(take),
                    pa.array(
                        [cids[i] for i in top.ravel()], type=cell_t
                    ),
                    pa.array(
                        np.tile(np.arange(1, k + 1, dtype=np.int32), n),
                        type=out_pa_schema.field(2).type,
                    ),
                    v_arr.take(take),
                    pa.array(
                        np.repeat(vn, k), type=out_pa_schema.field(4).type
                    ),
                ],
                schema=out_pa_schema,
            )

    base = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("v")
    )
    return base.mapInArrow(_gemm, out_ddl)


def _uniform_width(
    df: DataFrame, vec_col: str, where: str, want: int | None = None
) -> int | None:
    """The index-lifecycle width contract (r11 fuzz): every non-NULL
    vector entering a materialized index must share ONE width (the
    recorded ``dims``), validated with a single column-pruned aggregate.

    Before this guard, a mixed-width corpus was scored at the CENTROID
    matrix width while the query guard pinned the FIRST row's width —
    two different projections of the same row (fuzz counterexample: a
    w3 row in a w2 index served cos 0.8165 where every consistent
    projection gives 1.0).  Low-level kernels keep their pad/truncate
    fallback (they score whatever width they are told, e.g. pq_encode
    against an explicit codebook); the LIFECYCLE refuses ragged input
    loudly — same discipline as the query-width identity gate below
    ("a silent truncation would return plausible nonsense").

    r11.5 (inf added r12): the same aggregate also refuses NULL, NaN
    and ±inf ELEMENTS
    inside vectors — all make cosine undefined (a NULL element
    decodes to NaN in every GEMM kernel), and the float serve would
    rank such a row ARBITRARILY: Spark's window `ORDER BY cos_sim
    DESC` sorts NaN above every double, so a NaN-element row serves at
    rank 1 from the float path while the PQ path's `~isnan(vnorm)`
    mask drops it — the two serving paths the driver row pins against
    one oracle would disagree (r11.5 review, verified by running it).
    Both checks are codegen collection functions, NOT interpreted
    per-element lambdas (`array_compact` size comparison for NULLs;
    `array_contains(c, NaN)` for NaNs — Spark SQL defines NaN = NaN as
    TRUE, unlike IEEE, so array_contains finds it), so the guard pass
    stays cheap at crossover-scale builds.  The inline similarity
    paths (ivf_topk / lsh / brute twins) stay lenient: they define and
    fuzz-pin an exact NULL/NaN-element semantics instead, because they
    score transient frames, not a persisted artifact.

    Returns the width (or ``want``; None for an all-NULL/empty frame).
    """
    c = F.col(vec_col)
    row = (
        df.where(c.isNotNull())
        .select(
            F.min(F.size(c)).alias("lo"),
            F.max(F.size(c)).alias("hi"),
            F.max(
                (
                    (F.size(F.array_compact(c)) != F.size(c))
                    | F.array_contains(c, F.lit(float("nan")))
                    # r12: ±inf elements are the same failure class —
                    # norm inf makes every cosine NaN (inf/inf), so the
                    # float serve would rank the row FIRST while the PQ
                    # serve's ~isnan(vnorm) mask drops it (vnorm = inf
                    # survives that mask, but the ADC sims are NaN) —
                    # refuse at the gate like NULL/NaN elements
                    | F.array_contains(c, F.lit(float("inf")))
                    | F.array_contains(c, F.lit(float("-inf")))
                ).cast("int")
            ).alias("bad_elem"),
        )
        .first()
    )
    if row is None or row["lo"] is None:
        return want
    if row["bad_elem"]:
        raise ValueError(
            f"{where}: vector column {vec_col!r} contains NULL, NaN or "
            "infinite elements inside vectors — cosine over them is "
            "undefined (an inf element makes the norm inf and every "
            "cosine NaN) and a materialized index must never rank such "
            "a row (the float serve would emit it at rank 1: NaN sorts "
            "above every double in Spark). Filter those rows (or impute "
            "the elements) before build/ingest."
        )
    lo, hi = int(row["lo"]), int(row["hi"])
    if lo != hi:
        raise ValueError(
            f"{where}: vector column {vec_col!r} has mixed widths "
            f"({lo}..{hi}); a materialized ANN index is defined over ONE "
            "dimensionality — project the corpus to a fixed width first "
            "(functions.vectors.random_projection, or slice/pad "
            "explicitly)."
        )
    if want is not None and lo != want:
        raise ValueError(
            f"{where}: batch vectors are {lo}-dim but the index records "
            f"dims={want}; project the batch to the index width."
        )
    return lo


def _measure_cold_bandwidth_mbps(
    cells_dir: str,
    budget_bytes: int = 64 << 20,
    min_bytes: int = 4 << 20,
) -> tuple[float, int] | None:
    """One bounded cold-read probe of the index's own cell files:
    ``(MB/s, bytes_read)`` or None when unmeasurable.

    r11 VERDICT Missing #3: ``ann_serving_policy``'s bandwidth default
    was this dev box's measured 344 MB/s — a deployment that never
    passes ``bandwidth_mbps`` silently inherited the wrong disk.  The
    build now stamps a measured number into ``_ann_meta.json`` so the
    policy is portable by default.

    Method (r14, r13 VERDICT task 6): copy a bounded byte budget of the
    LARGEST cell files into a scratch file beside the tree, fsync +
    evict THE COPY (``posix_fadvise(POSIX_FADV_DONTNEED)``), one timed
    sequential read of the copy, delete it.  The pre-r14 probe evicted
    the largest LIVE files — under hot-skew ingest exactly the cells
    the next serve probes, so every fold trigger deliberately cooled
    the hottest data right before the serve; the scratch copy leaves
    live files' page cache alone (the copy pass even warms them) and
    still times the same device.  Bounded to ``budget_bytes`` so a
    100 TB build pays a fixed ~64 MB probe; refuses to stamp under
    ``min_bytes`` (a few-MB read times syscall overhead, not the disk)
    and on any OSError / non-POSIX platform — the policy then falls
    back to its documented literal."""
    if not hasattr(os, "posix_fadvise"):  # non-POSIX: nothing to evict
        return None
    import time

    scratch = os.path.join(
        os.path.dirname(cells_dir) or ".", "_bw_probe_scratch"
    )
    try:
        sizes = []
        for dirpath, _dirs, files in os.walk(cells_dir):
            for name in files:
                if name.startswith((".", "_")):
                    continue
                p = os.path.join(dirpath, name)
                sizes.append((os.path.getsize(p), p))
        sizes.sort(reverse=True)  # largest first: fewest opens per byte
        acc = 0
        with open(scratch, "wb") as out:
            for _sz, p in sizes:
                with open(p, "rb") as f:
                    while acc < budget_bytes:
                        b = f.read(1 << 22)
                        if not b:
                            break
                        out.write(b)
                        acc += len(b)
                if acc >= budget_bytes:
                    break
            if acc < min_bytes:
                return None
            out.flush()
            os.fsync(out.fileno())
        fd = os.open(scratch, os.O_RDONLY)
        try:
            # only the scratch copy is evicted — never a live cell file
            os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
        finally:
            os.close(fd)
        n = 0
        t0 = time.perf_counter()
        with open(scratch, "rb") as f:
            while True:
                b = f.read(1 << 22)
                if not b:
                    break
                n += len(b)
        dt = time.perf_counter() - t0
        if dt <= 0:
            return None
        return round(n / dt / 1e6, 1), n
    except OSError:
        return None
    finally:
        try:
            os.remove(scratch)
        except OSError:
            pass


# Readings above this are page cache / tmpfs, not a disk: DONTNEED only
# evicts on filesystems with a real page-cache-backed store — on
# tmpfs/overlay it is a no-op and the probe times RAM (r12 ADVICE).  The
# fastest shipping NVMe reads ~14 GB/s; RAM streams are 20+ GB/s, so
# 16 GB/s separates the populations.  Refusing (rather than clamping)
# keeps the policy on its documented literal — the conservative
# direction, same as the min_bytes refusal.
_MAX_PLAUSIBLE_DISK_MBPS = 16_000.0


def _write_meta_atomic(meta_path: str, meta: dict) -> None:
    """tmp + ``os.replace`` — a crash mid-write leaves the OLD meta
    intact, never a truncated JSON that poisons every later read (r12
    ADVICE; the same convention as the streaming ingest marker)."""
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, meta_path)


def _stamp_bandwidth(root: str) -> None:
    """Measure and record ``bandwidth_mbps`` (+ ``bandwidth_probe_bytes``
    and ``bandwidth_probe_method``) in ``_ann_meta.json`` — best-effort:
    an unmeasurable tree leaves the meta untouched and the policy on its
    documented default.  A reading above ``_MAX_PLAUSIBLE_DISK_MBPS`` is
    a cache-tainted probe (fadvise-DONTNEED is a no-op on tmpfs/NFS/
    overlay mounts) and is refused rather than stamped — stamping it
    would bias :func:`ann_serving_policy` toward the float path at sizes
    where PQ wins.  The method string lets operators of exotic mounts
    spot a tainted stamp in the meta (r12 ADVICE)."""
    measured = _measure_cold_bandwidth_mbps(os.path.join(root, "cells"))
    if measured is None:
        return
    mbps, probed = measured
    if mbps > _MAX_PLAUSIBLE_DISK_MBPS:
        return
    meta_path = os.path.join(root, "_ann_meta.json")
    try:
        with open(meta_path) as f:
            meta = json.load(f)
        meta["bandwidth_mbps"] = mbps
        meta["bandwidth_probe_bytes"] = probed
        meta["bandwidth_probe_method"] = (
            "scratch_copy+fsync+fadvise_dontneed+seqread"
        )
        _write_meta_atomic(meta_path, meta)
    except (OSError, ValueError):
        pass


def build_ann_index(
    corpus: DataFrame,
    root: str,
    n_centroids: int = 16,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Train centroids, assign the corpus, persist both; returns root.

    One corpus-wide pass per training iteration plus one for the final
    assignment — all reusable across every future query.  The cells
    write partitions by cell id so serving can prune at file level.
    The meta sidecar carries a measured cold-read bandwidth stamp
    (:func:`_measure_cold_bandwidth_mbps`) so :func:`ann_serving_policy`
    resolves its float-vs-PQ tie from THIS deployment's disk, not the
    dev box's literal.
    """
    spark = corpus.sparkSession
    dims = _uniform_width(corpus, vec_col, f"build_ann_index({root})")
    cent = kmeans_centroids(
        corpus, n_centroids, n_iters, id_col, vec_col
    )
    cent.write.mode("overwrite").parquet(os.path.join(root, "centroids"))
    cent_r = spark.read.parquet(os.path.join(root, "centroids"))
    assigned = _assign_cells(corpus, cent_r, id_col, vec_col, keep_n=1)
    (
        assigned.select(
            "cell",
            F.lit(-1).alias("ingest_batch"),
            F.col("_id").alias("vec_id"),
            F.col("v").alias("cv"),
            F.col("vn").alias("cn"),
        )
        .write.mode("overwrite")
        .partitionBy("cell", "ingest_batch")
        .parquet(os.path.join(root, "cells"))
    )
    _write_meta_atomic(
        os.path.join(root, "_ann_meta.json"),
        {
            "n_centroids": n_centroids,
            "n_iters": n_iters,
            "dims": dims,
            "id_col": id_col,
            "vec_col": vec_col,
        },
    )
    _stamp_bandwidth(root)
    return root


def ann_index_add_batch(
    spark: SparkSession,
    root: str,
    batch: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_tag: int = -1,
) -> int:
    """Append a batch of new vectors to an existing index; returns the
    batch row count.

    Ingest-time maintenance without retraining: the batch is assigned
    against the FROZEN centroids (one narrow pass over the batch only —
    the standing corpus is never touched) and appended to the
    cell-partitioned layout, so per-batch cost is O(batch), independent
    of index size — the same property the streaming postings-index
    merge has.  Centroids drift from optimal as the distribution moves;
    rebuild with :func:`build_ann_index` on whatever cadence the drift
    monitor (streaming/drift.py) says, exactly like any IVF system.
    Parquet-append visibility: a concurrent reader sees the batch only
    once its files land — per-file atomicity, same discipline as the
    sorted-write path.  ``batch_tag`` names the ``ingest_batch=``
    partition the files land in: streaming ingest passes its checkpoint
    batch id so a crashed-then-replayed batch can be removed exactly
    (streaming/ann_ingest.py); direct callers default to -1 (same
    directory as the build — untagged, not replay-cleanable).
    """
    _recover_cells(root)
    cells_dir = os.path.join(root, "cells")
    if _legacy_cell_layout(cells_dir):
        raise ValueError(
            f"index at {root} uses the pre-ingest_batch cell layout; "
            "appending the partitioned layout beside it would break "
            "partition discovery for the whole table — run "
            "ann_index_compact(spark, root) once to migrate, then ingest."
        )
    recorded = None
    try:
        with open(os.path.join(root, "_ann_meta.json")) as f:
            recorded = json.load(f).get("dims")
    except (OSError, ValueError):
        # ValueError: a meta truncated by a pre-r13 (non-atomic) writer's
        # crash must not block ingest forever (r12 ADVICE) — the dims
        # gate simply has no recorded width to check against
        pass
    _uniform_width(
        batch, vec_col, f"ann_index_add_batch({root})", want=recorded
    )
    cent = spark.read.parquet(os.path.join(root, "centroids"))
    assigned = _assign_cells(batch, cent, id_col, vec_col, keep_n=1)
    (
        assigned.select(
            "cell",
            F.lit(int(batch_tag)).alias("ingest_batch"),
            F.col("_id").alias("vec_id"),
            F.col("v").alias("cv"),
            F.col("vn").alias("cn"),
        )
        .write.mode("append")
        .partitionBy("cell", "ingest_batch")
        .parquet(os.path.join(root, "cells"))
    )
    return batch.count()


def _recover_cells(root: str) -> None:
    """Finish a compaction swap a crash interrupted.  Two swap shapes
    exist, both healed here so serving and ingest self-repair on the
    next touch (single-writer contract: this must not run CONCURRENTLY
    with a live compaction — see the module docstring of
    streaming/ann_ingest.py):

    - whole-index (:func:`ann_index_compact`): write tmp → rename cells
      away → rename tmp in.  A crash between the renames leaves no
      ``cells`` but a COMPLETE ``cells__compacting`` — promote it; a
      leftover ``cells__old`` beside a live ``cells`` is post-swap
      garbage — drop it.
    - per-cell (:func:`ann_index_compact_cells`, r13): each folded cell
      is swapped by rename(cell → cells__cellfold_old/cell) +
      rename(stage/cell → cell).  A crash between the two leaves that
      ONE cell missing from the live tree: promote the staged copy when
      the stage write committed (``_SUCCESS`` present — the swap phase
      only starts after it), else restore the old copy.  A leftover
      old dir whose every cell is live again is post-swap garbage.
    """
    import shutil

    cells = os.path.join(root, "cells")
    tmp = os.path.join(root, "cells__compacting")
    old = os.path.join(root, "cells__old")
    if not os.path.exists(cells):
        if os.path.exists(tmp):  # complete new data: finish the swap
            os.rename(tmp, cells)
        elif os.path.exists(old):  # crashed before the tmp write landed
            os.rename(old, cells)
    if os.path.exists(cells) and os.path.exists(old):
        shutil.rmtree(old, ignore_errors=True)
    # --- per-cell fold windows (r13) ---------------------------------
    stage = os.path.join(root, "cells__cellfold")
    cell_old = os.path.join(root, "cells__cellfold_old")
    if os.path.exists(cell_old):
        staged_ok = os.path.exists(os.path.join(stage, "_SUCCESS"))
        for entry in os.listdir(cell_old):
            if not entry.startswith("cell="):
                continue
            live = os.path.join(cells, entry)
            if os.path.exists(live):
                continue
            staged = os.path.join(stage, entry)
            if staged_ok and os.path.exists(staged):
                os.rename(staged, live)  # finish the interrupted swap
            else:
                os.rename(os.path.join(cell_old, entry), live)
        shutil.rmtree(cell_old, ignore_errors=True)
    # the stage dir itself is owned by the (single-writer) compact job —
    # collected there, never here, same rule as cells__compacting


def _legacy_cell_layout(cells_dir: str) -> bool:
    """True when cell directories hold parquet files directly — the
    pre-``ingest_batch`` layout.  Appending the two-level layout beside
    it would make partition discovery fail for the WHOLE table
    ('conflicting directory structures'), so writers must gate.

    Answers from the FIRST decisive entry (r13.2): every writer gates,
    so a tree is homogeneous by construction — a data file directly
    under a cell dir means legacy, an ``ingest_batch=`` subdirectory
    means current, and the scan stops there.  The pre-r13.2 form
    listed EVERY cell dir before returning False, an O(#cells)
    per-ingest-batch cost in the streaming hot path (this guard and
    the codes-maintainability check both run per micro-batch); empty
    cell dirs keep scanning.  A hand-mixed tree (no writer produces
    one) answers by whichever decisive entry lists first — such a
    tree already fails partition discovery on any read."""
    import glob

    for cell in glob.glob(os.path.join(cells_dir, "cell=*")):
        for entry in os.listdir(cell):
            if entry.startswith((".", "_")):
                continue
            if os.path.isfile(os.path.join(cell, entry)):
                return True
            if entry.startswith("ingest_batch="):
                return False
    return False


def ann_index_compact(spark: SparkSession, root: str) -> int:
    """Fold accumulated ``ingest_batch=<id>`` delta directories back into
    the base layout (everything under ``ingest_batch=-1``); returns the
    NUMBER OF DELTA DIRECTORIES FOLDED.  Also migrates a
    pre-``ingest_batch`` (legacy flat-cell) index into the current
    layout, which unblocks :func:`ann_index_add_batch` on old roots —
    a pure legacy migration rewrites the index but folds 0 deltas and
    returns 0, so the return value is only "did nothing happen" when
    the layout was already current (ADVICE r5: the old code returned 1
    for a zero-delta migration, misreporting the documented count).

    A long-running stream leaves one small directory per cell per batch
    (the price of crash-exact replay, streaming/ann_ingest.py); serving
    cost grows with file count, not data size.  Compaction is the same
    amortized rewrite the near-dedup band state and any LSM layout use:
    read current cells, rewrite partitioned by cell into a fresh
    directory, then swap.  The swap is two renames, NOT atomic — the
    crash window between them is closed by :func:`_recover_cells`
    (the complete ``cells__compacting`` directory is promoted on the
    next touch).  Run between batches only (same single-writer contract
    as ingest).
    """
    import glob
    import shutil

    _recover_cells(root)
    cells_dir = os.path.join(root, "cells")
    tmp = os.path.join(root, "cells__compacting")
    # A compaction that crashed BEFORE its first rename leaves a
    # complete-but-stale staging dir beside the LIVE cells tree.
    # _recover_cells must NOT touch it (it runs on the concurrent serve
    # path, which could race an in-flight compaction's staging write);
    # this single-writer job owns the staging dir, so it collects the
    # orphan here — BEFORE the no-work early return, or a delta-free
    # index would carry the stale snapshot forever (r12 crash fuzz).
    # The per-cell fold's staging dir (r13) has the same owner, so a
    # selective fold that crashed mid-write is collected here too.
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(os.path.join(root, "cells__cellfold"), ignore_errors=True)
    deltas = glob.glob(os.path.join(cells_dir, "cell=*", "ingest_batch=*"))
    deltas = [d for d in deltas if not d.endswith("ingest_batch=-1")]
    legacy = _legacy_cell_layout(cells_dir)
    if not deltas and not legacy:
        return 0
    current = spark.read.parquet(cells_dir).select(
        "cell", "vec_id", "cv", "cn"
    )
    (
        current.withColumn("ingest_batch", F.lit(-1))
        .write.mode("overwrite")
        .partitionBy("cell", "ingest_batch")
        .parquet(tmp)
    )
    old = os.path.join(root, "cells__old")
    shutil.rmtree(old, ignore_errors=True)
    os.rename(cells_dir, old)
    os.rename(tmp, cells_dir)
    shutil.rmtree(old, ignore_errors=True)
    # the fold just rewrote the cells tree cold — a free probe window;
    # re-stamping here keeps a long-lived index's serving policy on its
    # CURRENT volume instead of the build-day number (r12 VERDICT #3)
    _stamp_bandwidth(root)
    return len(deltas)


def ann_index_compact_cells(
    spark: SparkSession, root: str, cells
) -> int:
    """Fold ONLY the given cells' ``ingest_batch=<id>`` delta
    directories into their base layout; returns the number of delta
    directories folded.

    The selective counterpart of :func:`ann_index_compact` (r12 VERDICT
    task 1): under skewed ingest the hot cell crosses the fragmentation
    dial while cold cells hold 1–2 delta dirs, and folding the WHOLE
    index on the hot cell's schedule is a corpus-scale synchronous
    stall inside a micro-batch — the same problem the postings LSM
    solved with per-bucket segment lists (streaming/index_maintenance).
    Each cell's ``base + deltas`` set is self-contained, so the fold
    reads and rewrites ONLY the requested cells: cost is O(requested
    cells' bytes), never O(index).

    ``cells`` is an iterable of cell partition VALUES (the ``<c>`` of
    ``cell=<c>`` — ints for the default long id column); values whose
    directory is missing or delta-free are skipped.

    Crash-safety: all requested cells are rewritten into a staging tree
    in ONE Spark job (``cells__cellfold``, committed by its
    ``_SUCCESS``), then swapped per cell via two renames through
    ``cells__cellfold_old``; every window is healed by
    :func:`_recover_cells` — promote the staged copy after the commit
    marker, restore the old copy before it, and cells not yet swapped
    simply keep their deltas for a later fold.  Single-writer, like
    :func:`ann_index_compact`.  Legacy (pre-``ingest_batch``) layouts
    must migrate through the full compact first — partition discovery
    cannot read a mixed tree.
    """
    import glob
    import shutil

    _recover_cells(root)
    cells_dir = os.path.join(root, "cells")
    if _legacy_cell_layout(cells_dir):
        raise ValueError(
            f"index at {root} uses the pre-ingest_batch cell layout — "
            "run ann_index_compact(spark, root) once to migrate before "
            "selective folds."
        )
    stage = os.path.join(root, "cells__cellfold")
    old = os.path.join(root, "cells__cellfold_old")
    # this single-writer job owns both; a prior crash's leftovers were
    # either healed by _recover_cells (old) or are orphan staging (stage)
    shutil.rmtree(stage, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    todo: dict[str, list[str]] = {}
    for c in cells:
        cdir = os.path.join(cells_dir, f"cell={c}")
        if not os.path.isdir(cdir):
            continue
        deltas = [
            d
            for d in glob.glob(os.path.join(cdir, "ingest_batch=*"))
            if not d.endswith("ingest_batch=-1")
        ]
        if deltas:
            todo[f"cell={c}"] = deltas
    if not todo:
        return 0
    # one job over ONLY the requested cells: basePath keeps `cell` as a
    # partition column so the staged tree mirrors the live layout
    current = (
        spark.read.option("basePath", cells_dir)
        .parquet(*(os.path.join(cells_dir, name) for name in todo))
        .select("cell", "vec_id", "cv", "cn")
    )
    (
        current.withColumn("ingest_batch", F.lit(-1))
        .write.mode("overwrite")
        .partitionBy("cell", "ingest_batch")
        .parquet(stage)
    )
    os.makedirs(old, exist_ok=True)
    folded = 0
    for name, deltas in todo.items():
        staged = os.path.join(stage, name)
        if not os.path.isdir(staged):
            # zero-row cell after the fold (possible only from empty
            # delta files): leave the live dir untouched rather than
            # dropping data on a read glitch
            continue
        os.rename(os.path.join(cells_dir, name), os.path.join(old, name))
        os.rename(staged, os.path.join(cells_dir, name))
        folded += len(deltas)
    shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(stage, ignore_errors=True)
    _stamp_bandwidth(root)  # same free-probe window as the full fold
    return folded


def ann_search(
    spark: SparkSession,
    root: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 5,
    max_probe_cells: int = 10_000,
    max_query_rows: int = 100_000,
) -> DataFrame:
    """Serve cosine top-k from a materialized index: zero corpus I/O.

    ``[query_id, neighbor_id, cos_sim, rank]`` — the contract of
    ``similarity.brute_force_topk`` / ``ivf_topk``.  Per query the
    ``nprobe`` best cells are searched; the union of probe cells across
    the query set is collected (bounded by ``max_probe_cells``) and
    pushed as a literal partition predicate, so the cells read prunes
    to the probed directories at file-listing time.  With ``nprobe >=
    n_centroids`` every cell is probed and the result is EXACTLY brute
    force (same rounding, same tie order) — the equivalence tests pin
    that.

    Scoring is one vectorized Arrow pass over the probed cells (r9 —
    the pq_topk batch shape): the BOUNDED query set is collected
    (``max_query_rows`` guard, the PQ-path contract) and each cells
    batch scores as a numpy GEMM against the queries probing its cell,
    keeping a per-batch local top-k so only |Q|·k rows per batch reach
    the global rank.  The previous per-pair ``zip_with`` cosine was
    interpreted (higher-order exprs skip codegen) and measured 122 s
    for 40 queries × 1 M rows at nprobe=4 on local[32] — this form
    serves the same query set in well under a tenth of that (see
    SCALE.md's crossover table).
    """
    import numpy as np

    _recover_cells(root)  # finish any crash-interrupted compaction swap
    q_rows = (
        queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
        .limit(max_query_rows + 1)
        .collect()
    )
    if len(q_rows) > max_query_rows:
        raise ValueError(
            f"ann_search collects the query set to the driver; got > "
            f"max_query_rows={max_query_rows} rows. Batch the queries "
            "or raise max_query_rows explicitly."
        )
    q_id_ddl = queries.schema[id_col].dataType.simpleString()
    empty_schema = (
        f"query_id {q_id_ddl}, neighbor_id long, cos_sim double, rank int"
    )
    if not q_rows:
        return spark.createDataFrame([], empty_schema)
    # identity gate (the IndexCatalog discipline): an index built over
    # d-dim vectors must not score d'-dim queries — a silent truncation
    # would return plausible nonsense.  Width read off the collected
    # rows (no extra Spark job).
    meta_path = os.path.join(root, "_ann_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        want = meta.get("dims")
        widths = [len(r["qv"]) for r in q_rows if r["qv"] is not None]
        got_d = widths[0] if widths else None
        if want is not None and got_d is not None and got_d != want:
            raise ValueError(
                f"ann_search: index at {root} was built over {want}-dim "
                f"vectors; query column {vec_col!r} has {got_d} dims."
            )
    from .pq import _pad_matrix

    cent = spark.read.parquet(os.path.join(root, "centroids"))
    cids, cmat, cns, n_dims = _collect_centroids(cent)
    q_mat = _pad_matrix([r["qv"] for r in q_rows], n_dims)
    q_ids = [r["qid"] for r in q_rows]
    q_norm = np.linalg.norm(q_mat, axis=1)
    # Spark's otherwise-0 branch for the query side (r12): NULL-element
    # queries (NULL norm in the brute twin's guard) and zero queries
    # score 0.0; NaN norms (NaN/±inf elements) PASS Spark's `> 0` and
    # score NaN — ranked first, the serve tie-tier
    q_zero = _null_elem_flags(
        [r["qv"] for r in q_rows], n_dims
    ) | (q_norm == 0)
    # probe ranking runs driver-side over the ALREADY-collected matrix
    # (same GEMM + tie rule as _assign_cells): no second execution of
    # the query plan, no KeyError on a nondeterministic query frame
    ranked = _probe_rank(q_mat, cmat, cns, nprobe, round_digits, q_zero)
    cell_qidx: dict = {}
    for j in range(len(q_ids)):
        for ci in ranked[j]:
            cell_qidx.setdefault(cids[int(ci)], []).append(j)
    probe_cells = sorted(cell_qidx)
    if len(probe_cells) > max_probe_cells:
        raise ValueError(
            f"ann_search probes > max_probe_cells={max_probe_cells} cells; "
            "shrink the query set / nprobe or raise the cap explicitly"
        )

    score_ddl = f"query_id {q_id_ddl}, neighbor_id long, cos_sim double"
    score_pa_schema = _arrow_schema(score_ddl)
    dec = by_value(decode_list_matrix)  # canonical decode (r12; this
    # closure inlined its own copy r10–r11), shipped by value
    hup = by_value(_half_up)  # one rounding implementation (r12)

    def _score(batches):
        # Arrow-native (r10): the pandas bridge's per-row vector objects
        # + pad loop measured ~2 s per million probed rows — the
        # dominant serve cost at 10 M rows; one flatten+reshape decodes
        # each batch with zero per-row Python (see _assign_cells).
        import numpy as np
        import pyarrow as pa

        qn_safe = np.where(q_norm > 0, q_norm, 1.0)
        for rb in batches:
            nrows = rb.num_rows
            if not nrows:
                continue
            cells_np = rb.column(0).to_numpy(zero_copy_only=False)
            ids_np = rb.column(1).to_numpy(zero_copy_only=False)
            col = rb.column(2)
            # NULL corpus vectors are never EMITTED as neighbors: the
            # SQL twin scores them NULL (sorted last under desc), so a
            # 0.0 emission would outrank genuine negative-sim matches
            # (r9 ADVICE).  Genuine zero VECTORS keep the 0.0 zero-norm
            # rule (the twin rounds them to 0.0 too).
            mat, live, _lens = dec(col, nrows, width=n_dims)
            vn = np.linalg.norm(mat, axis=1)
            vn_safe = np.where(vn > 0, vn, 1.0)
            out_q, out_n, out_s = [], [], []
            order = np.argsort(cells_np, kind="stable")
            uniq, starts = np.unique(
                cells_np[order], return_index=True
            )
            bounds = np.r_[starts[1:], nrows]
            for u, s0, e0 in zip(uniq, starts, bounds):
                qidx = cell_qidx.get(u if not hasattr(u, "item") else u.item())
                if not qidx:
                    continue
                sel = order[s0:e0]
                qi = np.asarray(qidx, dtype=np.int64)
                sims = (mat[sel] @ q_mat[qi].T) / np.outer(
                    vn_safe[sel], qn_safe[qi]
                )
                # Spark-branch zero mask (r12): q_zero carries the
                # NULL-element flag from the collected rows (the brute
                # twin's guard sees a NULL norm there → otherwise-0),
                # plus genuine zero norms; NaN norms (NaN/±inf
                # elements) PASS Spark's `> 0`, score NaN, rank first.
                # Corpus norms are gate-clean: only real zeros here.
                sims[vn[sel] == 0, :] = 0.0
                sims[:, q_zero[qi]] = 0.0
                sims = hup(sims, round_digits)
                c_ids = ids_np[sel]
                g_live = live[sel]
                for cj, j in enumerate(qi):
                    qid = q_ids[j]
                    keep = np.nonzero((c_ids != qid) & g_live)[0]
                    if not len(keep):
                        continue
                    # NaN sims (an INF-element query — the lifecycle
                    # gate keeps the corpus clean) rank FIRST like
                    # Spark's NaN-above-every-double DESC window, so
                    # the local cut keeps the same candidates the
                    # global rank would (r12)
                    vals = sims[keep, cj]
                    nan_v = np.isnan(vals)
                    top = keep[
                        np.lexsort(
                            (
                                c_ids[keep],
                                np.where(nan_v, 0.0, -vals),
                                ~nan_v,
                            )
                        )[:k]
                    ]
                    out_q.extend([qid] * len(top))
                    out_n.extend(c_ids[top])
                    out_s.extend(sims[top, cj])
            if out_q:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(out_q, type=score_pa_schema.field(0).type),
                        pa.array(
                            np.asarray(out_n, dtype=np.int64),
                            type=score_pa_schema.field(1).type,
                        ),
                        pa.array(
                            np.asarray(out_s, dtype=np.float64),
                            type=score_pa_schema.field(2).type,
                        ),
                    ],
                    schema=score_pa_schema,
                )

    cells = (
        spark.read.parquet(os.path.join(root, "cells"))
        .where(F.col("cell").isin(probe_cells))  # static partition pruning
        .select("cell", "vec_id", "cv")
    )
    scored = cells.mapInArrow(_score, score_ddl)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# IVF-PQ: product-quantized codes sidecar over the cell layout
# ---------------------------------------------------------------------------

# Bump when _cells_walk's digest input changes (v2 = r9's hidden-entry
# skip).  Recorded in _pq_meta.json so a mismatch can name its cause.
_FINGERPRINT_VERSION = 2


def _tree_bytes(d: str) -> int:
    """Visible-file bytes under ``d`` (hidden ``.``/``_`` entries are
    markers, not data).  Raises OSError on any listing failure —
    os.walk SUPPRESSES errors by default (onerror=None), and a silent 0
    from a non-listable tree reads as "small", the wrong direction for
    every caller (they must assume LARGE when they cannot list)."""

    def _raise(err: OSError):
        raise err

    total = 0
    for dirpath, dirnames, files in os.walk(d, onerror=_raise):
        dirnames[:] = [x for x in dirnames if not x.startswith((".", "_"))]
        for f in files:
            if not f.startswith((".", "_")):
                total += os.path.getsize(os.path.join(dirpath, f))
    return total


def _probed_cell_bytes(root: str, probe_cells) -> int | None:
    """On-disk bytes of the probed float cell directories, or None when
    the root is not a locally-listable path (object stores) — callers
    treat None as 'assume large', the scale-safe direction.  One
    os.walk per probed cell: metadata-only, never data I/O."""
    if not os.path.isdir(os.path.join(root, "cells")):
        return None
    total = 0
    try:
        for c in probe_cells:
            d = os.path.join(root, "cells", f"cell={c}")
            # empty cells are routine (a centroid that is nobody's
            # argmax gets no partition dir): 0 bytes, not a listing
            # failure — raising here would engage the pushdown's extra
            # job on every serve of a perfectly listable index
            if os.path.isdir(d):
                total += _tree_bytes(d)
    except OSError:
        return None
    return total


def _cells_walk(cells_dir: str) -> str:
    """Full O(#files) digest of the cells tree: sha256 over the sorted
    (relative path, size) listing.  Module-level so tests can interpose
    it (warm serves must not re-walk).  Hidden (``.``/``_``) entries
    are skipped — they are markers/in-flight writer state, not data,
    and the cache's mtime token (functions/listing.py) deliberately
    does not descend into hidden directories, so digesting them would
    open a token-blind staleness channel (r9 review finding)."""
    import hashlib

    entries = []
    for dirpath, dirnames, files in os.walk(cells_dir):
        dirnames[:] = [
            d for d in dirnames if not d.startswith((".", "_"))
        ]
        for name in files:
            if name.startswith((".", "_")):
                continue
            p = os.path.join(dirpath, name)
            entries.append(
                (os.path.relpath(p, cells_dir), os.path.getsize(p))
            )
    h = hashlib.sha256()
    for rel, size in sorted(entries):
        h.update(f"{rel}\x00{size}\n".encode())
    return h.hexdigest()


def _cells_fingerprint(root: str, use_cache: bool = True) -> str:
    """Content identity of the cells tree.  Any build/ingest/compaction
    changes the file set, so a stale codes sidecar can never serve
    silently — the IndexCatalog staleness discipline applied to the
    vector side.  Serving memoizes the walk behind the O(#dirs) mtime
    token (functions/listing.py); the augmentation passes
    ``use_cache=False`` so the PINNED fingerprint always comes from a
    real walk."""
    from ..functions.listing import cached_listing_digest

    return cached_listing_digest(
        os.path.join(root, "cells"),
        _cells_walk,
        "cells",
        use_cache=use_cache,
    )


def _cell_fingerprints(
    root: str, cells=None, use_cache: bool = True
) -> dict[str, str]:
    """Per-cell content digests: ``{cell value (dir-name string) →
    digest of cells/cell=<c>}``, restricted to ``cells`` when given
    (values str()-matched against the partition dir names).  Missing /
    empty cell directories get NO entry — serving treats
    absent-on-both-sides as consistent (an empty probed cell has no
    codes either).  This is the staleness gate's r13 granularity: a
    selective fold + re-encode updates only the folded cells' entries,
    and a PQ serve checks only its PROBED cells, so streaming ingest
    into cell A never blocks serves probing untouched cell B."""
    from ..functions.listing import cached_listing_digest

    cells_dir = os.path.join(root, "cells")
    want = None if cells is None else {f"cell={c}" for c in cells}
    out: dict[str, str] = {}
    try:
        entries = os.listdir(cells_dir)
    except OSError:
        return out
    for entry in entries:
        if not entry.startswith("cell="):
            continue
        if want is not None and entry not in want:
            continue
        d = os.path.join(cells_dir, entry)
        if not os.path.isdir(d):
            continue
        digest = cached_listing_digest(
            d, _cells_walk, "cell", use_cache=use_cache
        )
        if digest is not None:
            out[entry[len("cell="):]] = digest
    return out


def pq_augment_ann_index(
    spark: SparkSession,
    root: str,
    m_subspaces: int = 8,
    n_codes: int = 16,
    n_iters: int = 4,
    sample_rows: int = 65_536,
    n_dims: int | None = None,
) -> str:
    """Encode the index's cell-partitioned corpus into a PQ codes
    sidecar (``pq_codes/cell=<c>/``) + codebooks; returns root.

    One corpus pass (narrow — the encode keeps each row's cell key, no
    shuffle), after which :func:`ann_search_pq` serves the ADC scan
    from the 64×-smaller codes and touches float vectors only for the
    re-rank candidates.  The sidecar is pinned to the EXACT current
    cells tree by fingerprint: any later build/ingest/compaction makes
    it stale and serving raises loudly — re-run this augmentation on
    the same cadence as compaction.  Crash-safe: codes land in a tmp
    dir swapped in by rename, and the meta file (fingerprint +
    codebooks) is written LAST — a crash between the two leaves a
    sidecar that fails the fingerprint gate, never a wrong answer.

    ``n_dims`` defaults to the dims recorded in ``_ann_meta.json`` at
    build time — NOT a fixed constant, or a >64-dim index would be
    silently encoded over a 64-dim prefix (``_pad_matrix`` truncates)
    and ADC ranking would quietly degrade.  Raises if the meta is
    missing dims and no explicit override is given.
    """
    import shutil

    from .pq import pq_train, pq_encode

    _recover_cells(root)
    if n_dims is None:
        ann_meta_path = os.path.join(root, "_ann_meta.json")
        try:
            with open(ann_meta_path) as f:
                recorded = json.load(f).get("dims")
        except (OSError, ValueError):  # truncated legacy meta: no dims
            recorded = None
        if recorded is None:
            raise ValueError(
                f"pq_augment_ann_index: {root}/_ann_meta.json does not "
                "record the index dims (empty-corpus build or pre-dims "
                "index) — pass n_dims explicitly so PQ covers the full "
                "vector width."
            )
        n_dims = int(recorded)
    cells = spark.read.parquet(os.path.join(root, "cells"))
    cell_ddl = cells.schema["cell"].dataType.simpleString()
    cb = pq_train(
        cells,
        m_subspaces=m_subspaces,
        n_codes=n_codes,
        sample_rows=sample_rows,
        n_iters=n_iters,
        id_col="vec_id",
        vec_col="cv",
        n_dims=n_dims,
    )
    fp = _cells_fingerprint(root, use_cache=False)
    cell_fps = _cell_fingerprints(root, use_cache=False)
    codes_dir = os.path.join(root, "pq_codes")
    tmp_dir = codes_dir + "__tmp"
    old_dir = codes_dir + "__old"
    for d in (tmp_dir, old_dir):
        if os.path.exists(d):
            shutil.rmtree(d)
    meta_path = os.path.join(root, "_pq_meta.json")
    if os.path.exists(meta_path):
        os.remove(meta_path)  # serving gate off during the swap
    # two-level layout since r13 (mirrors the cells tree): the initial
    # encode lands under ingest_batch=-1 so the streaming ingest can
    # append each micro-batch's codes under its own tagged directory
    # (pq_append_batch_codes) without breaking partition discovery
    (
        pq_encode(
            cells,
            cb,
            id_col="vec_id",
            vec_col="cv",
            extra_cols={"cell": cell_ddl},
        )
        .withColumn("ingest_batch", F.lit(-1))
        .write.mode("overwrite")
        .partitionBy("cell", "ingest_batch")
        .parquet(tmp_dir)
    )
    if os.path.exists(codes_dir):
        os.rename(codes_dir, old_dir)
    os.rename(tmp_dir, codes_dir)
    if os.path.exists(old_dir):
        shutil.rmtree(old_dir)
    _write_meta_atomic(
        meta_path,
        {
            "books": cb.books,
            "n_dims": cb.n_dims,
            "cells_fingerprint": fp,
            # v2 (r9): hidden ('.'/'_') entries are skipped by the
            # walk — versioned so serving can tell "format changed,
            # re-augment" from "cells tree really changed" when an
            # older sidecar mismatches (r9 ADVICE)
            "fingerprint_version": _FINGERPRINT_VERSION,
            # r13: the gate's selective granularity — serving checks
            # only its PROBED cells against this map, and the selective
            # fold's re-encode updates only the folded cells' entries
            # (the whole-tree digest above stays for debugging and for
            # pre-r13 readers)
            "cell_fingerprints": cell_fps,
            # training dials recorded so maintenance re-augments replay
            # the operator's geometry AND training budget instead of
            # silently reverting to defaults (r12 ADVICE)
            "m_subspaces": m_subspaces,
            "n_codes": n_codes,
            "n_iters": n_iters,
            "sample_rows": sample_rows,
        },
    )
    # An index built before the bandwidth stamp existed (or whose probe
    # failed) gets a second chance here — augmentation is the moment a
    # deployment opts into the float-vs-PQ choice the stamp informs.
    try:
        with open(os.path.join(root, "_ann_meta.json")) as f:
            has_stamp = "bandwidth_mbps" in json.load(f)
    except (OSError, ValueError):
        has_stamp = True  # unreadable meta: nothing to stamp into
    if not has_stamp:
        _stamp_bandwidth(root)
    return root


def pq_reencode_stale_cells(spark: SparkSession, root: str) -> int:
    """Re-encode ONLY the cells whose recorded per-cell fingerprint no
    longer matches the cells tree, reusing the sidecar's EXISTING
    codebooks (no retrain); returns the number of cells refreshed.

    The selective counterpart of :func:`pq_augment_ann_index` (r12
    VERDICT task 1): after a selective fold — or plain ingest — only
    the touched cells' codes are stale, and re-encoding the whole
    corpus (plus re-training) to fix them is the same O(index) stall
    the selective fold exists to avoid.  Codebooks are a SAMPLE-trained
    artifact: reusing them over refreshed rows keeps ADC ranking
    quality on the drift monitor's rebuild cadence, exactly like the
    frozen centroids (streaming/ann_ingest.py's rebuild recipe).

    Self-healing by construction: staleness is diffed from the live
    tree (not from "what the caller folded"), so cells left stale by a
    prior crash — or by ingest batches below the autocompact dial —
    are refreshed on the next call, which also keeps
    :func:`ann_search_pq` AVAILABLE during streaming instead of raising
    between full augments.  Crash-safe fail-closed: each refreshed
    cell's codes are swapped in before the meta is rewritten (atomic,
    LAST), so a crash anywhere leaves a fingerprint mismatch the
    serving gate refuses — never a wrong answer.

    Requires a per-cell-gated sidecar (``cell_fingerprints`` in
    ``_pq_meta.json``, written since r13); legacy whole-tree sidecars
    must re-run :func:`pq_augment_ann_index` once.
    """
    import shutil

    from .pq import PQCodebooks, pq_encode

    _recover_cells(root)
    meta_path = os.path.join(root, "_pq_meta.json")
    if not os.path.exists(meta_path):
        raise ValueError(
            f"pq_reencode_stale_cells: no PQ sidecar at {root} — run "
            "pq_augment_ann_index(spark, root) first."
        )
    with open(meta_path) as f:
        meta = json.load(f)
    recorded = meta.get("cell_fingerprints")
    if recorded is None:
        raise ValueError(
            f"pq_reencode_stale_cells: the sidecar at {root} predates "
            "per-cell fingerprints — re-run pq_augment_ann_index(spark, "
            "root) once to upgrade it."
        )
    current = _cell_fingerprints(root, use_cache=False)
    refresh = sorted(
        c for c, d in current.items() if recorded.get(c) != d
    )
    dropped = sorted(c for c in recorded if c not in current)
    if not refresh and not dropped:
        return 0
    cb = PQCodebooks(
        books=tuple(tuple(tuple(x) for x in b) for b in meta["books"]),
        n_dims=meta["n_dims"],
    )
    cells_dir = os.path.join(root, "cells")
    codes_dir = os.path.join(root, "pq_codes")
    if _legacy_cell_layout(codes_dir):
        # single-level (pre-r13.2) codes beside a two-level staged swap
        # would break partition discovery for the whole sidecar — one
        # full augment rewrites the tree into the current layout
        raise ValueError(
            f"pq sidecar at {root} uses the single-level codes layout — "
            "re-run pq_augment_ann_index(spark, root) once to migrate, "
            "then selective refreshes work."
        )
    stage = codes_dir + "__cellfold"
    shutil.rmtree(stage, ignore_errors=True)
    if refresh:
        cells = (
            spark.read.option("basePath", cells_dir)
            .parquet(
                *(os.path.join(cells_dir, f"cell={c}") for c in refresh)
            )
            .select("cell", "vec_id", "cv", "cn")
        )
        cell_ddl = cells.schema["cell"].dataType.simpleString()
        # a refreshed cell's codes are rewritten WHOLE under
        # ingest_batch=-1 — the refresh doubles as that cell's codes
        # defragmentation (tagged per-batch code dirs from
        # pq_append_batch_codes fold away here)
        (
            pq_encode(
                cells,
                cb,
                id_col="vec_id",
                vec_col="cv",
                extra_cols={"cell": cell_ddl},
            )
            .withColumn("ingest_batch", F.lit(-1))
            .write.mode("overwrite")
            .partitionBy("cell", "ingest_batch")
            .parquet(stage)
        )
    for c in refresh + dropped:
        live = os.path.join(codes_dir, f"cell={c}")
        staged = os.path.join(stage, f"cell={c}")
        # swap = drop + rename: a crash between the two leaves this
        # cell's codes missing AND its meta entry stale — the serving
        # gate refuses it until the next (self-healing) call
        shutil.rmtree(live, ignore_errors=True)
        if os.path.isdir(staged):
            os.rename(staged, live)
    shutil.rmtree(stage, ignore_errors=True)
    meta["cell_fingerprints"] = current
    # keep the debugging whole-tree digest truthful alongside
    meta["cells_fingerprint"] = _cells_fingerprint(root, use_cache=False)
    _write_meta_atomic(meta_path, meta)
    return len(refresh) + len(dropped)


def pq_append_batch_codes(
    spark: SparkSession, root: str, batch_tag: int
) -> list:
    """Encode ONE ingest batch's rows (already appended to the cells
    tree under ``ingest_batch=<batch_tag>``) with the sidecar's
    EXISTING codebooks, append them under the same tag in the codes
    tree, and refresh the touched cells' fingerprints; returns the
    touched cell values.

    The encode-at-ingest half of the r13 LSM discipline for the codes
    sidecar: without it, every ingest batch leaves its cells
    fingerprint-stale and ``ann_search_pq`` fails closed on those cells
    until the next fold's refresh — correct, but an availability hole
    exactly while the stream is healthiest.  Appending the batch's own
    codes (an O(batch) GEMM — the batch is read back from its tagged
    cell directories, so the stored assignment is reused, never
    recomputed) keeps codes content equal to cells content after every
    commit, so the per-cell gate passes continuously.  Tagged code
    directories fold away whenever :func:`pq_reencode_stale_cells`
    rewrites their cell (the fold path), mirroring the cells tree's
    own fragmentation lifecycle — both trees cross the autocompaction
    dial together because their delta-directory counts are identical.

    Crash-safe fail-closed: codes land before the meta refresh (atomic,
    LAST), so a crash anywhere leaves the touched cells' recorded
    fingerprints behind the tree and the serving gate refuses them; the
    streaming wrapper's replay drops BOTH trees' tagged directories
    before re-appending (``_drop_batch_dirs``), so nothing
    double-inserts.  The whole-tree ``cells_fingerprint`` is NOT
    refreshed here (that would cost an O(#files) walk per micro-batch);
    it stays a debugging value wherever ``cell_fingerprints`` exists.

    Raises if the sidecar is missing, predates per-cell fingerprints,
    or uses the single-level codes layout (one ``pq_augment_ann_index``
    migrates).  ``batch_tag`` must name a REAL tagged batch — the
    untagged ``-1`` base is refused (encoding "batch -1" would
    duplicate every base row's codes).
    """
    import glob

    from .pq import PQCodebooks, pq_encode

    if int(batch_tag) == -1:
        raise ValueError(
            "pq_append_batch_codes: batch_tag=-1 is the untagged base "
            "partition, not a batch — guarded callers must skip codes "
            "maintenance for untagged appends."
        )
    meta_path = os.path.join(root, "_pq_meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    if meta.get("cell_fingerprints") is None:
        raise ValueError(
            f"pq_append_batch_codes: the sidecar at {root} predates "
            "per-cell fingerprints — re-run pq_augment_ann_index once."
        )
    codes_dir = os.path.join(root, "pq_codes")
    if not os.path.isdir(codes_dir):
        # meta without its codes tree (manual surgery): appending would
        # recreate the tree from new batches alone, and the refreshed
        # fingerprints would serve cells whose BASE rows have no codes
        raise ValueError(
            f"pq_append_batch_codes: {root}/_pq_meta.json exists but the "
            "pq_codes tree is missing — re-run pq_augment_ann_index."
        )
    if _legacy_cell_layout(codes_dir):
        raise ValueError(
            f"pq sidecar at {root} uses the single-level codes layout — "
            "re-run pq_augment_ann_index(spark, root) once to migrate."
        )
    cells_dir = os.path.join(root, "cells")
    delta_dirs = sorted(
        glob.glob(
            os.path.join(cells_dir, "cell=*", f"ingest_batch={batch_tag}")
        )
    )
    if not delta_dirs:
        return []  # empty batch: nothing appended, nothing stale
    touched = [
        os.path.basename(os.path.dirname(d))[len("cell="):]
        for d in delta_dirs
    ]
    cb = PQCodebooks(
        books=tuple(tuple(tuple(x) for x in b) for b in meta["books"]),
        n_dims=meta["n_dims"],
    )
    batch = (
        spark.read.option("basePath", cells_dir)
        .parquet(*delta_dirs)
        .select("cell", "vec_id", "cv", "cn")
    )
    cell_ddl = batch.schema["cell"].dataType.simpleString()
    (
        pq_encode(
            batch,
            cb,
            id_col="vec_id",
            vec_col="cv",
            extra_cols={"cell": cell_ddl},
        )
        .withColumn("ingest_batch", F.lit(int(batch_tag)))
        .write.mode("append")
        .partitionBy("cell", "ingest_batch")
        .parquet(codes_dir)
    )
    current = _cell_fingerprints(root, cells=touched, use_cache=False)
    meta["cell_fingerprints"].update(current)
    _write_meta_atomic(meta_path, meta)
    return touched


def ann_search_pq(
    spark: SparkSession,
    root: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 5,
    max_probe_cells: int = 10_000,
    max_query_rows: int = 100_000,
    max_pushdown_candidates: int = 10_000,
    min_pushdown_bytes: int = 256 << 20,
    _stop_after: str | None = None,
) -> DataFrame:
    """Serve cosine top-k from the PQ sidecar: probe-pruned ADC scan
    over codes, exact re-rank over candidates only.

    ``_stop_after`` is bench instrumentation (phase decomposition, r8
    VERDICT task 6): ``"probe"`` returns the per-query probed-cell
    frame (centroid ranking only), ``"adc"`` returns the ADC candidate
    frame (probe + codes scan + candidate top-k, no float fetch).
    Phase costs read as deltas: rerank = full − adc, adc-scan = adc −
    probe.  Not part of the serving contract.

    Same contract as :func:`ann_search` (``[query_id, neighbor_id,
    cos_sim, rank]``, exact scores — the ADC estimate only RANKS the
    candidate pool).  I/O per query: the probed cells' CODES
    (~9 B/row vs 512 B/row of floats) plus the k·rerank_factor
    candidates' float vectors — at 100 TB of embeddings that is the
    difference between re-reading the corpus slice and reading 2 % of
    it.  With ``nprobe >= n_centroids`` and ``k·rerank_factor >=
    |corpus|`` the result EQUALS :func:`ann_search`'s full probe ==
    brute force (pinned by test).  Raises if the sidecar is missing or
    stale (cells tree changed since :func:`pq_augment_ann_index`).
    """
    import numpy as np

    from .pq import PQCodebooks, _pad_matrix, _subspace_slices

    _recover_cells(root)
    meta_path = os.path.join(root, "_pq_meta.json")
    if not os.path.exists(meta_path):
        raise ValueError(
            f"ann_search_pq: no PQ sidecar at {root} — run "
            "pq_augment_ann_index(spark, root) first."
        )
    with open(meta_path) as f:
        meta = json.load(f)
    recorded_cell_fps = meta.get("cell_fingerprints")
    # r13 sidecars gate per PROBED cell (after the probe set is known,
    # below): ingest into cell A must not block serves probing only
    # untouched cell B.  Legacy sidecars keep the whole-tree gate.
    if recorded_cell_fps is None and (
        meta["cells_fingerprint"] != _cells_fingerprint(root)
    ):
        if meta.get("fingerprint_version") != _FINGERPRINT_VERSION:
            # an older sidecar whose recorded digest predates the
            # current walk format mismatches on EVERY serve even when
            # the cells tree is untouched — name the real cause so
            # operators don't chase a phantom ingest race (r9 ADVICE)
            raise ValueError(
                f"ann_search_pq: the PQ sidecar at {root} records a "
                f"v{meta.get('fingerprint_version', 1)} cells "
                f"fingerprint but this engine computes "
                f"v{_FINGERPRINT_VERSION} (the digest format changed: "
                "hidden '.'/'_' entries are no longer walked). The "
                "codes may be fine but cannot be verified — re-run "
                "pq_augment_ann_index(spark, root) once to re-pin."
            )
        raise ValueError(
            f"ann_search_pq: the cells tree at {root} changed since the "
            "PQ sidecar was built (ingest/compaction/rebuild) — the "
            "codes are STALE. Re-run pq_augment_ann_index(spark, root)."
        )
    cb = PQCodebooks(
        books=tuple(tuple(tuple(c) for c in b) for b in meta["books"]),
        n_dims=meta["n_dims"],
    )
    # -- bounded query collect FIRST: the dims gate reads the width off
    # the collected rows instead of paying its own .first() Spark job
    # per serve (the float path keeps a standalone gate — it never
    # collects queries)
    q_rows = (
        queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
        .limit(max_query_rows + 1)
        .collect()
    )
    if len(q_rows) > max_query_rows:
        raise ValueError(
            f"ann_search_pq collects the query set to the driver; got > "
            f"max_query_rows={max_query_rows} rows."
        )
    q_id_ddl = queries.schema[id_col].dataType.simpleString()
    if not q_rows:
        # schema matches the non-empty path (q_id_ddl, not a hardcoded
        # long) so per-batch unions don't flip types on an empty batch
        return spark.createDataFrame(
            [],
            f"query_id {q_id_ddl}, neighbor_id long, cos_sim double, "
            "rank int",
        )
    ann_meta_path = os.path.join(root, "_ann_meta.json")
    if os.path.exists(ann_meta_path):
        with open(ann_meta_path) as f:
            ann_meta = json.load(f)
        want = ann_meta.get("dims")
        widths = [len(r["qv"]) for r in q_rows if r["qv"] is not None]
        got_d = widths[0] if widths else None
        if want is not None and got_d is not None and got_d != want:
            raise ValueError(
                f"ann_search_pq: index at {root} was built over "
                f"{want}-dim vectors; query column {vec_col!r} has "
                f"{got_d} dims."
            )

    # -- probe: rank centroids per query, driver-side over the
    # already-collected matrix (see _probe_rank) -----------------------
    cent = spark.read.parquet(os.path.join(root, "centroids"))
    cids, cmat, cns, cent_dims = _collect_centroids(cent)
    probe_mat = _pad_matrix([r["qv"] for r in q_rows], cent_dims)
    probe_zero = _null_elem_flags(
        [r["qv"] for r in q_rows], cent_dims
    ) | (np.linalg.norm(probe_mat, axis=1) == 0)
    ranked = _probe_rank(
        probe_mat, cmat, cns, nprobe, round_digits, probe_zero
    )
    cell_qidx: dict = {}
    for j in range(len(q_rows)):
        for ci in ranked[j]:
            cell_qidx.setdefault(cids[int(ci)], []).append(j)
    probe_cells = sorted(cell_qidx)
    if len(probe_cells) > max_probe_cells:
        raise ValueError(
            f"ann_search_pq probes > max_probe_cells={max_probe_cells} "
            "cells; shrink the query set / nprobe or raise the cap "
            "explicitly"
        )
    if recorded_cell_fps is not None:
        current_fps = _cell_fingerprints(root, cells=probe_cells)
        stale = [
            c
            for c in probe_cells
            if current_fps.get(str(c)) != recorded_cell_fps.get(str(c))
        ]
        if stale:
            raise ValueError(
                f"ann_search_pq: probed cells {stale} at {root} changed "
                "since their PQ codes were written (ingest/fold) — those "
                "codes are STALE. Run pq_reencode_stale_cells(spark, "
                "root) (or pq_augment_ann_index to retrain)."
            )
    if _stop_after == "probe":
        cell_ddl = cent.schema["cid"].dataType.simpleString()
        return spark.createDataFrame(
            [
                (q_rows[j]["qid"], cids[int(ci)])
                for j in range(len(q_rows))
                for ci in ranked[j]
            ],
            f"query_id {q_id_ddl}, cell {cell_ddl}",
        )

    # -- compact query shipment: the closure carries q_mat/books/q_norm
    # (n_queries × n_dims floats + the tiny codebooks), NOT the expanded
    # per-query (m × n_codes) LUT dict — at max_query_rows=100k that
    # dict is ~100+ MB serialized into EVERY task.  LUTs are built once
    # per worker from the compact arrays (the pq_topk._scan shape).
    # The ADC scan itself is JOIN-FREE (r9): the previous form joined
    # probes onto the codes and windowed over the full |Q|-duplicated
    # pair frame — 10 M shuffled rows for 40 queries × 1 M codes; now
    # one Arrow pass over the pruned codes scores each batch against
    # the queries probing its cell and keeps a LOCAL top-(k·factor), so
    # only |Q|·k·factor rows per batch reach the global rank (the
    # ann_search/pq_topk shape).
    slices = _subspace_slices(cb.n_dims, cb.m_subspaces)
    books = cb.books
    q_mat = _pad_matrix([r["qv"] for r in q_rows], cb.n_dims)
    q_ids = [r["qid"] for r in q_rows]
    q_norm = np.linalg.norm(q_mat, axis=1)
    q_zero = _null_elem_flags(
        [r["qv"] for r in q_rows], cb.n_dims
    ) | (q_norm == 0)  # Spark's otherwise-0 branch (r12)
    n_cand = max(k * rerank_factor, k)

    adc_ddl = f"query_id {q_id_ddl}, neighbor_id long, adc_sim double"
    adc_pa_schema = _arrow_schema(adc_ddl)
    dec = by_value(decode_list_matrix)  # canonical decode (r12); codes
    # are small ints, exactly representable through its float64 matrix
    hup = by_value(_half_up)  # one rounding implementation (r12)

    def _adc(batches):
        # Arrow-native (r10): codes decode to the (batch × m) int matrix
        # with one flatten+reshape — zero per-row Python (the pandas
        # bridge's per-row np.vstack objects dominated at 10 M rows)
        import numpy as np
        import pyarrow as pa

        cents = [np.asarray(b, dtype=np.float64) for b in books]
        # luts[s]: (n_codes, n_queries) — built once per worker;
        # approx_dot(x, q) = sum_s luts[s][code_s(x), j]
        luts = [
            cents[s] @ q_mat[:, lo:hi].T
            for s, (lo, hi) in enumerate(slices)
        ]
        m = len(luts)
        for rb in batches:
            nrows = rb.num_rows
            if not nrows:
                continue
            cells_np = rb.column(0).to_numpy(zero_copy_only=False)
            ids_np = rb.column(1).to_numpy(zero_copy_only=False)
            codes_col = rb.column(2)
            # codes are fixed-width (one per subspace) and never null —
            # pq_encode emits a row for every input, NULLs marked via
            # NaN vnorm below; the shared decode's float64 matrix is
            # exact for code ids (all << 2^53)
            codes_all = dec(codes_col, nrows, width=m)[0].astype(
                np.int64
            )
            vnorm_all = rb.column(3).to_numpy(zero_copy_only=False)
            out_q, out_n, out_s = [], [], []
            order = np.argsort(cells_np, kind="stable")
            uniq, starts = np.unique(cells_np[order], return_index=True)
            bounds = np.r_[starts[1:], nrows]
            for u, s0, e0 in zip(uniq, starts, bounds):
                qidx = cell_qidx.get(
                    u if not hasattr(u, "item") else u.item()
                )
                if not qidx:
                    continue
                sel = order[s0:e0]
                qi = np.asarray(qidx, dtype=np.int64)
                codes = codes_all[sel]
                c_ids = ids_np[sel]
                vnorm = vnorm_all[sel]
                # NaN vnorm marks a NULL source vector (pq_encode): it
                # must never surface as an ADC candidate — the SQL twin
                # scores NULLs NULL (sorted last), so a 0.0 emission
                # would outrank genuine negative sims (r9 ADVICE).
                # Pre-r10 sidecars encoded NULLs as vnorm=0.0; those
                # keep the old zero-score behavior until re-augmented.
                live = ~np.isnan(vnorm)
                vn_safe = np.where(vnorm > 0, vnorm, 1.0)
                qn = q_norm[qi]
                qn_safe = np.where(qn > 0, qn, 1.0)
                # slice each LUT to this cell's probing queries BEFORE
                # the code gather: gathering first materializes a
                # (batch × |Q_total|) temporary per subspace — 8 GB at
                # the documented max_query_rows (r9 review finding)
                dots = luts[0][:, qi][codes[:, 0]]
                for s in range(1, m):
                    dots = dots + luts[s][:, qi][codes[:, s]]
                sims = dots / np.outer(vn_safe, qn_safe)
                # Spark-branch zero mask (r12): q_zero carries the
                # NULL-element query flag; NaN q-norms (NaN/±inf
                # elements) stay scored — NaN, ranked first below.
                # Corpus rows: NaN vnorm (pq_encode's undefined-norm
                # marker) is dropped by `live`; the mask catches
                # genuine zeros only.
                sims[vnorm == 0, :] = 0.0
                sims[:, q_zero[qi]] = 0.0
                sims = hup(sims, round_digits)
                for cj, j in enumerate(qi):
                    qid = q_ids[j]
                    keep = np.nonzero((c_ids != qid) & live)[0]
                    if not len(keep):
                        continue
                    # NaN ADC sims (inf-element query): rank first,
                    # Spark's NaN-largest DESC rule — the candidate
                    # cut then feeds the exact rerank the same rows
                    # the global rank would keep (r12)
                    vals = sims[keep, cj]
                    nan_v = np.isnan(vals)
                    top = keep[
                        np.lexsort(
                            (
                                c_ids[keep],
                                np.where(nan_v, 0.0, -vals),
                                ~nan_v,
                            )
                        )[:n_cand]
                    ]
                    out_q.extend([qid] * len(top))
                    out_n.extend(c_ids[top])
                    out_s.extend(sims[top, cj])
            if out_q:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(out_q, type=adc_pa_schema.field(0).type),
                        pa.array(
                            np.asarray(out_n, dtype=np.int64),
                            type=adc_pa_schema.field(1).type,
                        ),
                        pa.array(
                            np.asarray(out_s, dtype=np.float64),
                            type=adc_pa_schema.field(2).type,
                        ),
                    ],
                    schema=adc_pa_schema,
                )

    codes_df = (
        spark.read.parquet(os.path.join(root, "pq_codes"))
        .where(F.col("cell").isin(probe_cells))  # static partition prune
        .select("cell", "vec_id", "codes", "vnorm")
    )
    scored = codes_df.mapInArrow(_adc, adc_ddl)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_sim").desc(), F.col("neighbor_id").asc()
    )
    cand = (
        scored.withColumn("crank", F.row_number().over(w))
        .where(F.col("crank") <= n_cand)
        .select("query_id", "neighbor_id")
    )
    if _stop_after == "adc":
        return cand

    # -- exact re-rank: floats fetched for candidates only -------------
    # Candidate-ID pushdown (r10): joining the float cells against the
    # broadcast candidate frame still SCANS every probed cell's float
    # column — the r10 crossover measured the PQ serve reading ~2 GB of
    # floats to fetch 20 candidate rows, erasing the codes' entire byte
    # advantage (PQ cold 12.1 s vs float 11.3 s at full probe).  The
    # candidate set is bounded (|Q| × k·rerank_factor), so when small
    # enough for a literal In filter it is collected ONCE (also reused
    # as a literal frame for the pairing join — the ADC scan must not
    # execute twice) and pushed into the parquet scan, where row-group
    # vec_id stats prune the float read to the candidates' groups.
    # Above the cap (huge query batches) the join-only shape remains.
    # The pushdown costs one EXTRA bounded Spark job (the eager
    # candidate collect), so it only engages when the probed float
    # bytes are big enough to out-cost that job — a cheap local listing
    # decides; non-local filesystems (listing fails) default to
    # pushdown, the scale-safe direction.
    qframe = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
    )
    floats = (
        spark.read.parquet(os.path.join(root, "cells"))
        .where(F.col("cell").isin(probe_cells))
        .select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("cv"),
            F.col("cn"),
        )
    )
    probed_bytes = _probed_cell_bytes(root, probe_cells)
    if len(q_rows) * n_cand <= max_pushdown_candidates and (
        probed_bytes is None or probed_bytes >= min_pushdown_bytes
    ):
        pairs = cand.collect()  # bounded by the gate above
        if not pairs:
            return spark.createDataFrame(
                [],
                f"query_id {q_id_ddl}, neighbor_id long, cos_sim double, "
                "rank int",
            )
        cand = spark.createDataFrame(pairs, cand.schema)
        cand_ids = sorted({r["neighbor_id"] for r in pairs})
        floats = floats.where(F.col("neighbor_id").isin(cand_ids))
    exact = (
        floats.join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(qframe), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_with_norms("qv", "cv", F.col("qn"), F.col("cn")),
                round_digits,
            ).alias("cos_sim"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
    )


def ann_serving_policy(
    root: str,
    nprobe: int,
    bandwidth_mbps: float | None = None,
    pq_tie_seconds: float = 6.0,
) -> dict:
    """The measured float-vs-PQ crossover rule as an executable policy
    (SCALE.md "Cold-cache run of the rule", r10–r11): returns
    ``{"path": "float"|"pq", "probed_bytes_est": int|None,
    "tie_bytes": int, "reason": str}`` from index METADATA only (one
    pointer/meta read + one file-size listing, never data I/O) — the
    same should_rebuild-style wiring that turned the drift monitor's
    prose recipe into code.

    The measured facts this encodes:

    - the tie sits where cold float probe I/O costs ≈ PQ's serve
      constant: ~2.0 GB probed at ~344 MB/s ≈ 6 s (r10 measured tie;
      ``pq_tie_seconds``), so ``tie_bytes = bandwidth × 6 s``;
    - PQ WINS on SELECTIVE probes past the tie: 150 M × 64 d quarter
      probe = 5.6 GB probed → float 51.8 s (scattered pruned reads
      reach only ~1/3 of sequential bandwidth) vs PQ 14.0 s (r11
      measured, 3.7×);
    - FULL sweeps (``nprobe ≥ n_centroids``) stay float at local-disk
      bandwidth: one parallel sequential scan reaches ~490 MB/s while
      the ADC gather over every code row is itself O(corpus) compute
      (r11 measured: 45.6 s float vs 55.0 s PQ at 22.4 GB).

    Bandwidth resolution (r12, r11 VERDICT Missing #3): an explicit
    ``bandwidth_mbps`` argument wins; otherwise the ``bandwidth_mbps``
    stamp :func:`build_ann_index` measured into ``_ann_meta.json`` (a
    bounded cold-read probe of the index's own cells — the policy is
    portable by default); only then the 344 MB/s dev-box literal.
    ``bandwidth_source`` in the result names which applied.  Object
    stores are often 100–200 MB/s per node, moving the tie down to
    0.6–1.2 GB.  An unlistable root assumes large (``"pq"`` when the
    sidecar exists), the same fail direction as the rerank pushdown
    gate."""
    meta = {}
    try:
        with open(os.path.join(root, "_ann_meta.json")) as f:
            meta = json.load(f)
    except (OSError, ValueError):
        pass  # unlistable/remote root: meta is a local stat
    if bandwidth_mbps is not None:
        bw, bw_src = float(bandwidth_mbps), "argument"
    elif meta.get("bandwidth_mbps"):
        bw, bw_src = float(meta["bandwidth_mbps"]), "index_stamp"
    else:
        bw, bw_src = 344.0, "default"
    tie_bytes = int(bw * 1e6 * pq_tie_seconds)
    out = {
        "tie_bytes": tie_bytes,
        "probed_bytes_est": None,
        "bandwidth_mbps": bw,
        "bandwidth_source": bw_src,
    }
    if not os.path.isdir(root):
        # non-local root (object store): the sidecar check below is a
        # LOCAL stat, so falling through would misreport "no PQ
        # sidecar" — assume large instead (the documented fail
        # direction; note ann_search_pq still raises if the sidecar
        # genuinely does not exist at serve time)
        out.update(
            path="pq",
            reason="root not locally listable — assume probed bytes "
            "large (serve raises if the PQ sidecar is missing)",
        )
        return out
    if not os.path.exists(os.path.join(root, "_pq_meta.json")):
        out.update(
            path="float",
            reason="no PQ sidecar at this root (pq_augment_ann_index "
            "to enable the codes path)",
        )
        return out
    n_centroids = meta.get("n_centroids")
    if n_centroids is not None and int(nprobe) >= int(n_centroids):
        out.update(
            path="float",
            reason=f"full sweep (nprobe={nprobe} >= n_centroids="
            f"{n_centroids}): sequential float scan beats an O(corpus) "
            "ADC gather at local-disk bandwidth (r11 measured)",
        )
        return out
    try:
        cells_bytes = _tree_bytes(os.path.join(root, "cells"))
    except OSError:
        cells_bytes = None
    if cells_bytes is None or not n_centroids:
        out.update(
            path="pq",
            reason="cells not locally listable — assume probed bytes "
            "large (the pushdown gate's fail direction)",
        )
        return out
    probed = int(cells_bytes * min(int(nprobe), n_centroids) / n_centroids)
    out["probed_bytes_est"] = probed
    if probed >= tie_bytes:
        out.update(
            path="pq",
            reason=f"selective probe reads ~{probed >> 20} MiB of float "
            f"cells > tie {tie_bytes >> 20} MiB at {bw:.0f} MB/s",
        )
    else:
        out.update(
            path="float",
            reason=f"probed float bytes ~{probed >> 20} MiB under the "
            f"tie {tie_bytes >> 20} MiB — PQ's serve constant would "
            "dominate",
        )
    return out


def ann_search_auto(
    spark: SparkSession,
    root: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    bandwidth_mbps: float | None = None,
    **kwargs,
) -> DataFrame:
    """Serve top-k through whichever path :func:`ann_serving_policy`
    recommends for this index + probe width.  Same result contract as
    both underlying paths (with full-coverage dials they are EXACTLY
    equal and otherwise differ only in recall, fuzz- and test-pinned);
    ``kwargs`` pass through to the chosen serve."""
    policy = ann_serving_policy(root, nprobe, bandwidth_mbps)
    if policy["path"] == "pq":
        return ann_search_pq(
            spark, root, queries, k=k, nprobe=nprobe, **kwargs
        )
    kwargs.pop("rerank_factor", None)  # PQ-only dial
    return ann_search(spark, root, queries, k=k, nprobe=nprobe, **kwargs)
