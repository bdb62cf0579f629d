"""Find the ANN serve-cost fragmentation knee (r12).

Each streamed micro-batch leaves one small ``ingest_batch=<id>``
directory per touched cell; serving cost grows with FILE COUNT, not
data size, until ``ann_index_compact`` folds them.  The LSM postings
index got its autocompaction dial from a measured read-amplification
knee (r11, tools/lsm_read_amplification.py) — this run produces the
same evidence for the vector index.

Protocol (v2 — the first attempt timed serve points while the index
GREW under them, confounding data size with fragmentation): for each
checkpoint D in 4/8/16/32/64, ingest D fixed-size batches, time the
warm serve against D accumulated delta dirs per cell, then compact and
time the SAME-SIZE serve again — the ratio is the pure fragmentation
amplification at D.  The streaming ingest's
``DEFAULT_MAX_BATCH_DIRS_PER_CELL`` is pinned at the measured knee.

Usage:  python tools/ann_frag_knee.py [base_rows] [out_json]
        python tools/ann_frag_knee.py skew [out_json]

The ``skew`` mode is the r13 scenario (r12 VERDICT task 1's
done-criterion): real ingest is skewed — ONE hot cell crosses the
autocompaction dial while cold cells hold a delta dir or two.  At
each index size it loads one cell with hot delta batches (same vector,
fresh ids → same argmax cell) and times, at the SAME on-disk state,

- the selective fold (``ann_index_compact_cells`` on the hot cell +
  ``pq_reencode_stale_cells`` — what the dial actually triggers since
  r13), and
- the whole-index fold (``ann_index_compact`` + full
  ``pq_augment_ann_index`` — what the r12 dial triggered),

alongside the hot cell's bytes vs the whole index's bytes.  The claim
under test: the micro-batch stall is bounded by HOT-CELL bytes, not
index bytes — the selective column should stay flat as the index
grows while the whole-index column scales with it.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIMS = 32
BATCH = 25_000
CHECKPOINTS = [0, 4, 8, 16, 32, 64]


def _vectors(spark, n, offset=0):
    from pyspark.sql import functions as F

    return (
        spark.range(n)
        .select((F.col("id") + offset).alias("vec_id"))
        .select(
            "vec_id",
            F.expr(
                f"transform(sequence(1, {DIMS}), j -> "
                "cast(hash(vec_id, j) as double) / 2147483647.0)"
            ).alias("embedding"),
        )
    )


def _tree_mb(d: str) -> float:
    total = 0
    for dirpath, _dn, files in os.walk(d):
        for f in files:
            if not f.startswith((".", "_")):
                total += os.path.getsize(os.path.join(dirpath, f))
    return round(total / 1e6, 1)


def skew_main() -> None:
    from pyspark.sql import functions as F

    from polars_w_inverted_index_spark.operators.ann_index import (
        ann_index_compact,
        ann_index_compact_cells,
        build_ann_index,
        pq_augment_ann_index,
        pq_reencode_stale_cells,
    )
    from polars_w_inverted_index_spark.session import get_session
    from polars_w_inverted_index_spark.streaming.ann_ingest import (
        ann_ingest_batch,
    )

    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_session("ann_skew_fold")
    scratch = tempfile.mkdtemp(prefix="ann_skew_")
    hot_batch, n_hot = 25_000, 5
    points = []
    # 32 centroids: the hot cell's BASE is 1/32 of the corpus, so once
    # the fixed 5-batch hot load lands the hot cell is delta-dominated
    # and stays near-constant while the index quadruples — the shape a
    # skewed production stream shows (hot cell << index)
    for i, base_rows in enumerate([800_000, 1_600_000, 3_200_000]):
        root = os.path.join(scratch, f"idx{base_rows}")
        build_ann_index(_vectors(spark, base_rows), root,
                        n_centroids=32, n_iters=1)
        pq_augment_ann_index(spark, root, m_subspaces=4, n_codes=16,
                             n_iters=1)
        # one stored vector, replicated under fresh ids → every hot row
        # lands in ITS cell (assignment is a pure function of the vector)
        hot = spark.read.parquet(os.path.join(root, "cells")).select(
            "cell", "cv"
        ).first()
        hot_cell = hot["cell"]
        hot_vec = [float(x) for x in hot["cv"]]

        def hot_rows(n, offset):
            return spark.range(n).select(
                (F.col("id") + offset).alias("vec_id"),
                F.array(*[F.lit(v) for v in hot_vec]).alias("embedding"),
            )

        next_bid = 0

        def load_hot(next_id):
            nonlocal next_bid
            for _ in range(n_hot):
                ann_ingest_batch(
                    hot_rows(hot_batch, next_id), root,
                    batch_id=next_bid,
                    max_batch_dirs_per_cell=None,  # accumulate, no dial
                )
                next_id += hot_batch
                next_bid += 1
            return next_id

        if i == 0:  # session warm-up: burn JIT on a throwaway cycle
            nid = load_hot(base_rows + 10_000_000)
            ann_index_compact_cells(spark, root, [hot_cell])
            pq_reencode_stale_cells(spark, root)
        else:
            nid = base_rows + 10_000_000

        nid = load_hot(nid)
        hot_mb = _tree_mb(os.path.join(root, "cells", f"cell={hot_cell}"))
        index_mb = _tree_mb(os.path.join(root, "cells"))
        t = time.perf_counter()
        folded = ann_index_compact_cells(spark, root, [hot_cell])
        sel_fold_s = round(time.perf_counter() - t, 3)
        t = time.perf_counter()
        pq_reencode_stale_cells(spark, root)
        sel_pq_s = round(time.perf_counter() - t, 3)
        assert folded == n_hot, folded

        nid = load_hot(nid)  # same state again for the whole-index arm
        t = time.perf_counter()
        ann_index_compact(spark, root)
        full_fold_s = round(time.perf_counter() - t, 3)
        t = time.perf_counter()
        pq_augment_ann_index(spark, root, m_subspaces=4, n_codes=16,
                             n_iters=1)
        full_pq_s = round(time.perf_counter() - t, 3)
        points.append(
            {
                "index_rows": base_rows + 2 * n_hot * hot_batch,
                "index_mb": index_mb,
                "hot_cell_mb": hot_mb,
                "selective_fold_s": sel_fold_s,
                "selective_pq_refresh_s": sel_pq_s,
                "whole_index_fold_s": full_fold_s,
                "full_pq_augment_s": full_pq_s,
            }
        )
        shutil.rmtree(root, ignore_errors=True)

    result = {
        "metric": "ann_skew_fold",
        "dims": DIMS,
        "hot_batches": n_hot,
        "hot_batch_rows": hot_batch,
        "points": points,
    }
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    shutil.rmtree(scratch, ignore_errors=True)


def main() -> None:
    from polars_w_inverted_index_spark.operators.ann_index import (
        ann_index_add_batch,
        ann_index_compact,
        ann_search,
        build_ann_index,
    )
    from polars_w_inverted_index_spark.session import get_session

    base_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_session("ann_frag_knee")
    scratch = tempfile.mkdtemp(prefix="ann_knee_")
    root = os.path.join(scratch, "idx")

    # session warm-up on a throwaway index (JIT/codegen — the scaling
    # tool's first compact measured 3x slow without this)
    warm = os.path.join(scratch, "warm")
    build_ann_index(_vectors(spark, 20_000), warm, n_centroids=8, n_iters=1)
    ann_index_add_batch(
        spark, warm, _vectors(spark, 5_000, offset=20_000), batch_tag=0
    )
    ann_index_compact(spark, warm)
    ann_search(spark, warm, _vectors(spark, 5), k=5, nprobe=2).collect()
    shutil.rmtree(warm, ignore_errors=True)

    build_ann_index(_vectors(spark, base_rows), root, n_centroids=8,
                    n_iters=1)
    queries = _vectors(spark, 20)

    def timed_serve():
        best = float("inf")
        for _ in range(2):
            t = time.perf_counter()
            ann_search(spark, root, queries, k=5, nprobe=2).collect()
            best = min(best, time.perf_counter() - t)
        return round(best, 3)

    size = base_rows
    points = []
    for n_batches in CHECKPOINTS:
        if not n_batches:
            continue
        for _ in range(n_batches):  # compact reset the count to 0
            ann_index_add_batch(
                spark, root, _vectors(spark, BATCH, offset=size),
                batch_tag=size,
            )
            size += BATCH
        frag_s = timed_serve()
        t = time.perf_counter()
        ann_index_compact(spark, root)
        compact_s = round(time.perf_counter() - t, 3)
        base_s = timed_serve()  # SAME size, zero delta dirs
        points.append(
            {
                "batch_dirs": n_batches,
                "index_rows": size,
                "serve_fragmented_s": frag_s,
                "serve_compacted_s": base_s,
                "amplification": round(frag_s / base_s, 2),
                "compact_s": compact_s,
            }
        )

    result = {
        "metric": "ann_frag_knee",
        "dims": DIMS,
        "batch_rows": BATCH,
        "build_rows": base_rows,
        "final_rows": size,
        "points": points,
    }
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "skew":
        skew_main()
    else:
        main()
