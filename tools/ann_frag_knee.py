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
    main()
