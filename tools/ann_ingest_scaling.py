"""Measure the ANN index maintenance scaling claims (r12).

SCALE.md asserts three shapes for the materialized IVF index that were
prose until this run:

1. ``ann_index_add_batch`` is O(batch), INDEPENDENT of index size —
   the batch assigns against frozen broadcast centroids and appends its
   own ``ingest_batch=<id>`` partition files; the standing corpus is
   never read.  Measured: the same fixed-size batch timed at three
   index sizes spanning 16×.
2. ``ann_index_compact`` is O(index) — it reads the whole cell tree and
   rewrites it partitioned.  Measured at two index sizes.
3. Serving cost tracks FILE COUNT between compactions (each ingest
   leaves one small directory per touched cell) — measured as the same
   warm serve before/after the final compaction.

Corpus: hash-derived incompressible vectors (the pq_crossover_io
lesson — replicated rows dictionary-encode to nothing and fake the I/O
regime).  Output: one JSON line.

Usage:  python tools/ann_ingest_scaling.py [base_rows] [out_json]
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
    from pyspark.sql import functions as F

    from polars_w_inverted_index_spark.operators.ann_index import (
        ann_index_add_batch,
        ann_index_compact,
        ann_search,
        build_ann_index,
    )
    from polars_w_inverted_index_spark.session import get_session

    base_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_session("ann_ingest_scaling")
    scratch = tempfile.mkdtemp(prefix="ann_scaling_")
    root = os.path.join(scratch, "idx")

    # Warm-up on a THROWAWAY index: the first Spark jobs of a session
    # pay JIT/codegen/shuffle-service costs that polluted the first
    # measured compact by ~3x on the initial run of this tool — every
    # op class below (build/ingest/compact/serve) runs once before
    # anything is timed.
    warm = os.path.join(scratch, "warm")
    build_ann_index(_vectors(spark, 20_000), warm, n_centroids=8, n_iters=1)
    ann_index_add_batch(
        spark, warm, _vectors(spark, 5_000, offset=20_000), batch_tag=0
    )
    ann_index_compact(spark, warm)
    ann_search(spark, warm, _vectors(spark, 5), k=5, nprobe=2).collect()
    shutil.rmtree(warm, ignore_errors=True)

    t0 = time.perf_counter()
    build_ann_index(
        _vectors(spark, base_rows), root, n_centroids=8, n_iters=1
    )
    build_s = round(time.perf_counter() - t0, 3)

    size = base_rows
    ingest_points = []  # (index_rows_before, best-of-2 batch seconds)
    compact_points = []  # (index_rows, seconds, deltas_folded)

    def timed_ingests():
        nonlocal size
        best = float("inf")
        for _ in range(2):  # best-of-2: consecutive same-size batches
            batch = _vectors(spark, BATCH, offset=size)
            t = time.perf_counter()
            ann_index_add_batch(spark, root, batch, batch_tag=size)
            best = min(best, time.perf_counter() - t)
            size += BATCH
        ingest_points.append((size - 2 * BATCH, round(best, 3)))

    def grow(to_rows):
        nonlocal size
        while size < to_rows:
            step = min(200_000, to_rows - size)
            ann_index_add_batch(
                spark, root, _vectors(spark, step, offset=size),
                batch_tag=size,
            )
            size += step

    timed_ingests()                     # @ base (100k)
    grow(4 * base_rows)
    timed_ingests()                     # @ 4x
    t = time.perf_counter()
    folded = ann_index_compact(spark, root)
    compact_points.append((size, round(time.perf_counter() - t, 3), folded))
    grow(16 * base_rows)
    timed_ingests()                     # @ 16x

    # serve cost vs fragmentation: same warm serve before/after the
    # final fold (ingest left one small dir per cell per batch)
    queries = _vectors(spark, 20)
    def timed_serve():
        best = float("inf")
        for _ in range(2):
            t = time.perf_counter()
            ann_search(spark, root, queries, k=5, nprobe=2).collect()
            best = min(best, time.perf_counter() - t)
        return round(best, 3)

    serve_fragmented_s = timed_serve()
    n_batch_dirs = sum(
        1
        for cell in os.listdir(os.path.join(root, "cells"))
        if cell.startswith("cell=")
        for d in os.listdir(os.path.join(root, "cells", cell))
        if d.startswith("ingest_batch=") and not d.endswith("=-1")
    )
    t = time.perf_counter()
    folded = ann_index_compact(spark, root)
    compact_points.append((size, round(time.perf_counter() - t, 3), folded))
    serve_compacted_s = timed_serve()

    result = {
        "metric": "ann_ingest_scaling",
        "dims": DIMS,
        "batch_rows": BATCH,
        "build_rows": base_rows,
        "build_s": build_s,
        "ingest_points": [
            {"index_rows": r, "batch_s": s} for r, s in ingest_points
        ],
        "compact_points": [
            {"index_rows": r, "compact_s": s, "deltas_folded": f}
            for r, s, f in compact_points
        ],
        "serve_fragmented_s": serve_fragmented_s,
        "serve_fragmented_batch_dirs": n_batch_dirs,
        "serve_compacted_s": serve_compacted_s,
        "final_rows": size,
    }
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    shutil.rmtree(os.path.dirname(root), ignore_errors=True)


if __name__ == "__main__":
    main()
