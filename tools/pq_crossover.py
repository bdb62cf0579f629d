"""One-off measurement: where does IVF-PQ overtake float IVF?

r8 VERDICT task 6 (second half): the IVF-PQ composition's value claim —
the 64x byte shrink of the scanned codes wins once the probed cells'
float I/O dominates — was argued, not measured.  This script builds the
same IVF index over the sf embeddings at 1x and ~10x scale (10x via id
re-keying: identical vectors, distinct ids — serve-time COST depends on
row count and width, not values), augments the PQ sidecar, and times
the two serve paths at matched dials (best-of-3, materialized via
count).  Results land in SCALE.md's "Product quantization" section.

Usage:  python tools/pq_crossover.py [sf_dir] [scale_factor]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _best_of(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> None:
    from pyspark.sql import functions as F

    from polars_w_inverted_index_spark.operators.ann_index import (
        ann_search,
        ann_search_pq,
        build_ann_index,
        pq_augment_ann_index,
    )
    from polars_w_inverted_index_spark.session import get_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_session("pq_crossover")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n1 = emb.count()
    out = {"sf_dir": sf_dir, "n_base": n1, "mult": mult}

    for scale, corpus in (
        (1, emb),
        (
            mult,
            emb.crossJoin(
                spark.range(mult).select(F.col("id").alias("_rep"))
            ).select(
                (F.col("vec_id") * mult + F.col("_rep")).alias("vec_id"),
                "embedding",
            ),
        ),
    ):
        root = tempfile.mkdtemp(prefix=f"pq_xover_{scale}x_")
        try:
            build_ann_index(
                corpus, root, n_centroids=32, n_iters=1,
                id_col="vec_id", vec_col="embedding",
            )
            pq_augment_ann_index(spark, root, m_subspaces=8, n_codes=16)
            q = emb.where(F.col("vec_id") % 50 == 0).select(
                (F.col("vec_id") * mult).alias("vec_id"), "embedding"
            ) if scale > 1 else emb.where(F.col("vec_id") % 50 == 0)
            nq = q.count()
            for nprobe in (4, 8):
                out[f"{scale}x_float_nprobe{nprobe}"] = _best_of(
                    lambda: ann_search(
                        spark, root, q, k=5, nprobe=nprobe
                    ).count()
                )
                out[f"{scale}x_pq_nprobe{nprobe}"] = _best_of(
                    lambda: ann_search_pq(
                        spark, root, q, k=5, nprobe=nprobe, rerank_factor=4
                    ).count()
                )
            out[f"{scale}x_rows"] = corpus.count()
            out[f"{scale}x_queries"] = nq
        finally:
            shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
