"""I/O-bound crossover datapoint: IVF-PQ vs float IVF with a COLD page
cache (r9 VERDICT task 5).

SCALE.md's deployment rule (float wins while probed bytes are page-hot;
PQ wins once probed bytes exceed ~1 GB per 200 MB/s of scan bandwidth)
was derived from measured on-disk bytes (267 B/row float vs 33 B/row
codes) but never RUN in an I/O-bound regime — local[32] with a warm
page cache is compute-bound, where float BLAS beats ADC gathers.

This script manufactures the I/O-bound regime on the local box instead
of arguing it:

- an INCOMPRESSIBLE hash-derived corpus of `target_rows` (default
  10 M) 64-dim vectors — ~5 GB of float cells vs ~0.2 GB of codes on
  disk (replicated real vectors dictionary-encode to nothing);
- ONE query (serve compute scales with |Q| x probed rows; I/O scales
  with probed bytes only — a single query at full probe makes the float
  path read ~5 GB to do 10 M x 64 MACs, i.e. disk-dominated);
- the page cache over the index tree is dropped with
  ``posix_fadvise(POSIX_FADV_DONTNEED)`` before EVERY timed run
  (single-shot per eviction, best-of-reps across evictions — best-of
  within one cache state would measure the rewarmed cache);
- effective cold-scan bandwidth is measured by timing a raw sequential
  read of the float cell files after an eviction, so the observed
  crossover can be compared against the rule's prediction at THIS
  box's bandwidth, not the 200 MB/s reference point.

Usage: python tools/pq_crossover_io.py [target_rows]
Writes one JSON line; results land in SCALE.md's crossover table.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _evict(root: str) -> int:
    """Drop every file under root from the page cache; returns bytes
    evicted.  fsync first — freshly written pages are dirty and
    DONTNEED only drops clean ones."""
    total = 0
    for dirpath, _, files in os.walk(root):
        for name in files:
            p = os.path.join(dirpath, name)
            try:
                fd = os.open(p, os.O_RDONLY)
            except OSError:
                continue
            try:
                os.fsync(fd)
                os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
                total += os.path.getsize(p)
            finally:
                os.close(fd)
    return total


def _raw_read_bw(root: str) -> tuple[float, int]:
    """(MB/s, bytes) for a cold sequential read of every file under
    root — the box's effective cold-scan bandwidth."""
    _evict(root)
    n = 0
    t0 = time.perf_counter()
    for dirpath, _, files in os.walk(root):
        for name in files:
            with open(os.path.join(dirpath, name), "rb") as f:
                while True:
                    b = f.read(1 << 22)
                    if not b:
                        break
                    n += len(b)
    dt = time.perf_counter() - t0
    return round(n / dt / 1e6, 1), n


def _cold_best(fn, root: str, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        _evict(root)
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    from pyspark.sql import functions as F

    from polars_w_inverted_index_spark.operators.ann_index import (
        ann_search,
        ann_search_pq,
        build_ann_index,
        pq_augment_ann_index,
    )
    from polars_w_inverted_index_spark.session import get_session

    target = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_session("pq_crossover_io")
    # INCOMPRESSIBLE synthetic vectors: replicating the sf embeddings
    # (the first attempt) let parquet's dictionary/RLE encoding shrink
    # "10 M rows" of duplicates to 12 MB on disk — no I/O regime at
    # all.  Hash-derived components have no cross-row structure, so
    # on-disk bytes ≈ raw (8 B per component), the deployment shape.
    dims = 64
    corpus = spark.range(target).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dims)),
            lambda d: (
                F.pmod(F.xxhash64(F.col("id") * dims + d), F.lit(100_000))
                / 50_000.0
                - 1.0
            ),
        ).alias("embedding"),
    )
    out = {"n_rows": target, "dims": dims}

    root = tempfile.mkdtemp(prefix="pq_xover_io_")
    try:
        # n_iters=0 (seed centroids): serve COST depends on bytes/rows
        # scanned, not centroid quality — skip the training passes
        build_ann_index(
            corpus, root, n_centroids=32, n_iters=0,
            id_col="vec_id", vec_col="embedding",
        )
        pq_augment_ann_index(spark, root, m_subspaces=8, n_codes=16)
        cells, codes = os.path.join(root, "cells"), os.path.join(
            root, "pq_codes"
        )
        out["float_mb"] = round(_evict(cells) / 1e6, 1)
        out["codes_mb"] = round(_evict(codes) / 1e6, 1)
        out["cold_bw_mbps"], _ = _raw_read_bw(cells)

        q = corpus.where(F.col("vec_id") == 0)
        assert q.count() == 1
        for nprobe in (8, 32):  # quarter probe / full probe
            out[f"float_cold_np{nprobe}"] = _cold_best(
                lambda: ann_search(
                    spark, root, q, k=5, nprobe=nprobe
                ).count(),
                cells,
            )
            out[f"pq_cold_np{nprobe}"] = _cold_best(
                lambda: ann_search_pq(
                    spark, root, q, k=5, nprobe=nprobe, rerank_factor=4
                ).count(),
                root,  # evict codes AND float cells (rerank reads some)
            )
        # warm comparison at the same dials, for the same-run contrast
        for nprobe in (8, 32):
            for _ in range(2):  # warm the cache
                ann_search(spark, root, q, k=5, nprobe=nprobe).count()
                ann_search_pq(
                    spark, root, q, k=5, nprobe=nprobe, rerank_factor=4
                ).count()
            t0 = time.perf_counter()
            ann_search(spark, root, q, k=5, nprobe=nprobe).count()
            out[f"float_warm_np{nprobe}"] = round(
                time.perf_counter() - t0, 3
            )
            t0 = time.perf_counter()
            ann_search_pq(
                spark, root, q, k=5, nprobe=nprobe, rerank_factor=4
            ).count()
            out[f"pq_warm_np{nprobe}"] = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
