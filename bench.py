"""Benchmark harness — one JSON line for the driver.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}``.

Comparable to BASELINE.md: the reference runs six queries over 10 M rows at
~1 s each (README.md:17-24).  Per-query time here is plan-build + execute +
collect, measured after a session warm-up job so JVM startup isn't billed to
the first query (the reference binary likewise excludes process startup from
per-query timings — query_stats.rs phase timers start inside each query fn).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from polars_w_inverted_index_spark import registry
    from polars_w_inverted_index_spark.session import get_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    spark = get_session("bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up JVM

    # Warm-up pass: parquet footer reads, codegen compilation, and OS page
    # cache are one-time costs a long-running engine amortizes; the measured
    # pass reports steady-state per-query latency (the reference's parquet
    # file is likewise page-cached when its queries run — it wrote the file
    # moments earlier in the same process, main.rs:712 vs 729).
    for fn in registry.QUERIES.values():
        fn(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name, fn in registry.QUERIES.items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        # collect(), not count(): matches the reference, whose every query
        # ends in .collect() (main.rs:321, 579) — full result production
        # plus executor→driver transfer is billed.
        rows = df.collect()
        timings[name] = round(time.perf_counter() - t0, 4)
        _ = len(rows)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
