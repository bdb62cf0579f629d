"""Best-of-N noop-sink timings for named registry rows (guide §1.4).

Usage: python tools/time_rows.py [--reps N] [--sf DIR] name1 name2 ...
Each row is warmed once, then timed ``reps`` times; prints one JSON line
{"name": best_seconds, ...}.  The noop sink computes every column of
every row and discards it — same discipline as bench.py's toArrow
materialization minus the driver copy, so numbers here are comparable
run-to-run, not to BENCH_DETAIL entries.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    sf_dir = "/root/testdata/sf0.1"
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1]); i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    from polars_w_inverted_index_spark.registry import QUERIES
    from polars_w_inverted_index_spark.session import get_session

    spark = get_session("time_rows")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up
    import gc

    out = {}
    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"warm:{name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for r in range(reps):
            gc.collect()
            try:
                spark._jvm.System.gc()
            except Exception:
                pass
            spark.sparkContext.setJobDescription(f"time:{name}:{r}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
