"""Per-row PLAN-CONSTRUCTION cost profile (r15, guide §4: the Python↔JVM
boundary).  Times ``fn(spark, sf_dir)`` — building the DataFrame, zero
actions — for every registry row, twice (the second rep excludes
first-touch import/footers costs).  Rows whose *construction* runs jobs
(lifecycle rows: ann_auto, composite lookup, streaming twins) report the
build-including-actions number; read those rows' numbers as
"whole row", not "plan build".

r14 VERDICT item 5 context: every Column operator is one py4j round
trip (~1 ms); a 60-expression aggregate therefore costs ~hundreds of ms
*before any job runs*.  This tool names the rows where that tax is the
floor.

Usage: python tools/plan_build_profile.py [sf_dir] [name_substr ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = sys.argv[2:]
    from polars_w_inverted_index_spark import registry
    from polars_w_inverted_index_spark.session import get_session

    spark = get_session("plan_build_profile")
    spark.range(1).collect()
    rows = {}
    for name, fn in registry.QUERIES.items():
        if only and not any(s in name for s in only):
            continue
        try:
            t0 = time.perf_counter()
            fn(spark, sf_dir)
            t1 = time.perf_counter()
            fn(spark, sf_dir)
            t2 = time.perf_counter()
            rows[name] = round(t2 - t1, 3)  # steady-state build
            del t0
        except Exception as e:  # noqa: BLE001
            rows[name] = f"{type(e).__name__}: {e}"[:80]
    for name, s in sorted(
        rows.items(), key=lambda kv: -(kv[1] if isinstance(kv[1], float) else 0)
    ):
        print(f"{s if isinstance(s, float) else s:>8}  {name}")
    print(json.dumps({"sf_dir": sf_dir, "plan_build_s": rows}))


if __name__ == "__main__":
    main()
