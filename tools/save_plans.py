"""Capture `.explain("formatted")` for registry queries into plans/r<N>/.

Usage:
    python tools/save_plans.py before name1 name2 ...   # suffix + names
    python tools/save_plans.py after  all               # every registry row

Writes plans/<SPARK_GRAFT_PLANS_DIR:-r14>/<name>_<suffix>.txt
(planning only — no execution).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    from polars_w_inverted_index_spark.registry import QUERIES
    from polars_w_inverted_index_spark.session import get_session

    spark = get_session("save_plans")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if names == ["all"]:
        names = sorted(QUERIES)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_DIR", "r14"),
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print("wrote", path)


if __name__ == "__main__":
    main()
