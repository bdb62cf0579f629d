"""Sketch profiling: error bounds vs exact answers on real tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_w_inverted_index_spark.operators.sketches import corpus_profile


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


@pytest.fixture(scope="module")
def profile(lineitem):
    return {
        r["column"]: r
        for r in corpus_profile(
            lineitem,
            ["l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"],
        ).collect()
    }


def test_counts_and_nulls_exact(lineitem, profile):
    n = lineitem.count()
    for col, r in profile.items():
        assert r["n_rows"] == n
        exact_nulls = lineitem.where(F.col(col).isNull()).count()
        assert r["n_nulls"] == exact_nulls


def test_distinct_within_rsd(lineitem, profile):
    for col in ("l_orderkey", "l_returnflag", "l_shipdate"):
        exact = lineitem.select(col).distinct().count()
        got = profile[col]["approx_distinct"]
        # 5% rsd → 4 sigma tolerance (plus slack for tiny cardinalities)
        assert abs(got - exact) <= max(0.2 * exact, 2), (col, got, exact)


def test_quantiles_within_rank_tolerance(lineitem, profile):
    vals = sorted(
        r["l_quantity"] for r in lineitem.select("l_quantity").collect()
    )
    n = len(vals)
    for name, p in (("q50", 0.5), ("q95", 0.95), ("q99", 0.99)):
        got = profile["l_quantity"][name]
        # accuracy=10000 → rank error ≤ n/10000; allow 1% slack
        lo = vals[max(0, int((p - 0.01) * n) - 1)]
        hi = vals[min(n - 1, int((p + 0.01) * n))]
        assert lo <= got <= hi, (name, got, lo, hi)


def test_non_numeric_quantiles_null(profile):
    assert profile["l_returnflag"]["q50"] is None
    assert profile["l_shipdate"]["q99"] is None


def test_profile_is_one_pass(lineitem):
    # single aggregation: the physical plan reads the table once per
    # profiled-column union leg at most — no join, no global sort
    plan = (
        corpus_profile(lineitem, ["l_orderkey", "l_quantity"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
