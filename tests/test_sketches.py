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


# -- heavy hitters -----------------------------------------------------------

def test_heavy_hitters_exact(lineitem, spark):
    import duckdb

    got = [
        (r["value"], r["freq"])
        for r in __import__(
            "polars_w_inverted_index_spark.operators.sketches",
            fromlist=["heavy_hitters"],
        ).heavy_hitters(lineitem, "l_returnflag", k=3).collect()
    ]
    exp = duckdb.sql(
        "SELECT CAST(l_returnflag AS VARCHAR) v, count(*) c FROM "
        f"'/root/testdata/sf0.001/lineitem.parquet' WHERE l_returnflag IS "
        "NOT NULL GROUP BY 1 ORDER BY c DESC, v ASC LIMIT 3"
    ).fetchall()
    assert got == [(v, c) for v, c in exp]


def test_heavy_hitters_approx_guarantees(spark):
    from polars_w_inverted_index_spark.operators.sketches import (
        heavy_hitters,
        heavy_hitters_approx,
    )

    # skewed synthetic stream: value v appears ~N/v times (Zipf-ish),
    # spread over several partitions
    df = (
        spark.range(0, 20_000, 1, 8)
        .selectExpr("CAST(1 + CAST(id % 100 AS INT) AS STRING) AS value")
    )
    # support far above the distinct count → MG is exact
    exact = {
        r["value"]: r["freq"]
        for r in heavy_hitters(df, "value", k=100).collect()
    }
    approx = {
        r["value"]: r["freq_lower"]
        for r in heavy_hitters_approx(df, "value", k=100, support=500).collect()
    }
    assert approx == exact

    # tight support: every reported count is a lower bound, and the
    # true heavy hitters (freq > N/(support+1)) all survive
    tight = {
        r["value"]: r["freq_lower"]
        for r in heavy_hitters_approx(df, "value", k=100, support=10).collect()
    }
    n_total = df.count()
    for v, f in tight.items():
        assert f <= exact[v], (v, f, exact[v])
    must_survive = {v for v, f in exact.items() if f > n_total / 11}
    assert must_survive <= set(tight), must_survive - set(tight)


def test_frequent_ngrams_matches_dedup_df_semantics(spark, sf_dir):
    import os

    import duckdb
    from pyspark.sql import functions as F

    from polars_w_inverted_index_spark.operators.sketches import (
        frequent_ngrams,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    got = frequent_ngrams(docs, n=2, k=5).collect()
    # document frequency: repeated shingles inside one doc count once
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(sf_dir, 'documents.parquet')}'"
    )
    exp = con.execute(
        """
        WITH toks AS (
          SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)),
            '\\s+'), t -> t != '') AS ts FROM documents
        ), sh AS (
          SELECT DISTINCT doc_id,
            ts[i] || ' ' || ts[i+1] AS shingle
          FROM toks, UNNEST(range(1, len(ts))) AS u(i)
          WHERE len(ts) >= 2
        )
        SELECT shingle, count(*) AS df FROM sh GROUP BY 1
        ORDER BY df DESC, shingle ASC LIMIT 5
        """
    ).fetchall()
    assert [(r["shingle"], r["df"]) for r in got] == [tuple(r) for r in exp]
