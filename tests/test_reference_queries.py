"""Unit tests for the four reference queries + §1.4 fine-print semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from polars_w_inverted_index_spark import Engine
from polars_w_inverted_index_spark.operators.inverted_index import (
    postings,
    postings_chunked,
)
from polars_w_inverted_index_spark.plans.rewrite import filter_by_doc_ids


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        Row(doc_id=1, level="info", clicks=10, active=True),
        Row(doc_id=2, level="warn", clicks=20, active=False),
        Row(doc_id=3, level="info", clicks=None, active=True),
        Row(doc_id=4, level=None, clicks=40, active=None),
        Row(doc_id=None, level="info", clicks=50, active=True),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, level string, clicks long, active boolean"
    )


def test_postings_basic(spark, tiny):
    eng = Engine(spark, df=tiny)
    vm = eng.to_value_map("level")
    # null level (doc 4) and null doc_id rows skipped (main.rs:338-342)
    assert vm == {"info": [1, 3], "warn": [2]}


def test_postings_boolean_stringification(spark, tiny):
    eng = Engine(spark, df=tiny)
    vm = eng.to_value_map("active")
    # booleans stringify to "true"/"false" (main.rs:361-363)
    assert vm == {"true": [1, 3], "false": [2]}


def test_by_doc_ids_missing_dropped(spark, tiny):
    eng = Engine(spark, df=tiny)
    result, st = eng.get_field_values_collected("level", [1, 99])
    assert {k: list(v) for k, v in result.value_map.items()} == {"info": [1]}
    assert st.total_time > 0


def test_by_doc_ids_duplicate_multiplicity(spark, tiny):
    # duplicated requested id duplicates rows (inner-join semantics,
    # SURVEY.md §1.4.1)
    out = filter_by_doc_ids(tiny, [1, 1, 2], "doc_id")
    assert out.count() == 3
    vm = Engine(spark, df=out).to_value_map("level")
    assert vm == {"info": [1, 1], "warn": [2]}


def test_numeric_stats(spark, tiny):
    eng = Engine(spark, df=tiny)
    result, _ = eng.get_numeric_stats_collected("clicks")
    # whole-table stats do NOT filter null doc_id rows (main.rs:611-689 has
    # no id filter); nulls in the value column are skipped by min/max/avg.
    assert (result.min, result.max) == (10.0, 50.0)
    assert result.avg == pytest.approx((10 + 20 + 40 + 50) / 4)


def test_numeric_stats_empty_is_null(spark, tiny):
    # empty id-set → NumericStats all-null (main.rs:582-587)
    eng = Engine(spark, df=tiny)
    result, _ = eng.get_numeric_stats_collected("clicks", [999])
    assert (result.min, result.max, result.avg) == (None, None, None)


def test_dotted_path_resolution(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, user_metrics_clicks=5)],
        "doc_id long, user_metrics_clicks long",
    )
    eng = Engine(spark, df=df)
    result, _ = eng.get_numeric_stats_collected("user.metrics.clicks")
    assert result.min == 5.0


def test_postings_chunked_bounded_rows(spark):
    rows = [Row(doc_id=i, v="hot" if i < 90 else "cold") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, v string")
    out = postings_chunked(df, "v", max_postings_per_row=25).collect()
    by_val: dict[str, list[int]] = {}
    for r in out:
        assert len(r["doc_ids"]) <= 90  # bounded-ish; hash split is approximate
        by_val.setdefault(r["value"], []).extend(r["doc_ids"])
    assert sorted(by_val["hot"]) == list(range(90))
    assert sorted(by_val["cold"]) == list(range(90, 100))
    # hot value was split into multiple chunk rows
    assert sum(1 for r in out if r["value"] == "hot") >= 2


def test_where_composes_with_queries(spark, tiny):
    eng = Engine(spark, df=tiny).where("level = 'info'")
    assert eng.to_value_map("active") == {"true": [1, 3]}
    result, _ = eng.get_numeric_stats_collected("clicks")
    assert (result.min, result.max) == (10.0, 50.0)  # docs 1,3(null),null-id
    # filtered view never answers from a stale index
    assert eng.catalog is None


def test_isin_and_join_paths_agree(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ids = list(range(0, 300, 3))
    a = postings(
        filter_by_doc_ids(li, ids, "l_orderkey"), "l_returnflag", "l_orderkey"
    )
    big = ids * 1  # same list via join path: force join by exceeding nothing
    from polars_w_inverted_index_spark.plans import rewrite

    old = rewrite.ISIN_THRESHOLD
    rewrite.ISIN_THRESHOLD = 0  # force join path
    try:
        b = postings(
            filter_by_doc_ids(li, big, "l_orderkey"),
            "l_returnflag",
            "l_orderkey",
        )
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    finally:
        rewrite.ISIN_THRESHOLD = old
