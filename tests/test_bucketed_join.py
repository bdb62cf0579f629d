"""Bucketed-table layout: co-located joins run shuffle-free."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_w_inverted_index_spark.sources.parquet import (
    write_bucketed_table,
)

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_bucketed_table(
        li, "bt_lineitem", "l_orderkey", N_BUCKETS,
        path=str(base / "lineitem"),
    )
    write_bucketed_table(
        od, "bt_orders", "o_orderkey", N_BUCKETS,
        path=str(base / "orders"),
    )
    yield spark.table("bt_lineitem"), spark.table("bt_orders")
    spark.sql("DROP TABLE IF EXISTS bt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bt_orders")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    li, od = bucketed
    # broadcast would bypass bucketing on small test data — disable to
    # observe the layout the plan would use at scale
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = li.join(od, li.l_orderkey == od.o_orderkey).select(
            "l_orderkey", "o_orderdate", "l_quantity"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_results_match_plain_join(spark, sf_dir, bucketed):
    li, od = bucketed
    plain = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{sf_dir}/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert li.join(od, li.l_orderkey == od.o_orderkey).count() == plain


def test_bucketed_agg_skips_shuffle(spark, bucketed):
    li, _ = bucketed
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
