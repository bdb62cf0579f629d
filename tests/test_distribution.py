"""Distribution primitives: bucketed exchange-free joins, salting, and
nested-array (answers) querying on the generated logs schema."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_w_inverted_index_spark.plans.distribution import (
    salted_count,
    salted_inner_join,
    write_bucketed,
)
from polars_w_inverted_index_spark.sources.generator import generate_logs


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path_factory):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_bucketed(li.select("l_orderkey", "l_quantity"),
                   "t_li_b", "l_orderkey", 8)
    write_bucketed(o.select("o_orderkey", "o_totalprice"),
                   "t_o_b", "o_orderkey", 8)
    # at test scale Spark would broadcast (cheaper than reading buckets);
    # disable it so the plan shows what bucketing buys at real scale,
    # where neither side is broadcastable
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table("t_li_b")
        b = spark.table("t_o_b").withColumnRenamed("o_orderkey", "l_orderkey")
        joined = a.join(b, "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: a shuffle-free sort-merge join over bucketed scans
        assert "Exchange hashpartitioning" not in plan
        assert "Bucketed: true" in plan
        want = (
            li.select("l_orderkey", "l_quantity")
            .join(
                o.select(
                    F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
                ),
                "l_orderkey",
            )
            .count()
        )
        assert joined.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS t_li_b")
        spark.sql("DROP TABLE IF EXISTS t_o_b")


def test_salted_join_matches_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    dim = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    got = salted_inner_join(li, dim, "l_orderkey", salt_factor=4)
    want = li.join(dim, "l_orderkey")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_salted_count_matches_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = {
        r["l_returnflag"]: r["count"]
        for r in salted_count(li, "l_returnflag", 4).collect()
    }
    want = {
        r["l_returnflag"]: r["count"]
        for r in li.groupBy("l_returnflag").count().collect()
    }
    assert got == want


def test_nested_answers_array_queries(spark):
    """The logs schema's List<Struct> column is queryable: explode +
    aggregate over answers (the reference stores but never queries it —
    SURVEY.md §1.3; we prove the Spark path works)."""
    logs = generate_logs(spark, 500)
    ans = logs.select(
        "doc_id", F.explode("answers").alias("a")
    ).select("doc_id", "a.nx_domain", "a.response_time_ms")
    stats = ans.agg(
        F.min("response_time_ms").alias("lo"),
        F.max("response_time_ms").alias("hi"),
        F.avg(F.col("nx_domain").cast("int")).alias("nx_rate"),
    ).first()
    assert 0 <= stats["lo"] <= stats["hi"]
    assert 0.0 <= stats["nx_rate"] <= 1.0
    # array predicates without explode: docs where ANY answer was nx
    any_nx = logs.where(
        F.exists("answers", lambda a: a["nx_domain"])
    ).count()
    via_explode = ans.where("nx_domain").select("doc_id").distinct().count()
    assert any_nx == via_explode
