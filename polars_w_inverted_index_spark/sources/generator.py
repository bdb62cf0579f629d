"""Spark-native synthetic log-record generator.

Reproduces the reference's data generator (main.rs:61-109: value domains;
main.rs:704-707: 10 M records via rayon) as pure column expressions over
``spark.range(n)`` — no driver-side loop, no Python rows, so generation is
distributed and scales to any n.  Determinism: every random column derives
from ``xxhash64(doc_id, salt)``, so the same (n, seed) produces the same
table on any cluster layout — rayon's per-thread RNG in the reference is
NOT reproducible; ours is.

Value domains (main.rs cites):
- level: 5 values (main.rs:63)            - source_region: 5 (main.rs:64-70)
- source_host: 20 hosts (main.rs:71-73)   - source_ip: 10.0.{1-254}.{1-254}
- user_id: user_{1000..49999}             - login_time_ms: 10..1499
- clicks: 0..99                           - active: p=0.75
- payload_size: 50..20479                 - tags: 1-7 of tag_{1..49}
- answers: 0-3 structs {nx_domain p=0.3, response_time_ms 5..149}
- processed: p=0.9                        - timestamp: base ± 30 s
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LEVELS = ["info", "warn", "error", "debug", "trace"]
REGIONS = ["us-east-1", "eu-west-1", "eu-west-2", "ap-south-1", "us-west-2"]
BASE_TIME = "2024-01-01 00:00:00"


def _h(salt: int):
    """Deterministic per-row uniform long in [0, 2^63): hash(doc_id, salt)."""
    return F.abs(F.xxhash64(F.col("doc_id"), F.lit(salt)))


def _uniform(salt: int, lo: int, hi: int):
    """Uniform integer in [lo, hi] (inclusive), deterministic per row."""
    return (_h(salt) % F.lit(hi - lo + 1) + F.lit(lo)).cast("long")


def _pick(salt: int, values: list[str]):
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (_h(salt) % F.lit(len(values)) + 1).cast("int"))


def generate_logs(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """n-row logs table in the reference's flattened 16-column layout
    (column order main.rs:176-193; FIXTURES.md §A)."""
    s = seed * 1000  # namespace the per-column salts by seed

    df = spark.range(n).withColumnRenamed("id", "doc_id")
    host_num = (_h(s + 3) % 20 + 1).cast("int")

    tags = F.transform(
        F.sequence(F.lit(1), (_h(s + 10) % 7 + 1).cast("int")),
        lambda i: F.concat(
            F.lit("tag_"),
            (F.abs(F.xxhash64(F.col("doc_id"), F.lit(s + 11), i)) % 49 + 1),
        ),
    )
    answers = F.transform(
        F.sequence(F.lit(1), (_h(s + 12) % 4).cast("int")),
        lambda i: F.struct(
            (F.abs(F.xxhash64(F.col("doc_id"), F.lit(s + 13), i)) % 100 < 30)
            .alias("nx_domain"),
            (F.abs(F.xxhash64(F.col("doc_id"), F.lit(s + 14), i)) % 145 + 5)
            .cast("long")
            .alias("response_time_ms"),
        ),
    )
    # empty sequence(1, 0) yields [] — matches 0-answer records

    return df.select(
        F.col("doc_id"),
        (
            F.to_timestamp(F.lit(BASE_TIME))
            + F.make_dt_interval(
                F.lit(0), F.lit(0), F.lit(0),
                (_uniform(s + 1, -30000, 30000) / 1000.0),
            )
        ).alias("timestamp"),
        _pick(s + 2, LEVELS).alias("level"),
        F.concat(
            F.lit("Log message "),
            F.md5(F.concat(F.lit("msg"), F.col("doc_id").cast("string"))),
            F.lit(" for record "),
            F.col("doc_id").cast("string"),
        ).alias("message"),
        F.concat(
            F.lit("10.0."),
            (_h(s + 4) % 254 + 1).cast("string"),
            F.lit("."),
            (_h(s + 5) % 254 + 1).cast("string"),
        ).alias("source_ip"),
        F.concat(F.lit("server-"), host_num.cast("string"), F.lit(".region.local"))
        .alias("source_host"),
        _pick(s + 6, REGIONS).alias("source_region"),
        F.concat(F.lit("user_"), (_h(s + 7) % 49000 + 1000).cast("string"))
        .alias("user_id"),
        F.md5(F.concat(F.lit("sess"), F.col("doc_id").cast("string")))
        .alias("user_session_id"),
        _uniform(s + 8, 10, 1499).alias("user_metrics_login_time_ms"),
        _uniform(s + 9, 0, 99).alias("user_metrics_clicks"),
        (_h(s + 15) % 100 < 75).alias("user_metrics_active"),
        _uniform(s + 16, 50, 20479).alias("payload_size"),
        tags.alias("tags"),
        answers.alias("answers"),
        (_h(s + 17) % 100 < 90).alias("processed"),
    )
