"""Schema-explicit JSON ingest → flattened 16-column layout.

The reference *claims* JSON ingestion (README.md:9, `json` feature enabled
in Cargo.toml:8) but never calls a JSON reader — its data is generated
in-memory (main.rs:704-707).  SURVEY.md §2.1 directs us to build it anyway:
at 100 TB, newline-delimited JSON logs are the natural ingest source.

The nested source schema mirrors ``LogRecord`` (main.rs:46-58):
``source {ip, host, region}``, ``user {id, session_id, metrics {login_time_ms,
clicks, active}}``, ``answers: array<struct>``, and flattening follows the
``.``→``_`` mangling convention (main.rs:260-262).  Timestamps parse RFC3339;
unparseable → null, not error (main.rs:134-138).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ANSWER = T.StructType(
    [
        T.StructField("nx_domain", T.BooleanType()),
        T.StructField("response_time_ms", T.LongType()),
    ]
)

# Nested wire schema = LogRecord (main.rs:46-58)
LOG_JSON_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("timestamp", T.StringType()),  # RFC3339 string on wire
        T.StructField("level", T.StringType()),
        T.StructField("message", T.StringType()),
        T.StructField(
            "source",
            T.StructType(
                [
                    T.StructField("ip", T.StringType()),
                    T.StructField("host", T.StringType()),
                    T.StructField("region", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "user",
            T.StructType(
                [
                    T.StructField("id", T.StringType()),
                    T.StructField("session_id", T.StringType()),
                    T.StructField(
                        "metrics",
                        T.StructType(
                            [
                                T.StructField("login_time_ms", T.LongType()),
                                T.StructField("clicks", T.LongType()),
                                T.StructField("active", T.BooleanType()),
                            ]
                        ),
                    ),
                ]
            ),
        ),
        T.StructField("payload_size", T.LongType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("answers", T.ArrayType(ANSWER)),
        T.StructField("processed", T.BooleanType()),
    ]
)


def flatten_logs(nested: DataFrame) -> DataFrame:
    """Nested LogRecord frame → the flattened 16-column layout
    (main.rs:112-194; column order main.rs:176-193)."""
    return nested.select(
        F.col("doc_id"),
        # try-parse: unparseable → null (main.rs:134-138). to_timestamp
        # raises under ANSI; try_to_timestamp matches the ok().map semantics.
        F.try_to_timestamp(F.col("timestamp")).alias("timestamp"),
        F.col("level"),
        F.col("message"),
        F.col("source.ip").alias("source_ip"),
        F.col("source.host").alias("source_host"),
        F.col("source.region").alias("source_region"),
        F.col("user.id").alias("user_id"),
        F.col("user.session_id").alias("user_session_id"),
        F.col("user.metrics.login_time_ms").alias("user_metrics_login_time_ms"),
        F.col("user.metrics.clicks").alias("user_metrics_clicks"),
        F.col("user.metrics.active").alias("user_metrics_active"),
        F.col("payload_size"),
        F.col("tags"),
        F.col("answers"),
        F.col("processed"),
    )


def read_logs_json(
    spark: SparkSession, path: str, mode: str = "PERMISSIVE"
) -> DataFrame:
    """NDJSON → flattened logs table. Explicit schema: no inference pass
    (a schema-inference scan over 100 TB is a full extra read).

    ``mode``: PERMISSIVE (corrupt line → all-null row, default),
    DROPMALFORMED (skip corrupt lines), or FAILFAST.
    """
    return flatten_logs(
        spark.read.schema(LOG_JSON_SCHEMA).option("mode", mode).json(path)
    )
