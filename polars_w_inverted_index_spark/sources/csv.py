"""Schema-explicit CSV ingest for the flat log layout.

Source-format breadth beyond the reference (its only on-disk format is
parquet, main.rs:210-257; SURVEY.md §2.1 directs building the natural
ingest formats anyway).  CSV cannot carry nested structs or arrays, so
the wire shape is the FLAT 14-scalar-column projection of the log
layout — ``tags``/``answers`` ride as JSON-encoded strings and are
revived with ``from_json`` on read, the standard CSV escape hatch for
nested data.

Same disciplines as the JSON reader: explicit schema (a schema-inference
pass over 100 TB is a full extra read), ``try_to_timestamp`` RFC3339
parsing (unparseable → null, main.rs:134-138 semantics), selectable
corrupt-line mode.  Round-trip fidelity is pinned by tests against the
seeded generator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .json import ANSWER

# Flat wire schema: scalars verbatim, nested columns JSON-encoded.
LOG_CSV_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("timestamp", T.StringType()),  # RFC3339 on wire
        T.StructField("level", T.StringType()),
        T.StructField("message", T.StringType()),
        T.StructField("source_ip", T.StringType()),
        T.StructField("source_host", T.StringType()),
        T.StructField("source_region", T.StringType()),
        T.StructField("user_id", T.StringType()),
        T.StructField("user_session_id", T.StringType()),
        T.StructField("user_metrics_login_time_ms", T.LongType()),
        T.StructField("user_metrics_clicks", T.LongType()),
        T.StructField("user_metrics_active", T.BooleanType()),
        T.StructField("payload_size", T.LongType()),
        T.StructField("tags", T.StringType()),  # JSON-encoded array
        T.StructField("answers", T.StringType()),  # JSON-encoded array
        T.StructField("processed", T.BooleanType()),
    ]
)

_CSV_OPTS = {
    "header": "true",
    "escape": '"',  # RFC 4180 doubled-quote escaping
    "nullValue": "",
}


def write_logs_csv(flat: DataFrame, path: str) -> None:
    """Flat logs table → headered CSV, nested columns JSON-encoded,
    timestamps RFC3339 (microsecond precision, UTC)."""
    out = flat.select(
        "doc_id",
        F.date_format(
            "timestamp", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
        ).alias("timestamp"),
        "level",
        "message",
        "source_ip",
        "source_host",
        "source_region",
        "user_id",
        "user_session_id",
        "user_metrics_login_time_ms",
        "user_metrics_clicks",
        "user_metrics_active",
        "payload_size",
        F.to_json("tags").alias("tags"),
        F.to_json("answers").alias("answers"),
        "processed",
    )
    w = out.write.mode("overwrite")
    for k, v in _CSV_OPTS.items():
        w = w.option(k, v)
    w.csv(path)


def read_logs_csv(
    spark: SparkSession, path: str, mode: str = "PERMISSIVE"
) -> DataFrame:
    """Headered CSV → the flattened 16-column logs table (nested
    ``tags``/``answers`` revived from their JSON encoding).

    ``mode``: PERMISSIVE (corrupt line → all-null row, default),
    DROPMALFORMED, or FAILFAST.
    """
    r = spark.read.schema(LOG_CSV_SCHEMA).option("mode", mode)
    for k, v in _CSV_OPTS.items():
        r = r.option(k, v)
    raw = r.csv(path)
    return raw.select(
        "doc_id",
        F.try_to_timestamp("timestamp").alias("timestamp"),
        "level",
        "message",
        "source_ip",
        "source_host",
        "source_region",
        "user_id",
        "user_session_id",
        "user_metrics_login_time_ms",
        "user_metrics_clicks",
        "user_metrics_active",
        "payload_size",
        F.from_json("tags", T.ArrayType(T.StringType())).alias("tags"),
        F.from_json("answers", T.ArrayType(ANSWER)).alias("answers"),
        "processed",
    )
