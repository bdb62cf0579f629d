"""functions/timeutil.epoch_us — identical results on TIMESTAMP and
TIMESTAMP_NTZ inputs.

The driver's parquet fixtures have shifted timestamp physical types
between rounds (TIMESTAMP(NANOS) -> nanosAsLong path, then plain micros
without isAdjustedToUTC -> TIMESTAMP_NTZ), and ``unix_micros`` rejects
NTZ outright on Spark 4.  Every epoch conversion must go through
``epoch_us`` so the engine is immune to how the file was written.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from polars_w_inverted_index_spark.functions.timeutil import epoch_us
from polars_w_inverted_index_spark.operators.interval_join import (
    interval_join,
)

_ROWS = [
    (1, dt.datetime(2024, 1, 1, 0, 0, 0, 123456)),
    (2, dt.datetime(2024, 1, 1, 0, 40, 0)),
    (3, dt.datetime(2024, 1, 2, 12, 0, 0, 999999)),
]


def _events(spark, ts_type: str):
    return spark.createDataFrame(_ROWS, f"event_id long, ts {ts_type}")


def test_epoch_us_both_timestamp_types(spark):
    vals = {}
    for t in ("timestamp", "timestamp_ntz"):
        df = _events(spark, t).select(
            "event_id", epoch_us("ts").alias("us")
        )
        vals[t] = {r["event_id"]: r["us"] for r in df.collect()}
    # session tz is UTC (session.py) so NTZ reinterpretation is exact
    assert vals["timestamp"] == vals["timestamp_ntz"]
    assert vals["timestamp"][1] == 1704067200123456


def test_interval_join_accepts_ntz(spark):
    base = dt.datetime(2024, 1, 1)
    for t in ("timestamp", "timestamp_ntz"):
        pts = spark.createDataFrame(
            [(1, base + dt.timedelta(seconds=30))],
            f"event_id long, ts {t}",
        )
        ivs = spark.createDataFrame(
            [("A", base, base + dt.timedelta(seconds=100))],
            f"name string, start {t}, end {t}",
        )
        got = [
            (r["event_id"], r["name"])
            for r in interval_join(pts, ivs).collect()
        ]
        assert got == [(1, "A")]


def test_sessionize_query_runs_on_ntz(spark, tmp_path):
    """The registered sessionize query must analyze + run when events.ts
    is TIMESTAMP_NTZ (round-3 driver regression: AnalysisException)."""
    from polars_w_inverted_index_spark.registry_ext import q_events_sessions

    path = str(tmp_path / "events.parquet")
    (
        _events(spark, "timestamp_ntz")
        .withColumn("user_id", F.lit(7))
        .withColumn("event_type", F.lit("x"))
        .withColumn("value", F.lit(1.0))
        .withColumn("props", F.lit("{}"))
        .write.mode("overwrite").parquet(path)
    )
    out = q_events_sessions(spark, str(tmp_path)).collect()
    assert len(out) == 1
    # gaps: 40 min (> 30 min) then ~35.3 h -> 3 sessions for user 7
    assert out[0]["n_sessions"] == 3
