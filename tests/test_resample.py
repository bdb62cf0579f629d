"""Time-series resample + gap fill (operators/resample.py):
DuckDB generate_series twin on the events fixture + fill semantics."""

from __future__ import annotations

import datetime

import duckdb
import pytest
from pyspark.sql import functions as F

from polars_w_inverted_index_spark.operators.resample import resample_events

SF_DIR = "/root/testdata/sf0.01"
EVERY = 6 * 3600  # 6-hour buckets


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def test_matches_duckdb(spark, events):
    got = sorted(
        (r["user_id"], r["bucket_ts"], round(r["sum_value"], 6),
         r["n_events"])
        for r in resample_events(events, EVERY).collect()
    )
    w = EVERY * 1_000_000
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
    )
    exp = con.execute(
        f"""
        WITH b AS (
          SELECT user_id, epoch_us(ts) // {w} AS b, value
          FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        ), per AS (
          SELECT user_id, b, sum(value) AS a, count(*) AS n
          FROM b GROUP BY 1, 2
        ), spans AS (
          SELECT user_id, min(b) AS lo, max(b) AS hi FROM per GROUP BY 1
        ), grid AS (
          SELECT user_id, unnest(range(lo, hi + 1)) AS b FROM spans
        )
        SELECT g.user_id, make_timestamp(g.b * {w}) AS bucket_ts,
               ROUND(COALESCE(p.a, 0.0), 6) AS sum_value,
               COALESCE(p.n, 0) AS n_events
        FROM grid g LEFT JOIN per p USING (user_id, b)
        ORDER BY 1, 2
        """
    ).fetchall()
    assert got == [tuple(r) for r in exp]


def test_grid_is_contiguous_and_counts_conserved(events):
    out = resample_events(events, EVERY).collect()
    by_key: dict = {}
    for r in out:
        by_key.setdefault(r["user_id"], []).append(r["bucket_ts"])
    step = datetime.timedelta(seconds=EVERY)
    for ts_list in by_key.values():
        ts_list.sort()
        for a, b in zip(ts_list, ts_list[1:]):
            assert b - a == step  # no holes, no duplicates
    n_total = sum(r["n_events"] for r in out)
    assert n_total == events.where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    ).count()


def test_fill_modes(spark):
    rows = [
        (1, datetime.datetime(2024, 1, 1, 0, 30), 10.0),
        (1, datetime.datetime(2024, 1, 1, 3, 30), 2.0),  # 2 empty hours
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    zero = {
        r["bucket_ts"].hour: r["sum_value"]
        for r in resample_events(df, 3600, fill="zero").collect()
    }
    assert zero == {0: 10.0, 1: 0.0, 2: 0.0, 3: 2.0}
    ff = {
        r["bucket_ts"].hour: r["sum_value"]
        for r in resample_events(df, 3600, fill="ffill").collect()
    }
    assert ff == {0: 10.0, 1: 10.0, 2: 10.0, 3: 2.0}
    nul = {
        r["bucket_ts"].hour: r["sum_value"]
        for r in resample_events(df, 3600, fill="null").collect()
    }
    assert nul[1] is None and nul[2] is None


def test_span_guard_and_bad_args(spark, events):
    with pytest.raises(ValueError, match="buckets"):
        resample_events(events, 1, max_buckets_per_key=100)
    with pytest.raises(ValueError, match="agg"):
        resample_events(events, 3600, agg="median")
    with pytest.raises(ValueError, match="fill"):
        resample_events(events, 3600, fill="bfill")


def test_pre_epoch_timestamps_floor_into_correct_bucket(spark):
    """Negative epoch micros must FLOOR into their bucket, not truncate
    toward zero: 1969-12-31 23:59:30 belongs to the bucket starting
    1969-12-31 23:59:00, never to 1970-01-01 00:00:00 (and bucket 0 must
    not swallow 2 minutes of pre/post-epoch events)."""
    rows = [
        (1, datetime.datetime(1969, 12, 31, 23, 59, 30), 10.0),
        (1, datetime.datetime(1970, 1, 1, 0, 0, 30), 20.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    )
    out = {
        r["bucket_ts"]: r["sum_value"]
        for r in resample_events(df, every_sec=60).collect()
    }
    assert out == {
        datetime.datetime(1969, 12, 31, 23, 59): 10.0,
        datetime.datetime(1970, 1, 1, 0, 0): 20.0,
    }
