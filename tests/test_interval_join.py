"""operators/interval_join.py — bucketized range join semantics + plan."""

from __future__ import annotations

import datetime as dt

from polars_w_inverted_index_spark.operators.interval_join import (
    interval_join,
)


def _ts(s: float):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _frames(spark):
    pts = spark.createDataFrame(
        [
            (1, _ts(30.0)),      # inside A only
            (2, _ts(90.0)),      # inside A and B (overlapping intervals)
            (3, _ts(100.0)),     # == A's end -> excluded (half-open), in B
            (4, _ts(5000.0)),    # inside C (interval spanning 2 buckets)
            (5, _ts(9999.0)),    # in no interval
        ],
        "event_id long, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [
            ("A", _ts(0.0), _ts(100.0)),
            ("B", _ts(80.0), _ts(200.0)),
            ("C", _ts(3000.0), _ts(6000.0)),   # crosses a 3600 s boundary
            ("D", _ts(500.0), _ts(500.0)),     # empty -> matches nothing
        ],
        "name string, start timestamp, end timestamp",
    )
    return pts, ivs


def test_inner_semantics(spark):
    pts, ivs = _frames(spark)
    got = {
        (r["event_id"], r["name"])
        for r in interval_join(pts, ivs, bucket_width_sec=3600).collect()
    }
    assert got == {(1, "A"), (2, "A"), (2, "B"), (3, "B"), (4, "C")}


def test_inner_matches_tiny_buckets(spark):
    """Bucket width must not change results — only the plan's fan-out."""
    pts, ivs = _frames(spark)
    wide = {
        (r["event_id"], r["name"])
        for r in interval_join(pts, ivs, bucket_width_sec=86400).collect()
    }
    narrow = {
        (r["event_id"], r["name"])
        for r in interval_join(pts, ivs, bucket_width_sec=7).collect()
    }
    assert wide == narrow


def test_left_keeps_unmatched(spark):
    pts, ivs = _frames(spark)
    rows = interval_join(pts, ivs, how="left").collect()
    by_event = {}
    for r in rows:
        by_event.setdefault(r["event_id"], set()).add(r["name"])
    assert by_event[5] == {None}
    assert by_event[2] == {"A", "B"}
    assert sum(len(v) for v in by_event.values()) == 6  # 5 matches + 1 null


def test_left_null_point_columns_no_duplicates(spark):
    """A matched point carrying a NULL column must not ALSO be emitted as
    unmatched (null-unsafe anti-join regression)."""
    pts = spark.createDataFrame(
        [(1, None, _ts(30.0)), (2, None, _ts(9999.0))],
        "event_id long, payload string, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [("A", _ts(0.0), _ts(100.0))],
        "name string, start timestamp, end timestamp",
    )
    rows = interval_join(pts, ivs, how="left").collect()
    got = sorted((r["event_id"], r["name"]) for r in rows)
    assert got == [(1, "A"), (2, None)]


def test_plan_is_equi_join(spark):
    """The whole point: no nested-loop/cartesian anywhere in the plan."""
    pts, ivs = _frames(spark)
    plan = (
        interval_join(pts, ivs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Cartesian" not in plan


def test_interval_join_random_vs_bruteforce(spark):
    """Randomized: bucketized equi-join == O(n·m) brute-force reference
    on arbitrary points/intervals (boundaries, spans, empties)."""
    import random

    rng = random.Random(20260813)
    for trial in range(4):
        pts_rows = [
            (i, _ts(rng.uniform(-100, 8000))) for i in range(rng.randint(1, 30))
        ]
        ivs_rows = []
        for j in range(rng.randint(1, 12)):
            a = rng.uniform(-100, 8000)
            b = a + rng.uniform(-50, 4000)  # sometimes empty/negative
            ivs_rows.append((f"iv{j}", _ts(a), _ts(b)))
        want = {
            (i, name)
            for i, t in pts_rows
            for name, s, e in ivs_rows
            if s <= t < e
        }
        pts = spark.createDataFrame(pts_rows, "event_id long, ts timestamp")
        ivs = spark.createDataFrame(
            ivs_rows, "name string, start timestamp, end timestamp"
        )
        bw = rng.choice([7, 360, 3600, 86400])
        got = {
            (r["event_id"], r["name"])
            for r in interval_join(pts, ivs, bucket_width_sec=bw).collect()
        }
        assert got == want, f"trial={trial} bucket={bw}"


def test_interval_join_guards_adversarial_spans(spark):
    """One corrupt interval spanning centuries must fail LOUDLY with the
    offending bounds in the message (resample's max_buckets_per_key
    discipline) — not explode into 10^8 bucket rows inside one task."""
    import pytest
    from pyspark.sql import functions as F

    from polars_w_inverted_index_spark.operators.interval_join import (
        interval_join,
    )

    points = spark.createDataFrame(
        [(1, "2024-01-01 10:30:00")], "pid long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    bad = spark.createDataFrame(
        [("huge", "1970-01-01 00:00:00", "2970-01-01 00:00:00")],
        "name string, start string, end string",
    ).select(
        "name",
        F.to_timestamp("start").alias("start"),
        F.to_timestamp("end").alias("end"),
    )
    with pytest.raises(Exception, match="spans more than"):
        interval_join(points, bad, bucket_width_sec=3600).collect()

    # the same shape under the cap joins normally
    ok = spark.createDataFrame(
        [("day", "2024-01-01 00:00:00", "2024-01-02 00:00:00")],
        "name string, start string, end string",
    ).select(
        "name",
        F.to_timestamp("start").alias("start"),
        F.to_timestamp("end").alias("end"),
    )
    rows = interval_join(points, ok, bucket_width_sec=3600).collect()
    assert len(rows) == 1 and rows[0]["name"] == "day"
