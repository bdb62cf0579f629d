"""operators/asof.py — as-of join semantics on hand-built frames."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from polars_w_inverted_index_spark.operators.asof import asof_join


def _ts(s: float):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (100, 1, _ts(10.0)),   # matches r at 10.0 (inclusive bound)
            (101, 1, _ts(5.0)),    # matches r at 3.0
            (102, 1, _ts(2.0)),    # before all right rows -> unmatched
            (103, 2, _ts(50.0)),   # key 2 has no right rows -> unmatched
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(3.0), 7, 1.5),
            (1, _ts(10.0), 8, 2.5),
            (1, _ts(10.0), 9, 3.5),   # tie on ts: highest id (9) wins
            (1, _ts(20.0), 10, 4.5),
        ],
        "user_id long, ts timestamp, event_id long, value double",
    )
    return left, right


def test_asof_backward(spark):
    left, right = _frames(spark)
    out = {
        r["event_id"]: (r["event_id_asof"], r["value_asof"])
        for r in asof_join(
            left, right, on="user_id", right_cols=["event_id", "value"]
        ).collect()
    }
    assert out[100] == (9, 3.5)       # inclusive ts, max-id tiebreak
    assert out[101] == (7, 1.5)
    assert out[102] == (None, None)   # nothing at-or-before
    assert out[103] == (None, None)   # key absent on right
    assert len(out) == 4              # every left row exactly once


def test_asof_forward(spark):
    left, right = _frames(spark)
    out = {
        r["event_id"]: r["event_id_asof"]
        for r in asof_join(
            left,
            right,
            on="user_id",
            right_cols=["event_id", "value"],
            direction="forward",
        ).collect()
    }
    assert out[100] == 9    # inclusive at 10.0, max-id tiebreak
    assert out[101] == 9    # next at-or-after 5.0 is 10.0
    assert out[102] == 7    # next after 2.0 is 3.0
    assert out[103] is None


def test_asof_row_atomic_payload(spark):
    """A right row with a null payload column must NOT inherit that
    column from an older right row (struct-atomic attach)."""
    left = spark.createDataFrame(
        [(1, 1, _ts(30.0))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts(10.0), 7, 1.5), (1, _ts(20.0), 8, None)],
        "user_id long, ts timestamp, event_id long, value double",
    )
    row = asof_join(
        left, right, on="user_id", right_cols=["event_id", "value"]
    ).collect()[0]
    assert row["event_id_asof"] == 8 and row["value_asof"] is None


def test_asof_single_shuffle_no_join(spark):
    """Plan gate: the operator is union + window — no join node, no
    cartesian, exactly one exchange (the window partitioning)."""
    left, right = _frames(spark)
    plan = (
        asof_join(left, right, on="user_id", right_cols=["event_id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "Cartesian" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_tolerance_nulls_stale_matches(spark):
    left, right = _frames(spark)
    out = {
        r["event_id"]: r["event_id_asof"]
        for r in asof_join(
            left, right, on="user_id",
            right_cols=["event_id", "value"], tolerance_sec=3.0,
        ).collect()
    }
    # 100@10.0 matches right@10.0 (gap 0 ≤ 3) → kept;
    # 101@5.0's nearest is right@3.0 (gap 2 ≤ 3) → kept;
    # 102/103 unmatched regardless
    assert out == {100: 9, 101: 7, 102: None, 103: None}
    tight = {
        r["event_id"]: r["event_id_asof"]
        for r in asof_join(
            left, right, on="user_id",
            right_cols=["event_id", "value"], tolerance_sec=1.0,
        ).collect()
    }
    assert tight == {100: 9, 101: None, 102: None, 103: None}


def test_asof_tolerance_forward(spark):
    left, right = _frames(spark)
    out = {
        r["event_id"]: r["event_id_asof"]
        for r in asof_join(
            left, right, on="user_id", direction="forward",
            right_cols=["event_id", "value"], tolerance_sec=1.0,
        ).collect()
    }
    # forward: 102@2.0 → right@3.0, gap 1 ≤ 1 kept; 101@5.0 → right@10.0
    # gap 5 > 1 nulled; 100@10.0 → right@10.0 gap 0 kept
    assert out == {100: 9, 101: None, 102: 7, 103: None}


def test_asof_random_vs_pandas_merge_asof(spark):
    """Randomized: asof_join == pandas.merge_asof (the independent
    reference implementation) for both directions, per key, with ties
    excluded (pandas keeps the LAST right row at equal ts; we pin the
    max-tiebreak row — identical only when (key, ts) is unique)."""
    import random

    import pandas as pd

    rng = random.Random(4813)
    for trial in range(3):
        keys = [1, 2]
        lrows = [
            (i, rng.choice(keys), _ts(rng.uniform(0, 1000)))
            for i in range(rng.randint(1, 25))
        ]
        seen = set()
        rrows = []
        for j in range(rng.randint(1, 25)):
            k, t = rng.choice(keys), round(rng.uniform(0, 1000), 3)
            if (k, t) in seen:   # keep (key, ts) unique for a fair oracle
                continue
            seen.add((k, t))
            rrows.append((k, _ts(t), 1000 + j, float(j)))
        if not rrows:
            continue
        left = spark.createDataFrame(
            lrows, "event_id long, user_id long, ts timestamp"
        )
        right = spark.createDataFrame(
            rrows, "user_id long, ts timestamp, event_id long, value double"
        )
        lpd = pd.DataFrame(
            lrows, columns=["event_id", "user_id", "ts"]
        ).sort_values("ts")
        rpd = pd.DataFrame(
            rrows, columns=["user_id", "ts", "r_event_id", "value"]
        ).sort_values("ts")
        for direction in ("backward", "forward"):
            got = {
                r["event_id"]: r["event_id_asof"]
                for r in asof_join(
                    left, right, on="user_id",
                    right_cols=["event_id", "value"], direction=direction,
                ).collect()
            }
            merged = pd.merge_asof(
                lpd, rpd, on="ts", by="user_id", direction=direction,
            )
            want = {
                int(row.event_id): (
                    None if pd.isna(row.r_event_id) else int(row.r_event_id)
                )
                for row in merged.itertuples()
            }
            assert got == want, f"trial={trial} {direction}"
