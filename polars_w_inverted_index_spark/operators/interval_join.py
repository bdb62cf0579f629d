"""Point-in-interval join via time-bucket equi-join — the scale-safe
form of a range join.

A naive ``points JOIN intervals ON start <= ts AND ts < end`` has no
equality predicate, so Catalyst plans BroadcastNestedLoopJoin (or a
cartesian): O(|points|·|intervals|) comparisons — fine for 24 windows,
fatal for a million. The standard fix (used by every time-series engine,
and what Databricks' range-join optimization does under the hood): chop
time into fixed buckets, explode each interval onto the buckets it
overlaps, map each point to its single bucket, equi-join on bucket, then
re-check the exact predicate.

Cost model: the join is a hash/sort-merge equi-join on bucket; an
interval spanning B buckets appears B times, so ``bucket_width`` is the
dial — pick it near the median interval length and B stays O(1) per
interval while each bucket holds points/intervals of one time slice
only. Skewed buckets (rush-hour) behave like any skewed equi-join key
(AQE-splittable), never a cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.timeutil import epoch_us


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_width_sec: int = 3600,
    how: str = "inner",
    max_buckets_per_interval: int = 100_000,
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= ts < end`` (half-open, the time-window convention).

    Returns all point columns + all interval columns.  ``how`` may be
    ``inner`` or ``left`` (unmatched points keep nulls).  Column name
    collisions between the two inputs are the caller's to resolve.

    ``max_buckets_per_interval`` is the adversarial-row guard (the
    resample operator's ``max_buckets_per_key`` discipline): one corrupt
    interval spanning centuries would otherwise explode into hundreds of
    millions of bucket rows inside a single task — a silent OOM blaming
    the wrong operator.  Over-cap rows raise with the interval's bounds
    in the message; the check is one comparison per interval row.
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    w = F.lit(bucket_width_sec * 1_000_000)  # microsecond buckets

    p_us = epoch_us(point_ts)
    pts = points.withColumn("_bucket", F.floor(p_us / w))

    s_us = epoch_us(start_col)
    e_us = epoch_us(end_col)
    # half-open [start, end): the last covered bucket is the one holding
    # end - 1µs; empty/negative intervals cover no bucket (sequence guard)
    first_b = F.floor(s_us / w)
    last_b = F.floor((e_us - F.lit(1)) / w)
    guarded_first = F.when(
        last_b - first_b < F.lit(max_buckets_per_interval), first_b
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "interval_join: interval spans more than "
                    f"{max_buckets_per_interval} buckets at "
                    f"bucket_width_sec={bucket_width_sec} (start="
                ),
                F.col(start_col).cast("string"),
                F.lit(", end="),
                F.col(end_col).cast("string"),
                F.lit(
                    "); widen bucket_width_sec, raise "
                    "max_buckets_per_interval, or filter corrupt rows."
                ),
            )
        ).cast("long")
    )
    ivs = (
        intervals.where(e_us > s_us)
        .withColumn("_bucket", F.explode(F.sequence(guarded_first, last_b)))
    )

    exact = (
        F.col(point_ts) >= F.col(start_col)
    ) & (F.col(point_ts) < F.col(end_col))

    if how == "inner":
        return (
            pts.join(ivs, on="_bucket", how="inner")
            .where(exact)
            .drop("_bucket")
        )
    # left: equi-join on bucket, keep exact-match interval payload, then
    # reduce back to one-or-more rows per point with unmatched preserved
    matched = (
        pts.join(ivs, on="_bucket", how="inner").where(exact).drop("_bucket")
    )
    # Null-SAFE anti-join: a plain `on=columns` leftanti uses null-unsafe
    # equality, so a matched point carrying any NULL column would fail to
    # anti-match itself and be emitted a second time with null intervals.
    bare = pts.drop("_bucket")
    seen = matched.select(*points.columns).distinct()
    cond = None
    for c in points.columns:
        eq = bare[c].eqNullSafe(seen[c])
        cond = eq if cond is None else (cond & eq)
    unmatched = bare.join(seen, on=cond, how="leftanti")
    for c in intervals.columns:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(intervals.schema[c].dataType)
        )
    return matched.unionByName(unmatched)
