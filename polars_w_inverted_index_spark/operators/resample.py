"""Time-series resampling with gap filling (downsample + regular grid).

Monitoring/feature pipelines need event streams on a REGULAR time grid
— "sum of value per user per hour, with empty hours present" — which
plain ``groupBy(window(...))`` does not give (empty buckets simply
don't exist in the output).  ``resample_events`` aggregates into
fixed-width buckets and materializes every bucket of each key's
[first, last] activity span, with a fill policy for the gaps.

Plan shape:
- bucketing is a narrow map (``epoch_us`` floor-div — NTZ-safe);
- ONE shuffle aggregates (key, bucket) partials AND, in the same pass,
  each key's min/max bucket (partial-aggregatable);
- the grid is ``sequence(min, max)`` exploded per key — output-sized
  work by definition (the grid IS the result), no generator scan;
- grid ⋈ aggregates is an equi-join on (key, bucket);
- forward fill is one ``last(value, ignorenulls)`` running window per
  key — O(1) state per row, the as-of join's machinery.

A key with a years-long span × a small step emits span/step rows —
that is the requested output, not plan waste; the spans guard
(``max_buckets_per_key``) turns a mis-set step into a loud error
instead of a quiet 10^9-row explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.timeutil import epoch_us


def resample_events(
    df: DataFrame,
    every_sec: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    agg: str = "sum",
    fill: str = "zero",
    max_buckets_per_key: int = 10_000_000,
) -> DataFrame:
    """``[<key>, bucket_ts, <agg>_value, n_events]`` on a regular grid.

    ``agg`` ∈ {sum, avg, min, max, count}; ``fill`` ∈ {zero, ffill,
    null} controls empty buckets (``n_events`` is 0 there either way;
    ``ffill`` carries the last seen aggregate forward within the key).
    Rows with null key/timestamp are dropped (they belong to no
    bucket); ``bucket_ts`` is the bucket's START timestamp.
    """
    aggs = {
        "sum": F.sum,
        "avg": F.avg,
        "min": F.min,
        "max": F.max,
        "count": lambda c: F.count(c),
    }
    if agg not in aggs:
        raise ValueError(f"agg must be one of {sorted(aggs)}, got {agg!r}")
    if fill not in ("zero", "ffill", "null"):
        raise ValueError(f"fill must be zero|ffill|null, got {fill!r}")
    w = every_sec * 1_000_000
    out_val = f"{agg}_value"

    bucketed = df.where(
        F.col(key_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(key_col).alias("_key"),
        F.floor(epoch_us(ts_col) / F.lit(w)).cast("long").alias("_b"),
        F.col(value_col).alias("_v"),
    )
    per_bucket = bucketed.groupBy("_key", "_b").agg(
        aggs[agg]("_v").alias("_agg"), F.count("*").alias("n_events")
    )
    spans = per_bucket.groupBy("_key").agg(
        F.min("_b").alias("_lo"), F.max("_b").alias("_hi")
    )
    oversized = spans.where(
        F.col("_hi") - F.col("_lo") >= max_buckets_per_key
    ).limit(1).collect()
    if oversized:
        r = oversized[0]
        raise ValueError(
            f"key {r['_key']!r} spans {r['_hi'] - r['_lo'] + 1} buckets at "
            f"every_sec={every_sec} (> max_buckets_per_key="
            f"{max_buckets_per_key}); raise the step or the cap."
        )
    grid = spans.select(
        "_key", F.explode(F.sequence("_lo", "_hi")).alias("_b")
    )
    joined = grid.join(per_bucket, ["_key", "_b"], "left")

    val = F.col("_agg")
    if fill == "zero":
        val = F.coalesce(val, F.lit(0.0) if agg != "count" else F.lit(0))
    elif fill == "ffill":
        val = F.last("_agg", ignorenulls=True).over(
            Window.partitionBy("_key")
            .orderBy("_b")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    return joined.select(
        F.col("_key").alias(key_col),
        F.timestamp_micros(F.col("_b") * w).alias("bucket_ts"),
        val.alias(out_val),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
    )
