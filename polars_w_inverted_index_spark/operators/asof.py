"""As-of (nearest-key temporal) join — an operator Spark's DataFrame API
lacks natively, composed from union + one ordered window pass.

Semantics (pandas ``merge_asof`` / kdb ``aj`` / QuestDB ``ASOF JOIN``):
for every left row, attach the single right row with the largest
``right_ts <= left_ts`` (direction="backward"; "forward" takes the
smallest ``right_ts >= left_ts``) within the same ``on`` key.

Scale shape — the naive formulations both die at 100 TB:
- an inequality join (``l.ts >= r.ts``) is a range join: Catalyst plans a
  cartesian-per-key with a filter, exploding on hot keys;
- per-key ``collect_list`` + UDF search materializes whole key histories
  in single tasks.

The union trick is one shuffle and no explosion: tag left=1/right=0,
union, and run ``last(right_row_struct, ignorenulls=True)`` over a
window partitioned by key, ordered by (ts, tag, tiebreak), rows
unbounded preceding → current.  Each left row sees the running latest
right ROW (one struct — payload columns can never mix across right
rows); right rows sorting BEFORE left rows at equal ts gives the
inclusive ``right_ts <= left_ts`` bound.  Cost = sort within the one
shuffle, same as any groupBy; the window state is O(1) per row, so
skewed keys behave like any skewed sort (AQE-handled), never a blowup.

Ties on (key, ts) among right rows resolve to the highest ``tiebreak``
value (deterministic), mirrored exactly in the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    direction: str = "backward",
    suffix: str = "_asof",
    tolerance_sec: float | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row + the nearest ``right`` row.

    Output = all ``left`` columns, then ``{c}{suffix}`` for each of
    ``right_cols``, then ``{right_ts}{suffix}`` (the matched right
    timestamp).  Unmatched left rows keep nulls (left-join semantics).
    The first of ``right_cols`` is the tiebreak for equal (key, ts)
    right rows — pass a unique id column first for deterministic output.

    ``tolerance_sec`` (pandas ``merge_asof`` parity): a match further
    than this many seconds from the left timestamp is treated as NO
    match (stale-quote semantics) — a pure post-filter expression on the
    matched struct, so the plan is unchanged.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if tolerance_sec is not None and tolerance_sec < 0:
        raise ValueError("tolerance_sec must be >= 0")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]
    if not right_cols:
        raise ValueError("need at least one right payload column")
    # The union plan re-selects caller columns alongside these internals;
    # a caller column with the same name would either fail analysis with a
    # duplicate-column error or silently shadow data.  Fail loudly.
    reserved = {"_ts", "_tag", "_tb", "_rp"}
    clash = reserved & (set(left.columns) | set(right.columns))
    clash |= {"__ts"} & set(right_cols)  # __ts is the struct's ts field
    if clash:
        raise ValueError(
            f"asof_join reserves column names {sorted(reserved | {'__ts'})}; "
            f"rename conflicting input columns: {sorted(clash)}"
        )

    rp_type = T.StructType(
        [right.schema[c] for c in right_cols] + [
            T.StructField(f"__ts", right.schema[right_ts].dataType)
        ]
    )
    lhs = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(right.schema[right_cols[0]].dataType).alias("_tb"),
        *[F.col(c) for c in left.columns if c != on],
        F.lit(None).cast(rp_type).alias("_rp"),
    )
    rhs = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.col(right_cols[0]).alias("_tb"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c != on
        ],
        F.struct(
            *[F.col(c) for c in right_cols],
            F.col(right_ts).alias("__ts"),
        ).alias("_rp"),
    )

    if direction == "backward":
        # right rows first at equal ts (inclusive bound); among equal-ts
        # right rows the highest tiebreak is scanned last → wins.
        order = [F.col("_ts").asc(), F.col("_tag").asc(), F.col("_tb").asc()]
    else:
        # forward: scan from the future backwards; right rows still first
        # at equal ts, highest tiebreak scanned last → wins.
        order = [F.col("_ts").desc(), F.col("_tag").asc(), F.col("_tb").asc()]

    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = lhs.unionByName(rhs)
    matched = u.select(
        F.col(on),
        F.col("_tag"),
        F.col("_ts"),
        *[c for c in left.columns if c != on],
        F.last("_rp", ignorenulls=True).over(w).alias("_rp"),
    )
    if tolerance_sec is not None:
        from ..functions.timeutil import epoch_us

        gap = epoch_us(F.col("_ts")) - epoch_us(F.col("_rp").getField("__ts"))
        if direction == "forward":
            gap = -gap
        matched = matched.withColumn(
            "_rp",
            F.when(gap <= int(tolerance_sec * 1_000_000), F.col("_rp")),
        )
    return matched.where(F.col("_tag") == 1).select(
        *left.columns,
        *[
            F.col("_rp").getField(c).alias(f"{c}{suffix}")
            for c in right_cols
        ],
        F.col("_rp").getField("__ts").alias(f"{right_ts}{suffix}"),
    )
