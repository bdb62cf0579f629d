"""One-pass sketch profiling: corpus statistics at metadata cost.

Before mixing or filtering a 100 TB corpus you need its shape — column
cardinalities, quantiles, null rates — and computing those exactly means
global sorts and count-distinct shuffles.  Spark's sketch aggregates
(HyperLogLog++ behind ``approx_count_distinct``, KLL/GK behind
``percentile_approx``) are partial-aggregatable: every executor folds
its partitions into a fixed-size sketch and only sketches cross the
wire — ONE pass, no shuffle of data rows, error bounds set by sketch
parameters, not data size.

``corpus_profile`` emits one row per profiled column so the result is
driver-sized regardless of corpus size (long-format: adding columns
never widens the schema).  Exact twins exist in tests, which pin the
documented error bounds on real data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_QUANTILES = (0.5, 0.95, 0.99)
DEFAULT_RSD = 0.05  # HLL++ relative standard deviation
DEFAULT_PCT_ACCURACY = 10_000  # percentile_approx accuracy knob


def corpus_profile(
    df: DataFrame,
    columns: list[str] | None = None,
    quantiles: tuple[float, ...] = DEFAULT_QUANTILES,
    rsd: float = DEFAULT_RSD,
    accuracy: int = DEFAULT_PCT_ACCURACY,
) -> DataFrame:
    """Per-column profile: rows, nulls, approx distinct, and (for numeric
    columns) approx quantiles — one aggregation pass over the corpus.

    Output: ``[column, n_rows, n_nulls, approx_distinct, q50, q95, q99]``
    (quantile columns null for non-numeric types; header names follow
    ``quantiles``).
    """
    cols = columns or df.columns
    numeric = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName()
        in ("byte", "short", "integer", "long", "float", "double", "decimal")
    }
    aggs = []
    for c in cols:
        aggs.append(F.count(F.lit(1)).alias(f"{c}__rows"))
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls")
        )
        aggs.append(
            F.approx_count_distinct(c, rsd).alias(f"{c}__distinct")
        )
        if c in numeric:
            aggs.append(
                F.percentile_approx(
                    F.col(c).cast("double"), list(quantiles), accuracy
                ).alias(f"{c}__q")
            )
    wide = df.agg(*aggs)

    parts = []
    for c in cols:
        qcols = (
            [
                F.col(f"{c}__q")[i].alias(f"q{int(p * 100)}")
                for i, p in enumerate(quantiles)
            ]
            if c in numeric
            else [
                F.lit(None).cast("double").alias(f"q{int(p * 100)}")
                for p in quantiles
            ]
        )
        parts.append(
            wide.select(
                F.lit(c).alias("column"),
                F.col(f"{c}__rows").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("approx_distinct"),
                *qcols,
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
