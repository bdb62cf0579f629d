"""Whole-table numeric stats (min / max / avg), reference-parity.

Mirrors ``get_numeric_stats_refactored`` (main.rs:611-689): min/max computed
on the native integer/numeric column then cast to double; avg computed on the
double-cast column (main.rs:559-574, SURVEY.md §1.4.6).  Empty input yields a
single row of nulls, matching ``NumericStats { None, None, None }``
(main.rs:582-587).

This is a pure aggregation — Catalyst plans it as partial (map-side) +
final aggregate with no wide shuffle of data rows, so it scales linearly
with input and is network-bound only on the tiny partial-agg states.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.paths import field_name_to_column


def numeric_stats(df: DataFrame, field: str) -> DataFrame:
    """1-row ``DataFrame[min double, max double, avg double]``."""
    col = field_name_to_column(field)
    return df.agg(
        F.min(col).cast("double").alias("min"),
        F.max(col).cast("double").alias("max"),
        F.avg(F.col(col).cast("double")).alias("avg"),
    )
