"""Cross-engine canonical forms for driver hash-comparison.

The driver's correctness canonicalizer sorts/factorizes result frames with
pandas, which cannot hash list cells (``TypeError: unhashable type:
'list'``) — so any registry query whose output column is an array must
render it as a scalar before registration.  The canonical form is the
array joined to one CSV string, sorted ascending first unless the array
order is positional (MinHash signatures) or already canonical (min-k
fingerprints).

This is comparison discipline at the registry layer ONLY: engine APIs
(``Engine.get_field_values``, ``operators/inverted_index.postings`` …)
keep returning real ``array<long>`` columns.

DuckDB twin: ``array_to_string(list_sort(expr), ',')``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def csv_array(df: DataFrame, col: str, sort: bool = True) -> DataFrame:
    """Replace array column ``col`` with its CSV-string rendering."""
    c: Column = F.sort_array(col) if sort else F.col(col)
    return df.withColumn(col, F.array_join(c.cast("array<string>"), ","))


def csv_array_sql(expr: str, sort: bool = True) -> str:
    """DuckDB twin of :func:`csv_array` for an array-valued SQL expr.

    Spark's ``array_join([]) = ''`` but DuckDB's ``array_to_string([])``
    is NULL (same trap the r8 shingle fuzz caught in word_shingles_sql),
    so the empty list is coalesced to ``''`` — while a NULL INPUT stays
    NULL on both engines (the CASE guards the coalesce from
    converting it)."""
    inner = f"list_sort({expr})" if sort else expr
    return (
        f"(CASE WHEN ({expr}) IS NOT NULL THEN "
        f"coalesce(array_to_string({inner}, ','), '') END)"
    )
