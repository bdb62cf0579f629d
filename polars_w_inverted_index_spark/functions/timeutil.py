"""Timestamp-type-agnostic time helpers.

Spark 4 reads parquet timestamps whose logical type lacks
``isAdjustedToUTC`` as ``TIMESTAMP_NTZ``, and ``unix_micros`` accepts
only ``TIMESTAMP`` — so the same query breaks or works depending on how
the input file was written.  The engine pins the session timezone to UTC
(session.py), which makes ``CAST(ntz AS TIMESTAMP)`` a pure
reinterpretation (naive value read as UTC), so epoch arithmetic is
identical for both types and matches DuckDB's ``epoch_us`` on naive
timestamps.  Route every epoch conversion through :func:`epoch_us`
instead of calling ``unix_micros`` directly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_us(col: Column | str) -> Column:
    """Microseconds since epoch for TIMESTAMP **or** TIMESTAMP_NTZ input.

    NTZ values are interpreted in the session timezone (UTC per
    session.py), mirroring DuckDB ``epoch_us(ts)`` semantics on naive
    timestamps; TIMESTAMP values pass through the cast unchanged.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def ensure_event_time(df, ts_col: str):
    """Cast ``ts_col`` to TIMESTAMP when it is TIMESTAMP_NTZ.

    Structured Streaming's ``EventTimeWatermark`` (like ``unix_micros``)
    accepts only TIMESTAMP, so a stream whose source parquet carries NTZ
    timestamps fails analysis at ``withWatermark``.  Under the UTC
    session timezone the cast is a pure reinterpretation; columns already
    typed TIMESTAMP pass through untouched.
    """
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df
