"""Streaming exact deduplication: keep the first arrival per content hash.

The batch dedup family (operators/dedup.py) answers "which documents in
this corpus duplicate each other"; an INGEST pipeline needs the online
form — drop a document whose content already arrived.  Structured
Streaming's ``dropDuplicatesWithinWatermark`` is the purpose-built
operator: keyed state holds one entry per content hash seen inside the
watermark horizon, and state older than the watermark is evicted — so
state is O(unique contents per horizon), never O(stream length).

The key is the same 128-bit md5 the batch path groups on
(operators/dedup.py exact family): uniform, so the dedup state shards
evenly across executors, and batch/stream agree on what "identical"
means.  Horizon semantics are the standard trade-off: a duplicate
arriving LATER than ``delay`` after its original is not caught (its
state may be gone) — at 100 TB/day the horizon is a retention dial, and
a periodic batch ``exact_dedup`` sweep is the backstop, exactly how
production ingest pipelines layer the two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CONTENT_HASH_COL = "content_hash"


def with_content_hash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the dedup key (md5 of the raw text bytes)."""
    return df.withColumn(CONTENT_HASH_COL, F.md5(F.col(text_col)))


def streaming_dedup_exact(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    delay: str = "30 minutes",
) -> DataFrame:
    """First-arrival-wins exact dedup over a stream.

    Output = input columns + ``content_hash``, one row per distinct
    content within the watermark horizon.
    """
    from ..functions.timeutil import ensure_event_time

    return (
        ensure_event_time(with_content_hash(stream, text_col), ts_col)
        .withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark([CONTENT_HASH_COL])
    )


def batch_dedup_exact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Batch twin for stream-equivalence tests: same key, same
    keep-one-per-content contract (the kept row is the min-timestamp one
    only in the stream; batch keeps an arbitrary representative, so
    compare on keys/counts, not row identity)."""
    return with_content_hash(df, text_col).dropDuplicates(
        [CONTENT_HASH_COL]
    )
