"""Structured Streaming extension surface (SURVEY.md §2.7, §7 Phase 5)."""

from .dedup import batch_dedup_exact, streaming_dedup_exact
from .ann_ingest import (
    ann_ingest_batch,
    mark_rebuilt,
    should_rebuild,
    start_ann_ingest,
    start_ann_ingest_deployed,
)
from .drift import (
    drift_monitor_batch,
    read_ingest_lm,
    start_drift_monitor,
)
from .index_maintenance import (
    compact_index,
    index_fragmentation,
    merge_composite_postings_batch,
    merge_postings_batch,
    read_composite_index,
    read_index,
    read_index_postings,
    rebucket_index,
    start_composite_index_maintenance,
    start_index_maintenance,
)
from .near_dedup import (
    near_dedup_batch,
    read_corpus_bands,
    start_near_dedup,
)
from .span_scrub import (
    read_window_state,
    span_scrub_batch,
    start_span_scrub,
)
from .search_index import (
    boolean_search_from_index,
    merge_term_index_batch,
    start_term_index_maintenance,
)
from .stateful import running_user_totals
from .windows import session_event_counts, windowed_event_counts

__all__ = [
    "batch_dedup_exact",
    "boolean_search_from_index",
    "compact_index",
    "ann_ingest_batch",
    "mark_rebuilt",
    "should_rebuild",
    "start_ann_ingest",
    "start_ann_ingest_deployed",
    "drift_monitor_batch",
    "merge_term_index_batch",
    "start_term_index_maintenance",
    "read_ingest_lm",
    "start_drift_monitor",
    "index_fragmentation",
    "merge_composite_postings_batch",
    "merge_postings_batch",
    "near_dedup_batch",
    "read_composite_index",
    "read_corpus_bands",
    "read_index",
    "rebucket_index",
    "start_near_dedup",
    "read_index_postings",
    "start_composite_index_maintenance",
    "start_index_maintenance",
    "read_window_state",
    "span_scrub_batch",
    "start_span_scrub",
    "running_user_totals",
    "session_event_counts",
    "streaming_dedup_exact",
    "windowed_event_counts",
]
