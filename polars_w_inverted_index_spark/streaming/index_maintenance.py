"""Incremental inverted-index maintenance via ``foreachBatch``.

The reference rebuilds its postings map from scratch on every query
(main.rs:325-385).  At 100 TB with a continuously arriving corpus that is
a full-table shuffle per refresh; the streaming path amortizes it: each
micro-batch contributes only its own (value → doc_ids) postings, merged
into the materialized index.

Storage layout — value-hash buckets with per-bucket version pointers:
    <index_path>/m=<n>/bucket=<k>/...parquet   bucket k as of merge n
    <index_path>/_LATEST   JSON {"merge": n, "batch_id": b,
                                 "n_buckets": B, "buckets": {"k": "m=i/bucket=k", ...}}

Bucket = ``pmod(xxhash64(value), B)`` — a pure function of the value, so
a value's postings always live in one bucket and a merge knows exactly
which buckets its batch touches.  The merge then reads ONLY those
buckets' current postings, merges in the batch contribution, and writes
ONLY those buckets under a fresh ``m=<n>`` directory; every untouched
bucket keeps its existing pointer.  Per-merge cost is
O(batch + touched-bucket postings), independent of total index size —
the property a v1 of this module lacked (it unioned and rewrote the
whole index per micro-batch, i.e. O(index) writes per merge).

Why pointers instead of in-place overwrite: Spark cannot atomically
overwrite a parquet directory it is concurrently reading (the merge
reads bucket k while producing its replacement), and readers must never
observe a half-written index.  A table format (Delta/Iceberg) gives this
transactionally; on plain parquet the pointer file is the idiomatic
stand-in — a reader resolves _LATEST once and then reads immutable
directories.  Directories no longer referenced are pruned after commit,
which also collects orphans from merges that crashed before commit.

Hot values chunk via postings_chunked upstream; bucket-count is the
skew dial (B grows with corpus so no bucket's postings outgrow a task).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.inverted_index import postings

DEFAULT_N_BUCKETS = 16


def _latest_path(index_path: str) -> str:
    return os.path.join(index_path, "_LATEST")


def _read_marker(index_path: str) -> dict | None:
    """Commit marker (see module docstring) or None for an empty index."""
    marker = _latest_path(index_path)
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        return json.load(f)


def _bucket_col(n_buckets: int):
    return F.pmod(F.xxhash64(F.col("value")), F.lit(n_buckets))


def read_index(spark: SparkSession, index_path: str) -> DataFrame | None:
    """Current committed snapshot of the index, or None if empty.

    Resolves the pointer file once; the returned frame unions the
    per-bucket directories current at resolution time (immutable, so the
    frame stays consistent even while merges continue)."""
    meta = _read_marker(index_path)
    if meta is None or not meta["buckets"]:
        return None
    paths = [os.path.join(index_path, rel) for rel in meta["buckets"].values()]
    return spark.read.parquet(*paths)


def merge_postings_batch(
    batch_df: DataFrame,
    field: str,
    index_path: str,
    doc_id_col: str = "doc_id",
    batch_id: int | None = None,
    n_buckets: int = DEFAULT_N_BUCKETS,
) -> None:
    """Merge one micro-batch's postings into the index (foreachBatch body).

    Also callable directly for batch backfill (``batch_id=None`` skips
    replay protection).  ``n_buckets`` applies to the FIRST merge only;
    later merges inherit the committed bucket count (bucket assignment
    must stay stable across the index's life).

    Idempotence: foreachBatch is at-least-once — after a failure between
    this commit and Spark's checkpoint commit, the same micro-batch is
    replayed.  The marker records the last-applied ``batch_id``; a replay
    of exactly that batch is a no-op instead of a double merge that would
    permanently duplicate doc_ids.  A batch_id BEHIND the marker can only
    mean the stream restarted with a fresh/rewound checkpoint (Spark
    replays at most the one uncommitted batch); silently skipping would
    freeze the index forever, so that raises instead — point the new
    stream at a new index_path, or backfill with ``batch_id=None``.
    """
    spark = batch_df.sparkSession
    meta = _read_marker(index_path)
    if (
        batch_id is not None
        and meta is not None
        and meta.get("batch_id") is not None
    ):
        if batch_id == meta["batch_id"]:
            return  # replayed micro-batch — already merged and committed
        if batch_id < meta["batch_id"]:
            raise ValueError(
                f"batch_id {batch_id} is behind the index's committed "
                f"batch_id {meta['batch_id']}: the streaming checkpoint "
                f"was reset or replaced. Use a fresh index_path for the "
                f"new stream, or merge with batch_id=None for a manual "
                f"backfill."
            )
    if meta is not None:
        n_buckets = meta["n_buckets"]

    new = postings(batch_df, field, doc_id_col, sort_postings=False)
    new = new.withColumn("bucket", _bucket_col(n_buckets))
    # the frame feeds two actions (touched-bucket probe + the merge write)
    new = new.persist()
    # The batch is one micro-batch — small relative to the index; the
    # touched-bucket list is at most n_buckets entries.
    touched = sorted(
        r["bucket"] for r in new.select("bucket").distinct().collect()
    )
    if not touched:  # empty batch (all-null field/id rows): still commit
        new.unpersist()
        _commit(index_path, meta, {}, batch_id, n_buckets)
        return

    old_buckets = (meta or {}).get("buckets", {})
    old_paths = [
        os.path.join(index_path, old_buckets[str(b)])
        for b in touched
        if str(b) in old_buckets
    ]
    if old_paths:
        old = spark.read.parquet(*old_paths).withColumn(
            "bucket", _bucket_col(n_buckets)
        )
        merged = (
            old.unionByName(new)
            .groupBy("bucket", "value")
            .agg(
                F.sort_array(F.flatten(F.collect_list("doc_ids"))).alias(
                    "doc_ids"
                )
            )
        )
    else:
        merged = new.select(
            "bucket", "value", F.sort_array("doc_ids").alias("doc_ids")
        )
    next_m = (meta or {}).get("merge", -1) + 1
    out = os.path.join(index_path, f"m={next_m}")
    # one file-per-bucket layout: repartition on bucket so each partition
    # directory is written by one task (no tiny-file explosion)
    merged.repartition("bucket").write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(out)
    new.unpersist()
    new_pointers = {
        str(b): os.path.join(f"m={next_m}", f"bucket={b}") for b in touched
    }
    _commit(index_path, meta, new_pointers, batch_id, n_buckets, next_m)


def _commit(
    index_path: str,
    meta: dict | None,
    new_pointers: dict[str, str],
    batch_id: int | None,
    n_buckets: int,
    next_m: int | None = None,
) -> None:
    buckets = dict((meta or {}).get("buckets", {}))
    buckets.update(new_pointers)
    committed = batch_id if batch_id is not None else (
        (meta or {}).get("batch_id")
    )
    marker = {
        "merge": next_m if next_m is not None else (meta or {}).get("merge", -1),
        "batch_id": committed,
        "n_buckets": n_buckets,
        "buckets": buckets,
    }
    tmp = _latest_path(index_path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(marker, f)
    os.replace(tmp, _latest_path(index_path))
    _prune(index_path, buckets)


def _prune(index_path: str, buckets: dict[str, str]) -> None:
    """Remove bucket directories no longer referenced by the marker (and
    merge directories left empty).  Also collects orphans from merges
    that failed before commit."""
    import shutil

    live = {rel for rel in buckets.values()}
    for m_dir in os.listdir(index_path):
        if not m_dir.startswith("m="):
            continue
        m_path = os.path.join(index_path, m_dir)
        for b_dir in os.listdir(m_path):
            if b_dir.startswith("bucket=") and (
                os.path.join(m_dir, b_dir) not in live
            ):
                shutil.rmtree(os.path.join(m_path, b_dir), ignore_errors=True)
        if not any(n.startswith("bucket=") for n in os.listdir(m_path)):
            shutil.rmtree(m_path, ignore_errors=True)


def start_index_maintenance(
    stream_df: DataFrame,
    field: str,
    index_path: str,
    checkpoint: str,
    doc_id_col: str = "doc_id",
    trigger_available_now: bool = True,
    n_buckets: int = DEFAULT_N_BUCKETS,
):
    """Attach the merge to a streaming source; returns the StreamingQuery.

    ``availableNow`` drains the current backlog then stops (test/backfill
    mode); pass False for a continuously running maintainer.
    """

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_postings_batch(
            batch_df,
            field,
            index_path,
            doc_id_col,
            batch_id=batch_id,
            n_buckets=n_buckets,
        )

    writer = (
        stream_df.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
