"""Incremental inverted-index maintenance via ``foreachBatch``.

The reference rebuilds its postings map from scratch on every query
(main.rs:325-385).  At 100 TB with a continuously arriving corpus that is
a full-table shuffle per refresh; the streaming path amortizes it: each
micro-batch contributes only its own (value → doc_ids) postings, merged
into the materialized index.

Storage layout — versioned snapshots:
    <index_path>/v=<n>/...parquet     one directory per committed merge
    <index_path>/_LATEST              JSON {"v": n, "batch_id": b}

Why versions instead of in-place overwrite: Spark cannot atomically
overwrite a parquet directory it is concurrently reading (the merge reads
v=n while writing v=n+1), and readers must never observe a half-written
index.  A table format (Delta/Iceberg) gives this transactionally; on
plain parquet the version pointer is the idiomatic stand-in, and swapping
it is a single rename-equivalent.  Old versions are pruned after commit.

Merge strategy: ``new ∪ old → groupBy(value) → flatten(collect_list)``.
Each merge shuffles only distinct values touched plus their postings —
with value-bucketed storage (``bucketBy`` on value) the shuffle drops to
co-located appends.  Hot values chunk via postings_chunked upstream.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.inverted_index import postings


def _latest_path(index_path: str) -> str:
    return os.path.join(index_path, "_LATEST")


def _read_marker(index_path: str) -> dict | None:
    """Commit marker {"v": snapshot, "batch_id": last-applied} or None."""
    marker = _latest_path(index_path)
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        txt = f.read().strip()
    try:
        return json.loads(txt)
    except ValueError:  # pre-batch-id marker: plain version number
        return {"v": int(txt), "batch_id": None}


def read_index(spark: SparkSession, index_path: str) -> DataFrame | None:
    """Current committed snapshot of the index, or None if empty."""
    meta = _read_marker(index_path)
    if meta is None:
        return None
    return spark.read.parquet(os.path.join(index_path, f"v={meta['v']}"))


def merge_postings_batch(
    batch_df: DataFrame,
    field: str,
    index_path: str,
    doc_id_col: str = "doc_id",
    batch_id: int | None = None,
) -> None:
    """Merge one micro-batch's postings into the index (foreachBatch body).

    Also callable directly for batch backfill (``batch_id=None`` skips
    replay protection).

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
    new = postings(batch_df, field, doc_id_col, sort_postings=False)
    old = read_index(spark, index_path)
    if old is not None:
        merged = (
            old.unionByName(new)
            .groupBy("value")
            .agg(
                F.sort_array(F.flatten(F.collect_list("doc_ids"))).alias(
                    "doc_ids"
                )
            )
        )
        next_v = meta["v"] + 1
    else:
        merged = new.withColumn("doc_ids", F.sort_array("doc_ids"))
        next_v = 0
    out = os.path.join(index_path, f"v={next_v}")
    merged.write.mode("overwrite").parquet(out)
    # commit: point readers at the new snapshot, then prune old versions
    committed = batch_id if batch_id is not None else (
        (meta or {}).get("batch_id")
    )
    tmp = _latest_path(index_path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"v": next_v, "batch_id": committed}, f)
    os.replace(tmp, _latest_path(index_path))
    _prune(index_path, keep=next_v)


def _prune(index_path: str, keep: int) -> None:
    import shutil

    for name in os.listdir(index_path):
        if name.startswith("v=") and int(name[2:]) != keep:
            shutil.rmtree(os.path.join(index_path, name), ignore_errors=True)


def start_index_maintenance(
    stream_df: DataFrame,
    field: str,
    index_path: str,
    checkpoint: str,
    doc_id_col: str = "doc_id",
    trigger_available_now: bool = True,
):
    """Attach the merge to a streaming source; returns the StreamingQuery.

    ``availableNow`` drains the current backlog then stops (test/backfill
    mode); pass False for a continuously running maintainer.
    """

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_postings_batch(
            batch_df, field, index_path, doc_id_col, batch_id=batch_id
        )

    writer = (
        stream_df.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
