"""Shared delta-directory state for foreachBatch operators.

The streaming dedup family (MinHash band state, span window counts)
keeps its corpus-accumulated table as immutable per-batch DELTA
directories behind one atomic ``_LATEST`` pointer:

- commit I/O is O(batch) — a full old∪new rewrite would be O(corpus)
  per batch;
- the pointer swap is tmp-file + ``os.replace``: readers see the old or
  the new directory set, never a torn marker;
- compaction folds the list into one directory once it exceeds the
  dial, amortizing O(corpus / max_delta_dirs) per batch;
- unreferenced ``v=`` directories are pruned AFTER the swap (a crash
  mid-prune leaves garbage the next commit removes, never a broken
  state).

Batch-id replay guarding stays with the callers — the no-op/failure
semantics differ per operator (near-dedup must not re-emit accepted
rows; span scrub must not double-count windows).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def marker_path(state_path: str) -> str:
    return os.path.join(state_path, "_LATEST")


def read_marker(state_path: str) -> dict | None:
    p = marker_path(state_path)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def marker_dirs(meta: dict | None) -> list[str]:
    """Directory list; backward compatible with the single-"dir" form
    the pre-delta layout wrote."""
    if not meta:
        return []
    return meta.get("dirs") or ([meta["dir"]] if meta.get("dir") else [])


def read_state(spark: SparkSession, state_path: str) -> DataFrame | None:
    """Union of the committed delta directories, or None before the
    first commit.  Keys may repeat across deltas — consumers own the
    sum/merge (doing it here would be corpus-sized work per batch)."""
    meta = read_marker(state_path)
    dirs = marker_dirs(meta)
    if not dirs:
        return None
    return spark.read.parquet(
        *[os.path.join(state_path, d) for d in dirs]
    )


def state_file_count(state_path: str, meta: dict | None) -> int:
    """Data files across the marker's live directories (metadata-only:
    one listing per dir)."""
    n = 0
    for d in marker_dirs(meta):
        p = os.path.join(state_path, d)
        if os.path.isdir(p):
            n += sum(
                1
                for f in os.listdir(p)
                if not f.startswith((".", "_"))
            )
    return n


def commit_delta(
    state_path: str,
    delta: DataFrame,
    compacted: DataFrame | None,
    meta: dict | None,
    extra_marker: dict,
    max_delta_dirs: int,
    max_state_files: int | None = None,
) -> dict:
    """Write ``delta`` as the next ``v=`` directory (or ``compacted`` as
    the new single directory when the list is full), atomically swap the
    marker carrying ``extra_marker`` fields, prune unreferenced dirs.
    Returns the marker written.  ``compacted`` must be the caller's
    old-state ∪ delta merge — it is only evaluated (lazily, by the
    write) while the old directories still exist.

    ``max_state_files`` adds a FILE-count compaction trigger on top of
    the directory-count one: a long micro-batch sequence whose deltas
    each land many small part-files (the object-store small-files
    problem — every state read lists and opens all of them) compacts as
    soon as the live listing exceeds the dial, even when the directory
    list is still short.
    """
    old_dirs = marker_dirs(meta)
    next_v = (meta or {}).get("v", -1) + 1
    out_name = f"v={next_v}"
    out = os.path.join(state_path, out_name)
    files_over = (
        max_state_files is not None
        and state_file_count(state_path, meta) >= max_state_files
    )
    if compacted is not None and (
        len(old_dirs) >= max_delta_dirs or files_over
    ):
        if max_state_files is not None:
            # The compacted write itself must land UNDER the file-count
            # trigger, or a wide corpus read/union that emits >=
            # max_state_files part-files would re-trigger compaction on
            # every subsequent commit — each micro-batch an O(corpus)
            # rewrite.  Half the dial leaves headroom for new deltas.
            # repartition, NOT coalesce: coalesce propagates its
            # narrowing upstream, so the whole old∪delta merge would
            # COMPUTE on max_state_files/2 tasks — a small dial (8)
            # puts a corpus-sized merge on ~4 tasks (slow compactions,
            # task memory pressure at scale).  The shuffle is bounded
            # and paid once per rare compaction (r9 ADVICE).
            compacted = compacted.repartition(max(1, max_state_files // 2))
        compacted.write.mode("overwrite").parquet(out)
        new_dirs = [out_name]
    else:
        delta.write.mode("overwrite").parquet(out)
        new_dirs = old_dirs + [out_name]
    marker = {"v": next_v, "dirs": new_dirs, **extra_marker}
    tmp = marker_path(state_path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(marker, f)
    os.replace(tmp, marker_path(state_path))
    keep = set(new_dirs)
    for name in os.listdir(state_path):
        if name.startswith("v=") and name not in keep:
            shutil.rmtree(
                os.path.join(state_path, name), ignore_errors=True
            )
    return marker
