"""Streaming ANN-index ingest: new vectors join the materialized index
as they arrive (foreachBatch over operators/ann_index.add_batch).

Each micro-batch is assigned against the FROZEN centroids and appended
to the cell-partitioned layout — O(batch) per commit, index size
irrelevant (the postings-index merge's property, for vectors).
foreachBatch is at-least-once, and a blind append would double-insert
on replay, so commits are guarded by a recorded batch_id exactly like
streaming/near_dedup: a replayed committed batch is a no-op, a
batch_id BEHIND the committed one means the checkpoint was reset —
fail loudly rather than silently fork the index.

Crash-consistency contract (both halves required for the "replayed
batch is a no-op" guarantee to actually hold):

- the marker is written tmp-file + ``os.replace`` — a crash mid-write
  leaves the OLD marker intact, never a truncated JSON that poisons
  every later ``_read_marker``;
- each batch's files land under their own ``ingest_batch=<id>``
  partition directories (operators/ann_index.py layout), so a crash in
  the window AFTER the parquet append commits but BEFORE the marker
  lands is recoverable: the replay sees batch_id > committed, deletes
  any leftover ``ingest_batch=<id>`` directories (a per-cell prefix
  listing, O(n_centroids) — never corpus-sized), then re-appends.
  Without the tag the half-committed files would be indistinguishable
  from older data and the replay would double-insert.
- the PQ codes sidecar, when maintainable (r13 encode-at-ingest,
  ``pq_append_batch_codes``), rides the SAME tag: its per-batch code
  directories are dropped by the same replay cleanup, and its per-cell
  fingerprint refresh lands before the marker — a crash anywhere
  leaves the touched cells failing closed at the serving gate until
  the replay converges.

Centroids never move during ingest; rebuild with ``build_ann_index``
on the cadence the drift monitor (streaming/drift.py) indicates —
standard IVF operating procedure.

**Single-writer / serve-concurrency contract** (r12 ADVICE): index
MAINTENANCE (compaction — including the autocompaction dial below —
and PQ re-encodes) swaps directories via renames whose crash windows
are healed by ``_recover_cells`` on the NEXT touch, not during a
CONCURRENT touch: a serve running while a fold is mid-swap can observe
a missing cell or race the healer's promote against the fold's own
rename.  Serves against an index fed by a stream with the autocompact
dial enabled must therefore be scheduled between batches (the
foreachBatch body is the natural mutual-exclusion point — serve from
it, or from a coordinator that knows the stream is idle); to serve
concurrently with ingest, disable the dial
(``max_batch_dirs_per_cell=None``) and run compaction in the
scheduler's own serve-free window.  The r13 selective fold narrows
every such window to the offending cells' bytes but does not remove
the contract.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

from pyspark.sql import DataFrame

from ..operators.ann_index import (
    ann_index_add_batch,
    ann_index_compact_cells,
    pq_append_batch_codes,
    pq_augment_ann_index,
    pq_reencode_stale_cells,
)

# Autocompaction dial (r12): fold the per-batch delta directories back
# into the base layout once any cell has accumulated more than this
# many.  Measured knee (tools/ann_frag_knee.py, result JSON beside it;
# SAME-SIZE fragmented-vs-compacted warm serves on an incompressible
# 0.9–3.9 M-row corpus): amplification 1.41× at 4 dirs, 1.60× at 8,
# 1.84× at 16, then 3.09× at 32 and 3.53× at 64 — 16 is the last
# point inside the ≤2× discipline the LSM postings index pins its
# DEFAULT_MAX_SEGMENTS_PER_BUCKET at (r11 read-amplification knee).
# ``None`` disables (operators who schedule compaction off-peak).
DEFAULT_MAX_BATCH_DIRS_PER_CELL = 16


def _marker_path(root: str) -> str:
    return os.path.join(root, "_ANN_INGEST")


def _read_marker(root: str) -> dict | None:
    p = _marker_path(root)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _write_marker(root: str, meta: dict) -> None:
    """Atomic: tmp file + os.replace — readers see old or new, never a
    torn write (on HDFS/S3 the same shape is a rename/conditional-put)."""
    p = _marker_path(root)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, p)


def _drop_batch_dirs(root: str, batch_id: int) -> int:
    """Remove any ``cells/cell=*/ingest_batch=<batch_id>`` leftovers from
    an append that committed without its marker (crashed attempt) —
    and, since the codes sidecar mirrors the tag (r13,
    ``pq_append_batch_codes``), the same batch's code directories, so
    a replayed batch can never double-insert in EITHER tree."""
    dirs = glob.glob(
        os.path.join(root, "cells", "cell=*", f"ingest_batch={batch_id}")
    ) + glob.glob(
        os.path.join(root, "pq_codes", "cell=*", f"ingest_batch={batch_id}")
    )
    for d in dirs:
        shutil.rmtree(d)
    return len(dirs)


def _pq_codes_maintainable(root: str) -> bool:
    """True when the sidecar can take per-batch code appends: per-cell
    fingerprints recorded AND the two-level codes layout (a legacy tree
    migrates via one full ``pq_augment_ann_index``; until then ingest
    skips codes maintenance and the serving gate fails closed on the
    touched cells — the pre-r13.2 behavior)."""
    from ..operators.ann_index import _legacy_cell_layout

    meta_path = os.path.join(root, "_pq_meta.json")
    if not os.path.exists(meta_path):
        return False
    try:
        with open(meta_path) as f:
            meta = json.load(f)
    except (OSError, ValueError):
        return False
    if meta.get("cell_fingerprints") is None:
        return False
    codes_dir = os.path.join(root, "pq_codes")
    # a meta without its codes tree (manual surgery) must NOT take
    # appends: recreating the tree from new batches alone would let
    # refreshed fingerprints serve cells whose BASE rows have no codes
    # — silent wrong top-k instead of the loud missing-dir read
    if not os.path.isdir(codes_dir):
        return False
    return not _legacy_cell_layout(codes_dir)


def _cells_past_dial(root: str, dial: int) -> list[str]:
    """Cell partition values (dir-name strings) whose ``ingest_batch=``
    delta-directory count EXCEEDS the dial — the serve-cost
    fragmentation signal, per cell so maintenance can stay selective.
    O(#cells × #dirs) directory listing, never a data scan (the
    index_fragmentation discipline)."""
    cells = os.path.join(root, "cells")
    out: list[str] = []
    try:
        for cell in os.listdir(cells):
            if not cell.startswith("cell="):
                continue
            n = sum(
                1
                for d in os.listdir(os.path.join(cells, cell))
                if d.startswith("ingest_batch=")
                and not d.endswith("ingest_batch=-1")
            )
            if n > dial:
                out.append(cell[len("cell="):])
    except OSError:
        return []  # unlistable: let the explicit schedule handle it
    return out


def _maybe_autocompact(
    spark, root: str, max_batch_dirs_per_cell: int | None
) -> bool:
    """Inline compaction trigger for the streaming ingest (r12 — the
    ``_maybe_autocompact`` the LSM merge paths got in r11): once a
    cell's delta-directory count exceeds the dial, fold THAT CELL (and
    any siblings past the dial), so a long-running stream pays a write
    stall bounded by the offending cells' bytes instead of relying on
    an external scheduler to ever run :func:`ann_index_compact` (serve
    cost measured ~1.9× at 64 accumulated dirs, tools/ann_frag_knee.py).

    Selective since r13 (r12 VERDICT #1): real ingest is skewed — the
    hot cell crosses the dial while cold cells hold 1–2 dirs, and the
    r12 whole-index fold made the trigger FREQUENCY the hot cell's
    while the COST stayed O(index), a corpus-scale synchronous stall
    inside a micro-batch at 100 TB.  :func:`ann_index_compact_cells`
    folds only the offenders (each cell's base + deltas are
    self-contained — the postings LSM's per-bucket segment-list idea
    applied to cells), so under skew both trigger frequency and cost
    follow the hot cells.

    A PQ codes sidecar, if present, is refreshed in the same job —
    selectively: :func:`pq_reencode_stale_cells` re-encodes (with the
    EXISTING codebooks — geometry and training dials untouched) exactly
    the cells whose fingerprint moved, which covers the just-folded
    cells AND any cell made stale by sub-dial ingest or a prior crash,
    keeping ``ann_search_pq`` available throughout the stream.  A
    legacy (pre-per-cell-fingerprint) sidecar falls back to one full
    ``pq_augment_ann_index`` replaying the dials recorded at augment
    time (m_subspaces/n_codes/n_iters/sample_rows — r12 ADVICE; older
    metas recover geometry from the books and keep default training
    dials), which upgrades it to the per-cell gate for every later
    trigger."""
    if max_batch_dirs_per_cell is None:
        return False
    offending = _cells_past_dial(root, int(max_batch_dirs_per_cell))
    if not offending:
        return False
    ann_index_compact_cells(spark, root, offending)
    pq_meta = os.path.join(root, "_pq_meta.json")
    if os.path.exists(pq_meta):
        if _pq_codes_maintainable(root):
            pq_reencode_stale_cells(spark, root)
        else:
            # legacy sidecar (whole-tree fingerprint and/or single-level
            # codes layout): one full augment — replaying the dials
            # recorded at augment time (r12 ADVICE; older metas recover
            # geometry from the books and keep default training dials) —
            # migrates it to the per-cell gate + two-level layout, so
            # every later trigger takes the selective path above
            with open(pq_meta) as f:
                meta = json.load(f)
            books = meta["books"]
            pq_augment_ann_index(
                spark,
                root,
                m_subspaces=meta.get("m_subspaces", len(books)),
                n_codes=meta.get("n_codes", len(books[0])),
                n_iters=meta.get("n_iters", 4),
                sample_rows=meta.get("sample_rows", 65_536),
            )
    return True


def ann_ingest_batch(
    batch_df: DataFrame,
    root: str,
    batch_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_batch_dirs_per_cell: int | None = DEFAULT_MAX_BATCH_DIRS_PER_CELL,
) -> int:
    """Append one micro-batch to the index at ``root``; returns rows
    appended (0 for a committed replay).  After the commit, the
    autocompaction dial may fold accumulated delta directories (see
    :func:`_maybe_autocompact`; pass ``None`` to schedule compaction
    externally instead)."""
    meta = _read_marker(root)
    if (
        batch_id is not None
        and meta is not None
        and meta.get("batch_id") is not None
    ):
        if batch_id == meta["batch_id"]:
            return 0  # committed replay: no-op
        if batch_id < meta["batch_id"]:
            raise ValueError(
                f"batch_id {batch_id} is behind committed "
                f"{meta['batch_id']}: checkpoint was reset — rebuild the "
                f"index or replay without batch_id."
            )
    if batch_id is not None:
        # a prior attempt at THIS batch may have appended and crashed
        # before the marker landed — remove its files so the re-append
        # cannot double-insert
        _drop_batch_dirs(root, batch_id)
    n = ann_index_add_batch(
        batch_df.sparkSession,
        root,
        batch_df,
        id_col,
        vec_col,
        batch_tag=batch_id if batch_id is not None else -1,
    )
    # encode-at-ingest (r13): append this batch's PQ codes under the
    # same tag and refresh the touched cells' fingerprints, so
    # ann_search_pq stays continuously fresh during the stream instead
    # of failing closed between folds.  Guarded batches only — an
    # untagged (-1) append cannot be replay-cleaned, so its codes
    # cannot be either.  Runs BEFORE the marker: a crash in between
    # replays as a full re-run with both trees' tagged dirs dropped.
    if batch_id is not None and _pq_codes_maintainable(root):
        pq_append_batch_codes(batch_df.sparkSession, root, batch_id)
    _write_marker(
        root,
        {
            "batch_id": batch_id
            if batch_id is not None
            else (meta or {}).get("batch_id"),
        },
    )
    # maintenance runs AFTER the durable commit: a crash mid-fold
    # leaves the batch committed and the swap heals via _recover_cells
    _maybe_autocompact(
        batch_df.sparkSession, root, max_batch_dirs_per_cell
    )
    return n


def start_ann_ingest(
    vec_stream: DataFrame,
    root: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_batch_dirs_per_cell: int | None = DEFAULT_MAX_BATCH_DIRS_PER_CELL,
):
    """Wire a vector stream into the index: returns the StreamingQuery."""

    def _proc(batch_df: DataFrame, batch_id: int) -> None:
        ann_ingest_batch(
            batch_df, root, batch_id, id_col, vec_col,
            max_batch_dirs_per_cell=max_batch_dirs_per_cell,
        )

    return (
        vec_stream.writeStream.foreachBatch(_proc)
        .option("checkpointLocation", checkpoint)
        .start()
    )


# ---------------------------------------------------------------------------
# Drift-driven rebuild cadence (r9 VERDICT task 6: the module docstring
# says "rebuild on the cadence the drift monitor indicates" — this makes
# that recipe executable instead of prose)
# ---------------------------------------------------------------------------

def _baseline_path(root: str) -> str:
    return os.path.join(root, "_drift_baseline.json")


def _latest_drift_report(spark, report_path: str):
    """Most recent row of the drift monitor's report stream
    (streaming/drift.start_drift_monitor's ``report_path``), or None
    before the first report."""
    if not os.path.exists(report_path):
        return None
    reports = spark.read.parquet(report_path)
    from pyspark.sql import functions as F

    return reports.orderBy(F.col("batch_id").desc()).limit(1).first()


def should_rebuild(
    spark,
    root: str,
    report_path: str,
    threshold_bits: float = 0.05,
) -> bool:
    """True when the ingest distribution has drifted far enough from
    the one the FROZEN centroids were trained on that a
    ``build_ann_index`` rebuild is due.

    Reads the drift monitor's latest ``cumulative_js_bits`` (slow-drift
    signal — per-batch spikes mean a bad shipment, not stale centroids)
    and compares it against the divergence recorded at the last
    (re)build by :func:`mark_rebuilt`; no record means baseline 0 (the
    reference LM is the build corpus).  Returns False before any report
    exists — no evidence, no rebuild.  Cost: one bounded read of the
    vocabulary-free report table (a few rows per micro-batch), never
    the corpus.
    """
    row = _latest_drift_report(spark, report_path)
    if row is None or row["cumulative_js_bits"] is None:
        return False
    base = 0.0
    if os.path.exists(_baseline_path(root)):
        with open(_baseline_path(root)) as f:
            base = float(json.load(f).get("cumulative_js_bits", 0.0))
    return float(row["cumulative_js_bits"]) - base > float(threshold_bits)


def mark_rebuilt(spark, root: str, report_path: str) -> None:
    """Record the current drift level as the new rebuild baseline —
    call right after ``build_ann_index`` retrains the centroids so
    :func:`should_rebuild` measures drift SINCE this rebuild, not since
    the original build.  Atomic (tmp + replace), same discipline as the
    ingest marker."""
    row = _latest_drift_report(spark, report_path)
    meta = {
        "cumulative_js_bits": float(row["cumulative_js_bits"])
        if row is not None and row["cumulative_js_bits"] is not None
        else 0.0,
        "batch_id": row["batch_id"] if row is not None else None,
    }
    tmp = _baseline_path(root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, _baseline_path(root))
