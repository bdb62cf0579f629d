"""QueryStats parity: phase timing + memory instrumentation.

Mirrors ``query_stats.rs`` (the reference's whole second file): phase
timings setup / filter_creation / join_operation / collect / processing /
total (query_stats.rs:10-17), memory before/after/peak in KB
(query_stats.rs:72-78, 158-166), a global scan counter (query_stats.rs:7,
50-56), result-row count (query_stats.rs:80-82 — including the honest count
the reference's ``get_numeric_stats_refactored`` forgets to set, SURVEY.md
§2.9/I4), and the box-drawing summary printer (query_stats.rs:84-143).
"""

from __future__ import annotations

import itertools
import time
from contextlib import contextmanager
from dataclasses import dataclass, field

try:
    import resource

    def _mem_kb() -> int:
        # ru_maxrss is KB on Linux — same unit the reference reports.
        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
except ImportError:  # pragma: no cover - non-POSIX
    def _mem_kb() -> int:
        return 0

_scan_counter = itertools.count(1)


def _stage_peaks(spark, min_stage_id: int = -1) -> list[tuple[int, int]]:
    """``[(stage_id, peak_execution_memory_bytes)]`` for stages with id >
    ``min_stage_id``, read from the live AppStatusStore (the same
    TaskMetrics aggregation the Spark UI's stage page shows).

    This is the EXECUTOR-side answer to query_stats.rs:72-78: the
    reference measures its one process's RSS, which on a cluster is the
    driver and says nothing about where query memory is actually spent.
    Per-stage ``peakExecutionMemory`` sums each task's peak
    unroll/join/agg memory, so it moves with the query plan, not with
    the driver process.  Returns [] on any introspection failure (the
    store is driver-local state; never worth failing a query over).

    Why this reads nonzero under the engine session: ``peakExecutionMemory``
    only counts memory acquired from the task memory manager — unsafe
    sorts, hash-agg maps, join builds, and SERIALIZED shuffle writes.
    Plans made only of untracked operators (ObjectHashAggregate for
    collect_list, narrow maps) legitimately report 0 *unless* they
    shuffle; session.py pins ``spark.shuffle.sort.bypassMergeThreshold=1``
    so local shuffles take the serialized writer (the only writer a
    production-scale partition count ever uses), whose page acquisitions
    are tracked.  The AppStatusStore itself is populated with or without
    the UI (``spark.ui.enabled`` does not gate it)."""
    try:
        sc = spark.sparkContext
        store = sc._jsc.sc().statusStore()
        gw = sc._gateway
        from py4j.java_collections import ListConverter

        empty = ListConverter().convert([], gw._gateway_client)
        quantiles = gw.new_array(gw.jvm.double, 0)
        stages = store.stageList(empty, False, False, quantiles, empty)
        out = []
        for i in range(stages.size()):
            sd = stages.apply(i)
            sid = sd.stageId()
            if sid > min_stage_id:
                out.append((sid, sd.peakExecutionMemory()))
        return out
    except Exception:  # pragma: no cover - store API drift / no JVM
        return []


def _max_stage_id(spark) -> int:
    return max([sid for sid, _ in _stage_peaks(spark)], default=-1)


def _group_stage_ids(spark, group_id: str) -> list[int] | None:
    """Stage ids of every job tagged with ``group_id``, or None if the
    store could not be read (caller falls back to stage-floor scoping).

    Job-group scoping is the precise attribution the stage-id floor is
    not: a concurrent query or background streaming batch interleaving
    with this query gets stage ids above the floor but never this
    query's group id, so its memory is never mis-charged here."""
    try:
        sc = spark.sparkContext
        store = sc._jsc.sc().statusStore()
        gw = sc._gateway
        from py4j.java_collections import ListConverter

        empty = ListConverter().convert([], gw._gateway_client)
        jobs = store.jobsList(empty)
        out: list[int] = []
        for i in range(jobs.size()):
            jd = jobs.apply(i)
            grp = jd.jobGroup()
            if grp.isDefined() and grp.get() == group_id:
                sids = jd.stageIds()
                out.extend(int(sids.apply(j)) for j in range(sids.size()))
        return out
    except Exception:  # pragma: no cover - store API drift / no JVM
        return None

PHASES = (
    "setup",
    "filter_creation",
    "join_operation",
    "collect",
    "processing",
)


@dataclass
class QueryStats:
    """Per-query instrumentation record (query_stats.rs:34-45)."""

    query_name: str
    field_name: str = ""
    doc_ids_count: int | None = None
    scan_id: int = field(default_factory=lambda: next(_scan_counter))
    phase_times: dict[str, float] = field(default_factory=dict)
    memory_before_kb: int = 0
    memory_after_kb: int = 0
    memory_peak_kb: int = 0
    executor_peak_mem_kb: int = 0
    result_rows: int = 0
    total_time: float = 0.0
    _t0: float = field(default_factory=time.perf_counter)
    _spark: object = field(default=None, repr=False, compare=False)
    _stage_floor: int = field(default=-1, repr=False, compare=False)
    _group_id: str | None = field(default=None, repr=False, compare=False)
    _prev_group: str | None = field(default=None, repr=False, compare=False)
    _group_restored: bool = field(default=False, repr=False, compare=False)

    def __post_init__(self) -> None:
        self.memory_before_kb = _mem_kb()

    def attach_spark(self, spark) -> "QueryStats":
        """Opt in to executor-side memory.  Jobs launched from this thread
        between attach and :meth:`finalize` are tagged with a unique job
        group; finalize attributes executor memory from exactly those
        jobs' stages (concurrent queries and background streaming batches
        on the same session are therefore never mis-charged).  The
        stage-id floor remains as a fallback when the group tag cannot be
        set or read.  The driver-RSS fields stay (reference parity,
        query_stats.rs:72-78); ``executor_peak_mem_kb`` is the number
        that means something when the work runs on executors instead of
        in this process."""
        self._spark = spark
        self._stage_floor = _max_stage_id(spark)
        gid = f"qstats-{self.scan_id}-{id(self):x}"
        try:
            sc = spark.sparkContext
            self._prev_group = sc.getLocalProperty("spark.jobGroup.id")
            sc.setLocalProperty("spark.jobGroup.id", gid)
            self._group_id = gid
        except Exception:  # pragma: no cover - no JVM
            self._group_id = None
        return self

    def restore_group(self) -> None:
        """Reset the thread's job-group tag to its pre-attach value.
        IDEMPOTENT (second call is a no-op) and called from
        :meth:`finalize` too — but a query that RAISES between attach
        and finalize never reaches finalize, so the engine wraps query
        execution in try/finally around this (ADVICE r7): otherwise the
        thread stays tagged with a dead group id and later untracked
        jobs inherit it (mis-attribution), and with non-LIFO
        interleaving a stale value could be restored."""
        if (
            self._group_restored
            or self._group_id is None
            or self._spark is None
        ):
            return
        try:
            self._spark.sparkContext.setLocalProperty(
                "spark.jobGroup.id", self._prev_group
            )
        except Exception:  # pragma: no cover - no JVM
            pass
        self._group_restored = True

    @contextmanager
    def phase(self, name: str):
        """``time_section!`` equivalent (query_stats.rs:169-178)."""
        t = time.perf_counter()
        try:
            yield
        finally:
            self.phase_times[name] = (
                self.phase_times.get(name, 0.0) + time.perf_counter() - t
            )

    def set_result_rows(self, n: int) -> None:
        self.result_rows = n

    def finalize(self) -> "QueryStats":
        self.total_time = time.perf_counter() - self._t0
        self.memory_after_kb = _mem_kb()
        self.memory_peak_kb = max(self.memory_before_kb, self.memory_after_kb)
        if self._spark is not None:
            peaks: list[int] = []
            if self._group_id is not None:
                self.restore_group()
                sids = _group_stage_ids(self._spark, self._group_id)
                if sids is not None:
                    by_id = dict(_stage_peaks(self._spark))
                    peaks = [by_id[s] for s in sids if s in by_id]
            if not peaks:
                # group tag unavailable or tagged no jobs: stage-floor
                # scoping (assumes single-query-at-a-time on the session)
                peaks = [
                    p for _, p in _stage_peaks(self._spark, self._stage_floor)
                ]
            # max across this query's stages, not the sum: sequential
            # stages release their execution memory, so the busiest
            # single stage is the honest "peak" analog (the sum would
            # overstate overlapping-stage plans less often than it
            # overstates sequential ones).
            self.executor_peak_mem_kb = max(
                [p // 1024 for p in peaks], default=0
            )
        return self

    # -- printers (query_stats.rs:84-143, 145-155) --------------------------
    def print_summary(self) -> None:
        """Reference-layout box summary (query_stats.rs:84-143): same
        sections (header / identity / Timing / Memory), same row labels,
        same 52-char value field and +/--signed memory diff."""
        def row(label: str, value: str) -> None:
            # truncate (ellipsis) rather than overflow: a >52-char value
            # would push the right border out and break box alignment
            if len(value) > 52:
                value = value[:51] + "…"
            print(f"│ {label:<14} {value:<52} │")

        bar = "─" * 69
        before = self.memory_before_kb / 1024.0
        after = self.memory_after_kb / 1024.0
        peak = self.memory_peak_kb / 1024.0
        diff_kb = self.memory_after_kb - self.memory_before_kb
        diff = f"{'+' if diff_kb >= 0 else '-'}{abs(diff_kb) / 1024.0:.2f} MB"

        print("┌" + bar + "┐")
        print(f"│ {'QUERY STATS SUMMARY':<67} │")
        print("├" + bar + "┤")
        row("Query:", self.query_name)
        row("Field:", self.field_name)
        if self.doc_ids_count is not None:
            row("Doc IDs:", f"{self.doc_ids_count} ids")
        row("Scan #:", str(self.scan_id))
        row("Result Rows:", str(self.result_rows))
        print("├" + bar + "┤")
        print(f"│ {'Timing':<67} │")
        labels = {
            "setup": "Setup:",
            "filter_creation": "Filter:",
            "join_operation": "Join:",
            "collect": "Collect:",
            "processing": "Processing:",
        }
        for name in PHASES:
            row(
                "  " + labels[name],
                f"{self.phase_times.get(name, 0.0) * 1000:.3f} ms",
            )
        row("  Total:", f"{self.total_time * 1000:.3f} ms")
        print("├" + bar + "┤")
        print(f"│ {'Memory':<67} │")
        row("  Before:", f"{before:.2f} MB")
        row("  After:", f"{after:.2f} MB")
        row("  Peak:", f"{peak:.2f} MB")
        row("  Diff:", diff)
        if self.executor_peak_mem_kb:
            # beyond reference parity: the reference's one-process RSS IS
            # its executor memory; on Spark the driver numbers above say
            # nothing about executors, so the TaskMetrics peak is shown
            # whenever the query was stage-attributed (attach_spark).
            row(
                "  Exec peak:",
                f"{self.executor_peak_mem_kb / 1024.0:.2f} MB",
            )
        print("└" + bar + "┘")

    def compact(self) -> str:
        """print_compact parity (query_stats.rs:145-155)."""
        return (
            f"[{self.query_name}] '{self.field_name}' - "
            f"{self.total_time:.3f}s - {self.result_rows} rows - "
            f"Mem: {self.memory_before_kb}KB → {self.memory_after_kb}KB"
        )

    def as_dict(self) -> dict:
        return {
            "query": self.query_name,
            "scan_id": self.scan_id,
            "phases": dict(self.phase_times),
            "total_sec": self.total_time,
            "result_rows": self.result_rows,
            "memory_before_kb": self.memory_before_kb,
            "memory_after_kb": self.memory_after_kb,
            "executor_peak_mem_kb": self.executor_peak_mem_kb,
        }
