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
    scan_id: int = field(default_factory=lambda: next(_scan_counter))
    phase_times: dict[str, float] = field(default_factory=dict)
    memory_before_kb: int = 0
    memory_after_kb: int = 0
    memory_peak_kb: int = 0
    result_rows: int = 0
    total_time: float = 0.0
    _t0: float = field(default_factory=time.perf_counter)

    def __post_init__(self) -> None:
        self.memory_before_kb = _mem_kb()

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
        return self

    # -- printers (query_stats.rs:84-143, 145-155) --------------------------
    def print_summary(self) -> None:
        w = 46
        print("┌" + "─" * w + "┐")
        print(f"│ {self.query_name:<{w - 2}} │")
        print("├" + "─" * w + "┤")
        for name in PHASES:
            if name in self.phase_times:
                line = f"{name:<18} {self.phase_times[name] * 1000:>10.2f} ms"
                print(f"│ {line:<{w - 2}} │")
        line = f"{'total':<18} {self.total_time * 1000:>10.2f} ms"
        print(f"│ {line:<{w - 2}} │")
        dm = (self.memory_after_kb - self.memory_before_kb) / 1024.0
        line = f"{'memory delta':<18} {dm:>10.2f} MB"
        print(f"│ {line:<{w - 2}} │")
        line = f"{'result rows':<18} {self.result_rows:>10}"
        print(f"│ {line:<{w - 2}} │")
        print("└" + "─" * w + "┘")

    def compact(self) -> str:
        return (
            f"[{self.query_name}] total={self.total_time:.3f}s "
            f"rows={self.result_rows} "
            f"mem_delta={(self.memory_after_kb - self.memory_before_kb) / 1024.0:.2f}MB"
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
        }
