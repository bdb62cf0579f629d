"""Slot record for the driver-row registry table.

The grading driver's correctness sweep records at most 50 rows, so query
slots are a rationed resource: every candidate query declares itself as a
:class:`Slot` at its definition site, and ``registry.py`` assembles the
ONE table (``registry.TABLE``) over which the 50-row cap and its
rotations are auditable — including candidates that do NOT hold a driver
row, with the evidence that covers them instead (VERDICT r5 task 7 /
r6 task 5).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

DRIVER_EVIDENCE = "driver CORRECTNESS row (DuckDB-oracle hash at sf0.01)"


@dataclass(frozen=True)
class Slot:
    """One registry candidate.

    ``registered`` — holds one of the ≤50 driver rows this round.
    ``oracle`` — DuckDB SQL twin; None would mean a rows-only driver
    check (every registered slot currently carries an oracle).
    ``evidence`` — where the correctness evidence for this candidate
    lives: the driver row itself, or (for unregistered candidates) the
    pytest oracle / equivalence test that covers it and the registered
    slot that made its driver row redundant.
    """

    name: str
    fn: Callable
    oracle: str | None
    registered: bool = True
    evidence: str = DRIVER_EVIDENCE
