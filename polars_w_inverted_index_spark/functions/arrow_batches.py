"""Shared Arrow list-column → numpy matrix decode for GEMM closures.

Every vector-family worker closure (signature pass, cell assign, serve,
encode) starts the same way: an Arrow ``list<float|double>`` column must
become one dense ``(rows × width)`` float64 matrix — one
``flatten().reshape()`` for the uniform-width fast path, a per-row
scatter only for ragged corpora (the r10 measurement: the pandas
bridge's per-row objects cost ~2 s per million rows; this decode is the
zero-per-row-Python replacement).  The r11 review found the block
copied near-identically into a fourth and fifth closure, so this module
is now the canonical copy.

Closure shipping rule: worker closures are SELF-CONTAINED (see
functions/pickling.py — a module-level reference pickles by reference
and executors would need the repo importable).  Call sites must bind
``dec = by_value(decode_list_matrix)`` DRIVER-side and close over
``dec``; never reference this module from inside the closure.

Since r12 every vector-family closure uses this decode — ann_index.py's
assign/serve/ADC and pq.py's encode/scan converted off their inline
copies (r11 VERDICT Missing #4); the two CODE decodes (ADC, pq scan)
route their int lists through the float64 matrix, which is exact for
code ids (all << 2^53).
"""

from __future__ import annotations

__all__ = ["decode_list_matrix"]


def decode_list_matrix(col, n: int, width=None, min_width: int = 1):
    """Decode an Arrow list column to ``(mat, live, lens)``.

    - ``mat``: ``(n × W)`` float64, zero-padded; ``W = width``
      (truncating longer rows — the prefix rule) when given, else
      ``max(row lengths, min_width)``.
    - ``live``: bool mask of non-NULL rows.  NULL rows stay all-zero
      with ``lens`` 0 — callers apply their operator's NULL-row rule
      (drop, sig-0, zero-norm score...), this helper never decides.
    - ``lens``: per-row list lengths (0 for NULL rows), for
      width-mismatch rules.

    NULL/NaN ELEMENTS inside a list decode to NaN and propagate through
    any GEMM — callers whose expression twin treats a NULL element as a
    poisoned fold must mask on ``norm > 0`` (NaN fails the comparison,
    same branch as the ``when(na > 0)`` guard), not ``norm != 0``.
    """
    import numpy as np
    import pyarrow.compute as pc

    live = (
        col.is_valid().to_numpy(zero_copy_only=False)
        if col.null_count
        else np.ones(n, dtype=bool)
    )
    lv = pc.list_value_length(col).to_numpy(zero_copy_only=False)[
        live
    ].astype(np.int64)
    lens = np.zeros(n, dtype=np.int64)
    lens[live] = lv
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(
        np.float64, copy=False
    )
    w = (
        int(width)
        if width
        else max(int(lens.max(initial=0)), int(min_width), 1)
    )
    mat = np.zeros((n, w), dtype=np.float64)
    if lv.size and (lv == lv[0]).all():
        uw = int(lv[0])
        if uw:
            mat[live, : min(uw, w)] = flat.reshape(-1, uw)[:, :w]
    else:  # ragged widths: per-row scatter (prefix-truncate at w)
        pos = 0
        for j, rl in zip(np.nonzero(live)[0], lv):
            rl = int(rl)
            mat[j, : min(rl, w)] = flat[pos: pos + min(rl, w)]
            pos += rl
    return mat, live, lens
