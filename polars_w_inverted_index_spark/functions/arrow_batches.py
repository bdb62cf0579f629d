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


def decode_list_matrix(
    col, n: int, width=None, min_width: int = 1,
    with_null_elem: bool = False,
):
    """Decode an Arrow list column to ``(mat, live, lens)`` — or
    ``(mat, live, lens, null_elem)`` with ``with_null_elem=True``.

    - ``mat``: ``(n × W)`` float64, zero-padded; ``W = width``
      (truncating longer rows — the prefix rule) when given, else
      ``max(row lengths, min_width)``.
    - ``live``: bool mask of non-NULL rows.  NULL rows stay all-zero
      with ``lens`` 0 — callers apply their operator's NULL-row rule
      (drop, sig-0, zero-norm score...), this helper never decides.
    - ``lens``: per-row list lengths (0 for NULL rows), for
      width-mismatch rules.
    - ``null_elem`` (opt-in): per-row "has a NULL ELEMENT within the
      decoded ``W``-prefix" mask, from the Arrow child validity bitmap
      (vectorized — one cumsum, no per-row Python).

    NULL and NaN ELEMENTS both decode to NaN in ``mat`` — but Spark
    treats them DIFFERENTLY (r12, found by the bad-element fuzz): a
    NULL element poisons the expression fold to NULL, so ``when(norm >
    0)`` guards fall to their otherwise-0 branch, while a NaN element
    gives a NaN norm and **Spark's ``NaN > 0`` is TRUE** (NaN is the
    largest double in Spark's total order, unlike numpy/IEEE), so the
    guard PASSES and the score is NaN, ranked FIRST under DESC.  A
    GEMM twin replicating expression semantics therefore needs
    ``null_elem`` to split the branches: zero-branch =
    ``null_elem | (norm == 0)``; NaN norms (NaN/±inf elements) stay
    scored and their NaN results tier first.  The old guidance here
    ("mask on norm > 0") replicated numpy's NaN-fails-comparison, which
    is exactly backwards for Spark — it survived only because the
    dyadic fuzz never generated bare-NaN elements.
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
    fa = col.flatten()
    flat = fa.to_numpy(zero_copy_only=False).astype(
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
    if not with_null_elem:
        return mat, live, lens
    null_elem = np.zeros(n, dtype=bool)
    if fa.null_count:
        # prefix-scoped: a NULL past the decoded width is invisible to
        # the expression twin too (both sides slice to the same W)
        invalid = ~fa.is_valid().to_numpy(zero_copy_only=False)
        cum = np.concatenate(([0], np.cumsum(invalid)))
        ends = np.cumsum(lv)
        starts = ends - lv
        pref_ends = starts + np.minimum(lv, w)
        null_elem[live] = (cum[pref_ends] - cum[starts]) > 0
    return mat, live, lens, null_elem
