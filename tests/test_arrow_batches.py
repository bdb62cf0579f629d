"""Direct (Spark-free) tests for the shared Arrow list-column decode —
the canonical copy of the GEMM closures' batch → matrix step since r11
(functions/arrow_batches.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from polars_w_inverted_index_spark.functions.arrow_batches import (
    decode_list_matrix,
)
from polars_w_inverted_index_spark.functions.pickling import by_value


def _col(rows):
    return pa.array(rows, type=pa.list_(pa.float64()))


def test_uniform_fast_path():
    col = _col([[1.0, 2.0], [3.0, 4.0]])
    mat, live, lens = decode_list_matrix(col, 2)
    assert mat.tolist() == [[1.0, 2.0], [3.0, 4.0]]
    assert live.all() and lens.tolist() == [2, 2]


def test_null_row_stays_zero_with_len_zero():
    col = _col([[1.0, 2.0], None, [3.0, 4.0]])
    mat, live, lens = decode_list_matrix(col, 3)
    assert mat[1].tolist() == [0.0, 0.0]
    assert live.tolist() == [True, False, True]
    assert lens.tolist() == [2, 0, 2]
    # uniform fast path must still apply: live rows share one width
    assert mat[0].tolist() == [1.0, 2.0] and mat[2].tolist() == [3.0, 4.0]


def test_ragged_scatter_and_min_width():
    col = _col([[1.0], [2.0, 3.0, 4.0], []])
    mat, live, lens = decode_list_matrix(col, 3, min_width=5)
    assert mat.shape == (3, 5)
    assert mat[0].tolist() == [1.0, 0.0, 0.0, 0.0, 0.0]
    assert mat[1].tolist() == [2.0, 3.0, 4.0, 0.0, 0.0]
    assert mat[2].tolist() == [0.0] * 5
    assert lens.tolist() == [1, 3, 0]


def test_fixed_width_truncates_both_paths():
    # uniform: all rows wider than width
    u = _col([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    mu, _, _ = decode_list_matrix(u, 2, width=2)
    assert mu.tolist() == [[1.0, 2.0], [4.0, 5.0]]
    # ragged: one wider, one shorter
    r = _col([[1.0, 2.0, 3.0], [4.0]])
    mr, _, lr = decode_list_matrix(r, 2, width=2)
    assert mr.tolist() == [[1.0, 2.0], [4.0, 0.0]]
    assert lr.tolist() == [3, 1]  # lens report the TRUE lengths


def test_null_element_decodes_to_nan_and_mask_flags_it():
    """The r12 caller contract: a NULL element inside a list becomes
    NaN in the matrix — indistinguishable from a NaN element there —
    so the zero-branch decision must come from the ``null_elem`` mask
    (Arrow child validity), combined as ``null_elem | (norm == 0)``.
    Spark's ``NaN > 0`` is TRUE (its NaN is the largest double), so
    the pre-r12 guidance of masking on ``~(norm > 0)`` would wrongly
    zero NaN-element rows the expression twins SCORE (NaN, ranked
    first)."""
    col = _col([[1.0, None], [1.0, 2.0], [1.0, float("nan")]])
    mat, live, lens, null_e = decode_list_matrix(
        col, 3, with_null_elem=True
    )
    assert live.all() and lens.tolist() == [2, 2, 2]
    assert np.isnan(mat[0, 1]) and np.isnan(mat[2, 1])  # identical mats
    assert mat[1].tolist() == [1.0, 2.0]
    assert null_e.tolist() == [True, False, False]  # the ONLY signal
    norms = np.linalg.norm(mat, axis=1)
    zero_branch = null_e | (norms == 0)
    assert zero_branch.tolist() == [True, False, False]


def test_null_elem_mask_prefix_scoped_and_default_off():
    """The mask is prefix-scoped to the decode width (a NULL past the
    truncation is invisible to the expression twin's sliced fold too)
    and respects NULL rows (no flag — they're not NULL-ELEMENT rows);
    the default 3-tuple return is unchanged for callers that don't opt
    in."""
    col = _col([[1.0, 2.0, None], [None, 2.0, 3.0], None, [1.0, 2.0]])
    mat, live, lens, null_e = decode_list_matrix(
        col, 4, width=2, with_null_elem=True
    )
    # row 0's NULL sits past width=2 -> not flagged; row 1's is inside
    assert null_e.tolist() == [False, True, False, False]
    assert live.tolist() == [True, True, False, True]
    # no-null child fast path: mask exists and is all-False
    clean = _col([[1.0], [2.0]])
    _m, _l, _s, ne = decode_list_matrix(clean, 2, with_null_elem=True)
    assert not ne.any()
    # default return stays a 3-tuple
    assert len(decode_list_matrix(col, 4, width=2)) == 3


def test_null_elem_mask_respects_slice_offset():
    """Sliced RecordBatch columns must produce the mask for the SLICED
    rows, not the parent buffer (the flatten-offset trap, null_elem
    edition)."""
    col = _col(
        [[9.0, None], [1.0, 2.0], [None, 4.0], [5.0, 6.0]]
    ).slice(1, 3)
    mat, live, lens, null_e = decode_list_matrix(
        col, 3, with_null_elem=True
    )
    assert null_e.tolist() == [False, True, False]
    assert mat[0].tolist() == [1.0, 2.0]
    assert np.isnan(mat[1, 0]) and mat[2].tolist() == [5.0, 6.0]


def test_sliced_batch_offsets_respected():
    """mapInArrow can hand closures sliced RecordBatches; flatten()
    must honor the slice offset, not re-read from position 0."""
    col = _col([[9.0, 9.0], [1.0, 2.0], [3.0, 4.0]]).slice(1, 2)
    mat, _, lens = decode_list_matrix(col, 2)
    assert mat.tolist() == [[1.0, 2.0], [3.0, 4.0]]
    assert lens.tolist() == [2, 2]


def test_by_value_wrappable():
    """The closure-shipping contract: by_value() must accept the helper
    (no repo-global references) and the wrapper must compute the same
    result."""
    dec = by_value(decode_list_matrix)
    col = _col([[1.0, 2.0], None])
    a = dec(col, 2)
    b = decode_list_matrix(col, 2)
    assert a[0].tolist() == b[0].tolist()
    assert a[1].tolist() == b[1].tolist()
    assert a[2].tolist() == b[2].tolist()
