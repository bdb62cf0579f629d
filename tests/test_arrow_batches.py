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


def test_null_element_decodes_to_nan_and_norm_gt_zero_is_false():
    """The documented caller contract: a NULL element inside a list
    becomes NaN, and the mask callers must use (``norm > 0``) routes
    the row into the zero/otherwise branch — ``norm == 0`` would not."""
    col = _col([[1.0, None], [1.0, 2.0]])
    mat, live, lens = decode_list_matrix(col, 2)
    assert live.all() and lens.tolist() == [2, 2]
    assert np.isnan(mat[0, 1]) and mat[1].tolist() == [1.0, 2.0]
    norms = np.linalg.norm(mat, axis=1)
    assert not (norms[0] > 0)  # NaN fails the guard — the safe branch
    assert norms[0] != 0  # ...which `norm == 0` would NOT catch


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
