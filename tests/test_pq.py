"""Product-quantization ANN: train/encode invariants, the
full-coverage-rerank == brute-force oracle, and recall gates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_w_inverted_index_spark.operators import pq as PQ
from polars_w_inverted_index_spark.operators import similarity as SIM
from polars_w_inverted_index_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings")


@pytest.fixture(scope="module")
def cb(emb):
    return PQ.pq_train(emb, m_subspaces=8, n_codes=16, n_iters=4)


def test_train_deterministic_and_shaped(emb, cb):
    assert cb.m_subspaces == 8 and cb.n_codes == 16 and cb.n_dims == 64
    again = PQ.pq_train(emb, m_subspaces=8, n_codes=16, n_iters=4)
    assert again == cb  # lowest-id seed + Lloyd: no RNG anywhere


def test_encode_invariants(spark, emb, cb):
    import math

    enc = PQ.pq_encode(emb, cb)
    rows = enc.collect()
    n = emb.count()
    assert len(rows) == n
    by_id = {
        r["vec_id"]: r["embedding"]
        for r in emb.select("vec_id", "embedding").collect()
    }
    for r in rows:
        assert len(r["codes"]) == 8
        assert all(0 <= c < 16 for c in r["codes"])
        want = math.sqrt(sum(x * x for x in by_id[r["vec_id"]][:64]))
        assert abs(r["vnorm"] - want) < 1e-9  # exact norm, not quantized


def test_full_coverage_rerank_equals_brute_force(spark, emb, cb):
    """With k*rerank_factor >= |corpus| the ADC recall stage proposes
    every row, so the exact re-rank must EQUAL brute force row-for-row
    (same cosine expression, same rounding, same tie-break)."""
    n = emb.count()
    q = emb.orderBy(F.col("vec_id")).limit(4)
    enc = PQ.pq_encode(emb, cb)
    want = sorted(
        map(tuple, SIM.brute_force_topk(emb, q, k=5).collect())
    )
    got = sorted(
        map(
            tuple,
            PQ.pq_topk_rerank(
                emb, enc, q, cb, k=5, rerank_factor=(n // 5) + 1
            ).collect(),
        )
    )
    assert got == want and len(got) == 4 * 5


def test_adc_recall_floor_and_rerank_improvement(spark, emb, cb):
    """Raw ADC top-k on random gaussian vectors (the PQ-adversarial
    case: no cluster structure) must still beat chance by a wide
    margin, and exact re-rank at a modest candidate width must recall
    at least as much as the raw ADC ranks."""
    q = emb.orderBy(F.col("vec_id")).limit(8)
    enc = PQ.pq_encode(emb, cb)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.brute_force_topk(emb, q, k=5).collect()
    }
    raw = {
        (r["query_id"], r["neighbor_id"])
        for r in PQ.pq_topk(enc, q, cb, k=5).collect()
    }
    rer = {
        (r["query_id"], r["neighbor_id"])
        for r in PQ.pq_topk_rerank(
            emb, enc, q, cb, k=5, rerank_factor=8
        ).collect()
    }
    raw_recall = len(exact & raw) / len(exact)
    rer_recall = len(exact & rer) / len(exact)
    assert raw_recall >= RAW_FLOOR, (raw_recall, rer_recall)
    assert rer_recall >= max(raw_recall, RER_FLOOR), (
        raw_recall,
        rer_recall,
    )


# measured on the sf0.001 corpus (500 random gaussian vectors — the
# PQ-adversarial case; m=8, 16 codes): raw ADC recall@5 = 0.175,
# rerank@(factor 8) = 0.70.  Floors sit well below because testdata is
# REGENERATED between rounds (driver-quirk: embeddings are fresh
# randoms), so the deterministic pipeline still sees dataset drift.
RAW_FLOOR = 0.10
RER_FLOOR = 0.30


def test_zero_vector_scores_zero(spark):
    """Codebooks trained ON the frame make the in-sample vectors
    exactly reconstructable (a centroid sits on each seed subvector),
    so the identical pair scores ~1 while the zero-norm neighbor is
    pinned to exactly 0 by the vnorm==0 mask — never NaN/divide."""
    zero = spark.createDataFrame(
        [(0, [0.0] * 64), (1, [1.0] * 64), (2, [1.0] * 64)],
        "vec_id long, embedding array<double>",
    )
    tiny = PQ.pq_train(zero, m_subspaces=4, n_codes=2, n_iters=2)
    enc = PQ.pq_encode(zero, tiny)
    got = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in PQ.pq_topk(
            enc, zero.where("vec_id = 1"), tiny, k=2
        ).collect()
    }
    assert got[(1, 0)] == 0.0  # zero-norm neighbor scores exactly 0
    assert got[(1, 2)] > 0.99  # in-sample vector reconstructs exactly


def test_bounded_query_guard(spark, emb, cb):
    enc = PQ.pq_encode(emb, cb)
    with pytest.raises(ValueError, match="max_query_rows"):
        PQ.pq_topk(enc, emb, cb, k=2, max_query_rows=5)


def test_ragged_and_short_vectors_padded(spark, cb):
    """Encoding pads/truncates to n_dims exactly like the GEMM dedup
    path — a short vector's missing dims are zeros."""
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0] * 80)],
        "vec_id long, embedding array<double>",
    )
    rows = {r["vec_id"]: r for r in PQ.pq_encode(df, cb).collect()}
    import math

    assert abs(rows[0]["vnorm"] - math.sqrt(5.0)) < 1e-9
    assert abs(rows[1]["vnorm"] - 8.0) < 1e-9  # 64 ones, not 80
