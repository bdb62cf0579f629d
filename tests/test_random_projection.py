"""Random-projection dim reduction (functions/vectors.random_projection).

JL property checked empirically: pairwise cosine similarities in the
projected space track the originals (rank correlation on real fixture
embeddings), projection is deterministic, and the projected vectors are
drop-in inputs for the existing ANN stack.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from polars_w_inverted_index_spark.functions.vectors import (
    cosine,
    random_projection,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _pairwise_cos(df, vec_col, n=30):
    a = df.where(F.col("vec_id") < n).select(
        F.col("vec_id").alias("ia"), F.col(vec_col).alias("va")
    )
    b = df.where(F.col("vec_id") < n).select(
        F.col("vec_id").alias("ib"), F.col(vec_col).alias("vb")
    )
    return {
        (r["ia"], r["ib"]): r["c"]
        for r in a.crossJoin(b)
        .where(F.col("ia") < F.col("ib"))
        .select("ia", "ib", cosine("va", "vb").alias("c"))
        .collect()
    }


def test_projection_error_follows_jl_scaling(emb):
    """The ±1 projection estimator of cosine has std ≈ 1/sqrt(k); pin
    (a) the measured mean absolute error under ~1.2/sqrt(k) at two
    widths and (b) the monotone improvement with k.  (A high rank-
    correlation bar would be wrong here: the fixture's pairwise cosines
    span only ±0.34, so at 64→16 the JL noise is comparable to the
    signal spread by design — reduction from 64 dims is honest lossy
    compression; the 768→64 regime is where ranks survive.)"""
    import statistics

    orig = _pairwise_cos(emb, "embedding")
    keys = sorted(orig)
    xs = [orig[k] for k in keys]
    maes = {}
    for k in (16, 32):
        proj = emb.select(
            "vec_id",
            random_projection("embedding", in_dims=64, out_dims=k).alias(
                "proj"
            ),
        )
        red = _pairwise_cos(proj, "proj")
        ys = [red[kk] for kk in keys]
        maes[k] = sum(abs(a - b) for a, b in zip(xs, ys)) / len(xs)
        assert maes[k] <= 1.2 / (k ** 0.5), (k, maes[k])
        assert statistics.correlation(xs, ys) > 0.4
    assert maes[32] < maes[16]


def test_projection_shape_and_determinism(emb):
    proj = emb.select(
        "vec_id",
        random_projection("embedding", 64, 8).alias("p"),
    )
    rows = proj.orderBy("vec_id").limit(5).collect()
    assert all(len(r["p"]) == 8 for r in rows)
    rows2 = proj.orderBy("vec_id").limit(5).collect()
    assert [r["p"] for r in rows] == [r["p"] for r in rows2]


def test_projected_ann_search_integration(spark, emb, tmp_path):
    """Projected vectors feed the materialized ANN index unchanged:
    full-probe index search over the projected table must EQUAL brute
    force over the same projected table (the integration contract; how
    faithfully the projected space itself preserves full-dim neighbors
    is the JL-scaling question pinned above and below, not the index's
    job)."""
    from polars_w_inverted_index_spark.operators.ann_index import (
        ann_search,
        build_ann_index,
    )
    from polars_w_inverted_index_spark.operators.similarity import (
        brute_force_topk,
    )

    proj = emb.select(
        "vec_id", random_projection("embedding", 64, 24).alias("embedding")
    )
    root = str(tmp_path / "ann_proj")
    build_ann_index(proj, root, n_centroids=4, n_iters=1)
    queries = proj.where(F.col("vec_id") % 100 == 0)
    served = ann_search(spark, root, queries, k=5, nprobe=4)
    exact = brute_force_topk(proj, queries, k=5)
    key = lambda df: sorted(  # noqa: E731
        (r["query_id"], r["neighbor_id"], r["cos_sim"], r["rank"])
        for r in df.collect()
    )
    assert key(served) == key(exact)


def test_projected_neighbors_beat_chance(emb):
    """Projected-space top-5 lands inside the full-dim top-20 far more
    often than chance (random baseline: 20/499 ≈ 4%; the fixture's
    near-uniform vectors put a low ceiling on this — measured ~60% at
    64→48 — so the bar is 30%)."""
    from polars_w_inverted_index_spark.operators.similarity import (
        brute_force_topk,
    )

    q_full = emb.where(F.col("vec_id") % 100 == 0)
    truth: dict = {}
    for r in brute_force_topk(emb, q_full, k=20).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    proj = emb.select(
        "vec_id", random_projection("embedding", 64, 48).alias("embedding")
    )
    got: dict = {}
    for r in brute_force_topk(
        proj, proj.where(F.col("vec_id") % 100 == 0), k=5
    ).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    containment = [
        len(got.get(q, set()) & ns) / 5 for q, ns in truth.items()
    ]
    assert sum(containment) / len(containment) >= 0.3
