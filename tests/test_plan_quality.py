"""Plan-quality gates: the physical plans stay the plans we designed.

Correctness is the oracle suite's job; these tests pin the SCALE.md
properties — no accidental Python eval nodes, pushdown reaching the scan,
broadcast on star dims — so a future edit that silently degrades a plan
fails CI, not a 100 TB run.
"""

from __future__ import annotations

import pytest

from polars_w_inverted_index_spark.registry import QUERIES

# Queries whose plans intentionally contain Python (Arrow-batched
# mapInPandas operators — the documented exceptions).
PYTHON_OK = {
    "multimodal_image_features",
    "multimodal_resize",
    "multimodal_frame_sample",
    "dedup_embedding_cosine_pairs",  # GEMM-per-bucket applyInPandas
    "similarity_pq_rerank_topk",  # PQ encode + ADC scan (mapInPandas)
    "similarity_lsh_topk",  # r11 GEMM signature pass (mapInArrow)
    "similarity_ivf_topk",  # r11 GEMM cell assignment (mapInArrow)
    "similarity_ann_auto_topk",  # r11 auto-dispatch float serve (GEMM)
}


def _plan(df) -> str:
    # executedPlan triggers planning only, not execution
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_python_in_jvm_plans(spark, sf_dir, name):
    plan = _plan(QUERIES[name](spark, sf_dir))
    python_nodes = [
        marker
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                       "MapInArrow", "FlatMapGroupsInPandas")
        if marker in plan
    ]
    if name in PYTHON_OK:
        assert python_nodes, f"{name} expected a pandas node"
    else:
        assert not python_nodes, f"{name} plan fell off the JVM: {python_nodes}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_outputs_driver_canonicalizable(spark, sf_dir, name):
    """Every registered query must emit scalar columns only: the driver's
    correctness canonicalizer sorts/factorizes results with pandas, which
    cannot hash list/struct/binary cells (the round-1 failure mode that
    err'd 7 queries).  Arrays are rendered via functions/canon.csv_array
    at the registry layer — this gate keeps it that way."""
    df = QUERIES[name](spark, sf_dir)
    offenders = [
        (f.name, f.dataType.simpleString())
        for f in df.schema.fields
        if f.dataType.simpleString().startswith(
            ("array", "map", "struct", "binary")
        )
    ]
    assert not offenders, offenders


def test_gemm_twin_plan_is_arrow_batched(spark, sf_dir):
    """The GEMM top-k twin was rotated out of the 50-row driver registry
    (round 6) but stays a supported engine path: its plan must keep the
    single Arrow-batched MapInPandas node (never row-at-a-time Python),
    and its values stay pinned to the expression path in
    tests/test_dedup_similarity.py::test_gemm_topk_matches_expression_path."""
    from polars_w_inverted_index_spark.registry_ext import q_ann_gemm

    plan = _plan(q_ann_gemm(spark, sf_dir))
    # r10: MapInArrow (the pandas bridge's per-row vector objects cost
    # ~2 s per million corpus rows)
    assert "MapInArrow" in plan
    assert "BatchEvalPython" not in plan


def test_id_set_filter_reaches_scan(spark, sf_dir):
    plan = _plan(QUERIES["field_values_by_doc_ids"](spark, sf_dir))
    assert "PushedFilters: [In(l_orderkey" in plan  # row-group prunable
    assert "ReadSchema: struct<l_orderkey:bigint,l_linestatus:string>" in plan


def test_column_pruning_on_stats(spark, sf_dir):
    plan = _plan(QUERIES["numeric_stats"](spark, sf_dir))
    # 1 of 11 lineitem columns read
    assert "ReadSchema: struct<l_extendedprice:double>" in plan


def test_star_join_broadcasts_dims(spark, sf_dir):
    plan = _plan(QUERIES["sql_region_revenue"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3  # customer, nation, region


def test_postings_aggregates_partially_mapside(spark, sf_dir):
    plan = _plan(QUERIES["field_values"](spark, sf_dir))
    assert "partial_collect_list" in plan  # map-side combine before shuffle


def test_chunked_postings_no_forced_broadcast(spark, sf_dir):
    """postings_chunked must not statically broadcast its per-value counts
    frame: on a high-cardinality field (near-unique per row, like
    l_extendedprice here) it is corpus-sized and a forced broadcast OOMs
    at scale.
    AQE may still choose broadcast at runtime from measured sizes — the
    gate is on the *logical* plan carrying no broadcast hint."""
    from polars_w_inverted_index_spark.operators.inverted_index import (
        postings_chunked,
    )
    from polars_w_inverted_index_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    out = postings_chunked(li, "l_extendedprice", doc_id_col="l_orderkey")
    logical = out._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in logical
    assert "broadcast" not in logical.lower()


def test_ext_operator_plan_shapes(spark, sf_dir):
    """The extension operators keep their designed shuffle inventory
    (SCALE.md): packing = exactly one exchange (the shard repartition);
    scrub = narrow (zero exchanges); training shuffle = one range
    exchange; stratified sample = narrow."""
    from pyspark.sql import functions as F

    from polars_w_inverted_index_spark.functions.scrub import (
        scrub_documents,
    )
    from polars_w_inverted_index_spark.functions.text import token_count
    from polars_w_inverted_index_spark.operators.packing import (
        pack_documents,
    )
    from polars_w_inverted_index_spark.operators.sampling import (
        stratified_sample,
        training_shuffle,
    )

    doc = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def n_exchanges(df):
        return _plan(df).count("Exchange")

    assert n_exchanges(scrub_documents(doc)) == 0
    assert n_exchanges(stratified_sample(doc, "lang", {"en": 0.5})) == 0
    meta = doc.select("doc_id", token_count("text").alias("tc"))
    assert n_exchanges(pack_documents(meta, "tc", 2048, num_shards=8)) == 1
    assert n_exchanges(training_shuffle(doc, num_partitions=8)) == 1


def test_new_ext_operator_plan_shapes(spark, sf_dir):
    """Round-4 operators keep their designed shuffle inventory:
    mixture_sample's OUTPUT plan is narrow (the count agg happens at
    planning time; membership is the same hash-threshold filter as
    stratified_sample); unigram surprisal = LM groupBy + token⋈LM join +
    per-doc groupBy, with the 1-row normalizer entering as a broadcast,
    never a shuffled join."""
    from polars_w_inverted_index_spark.functions.text import (
        unigram_surprisal_df,
    )
    from polars_w_inverted_index_spark.operators.sampling import (
        mixture_sample,
    )

    doc = spark.read.parquet(f"{sf_dir}/documents.parquet")

    mix = mixture_sample(doc, "lang", {"en": 1.0, "de": 1.0})
    assert _plan(mix).count("Exchange") == 0

    sup = unigram_surprisal_df(doc)
    plan = _plan(sup)
    assert "BroadcastExchange" in plan  # the 1-row normalizer
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_simhash_pairs_plan_is_equi_join(spark, sf_dir):
    from polars_w_inverted_index_spark.operators.dedup import simhash_pairs

    doc = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(simhash_pairs(doc))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Cartesian" not in plan


def test_cross_corpus_pairs_plans_are_equi_joins(spark, sf_dir):
    from polars_w_inverted_index_spark.operators.dedup import (
        embedding_cosine_pairs_against,
        ngram_jaccard_pairs_against,
    )

    doc = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch = doc.limit(5)
    plan = _plan(ngram_jaccard_pairs_against(doc, batch, threshold=0.1))
    assert "BroadcastNestedLoopJoin" not in plan and "Cartesian" not in plan
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    eb = emb.limit(5)
    plan = _plan(embedding_cosine_pairs_against(emb, eb, threshold=0.2))
    assert "BroadcastNestedLoopJoin" not in plan and "Cartesian" not in plan


def test_round4_operator_plan_shapes(spark, sf_dir, tmp_path):
    """Round-4 operators keep their designed shapes: ann_search's only
    join is the probe⋈cells equi-join (no nested loop / cartesian — the
    query×centroid cross join IS broadcast by construction and bounded
    by n_centroids); curriculum_order's output plan is one range
    exchange (threshold agg happens at planning time); heavy_hitters
    plans TakeOrdered, never a global Sort+Exchange chain on data rows;
    random_projection is a pure narrow map."""
    from pyspark.sql import functions as F

    from polars_w_inverted_index_spark.functions.vectors import (
        random_projection,
    )
    from polars_w_inverted_index_spark.operators.ann_index import (
        ann_search,
        build_ann_index,
    )
    from polars_w_inverted_index_spark.operators.sampling import (
        curriculum_order,
    )
    from polars_w_inverted_index_spark.operators.sketches import (
        heavy_hitters,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    doc = spark.read.parquet(f"{sf_dir}/documents.parquet")

    root = str(tmp_path / "ann_plan")
    build_ann_index(emb, root, n_centroids=4, n_iters=0)
    served = ann_search(
        spark, root, emb.where(F.col("vec_id") < 3), k=3, nprobe=2
    )
    plan = _plan(served)
    assert "CartesianProduct" not in plan
    # r9 serve shape: ONE Arrow GEMM pass over the partition-pruned
    # cells (no probe⋈cells join at all — the query set ships in the
    # closure), then the global top-k window.  Banned: any join, any
    # interpreted per-pair scoring; required: the partition filter
    # proving the cells read pruned to the probed cells.
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" not in plan, plan
    # r10: MapInArrow — the pandas bridge's per-row vector objects
    # measured ~2 s per million probed rows
    assert "MapInArrow" in plan
    # r14 serve pruning: the manifest resolve hands the scan the probed
    # cells' LIVE directories as explicit paths (static pruning at
    # listing time — stronger than a partition filter, which still
    # lists the whole tree).  One query at nprobe=1 must scan exactly
    # one cell directory.
    one = ann_search(
        spark, root, emb.where(F.col("vec_id") == 0), k=3, nprobe=1
    )
    oplan = _plan(one)
    assert "InMemoryFileIndex(1 paths)" in oplan, oplan

    cur = curriculum_order(
        doc.select("doc_id", "n_chars"), "n_chars", n_stages=3
    )
    cplan = _plan(cur)
    assert cplan.count("Exchange rangepartitioning") == 1
    assert "ntile" not in cplan  # the single-task window shape is banned

    hh = heavy_hitters(doc, "lang", k=5)
    hplan = _plan(hh)
    assert "TakeOrderedAndProject" in hplan

    rp = doc.join(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id"
    ).select(random_projection("embedding", 64, 4).alias("p"))
    # projection itself adds no exchange beyond the join's
    rplan = _plan(emb.select(random_projection("embedding", 64, 4)))
    assert "Exchange" not in rplan


def test_corpus_divergence_plan_has_no_sort_merge_join(spark, sf_dir):
    """r11 VERDICT Missing #5: corpus_divergence carried the repo's
    only SortMergeJoins — the union-vocabulary FULL OUTER join can
    never broadcast, and the joined frame is planned twice (normalizer
    + divergence aggregate), so the r11 plan sorted both LM tables
    twice.  The r12 form aligns the vocabularies with a UNION + one
    map-side-combined hash aggregate: no join on the vocab path at all;
    the only remaining join is the documented 1-row broadcast
    normalizer (BroadcastNestedLoopJoin over a single-row aggregate)."""
    from polars_w_inverted_index_spark.functions.text import (
        corpus_divergence,
        unigram_lm,
    )

    doc = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lm_a = unigram_lm(doc.where("doc_id % 2 = 0"))
    lm_b = unigram_lm(doc.where("doc_id % 2 = 1"))
    plan = _plan(corpus_divergence(lm_a, lm_b))
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan
    # the vocab alignment must be an aggregate, not any join flavor:
    # the single allowed join is the 1-row normalizer broadcast
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "HashAggregate" in plan
