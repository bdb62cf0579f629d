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
    "similarity_bruteforce_topk_gemm",
    "dedup_embedding_cosine_pairs",  # GEMM-per-bucket applyInPandas
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
                       "FlatMapGroupsInPandas")
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
