"""End-to-end corpus preparation: composition contract at sf0.001."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_w_inverted_index_spark.pipelines import (
    CorpusConfig,
    prepare_training_corpus,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.fixture(scope="module")
def out(docs):
    return prepare_training_corpus(docs)


def test_stages_are_monotone_filters(docs, out):
    n_in = docs.count()
    n_corpus = out["corpus"].count()
    assert 0 < n_corpus <= n_in


def test_splits_partition_the_corpus(out):
    n = out["corpus"].count()
    parts = [out[k].count() for k in ("train", "val", "test")]
    assert sum(parts) == n
    train_ids = {r["doc_id"] for r in out["train"].collect()}
    val_ids = {r["doc_id"] for r in out["val"].collect()}
    assert not (train_ids & val_ids)
    assert parts[0] > parts[1]  # ~80/10/10


def test_corpus_is_deduped_and_gated(out):
    c = out["corpus"]
    assert c.count() == c.select("text").distinct().count()
    cfg = CorpusConfig()
    bad = c.where(
        (F.col("n_tokens_ws") < cfg.min_tokens)
        | (F.col("dup_3gram_frac") > cfg.max_dup_3gram_frac)
    ).count()
    assert bad == 0


def test_packs_cover_exactly_the_train_split(out):
    packed_ids = sorted(r["doc_id"] for r in out["packs"].collect())
    train_ids = sorted(r["doc_id"] for r in out["train"].collect())
    assert packed_ids == train_ids
    cfg = CorpusConfig()
    per_pack = (
        out["packs"]
        .groupBy("pack_id")
        .agg(
            F.sum("n_tokens").alias("tot"),
            F.max(F.col("oversize").cast("int")).alias("ov"),
        )
        .collect()
    )
    for r in per_pack:
        if not r["ov"]:
            assert r["tot"] <= cfg.pack_budget


def test_pipeline_is_reproducible(docs):
    a = prepare_training_corpus(docs)
    b = prepare_training_corpus(docs.repartition(7))
    for k in ("train", "val", "test"):
        assert sorted(r["doc_id"] for r in a[k].collect()) == sorted(
            r["doc_id"] for r in b[k].collect()
        )


def test_near_dedup_collapses_variant_docs(spark):
    """near_dedup=True: near-identical variants (one word changed)
    collapse onto the min-id canonical; distinct docs all survive."""
    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the fence and the birds sing in the tall trees "
        "near the old stone bridge by the quiet river every single day"
    )
    rows = [
        (1, base, "en"),
        (2, base.replace("jumps", "leaps"), "en"),   # near-dup of 1
        (3, base.replace("quick", "swift"), "en"),   # near-dup of 1
        (4, "completely different text about spark shuffles and "
            "partition pruning in distributed query engines today", "en"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    cfg = CorpusConfig(near_dedup=True)
    kept = {
        r["doc_id"]
        for r in prepare_training_corpus(docs, cfg)["corpus"].collect()
    }
    without = {
        r["doc_id"]
        for r in prepare_training_corpus(docs)["corpus"].collect()
    }
    assert without == {1, 2, 3, 4}  # exact dedup alone keeps variants
    assert kept == {1, 4}           # clusters collapse 2,3 onto 1


def test_chunked_pipeline_packs_chunks(docs):
    """chunk_window set ⇒ the packer works over context-window units:
    every pack member is a chunk ≤ window tokens, chunks reconstruct
    exactly the train docs' token streams, and chunk_uids are unique."""
    cfg = CorpusConfig(chunk_window=32, chunk_stride=32)
    out = prepare_training_corpus(docs, cfg)
    chunks = out["chunks"]
    packs = out["packs"]

    n_chunks = chunks.count()
    assert n_chunks > out["train"].count()  # long docs split
    assert chunks.where(F.col("n_tokens") > 32).count() == 0
    assert (
        chunks.select("chunk_uid").distinct().count() == n_chunks
    )

    # packs cover exactly the chunk set, each within budget
    assert packs.count() == n_chunks
    over = (
        packs.where(~F.col("oversize"))
        .groupBy("pack_id")
        .agg(F.sum("n_tokens").alias("t"))
        .where(F.col("t") > cfg.pack_budget)
        .count()
    )
    assert over == 0

    # token-stream reconstruction: non-overlapping chunks concatenate
    # back to the doc's token stream
    from polars_w_inverted_index_spark.functions.text import tokens

    rebuilt = (
        chunks.groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.array_sort(
                    F.collect_list(F.struct("chunk_idx", "chunk_text"))
                ).getField("chunk_text"),
            ).alias("rebuilt")
        )
    )
    joined = out["train"].join(rebuilt, "doc_id")
    mismatch = joined.where(
        F.array_join(tokens("text"), " ") != F.col("rebuilt")
    ).count()
    assert mismatch == 0


def test_span_scrub_stage_removes_shared_passage(spark):
    """span_scrub_k wired into the composition: the verbatim passage
    embedded in several otherwise-distinct docs is gone from the
    corpus, the docs themselves survive (they are NOT near-dups as a
    whole), and the stage runs before PII scrubbing so redaction
    placeholders can't register as hot windows."""
    passage = (
        "all rights reserved redistribution of this material requires "
        "prior written permission from the original publisher"
    )
    rows = []
    for i in range(6):
        uniq = " ".join(f"body{i}w{j}" for j in range(30))
        rows.append((i, f"{uniq} {passage}", "en"))
    for i in range(6, 12):
        rows.append(
            (i, " ".join(f"solo{i}w{j}" for j in range(40)), "en")
        )
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    cfg = CorpusConfig(span_scrub_k=8, min_tokens=3)
    out = prepare_training_corpus(docs, cfg)
    corpus = out["corpus"].collect()
    assert len(corpus) == 12  # no document dropped — only spans
    for r in corpus:
        assert "redistribution" not in r["text"]
    removed = {r["doc_id"]: r["n_removed_tokens"] for r in corpus}
    assert all(removed[i] >= 15 for i in range(6))
    assert all(removed[i] == 0 for i in range(6, 12))
