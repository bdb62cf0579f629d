"""Sequence packing + intra-document repetition signals."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_w_inverted_index_spark.functions.text import (
    dup_ngram_frac,
    repetition_profile,
    top_ngram_frac,
    word_ngrams,
)
from polars_w_inverted_index_spark.operators.packing import (
    pack_documents,
    pack_stats,
)

# ---------------------------------------------------------------------------
# Repetition signals
# ---------------------------------------------------------------------------


def test_word_ngrams_preserve_duplicates_and_order(spark):
    df = spark.createDataFrame([("a b a b a",)], "text string")
    [row] = df.select(word_ngrams("text", 2).alias("g")).collect()
    assert row["g"] == ["a b", "b a", "a b", "b a"]
    # shorter-than-k doc: whole text is the single n-gram
    [short] = (
        spark.createDataFrame([("hello",)], "text string")
        .select(word_ngrams("text", 3).alias("g"))
        .collect()
    )
    assert short["g"] == ["hello"]


@pytest.mark.parametrize(
    "text,k,want",
    [
        ("a b a b a", 2, 0.5),  # 4 bigrams, 2 distinct
        ("one two three four", 2, 0.0),  # all distinct
        ("x x x x x", 1, 0.8),  # 5 unigrams, 1 distinct
    ],
)
def test_dup_ngram_frac(spark, text, k, want):
    df = spark.createDataFrame([(text,)], "text string")
    [row] = df.select(dup_ngram_frac("text", k).alias("f")).collect()
    assert row["f"] == pytest.approx(want)


@pytest.mark.parametrize(
    "text,k,want",
    [
        ("a b a b a", 2, 0.5),  # "a b" covers 2 of 4 bigrams
        ("one two three four", 2, 1 / 3),  # every bigram unique
        ("x x x x x", 1, 1.0),
    ],
)
def test_top_ngram_frac(spark, text, k, want):
    df = spark.createDataFrame([(text,)], "text string")
    [row] = df.select(top_ngram_frac("text", k).alias("f")).collect()
    assert row["f"] == pytest.approx(want, abs=1e-6)


def test_repetition_profile_on_documents(spark, sf_dir):
    doc = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = doc.select("doc_id", *repetition_profile("text")).collect()
    assert len(out) == doc.count()
    for r in out:
        assert 0.0 <= r["dup_2gram_frac"] <= 1.0
        assert 0.0 <= r["dup_3gram_frac"] <= 1.0
        assert 0.0 < r["top_2gram_frac"] <= 1.0
    # the signal discriminates: a degenerate doc scores above the corpus max
    deg = spark.createDataFrame([("spam " * 50,)], "text string")
    [d] = deg.select(dup_ngram_frac("text", 2).alias("f")).collect()
    assert d["f"] > max(r["dup_2gram_frac"] for r in out)


def test_repetition_profile_df_equals_column_form(spark, sf_dir):
    from polars_w_inverted_index_spark.functions.text import (
        repetition_profile_df,
    )

    doc = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    a = sorted(
        map(tuple, doc.select("doc_id", *repetition_profile("text")).collect())
    )
    b = sorted(
        map(tuple, repetition_profile_df(doc).drop("text").collect())
    )
    assert a == b


def test_repetition_is_jvm_side(spark):
    df = spark.createDataFrame([("a b c",)], "text string")
    plan = (
        df.select(*repetition_profile("text"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# Packing
# ---------------------------------------------------------------------------

BUDGET = 1000


@pytest.fixture(scope="module")
def doc_lengths(spark):
    # realistic mix: power-law-ish lengths, some oversize outliers
    return spark.range(2000).select(
        F.col("id").alias("doc_id"),
        (
            F.pmod(F.xxhash64("id"), F.lit(400)) + 20
            + F.when(F.pmod(F.col("id"), F.lit(211)) == 0, F.lit(2000))
            .otherwise(F.lit(0))
        ).alias("n_tokens"),
    )


def test_packing_partitions_the_corpus(spark, doc_lengths):
    packed = pack_documents(doc_lengths, "n_tokens", BUDGET, num_shards=8)
    rows = packed.collect()
    # every doc exactly once, token counts carried through
    assert sorted(r["doc_id"] for r in rows) == list(range(2000))
    want = {r["doc_id"]: r["n_tokens"] for r in doc_lengths.collect()}
    assert all(r["n_tokens"] == want[r["doc_id"]] for r in rows)
    # no non-oversize pack exceeds the budget; oversize packs are singletons
    from collections import defaultdict

    packs = defaultdict(list)
    for r in rows:
        packs[r["pack_id"]].append(r)
    for members in packs.values():
        if any(m["oversize"] for m in members):
            assert len(members) == 1
        else:
            assert sum(m["n_tokens"] for m in members) <= BUDGET


def test_packing_fill_rate_and_stats(spark, doc_lengths):
    packed = pack_documents(doc_lengths, "n_tokens", BUDGET, num_shards=8)
    [st] = pack_stats(packed, BUDGET).collect()
    n_oversize_docs = doc_lengths.where(
        F.col("n_tokens") > BUDGET
    ).count()
    assert st["n_oversize_packs"] == n_oversize_docs
    assert st["mean_fill"] >= 0.85  # BFD on a realistic mix packs tight
    # lower bound: can't beat ceil(total/budget) per-shard by much
    total = doc_lengths.where(F.col("n_tokens") <= BUDGET).agg(
        F.sum("n_tokens")
    ).collect()[0][0]
    assert st["n_packs"] - n_oversize_docs >= total // BUDGET


def test_packing_is_deterministic(spark, doc_lengths):
    a = pack_documents(doc_lengths, "n_tokens", BUDGET, num_shards=8)
    b = pack_documents(
        doc_lengths.orderBy(F.rand(7)), "n_tokens", BUDGET, num_shards=8
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_bfd_assign_properties():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from polars_w_inverted_index_spark.operators.packing import bfd_assign

    @settings(max_examples=300, deadline=None)
    @given(
        tcs=st.lists(st.integers(1, 3000), max_size=200),
        budget=st.integers(1, 2048),
    )
    def check(tcs, budget):
        tcs = sorted(tcs, reverse=True)  # BFD contract: decreasing input
        assign, oversize = bfd_assign(tcs, budget)
        assert len(assign) == len(oversize) == len(tcs)
        fill: dict[int, int] = {}
        for tc, a, ov in zip(tcs, assign, oversize):
            assert ov == (tc > budget)
            fill[a] = fill.get(a, 0) + tc
            if ov:
                assert fill[a] == tc  # oversize bins are singletons
        for a, tot in fill.items():
            members = [t for t, x in zip(tcs, assign) if x == a]
            if not any(
                ov for x, ov in zip(assign, oversize) if x == a
            ):
                assert tot <= budget, (members, budget)
        # bin ids are dense 0..n-1
        assert set(fill) == set(range(len(fill)))
        # pigeonhole lower bound: can't use fewer regular bins than
        # ceil(total_regular_tokens / budget)
        non_over = sum(t for t, ov in zip(tcs, oversize) if not ov)
        n_regular = len(fill) - sum(oversize)
        assert n_regular >= -(-non_over // budget)

    check()


def test_packing_null_and_nonpositive_dropped(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 0), (4, -5)],
        "doc_id long, n_tokens long",
    )
    rows = pack_documents(df, "n_tokens", 100, num_shards=2).collect()
    assert [r["doc_id"] for r in rows] == [1]


# ---------------------------------------------------------------------------
# Unigram surprisal (perplexity proxy)
# ---------------------------------------------------------------------------


def test_unigram_surprisal_orders_common_vs_rare(spark):
    from polars_w_inverted_index_spark.functions.text import (
        unigram_surprisal_df,
    )

    rows = [
        (1, "the the the the the the the the"),      # one very common token
        (2, "the cat sat on the mat yesterday"),     # mixed
        (3, "zyx qwv plk mnb vcx asd"),              # all-rare tokens
        (4, ""),                                     # no tokens → no row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r for r in unigram_surprisal_df(df).collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[1]["n_tokens"] == 8
    # repetitive doc has the LOWEST surprisal, rare-token doc the highest
    s = {k: v["mean_surprisal_bits"] for k, v in got.items()}
    assert s[1] < s[2] < s[3]
    # determinism
    again = {
        r["doc_id"]: r["mean_surprisal_bits"]
        for r in unigram_surprisal_df(df).collect()
    }
    assert again == s


def test_unigram_surprisal_matches_hand_computation(spark):
    import math

    from polars_w_inverted_index_spark.functions.text import (
        unigram_surprisal_df,
    )

    # corpus: tokens a a a b  → p(a)=3/4, p(b)=1/4
    df = spark.createDataFrame(
        [(1, "a a a"), (2, "b")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["mean_surprisal_bits"]
        for r in unigram_surprisal_df(df).collect()
    }
    assert got[1] == pytest.approx(-math.log2(3 / 4), abs=1e-5)
    assert got[2] == pytest.approx(-math.log2(1 / 4), abs=1e-5)


def test_unigram_surprisal_external_lm_smoothed(spark):
    from polars_w_inverted_index_spark.functions.text import (
        unigram_lm,
        unigram_surprisal_df,
    )

    reference = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the dog ran to the park")],
        "doc_id long, text string",
    )
    lm = unigram_lm(reference)
    batch = spark.createDataFrame(
        [
            (10, "the cat ran"),          # all in-vocabulary
            (11, "zyx qwv plk"),          # fully out-of-vocabulary
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in unigram_surprisal_df(batch, lm=lm).collect()
    }
    assert got[10]["n_tokens"] == 3 and got[11]["n_tokens"] == 3
    # OOV text scores strictly higher, and finite (Laplace smoothing)
    s10 = got[10]["mean_surprisal_bits"]
    s11 = got[11]["mean_surprisal_bits"]
    assert s10 < s11 < 100.0
    import math

    # hand-check the smoothed unseen probability: p = 1/(total + V + 1)
    total, v = 12, 9
    assert s11 == pytest.approx(-math.log2(1 / (total + v + 1)), abs=1e-4)


def test_materialize_packs_deterministic_and_complete(spark):
    from polars_w_inverted_index_spark.functions.text import token_count
    from polars_w_inverted_index_spark.operators.packing import (
        materialize_packs,
        pack_documents,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    meta = docs.select("doc_id", token_count("text").alias("tc"))
    packed = pack_documents(meta, "tc", 512, num_shards=4)
    shards = materialize_packs(docs, packed)
    rows = {r["pack_id"]: r for r in shards.collect()}
    # complete: every input doc's text appears exactly once overall
    assert sum(r["n_docs"] for r in rows.values()) == docs.count()
    total_tok = sum(r["n_tokens"] for r in rows.values())
    assert total_tok == meta.agg({"tc": "sum"}).collect()[0][0]
    # deterministic byte-for-byte across re-runs
    again = {
        r["pack_id"]: r["text"]
        for r in materialize_packs(docs, packed).collect()
    }
    assert {k: v["text"] for k, v in rows.items()} == again
    # separator joins the right number of pieces
    any_multi = next(r for r in rows.values() if r["n_docs"] > 1)
    assert any_multi["text"].count("\n\n") >= any_multi["n_docs"] - 1


def test_fingerprint_long_document_near_linear(spark):
    """r7 regression gate: fingerprint() must stay near-linear in
    document length.  The positional substring(text, i, n) form was
    O(chars²) (UTF-8 substr seeks from the string start) — a single
    200k-char document took ~50 s; the char-split + shifted-zip form is
    linear.  Values are pinned against the positional DuckDB twin by the
    driver's text_fingerprint oracle row; this test guards the cost
    shape only."""
    import time

    from pyspark.sql import functions as F

    from polars_w_inverted_index_spark.functions.text import fingerprint

    def run(n_tokens):
        words = " ".join(f"w{i % 997}x{i % 31}" for i in range(n_tokens))
        df = spark.createDataFrame([(1, words)], "doc_id long, text string")
        t0 = time.perf_counter()
        df.select(fingerprint("text").alias("fp")).collect()
        return time.perf_counter() - t0

    run(1_000)  # warm codegen
    t_small = run(10_000)
    t_big = run(80_000)
    # 8× the chars: generous constant allowance; the quadratic form was
    # >30× here and ~minutes at the 80k size
    assert t_big < 10 * max(t_small, 0.5), (t_small, t_big)
