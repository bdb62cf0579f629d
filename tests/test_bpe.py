"""BPE tokenizer induction (functions/bpe.py) vs an independent
pure-Python reference implementation (Sennrich et al. 2016 algorithm,
re-implemented here from the paper's pseudocode — counts overlapping
adjacent pairs on the word-frequency table, merges the (max count, then
lexicographically smallest) pair left-to-right each round)."""

from __future__ import annotations

import collections
import os

import pytest
from pyspark.sql import functions as F

from polars_w_inverted_index_spark.functions.bpe import (
    EOW,
    bpe_encode,
    bpe_train,
    bpe_vocab,
    word_counts,
)


def _ref_word_symbols(word: str) -> tuple[str, ...]:
    syms = list(word)
    syms[-1] = syms[-1] + EOW
    return tuple(syms)


def _ref_apply(syms: tuple[str, ...], a: str, b: str) -> tuple[str, ...]:
    out: list[str] = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return tuple(out)


def _ref_bpe_train(word_freq: dict[str, int], n_merges: int, min_freq: int = 2):
    vocab = {_ref_word_symbols(w): c for w, c in word_freq.items()}
    merges = []
    for _ in range(n_merges):
        counts: collections.Counter = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_freq:
            break
        a, b = best[0]
        merges.append((a, b))
        vocab = {
            _ref_apply(s, a, b): c for s, c in vocab.items()
        }
    return merges


CORPUS = [
    (0, "low lower lowest low low"),
    (1, "new newer newest new new newer"),
    (2, "wide wider widest wide"),
    (3, "low new wide low new"),
    (4, "the newest widest lowest the the"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_train_matches_reference(docs):
    wf = {
        r["word"]: r["wc"]
        for r in word_counts(docs).collect()
    }
    expected = _ref_bpe_train(wf, n_merges=20)
    got = bpe_train(docs, n_merges=20)
    assert got == expected
    assert len(got) > 5  # the corpus genuinely supports merges


def test_encode_roundtrip_and_consistency(docs):
    merges = bpe_train(docs, n_merges=15)
    enc = bpe_encode(docs, merges)
    rows = {r["doc_id"]: r for r in enc.collect()}
    for did, text in CORPUS:
        toks = rows[did]["bpe_tokens"]
        # concatenating tokens and stripping EOW reproduces the words
        joined = "".join(toks).replace(EOW, " ").strip()
        assert joined == " ".join(text.lower().split())
        assert rows[did]["n_bpe_tokens"] == len(toks)
        # every token is either a learned symbol, a single char, or a
        # char+EOW — nothing else can be produced
        vocab = set(bpe_vocab(merges))
        for t in toks:
            base = t[:-len(EOW)] if t.endswith(EOW) else t
            assert t in vocab or len(base) == 1


def test_encode_matches_training_fold(docs):
    """A word seen in training encodes to exactly the symbols the
    training fold left it with (lowest-rank-first replay equivalence)."""
    wf = {r["word"]: r["wc"] for r in word_counts(docs).collect()}
    merges = bpe_train(docs, n_merges=12)
    # replay training on the reference side
    vocab = {w: _ref_word_symbols(w) for w in wf}
    for a, b in merges:
        vocab = {w: _ref_apply(s, a, b) for w, s in vocab.items()}
    one_word_docs = docs.sparkSession.createDataFrame(
        [(i, w) for i, w in enumerate(sorted(wf))], "doc_id long, text string"
    )
    enc = {
        r["text"]: tuple(r["bpe_tokens"])
        for r in bpe_encode(one_word_docs, merges, id_col="doc_id")
        .join(one_word_docs, "doc_id")
        .select("text", "bpe_tokens")
        .collect()
    }
    for w, syms in vocab.items():
        assert enc[w] == syms, w


def test_distributed_path_matches_inmemory(docs):
    """max_driver_vocab=0 forces the distributed per-round loop; it must
    produce the exact merge list of the in-memory fast path (and of the
    independent reference) — the fast path is an optimization, never a
    semantic fork."""
    wf = {r["word"]: r["wc"] for r in word_counts(docs).collect()}
    expected = _ref_bpe_train(wf, n_merges=12)
    fast = bpe_train(docs, n_merges=12)  # in-memory path (small vocab)
    slow = bpe_train(docs, n_merges=12, max_driver_vocab=0)
    assert fast == expected
    assert slow == expected


def test_encode_preserves_id_type(spark, docs):
    """String document ids survive bpe_encode (the mapInPandas output
    schema derives the id type from the input, not a hardcoded long)."""
    merges = bpe_train(docs, n_merges=8)
    sdocs = docs.select(
        F.concat(F.lit("doc-"), F.col("doc_id")).alias("doc_id"), "text"
    )
    enc = bpe_encode(sdocs, merges)
    assert dict(enc.dtypes)["doc_id"] == "string"
    ids = sorted(r["doc_id"] for r in enc.collect())
    assert ids == sorted(r["doc_id"] for r in sdocs.collect())


def test_min_frequency_stop(docs):
    # an absurd min_frequency stops training immediately
    assert bpe_train(docs, n_merges=10, min_frequency=10_000) == []


def test_train_on_fixture_corpus(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    sample = docs.where(F.col("doc_id") < 60).select("doc_id", "text")
    merges = bpe_train(sample, n_merges=8)
    assert len(merges) == 8
    enc = bpe_encode(sample, merges)
    assert enc.where(F.col("n_bpe_tokens") <= 0).count() == 0
    # deterministic across runs
    assert bpe_train(sample, n_merges=8) == merges


def test_merge_artifact_roundtrip(spark, docs, tmp_path):
    from polars_w_inverted_index_spark.functions.bpe import (
        load_merges,
        save_merges,
    )

    merges = bpe_train(docs, n_merges=10)
    path = str(tmp_path / "merges")
    save_merges(spark, merges, path)
    assert load_merges(spark, path) == merges
