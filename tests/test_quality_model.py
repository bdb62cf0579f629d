"""Model-based quality filter (operators/quality_model.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_w_inverted_index_spark.operators.quality_model import (
    quality_filter,
    score_quality,
    train_quality_model,
    weak_quality_labels,
)

GOOD = [
    "the quick brown fox jumps over the lazy dog and then it sat down.",
    "a library is a collection of books that people can borrow and read.",
    "the weather was mild and the children walked to the park with food.",
    "she wrote a long letter to her friend about the trip and the city.",
    "he found that the results of the study were clear and easy to read.",
    "the engine reads data from the table and writes results to a file.",
]
BAD = [
    "xz9 qq#@! zzkl mmmm kxkx 0101 ...,,,;;;!!!",
    "aaaaaa bbbbbb cccccc dddddd eeeeee ffffff",
    "click here buy now $$$ win win win !!!",
    "qwdo wqkd qpwkd qkwpd kqwpd kwqpd",
    "#### //// @@@@ %%%% ^^^^ &&&&",
    "lorem94 xx.yy.zz 77a 88b 99c zz!!",
]


@pytest.fixture(scope="module")
def train_docs(spark):
    rows = [(i, t) for i, t in enumerate(GOOD + BAD)]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def model(train_docs):
    return train_quality_model(
        weak_quality_labels(train_docs), n_features=1 << 12, max_iter=20
    )


def test_weak_labels_match_heuristics(train_docs):
    labels = {
        r["doc_id"]: r["label"]
        for r in weak_quality_labels(train_docs).collect()
    }
    for i in range(len(GOOD)):
        assert labels[i] == 1.0, (i, GOOD[i])
    for i in range(len(GOOD), len(GOOD) + len(BAD)):
        assert labels[i] == 0.0, (i, BAD[i - len(GOOD)])


def test_weak_labels_do_not_clobber_caller_columns(spark):
    """A caller whose frame already carries '_qm_toks' must get it back
    untouched (ADVICE r7: the internal shared-tokenize column picks a
    collision-free name instead of overwriting and dropping)."""
    df = spark.createDataFrame(
        [(0, GOOD[0], "keep-me")],
        "doc_id long, text string, _qm_toks string",
    )
    out = weak_quality_labels(df)
    row = out.collect()[0]
    assert row["_qm_toks"] == "keep-me"
    assert row["label"] == 1.0


def test_scores_separate_good_from_bad(spark, model):
    held_out = spark.createDataFrame(
        [
            (100, "the cat sat on the mat and looked out at the rain."),
            (101, "people read books in the library and talk about them."),
            (200, "zzz qqq ### 000 ,,, !!! kkk www 999"),
            (201, "xoxo 4u2 b4 gr8 m8 !!!! $$$$ zzzz"),
        ],
        "doc_id long, text string",
    )
    scores = {
        r["doc_id"]: r["quality_score"]
        for r in score_quality(model, held_out).collect()
    }
    assert min(scores[100], scores[101]) > max(scores[200], scores[201])


def test_filter_keeps_schema_plus_score(spark, model, train_docs):
    kept = quality_filter(model, train_docs, threshold=0.5)
    assert kept.columns == ["doc_id", "text", "quality_score"]
    ids = {r["doc_id"] for r in kept.collect()}
    # the model must at least reproduce its training prior
    assert ids == set(range(len(GOOD)))


def test_scoring_is_narrow(model, spark, sf_dir):
    import os

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text")
    scored = score_quality(model, docs)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan  # pure per-row map, no shuffle
    row = scored.agg(
        F.min("quality_score").alias("lo"), F.max("quality_score").alias("hi")
    ).first()
    assert 0.0 <= row["lo"] <= row["hi"] <= 1.0


def test_pipeline_quality_model_stage(spark):
    """The opt-in learned gate composes in prepare_training_corpus:
    garbage rows are dropped, survivors carry quality_score, and the
    stage is monotone (corpus is a subset of the no-model corpus)."""
    from polars_w_inverted_index_spark.pipelines import (
        CorpusConfig,
        prepare_training_corpus,
    )

    rows = [(i, t, "en") for i, t in enumerate(GOOD * 3 + BAD * 3)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    base = prepare_training_corpus(docs, CorpusConfig(min_tokens=3))
    gated = prepare_training_corpus(
        docs, CorpusConfig(min_tokens=3, quality_model_threshold=0.5)
    )
    base_ids = {r["doc_id"] for r in base["corpus"].collect()}
    gated_rows = gated["corpus"].collect()
    gated_ids = {r["doc_id"] for r in gated_rows}
    assert gated_ids <= base_ids
    assert all(r["quality_score"] >= 0.5 for r in gated_rows)
    # the garbage block (ids where text is from BAD) is gone
    n_good = len(GOOD)
    bad_ids = {
        i for i, t, _ in rows if t in BAD
    }
    assert not (gated_ids & bad_ids)
