"""Deterministic sampling, training shuffle, and PII scrubbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_w_inverted_index_spark.functions.scrub import (
    scrub_documents,
    scrub_text,
)
from polars_w_inverted_index_spark.operators.sampling import (
    mixture_sample,
    stratified_sample,
    training_shuffle,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# Stratified sampling
# ---------------------------------------------------------------------------


def test_stratified_fractions_realized(spark, docs):
    fracs = {"en": 0.5, "de": 0.1}
    out = stratified_sample(docs, "lang", fracs).collect()
    langs = {r["lang"] for r in out}
    assert langs <= set(fracs)  # unlisted strata dropped
    totals = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    got = {k: 0 for k in fracs}
    for r in out:
        got[r["lang"]] += 1
    for k, f in fracs.items():
        if totals.get(k, 0) >= 50:
            assert got[k] / totals[k] == pytest.approx(f, abs=0.15)


def test_stratified_deterministic_and_stratum_independent(spark, docs):
    a = stratified_sample(docs, "lang", {"en": 0.3}, seed=7)
    b = stratified_sample(docs, "lang", {"en": 0.3}, seed=7)
    assert sorted(r["doc_id"] for r in a.collect()) == sorted(
        r["doc_id"] for r in b.collect()
    )
    # different seed → different membership
    c = stratified_sample(docs, "lang", {"en": 0.3}, seed=8)
    assert sorted(r["doc_id"] for r in c.collect()) != sorted(
        r["doc_id"] for r in a.collect()
    )
    # membership is a function of doc_id only: relabelling strata keeps
    # the same kept-ids for the same fraction
    relabelled = docs.withColumn("lang2", F.lit("en"))
    d = stratified_sample(relabelled, "lang2", {"en": 0.3}, seed=7)
    kept_all = {r["doc_id"] for r in d.collect()}
    assert {r["doc_id"] for r in a.collect()} <= kept_all


def test_stratified_rejects_bad_fraction(spark, docs):
    with pytest.raises(ValueError, match="fraction"):
        stratified_sample(docs, "lang", {"en": 1.5})


# ---------------------------------------------------------------------------
# Training shuffle
# ---------------------------------------------------------------------------


def test_training_shuffle_is_a_deterministic_permutation(spark, docs):
    out = training_shuffle(docs, num_partitions=4)
    ids = [r["doc_id"] for r in out.collect()]
    assert sorted(ids) == sorted(r["doc_id"] for r in docs.collect())
    assert ids != sorted(ids)  # actually shuffled
    again = [
        r["doc_id"]
        for r in training_shuffle(docs, num_partitions=4).collect()
    ]
    assert ids == again
    other = [
        r["doc_id"]
        for r in training_shuffle(docs, seed=1, num_partitions=4).collect()
    ]
    assert ids != other


def test_training_shuffle_balanced_partitions(spark, docs):
    out = training_shuffle(docs, num_partitions=4)
    sizes = [
        r["n"]
        for r in out.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    n = docs.count()
    assert len(sizes) == 4
    assert max(sizes) < n / 4 * 1.5  # hash keys range-split evenly-ish


# ---------------------------------------------------------------------------
# Scrubbing
# ---------------------------------------------------------------------------


def test_scrub_text_patterns(spark):
    cases = [
        ("mail me at jo.doe+x@corp.example.org now", "<EMAIL>"),
        ("server 10.0.255.7 down", "<IP>"),
        ("card 4111 1111 1111 1111 ok", "<NUMBER>"),
        ("call +1 555 123 4567 today", "<PHONE>"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], "text string")
    rows = df.select(scrub_text("text").alias("s")).collect()
    for (orig, token), r in zip(cases, rows):
        assert token in r["s"], (orig, r["s"])
    # plain prose untouched
    [p] = (
        spark.createDataFrame([("just words, no identifiers.",)],
                              "text string")
        .select(scrub_text("text").alias("s"))
        .collect()
    )
    assert p["s"] == "just words, no identifiers."


def test_scrub_leaves_dates_and_ids_alone(spark):
    untouched = [
        "released on 2026-08-13 by us",
        "from 1914-1918 the war raged",
        "order 12345678 shipped",
        "pages 100-200 and 3.14159 appear",
    ]
    df = spark.createDataFrame([(t,) for t in untouched], "text string")
    for (orig,), r in zip(
        [(t,) for t in untouched],
        df.select(scrub_text("text").alias("s")).collect(),
    ):
        assert r["s"] == orig


def test_scrub_order_email_wins_over_phone(spark):
    [r] = (
        spark.createDataFrame([("reach +15551234567@relay.example.com",)],
                              "text string")
        .select(scrub_text("text").alias("s"))
        .collect()
    )
    assert "<EMAIL>" in r["s"] and "<PHONE>" not in r["s"]


def test_scrub_documents_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "a@b.co and c@d.org met at 10.1.1.1"),
            (2, "clean text"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in scrub_documents(df).collect()}
    assert rows[1]["n_email"] == 2
    assert rows[1]["n_ip"] == 1
    assert rows[1]["n_redactions"] == 3
    assert rows[2]["n_redactions"] == 0
    assert "<EMAIL>" in rows[1]["text"] and "a@b.co" not in rows[1]["text"]


def test_scrub_is_jvm_side(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = (
        scrub_documents(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# Mixture sampling
# ---------------------------------------------------------------------------


def _lang_counts(rows):
    out = {}
    for r in rows:
        out[r["lang"]] = out.get(r["lang"], 0) + 1
    return out


def test_mixture_sample_hits_target_shares(spark, docs):
    """50/50 target over a skewed corpus: the scarcer domain is kept
    whole and the abundant one downsampled to match."""
    avail = _lang_counts(docs.collect())
    a, b = sorted(avail, key=avail.get)[-1], sorted(avail, key=avail.get)[0]
    out = _lang_counts(
        mixture_sample(docs, "lang", {a: 1.0, b: 1.0}).collect()
    )
    assert set(out) == {a, b}
    assert out[b] == avail[b]  # scarce domain fully kept
    # abundant domain sampled down to ~the scarce count (hash threshold
    # is exact in expectation; allow sampling noise)
    assert abs(out[a] - avail[b]) / avail[b] < 0.25


def test_mixture_sample_temperature_flattens(spark, docs):
    """T→∞ pushes a 9:1 target toward uniform: the minority domain's
    realized share must grow with temperature."""
    avail = _lang_counts(docs.collect())
    a, b = sorted(avail, key=avail.get)[-1], sorted(avail, key=avail.get)[0]
    w = {a: 9.0, b: 1.0}

    def minority_share(t):
        got = _lang_counts(
            mixture_sample(docs, "lang", w, temperature=t).collect()
        )
        return got.get(b, 0) / max(1, sum(got.values()))

    assert minority_share(100.0) > minority_share(1.0)


def test_mixture_sample_is_downsampling_only(spark, docs):
    """Never duplicates rows, never exceeds per-domain availability, and
    drops unrequested domains."""
    avail = _lang_counts(docs.collect())
    langs = list(avail)
    out = mixture_sample(docs, "lang", {langs[0]: 3.0, "xx": 1.0})
    rows = out.collect()
    got = _lang_counts(rows)
    assert set(got) <= {langs[0]}
    assert got.get(langs[0], 0) <= avail[langs[0]]
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))


def test_mixture_sample_validates_inputs(spark, docs):
    with pytest.raises(ValueError, match="temperature"):
        mixture_sample(docs, "lang", {"en": 1.0}, temperature=0)
    with pytest.raises(ValueError, match="weight"):
        mixture_sample(docs, "lang", {"en": -1.0})
    with pytest.raises(ValueError, match="zero"):
        mixture_sample(docs, "lang", {"en": 0.0})


# -- curriculum ordering -----------------------------------------------------

def test_curriculum_stages_and_determinism(spark):
    from polars_w_inverted_index_spark.operators.sampling import (
        curriculum_order,
    )

    rows = [(i, float(i % 100)) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    out = curriculum_order(df, "score", n_stages=4, num_partitions=4)
    got = out.collect()
    # stage boundaries are score quantiles: every stage-1 score <= every
    # stage-2 score, etc.
    by_stage = {}
    for r in got:
        by_stage.setdefault(r["stage"], []).append(r["score"])
    assert set(by_stage) == {1, 2, 3, 4}
    for s in (1, 2, 3):
        assert max(by_stage[s]) <= min(by_stage[s + 1])
    # roughly equal frequency (sketch accuracy 10k -> near-exact here;
    # ties on the 100 distinct scores move edges by up to one value
    # group = 10 rows)
    for s in by_stage:
        assert abs(len(by_stage[s]) - 250) <= 30, (s, len(by_stage[s]))
    # deterministic: same order on re-run
    again = curriculum_order(df, "score", n_stages=4, num_partitions=4)
    assert [r["doc_id"] for r in again.collect()] == [
        r["doc_id"] for r in got
    ]


def test_curriculum_descending_and_single_stage(spark):
    from polars_w_inverted_index_spark.operators.sampling import (
        curriculum_order,
        training_shuffle,
    )

    rows = [(i, float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    desc = curriculum_order(
        df, "score", n_stages=2, ascending_difficulty=False,
        num_partitions=2,
    ).collect()
    hi = [r for r in desc if r["stage"] == 1]
    lo = [r for r in desc if r["stage"] == 2]
    assert min(r["score"] for r in hi) >= max(r["score"] for r in lo)
    # n_stages=1 == training_shuffle order (plus the stage column)
    one = curriculum_order(df, "score", n_stages=1, num_partitions=2)
    shuf = training_shuffle(df, num_partitions=2)
    assert [r["doc_id"] for r in one.collect()] == [
        r["doc_id"] for r in shuf.collect()
    ]
