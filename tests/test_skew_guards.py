"""Adversarial-skew proof for the pair generators' cost dials.

SCALE.md claims the dedup pair generators survive hot keys because their
dials bound every join bucket; this file PROVES it on a worst-case
fixture — one boilerplate sentence shared by 50% of the corpus (the
classic web-crawl template line) plus a single true near-dup pair:

- n-gram Jaccard: without the df-cut the hot shingles force the
  co-occurrence join to emit a quadratic candidate set (every pair of
  boilerplate docs); with ``max_shingle_freq`` below the hot df the
  discovered-pair set collapses to the true duplicates, while their
  Jaccard stays EXACT (denominators are computed before the cut);
- SimHash banding: candidate mass shrinks monotonically as band slices
  widen (more fingerprint bits per band), and the pigeonhole guarantee
  holds on the skewed corpus — banded pairs at ``max_hamming`` equal
  the brute-force Hamming pairs;
- line-level boilerplate removal: the 50%-df line is stripped from
  every doc by a df + anti-join plan (no per-line pair join exists to
  go quadratic in the first place).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_w_inverted_index_spark.functions.text import word_shingles
from polars_w_inverted_index_spark.operators import dedup as DD
from polars_w_inverted_index_spark.operators.line_dedup import (
    remove_boilerplate_lines,
)

BOILER = "subscribe to our newsletter for updates and exclusive offers today"
N_BOILER = 120  # docs carrying the boilerplate sentence
N_CLEAN = 60


@pytest.fixture(scope="module")
def skew_docs(spark):
    rows = []
    for i in range(N_BOILER):
        # unique filler + the shared template sentence
        filler = " ".join(f"w{i}x{j}" for j in range(12))
        rows.append((i, f"{filler}\n{BOILER}"))
    for i in range(N_BOILER, N_BOILER + N_CLEAN):
        rows.append((i, " ".join(f"u{i}y{j}" for j in range(15))))
    # one TRUE near-dup pair, sharing almost all content
    base = " ".join(f"dup{j}" for j in range(30))
    rows.append((9001, base + " tailone"))
    rows.append((9002, base + " tailtwo"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hot_shingle_is_actually_hot(skew_docs):
    """Fixture sanity: the boilerplate shingles reach df ≈ N_BOILER —
    the skew the dials must handle is really present."""
    df = (
        skew_docs.select(
            "doc_id", F.explode(word_shingles("text", 3)).alias("sh")
        )
        .groupBy("sh")
        .agg(F.count_distinct("doc_id").alias("df"))
        .agg(F.max("df").alias("m"))
        .first()
    )
    assert df["m"] >= N_BOILER


def test_jaccard_df_cut_bounds_candidate_set(skew_docs):
    """Without the cut the hot shingle emits a quadratic discovered-pair
    set; with the cut below the hot df, discovery collapses to the true
    duplicates — and their Jaccard value is IDENTICAL in both runs
    (the cut prunes discovery, never the denominator)."""
    # threshold=0 exposes every DISCOVERED pair — the join's raw output
    no_cut = DD.ngram_jaccard_pairs(
        skew_docs, threshold=0.0, max_shingle_freq=None
    )
    no_cut_pairs = no_cut.count()
    DD.release_intermediates(no_cut)
    assert no_cut_pairs >= N_BOILER * (N_BOILER - 1) // 2  # quadratic blowup

    cut = DD.ngram_jaccard_pairs(
        skew_docs, threshold=0.0, max_shingle_freq=20
    )
    cut_rows = cut.collect()
    DD.release_intermediates(cut)
    # every surviving discovery comes from a ≤20-df shingle: the hot
    # bucket is gone, output is the true pair only
    assert [(r["doc_a"], r["doc_b"]) for r in cut_rows] == [(9001, 9002)]

    # exactness despite the cut: same jaccard as the uncut run
    uncut_true = (
        DD.ngram_jaccard_pairs(skew_docs, threshold=0.5)
        .where((F.col("doc_a") == 9001) & (F.col("doc_b") == 9002))
        .first()
    )
    assert cut_rows[0]["jaccard"] == uncut_true["jaccard"]


def test_jaccard_df_cut_bounds_bucket_width(skew_docs):
    """The post-cut co-occurrence buckets obey the dial: recomputing the
    operator's own shingle frame, no shingle key joins more than
    ``max_shingle_freq`` docs — the per-bucket m² work is bounded by
    the dial, not by corpus skew."""
    max_freq = 20
    sh = skew_docs.select(
        "doc_id", F.explode(word_shingles("text", 3)).alias("sh")
    )
    df_tbl = sh.groupBy("sh").agg(F.count_distinct("doc_id").alias("df"))
    post_cut_max = (
        df_tbl.where(F.col("df") <= max_freq).agg(F.max("df")).first()[0]
    )
    assert post_cut_max <= max_freq
    # and the candidate mass (sum of m·(m-1)/2 per bucket) drops from
    # quadratic-in-N_BOILER to dial-bounded
    mass = df_tbl.select(
        F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("m")
    ).first()["m"]
    mass_cut = (
        df_tbl.where(F.col("df") <= max_freq)
        .select(F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("m"))
        .first()["m"]
    )
    assert mass >= N_BOILER * (N_BOILER - 1) / 2
    assert mass_cut < mass / 10


def test_simhash_band_width_is_the_cost_dial(skew_docs):
    """Candidate mass shrinks as band slices widen (same n_bands over
    more fingerprint bits), and the pigeonhole guarantee holds under
    skew: banded pairs == brute-force Hamming pairs."""

    def candidate_mass(bits: int, n_bands: int) -> float:
        sh = DD.simhash(skew_docs, bits=bits)
        w = bits // n_bands
        widths = [
            w + (1 if i < bits % n_bands else 0) for i in range(n_bands)
        ]
        offs = [sum(widths[:i]) for i in range(n_bands)]
        bands = sh.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("bi"),
                            F.shiftright("simhash", offs[i])
                            .bitwiseAND((1 << widths[i]) - 1)
                            .alias("bv"),
                        )
                        for i in range(n_bands)
                    ]
                )
            ).alias("b")
        ).select("b.bi", "b.bv")
        return (
            bands.groupBy("bi", "bv")
            .agg(F.count("*").alias("m"))
            .select(F.sum(F.col("m") * (F.col("m") - 1) / 2).alias("s"))
            .first()["s"]
        )

    narrow = candidate_mass(bits=12, n_bands=4)  # 3-bit slices: hot
    wide = candidate_mass(bits=60, n_bands=4)  # 15-bit slices
    assert wide < narrow  # widening the band slice shrinks the buckets

    # completeness under skew: banded candidates lose nothing vs brute
    # force at the pigeonhole setting
    got = sorted(
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in DD.simhash_pairs(
            skew_docs, n_bands=4, max_hamming=3
        ).collect()
    )
    sh = DD.simhash(skew_docs)
    a = sh.selectExpr("doc_id as doc_a", "simhash as ha")
    b = sh.selectExpr("doc_id as doc_b", "simhash as hb")
    brute = sorted(
        (r["doc_a"], r["doc_b"], r["h"])
        for r in a.crossJoin(b)
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("h"),
        )
        .where(F.col("h") <= 3)
        .collect()
    )
    assert got == brute


def test_boilerplate_line_stripped_at_50pct_df(skew_docs):
    """The 50%-df template line disappears from every carrier; unique
    lines survive byte-for-byte.  The plan is df + anti-join — there is
    no per-line pair join that could go quadratic on the hot line."""
    out = remove_boilerplate_lines(skew_docs, max_line_df=10)
    rows = {r["doc_id"]: r for r in out.collect()}
    for i in range(N_BOILER):
        assert BOILER not in rows[i]["text"]
        assert rows[i]["n_removed_lines"] == 1
        assert rows[i]["text"].startswith(f"w{i}x0 ")  # filler intact
    for i in range(N_BOILER, N_BOILER + N_CLEAN):
        assert rows[i]["n_removed_lines"] == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


# ---------------------------------------------------------------------------
# Incremental span scrub vs a standing corpus (VERDICT r5 task 6): the
# batch side broadcasts, the corpus-counts table is never reshuffled.
# ---------------------------------------------------------------------------

def _plan_depth(line: str) -> int:
    import re

    m = re.search(r"[+:]-", line)
    return m.start() if m else -1


def _ancestor_chain(lines: list[str], idx: int) -> list[str]:
    """Plan-tree ancestors of ``lines[idx]``: walk upward taking each
    line whose node marker sits strictly left of the current one."""
    chain = []
    d = _plan_depth(lines[idx])
    for j in range(idx - 1, -1, -1):
        dj = _plan_depth(lines[j])
        if dj < d:
            chain.append(lines[j])
            d = dj
            if dj <= 0:
                break
    return chain


def test_span_hot_window_count_is_skew_safe(spark):
    """r8: hot-window marking is count(*) over (partition by sh) —
    WindowExec buffers one sh group at a time in a spillable array, so
    a mega-hot window (here: ONE 8-token passage shared by every
    document, giving a single sh key with n_docs occurrences while all
    other keys have 1) must complete and mark exactly the shared
    passage in every document.  Measured wall-clock on the skewed
    corpus must stay within a small factor of a uniform corpus of the
    same size (the buffer degrades gracefully, it does not blow up)."""
    import time

    from polars_w_inverted_index_spark.operators.span_dedup import (
        repeated_spans,
    )

    n = 1500
    hot = " ".join(f"hot{j}" for j in range(8))
    skew_rows = [
        (i, " ".join(f"s{i}f{j}" for j in range(12)) + " " + hot)
        for i in range(n)
    ]
    uni_rows = [
        (i, " ".join(f"u{i}f{j}" for j in range(21))) for i in range(n)
    ]
    skew = spark.createDataFrame(skew_rows, "doc_id long, text string")
    uni = spark.createDataFrame(uni_rows, "doc_id long, text string")

    t0 = time.perf_counter()
    got = repeated_spans(skew, k=8).collect()
    t_skew = time.perf_counter() - t0
    t0 = time.perf_counter()
    repeated_spans(uni, k=8).collect()
    t_uni = time.perf_counter() - t0

    # every document carries exactly the one shared span, at the tail
    # (12 filler tokens then the 8 hot ones)
    assert len(got) == n
    assert all(
        (r["span_start"], r["span_end"]) == (12, 20) for r in got
    ), got[:3]
    # one 1500-row window group vs 1500 singleton groups: same order of
    # magnitude (generous 5x bound — a quadratic or non-spilling buffer
    # would blow far past it; typical observed ratio ~1x)
    assert t_skew < 5 * max(t_uni, 0.5), (t_skew, t_uni)


def test_span_scrub_against_broadcasts_batch_not_corpus(spark, tmp_path):
    """`scrub_repeated_spans_against` at a 50%-hot batch×corpus overlap:
    the corpus occurrence-count table (the big side at any real scale)
    must stream — no shuffle, no broadcast of it — while the O(batch)
    count frame is the broadcast build side.  At the test's data size
    BOTH sides fit under the default 10 MB broadcast threshold and AQE
    happily broadcasts the corpus, so the threshold is pinned low enough
    that only the genuinely batch-sized side qualifies — the same
    relative-size regime a 100 TB corpus imposes for free."""
    from polars_w_inverted_index_spark.operators.span_dedup import (
        scrub_repeated_spans_against,
        window_counts,
    )

    K = 8
    tmpl = " ".join(f"hot{j}" for j in range(12))
    rows = []
    for i in range(2000):  # half the corpus carries the hot template
        filler = " ".join(f"c{i}w{j}" for j in range(10))
        rows.append((i, f"{filler} {tmpl}"))
    for i in range(2000, 4000):
        rows.append((i, " ".join(f"u{i}v{j}" for j in range(20))))
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    state = str(tmp_path / "corpus_counts")
    window_counts(corpus, k=K).write.mode("overwrite").parquet(state)
    cc = spark.read.parquet(state)

    brows = []
    for i in range(9000, 9030):  # 50% of the batch overlaps the hot span
        filler = " ".join(f"b{i}w{j}" for j in range(10))
        brows.append((i, f"{filler} {tmpl}"))
    for i in range(9030, 9060):
        brows.append((i, " ".join(f"x{i}y{j}" for j in range(20))))
    batch = spark.createDataFrame(brows, "doc_id long, text string")

    thresholds = {
        "spark.sql.autoBroadcastJoinThreshold": "65536",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "65536",
    }
    saved = {k: spark.conf.get(k, None) for k in thresholds}
    for k, v in thresholds.items():
        spark.conf.set(k, v)
    try:
        out = scrub_repeated_spans_against(cc, batch, k=K, min_count=2)
        got = {r["doc_id"]: r for r in out.collect()}
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    # correctness at the overlap: every hot batch doc loses exactly the
    # 12-token template; clean docs pass through byte-identical
    for i in range(9000, 9030):
        assert got[i]["n_removed_tokens"] == 12, got[i]
        assert "hot0" not in got[i]["text"]
        assert got[i]["text"].startswith(f"b{i}w0 ")
    for i in range(9030, 9060):
        assert got[i]["n_removed_tokens"] == 0
        assert got[i]["text"] == f"x{i}y0 " + " ".join(
            f"x{i}y{j}" for j in range(1, 20)
        )

    # plan: consider only the FINAL adaptive plan, not the initial copy
    final = plan.split("== Initial Plan ==")[0]
    lines = final.splitlines()
    # the corpus table is this plan's ONLY parquet scan (the batch is an
    # in-memory frame); the FileScan line's Location string is truncated
    # by maxMetadataStringLength, so match the scan's schema
    scan_idxs = [i for i, ln in enumerate(lines)
                 if "FileScan parquet [sh#" in ln]
    assert scan_idxs, "corpus-counts scan missing from final plan"
    saw_join = False
    for idx in scan_idxs:
        chain = _ancestor_chain(lines, idx)
        # walk to the nearest join ancestor; the corpus side must reach
        # it with no Exchange of any kind in between
        below_join = []
        for ln in chain:
            if "Join" in ln:
                assert "BroadcastHashJoin" in ln and "BuildLeft" in ln, ln
                saw_join = True
                break
            below_join.append(ln)
        offenders = [
            ln for ln in below_join
            if "Exchange" in ln or "BroadcastQueryStage" in ln
        ]
        assert not offenders, offenders
    assert saw_join, "no join ancestor found above the corpus scan"
