"""Search (boolean / phrase / BM25) and context-window chunking.

Unit semantics on hand-built corpora plus DuckDB oracle twins over the
sf0.01 documents table (same rigor as the driver gate: hash-exact where
the output is integral, per-doc approx where float accumulation order
may differ between engines).
"""

from __future__ import annotations

import duckdb
import pytest

from polars_w_inverted_index_spark.functions.text import tokens_sql
from polars_w_inverted_index_spark.operators.chunking import (
    chunk_documents,
    chunk_documents_sql,
)
from polars_w_inverted_index_spark.operators.search import (
    bm25_search,
    bm25_search_from_index,
    boolean_search,
    build_search_index,
    phrase_search,
    phrase_search_indexed,
    positional_postings,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        "CREATE VIEW documents AS"
        f" SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    return c


@pytest.fixture(scope="module")
def sfdocs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def sf_terms(con):
    """Three mid-frequency corpus terms + a present 2-token phrase —
    derived from the data, not hardcoded, so a regenerated testdata
    vocabulary (the round-3 failure mode for timestamps) cannot empty
    these tests."""
    terms = [
        t
        for (t,) in con.execute(
            f"""
            SELECT term FROM (
              SELECT term, COUNT(DISTINCT doc_id) AS df FROM (
                SELECT doc_id, unnest({tokens_sql('text')}) AS term
                FROM documents
              ) GROUP BY term
            ) ORDER BY df DESC, term LIMIT 3
            """
        ).fetchall()
    ]
    phrase = con.execute(
        f"""
        SELECT p FROM (
          SELECT toks[i] || ' ' || toks[i+1] AS p, COUNT(*) AS n
          FROM (
            SELECT {tokens_sql('text')} AS toks FROM documents
          ), unnest(range(1, len(toks))) AS u(i)
          GROUP BY 1
        ) ORDER BY n DESC, p LIMIT 1
        """
    ).fetchone()[0]
    return terms, phrase


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick red fox"),
            (3, "lazy dog sleeps"),
            (4, ""),
            (5, "quick quick quick fox fox dog"),
            (6, None),
        ],
        "doc_id long, text string",
    )


# ---------------------------------------------------------------- boolean


def test_boolean_and(corpus):
    got = sorted(
        (r.doc_id, r.n_matched)
        for r in boolean_search(corpus, ["quick", "fox"]).collect()
    )
    assert got == [(1, 2), (2, 2), (5, 2)]


def test_boolean_or(corpus):
    got = sorted(
        (r.doc_id, r.n_matched)
        for r in boolean_search(
            corpus, ["quick", "dog"], mode="or"
        ).collect()
    )
    assert got == [(1, 2), (2, 1), (3, 1), (5, 2)]


def test_boolean_normalizes_and_dedupes_query(corpus):
    a = boolean_search(corpus, ["Quick", "FOX", "quick"]).collect()
    b = boolean_search(corpus, ["quick", "fox"]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    with pytest.raises(ValueError):
        boolean_search(corpus, ["  "])
    with pytest.raises(ValueError):
        boolean_search(corpus, ["x"], mode="xor")


# ----------------------------------------------------------------- phrase


def test_phrase_adjacency(corpus):
    assert sorted(
        r.doc_id for r in phrase_search(corpus, "quick brown fox").collect()
    ) == [1]
    # terms co-occur in doc 1 but are not adjacent
    assert phrase_search(corpus, "brown dog").count() == 0
    # case-insensitive, present in two docs
    assert sorted(
        r.doc_id for r in phrase_search(corpus, "Lazy DOG").collect()
    ) == [1, 3]


def test_phrase_single_term(corpus):
    assert sorted(
        r.doc_id for r in phrase_search(corpus, "fox").collect()
    ) == [1, 2, 5]


def test_phrase_repeated_word(corpus):
    # "quick quick" occurs only in doc 5; dedup of the needle would
    # wrongly match every doc containing one "quick"
    assert sorted(
        r.doc_id for r in phrase_search(corpus, "quick quick").collect()
    ) == [5]
    assert phrase_search(corpus, "fox fox dog").count() == 1


# ------------------------------------------------------ positional index


def test_positional_postings_values(corpus):
    idx = positional_postings(corpus)
    rows = {
        (r.term, r.doc_id): r.positions
        for r in idx.where("doc_id = 1").collect()
    }
    assert rows[("the", 1)] == [0, 6]
    assert rows[("quick", 1)] == [1]
    assert rows[("dog", 1)] == [8]


def test_positional_postings_match_duckdb(con, sfdocs):
    got = sorted(
        (r.term, r.doc_id, tuple(r.positions))
        for r in positional_postings(sfdocs).collect()
    )
    want = sorted(
        (t, d, tuple(p))
        for t, d, p in con.execute(
            f"""
            SELECT term, doc_id, list_sort(list(pos - 1)) AS positions
            FROM (
              SELECT doc_id, unnest(toks) AS term,
                     unnest(range(1, len(toks) + 1)) AS pos
              FROM (
                SELECT doc_id, {tokens_sql('text')} AS toks
                FROM documents
              )
            )
            GROUP BY term, doc_id
            """
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_phrase_indexed_equals_substring_scan(corpus, sfdocs):
    """The positional-intersection and substring-scan implementations are
    independent; they must agree on every phrase."""
    for src in (corpus, sfdocs):
        idx = positional_postings(src)
        for phrase in (
            "quick brown fox",
            "lazy dog",
            "quick quick",
            "fox",
            "brown dog",
            "fast table",
            "value table part",
        ):
            a = sorted(
                r.doc_id for r in phrase_search(src, phrase).collect()
            )
            b = sorted(
                r.doc_id
                for r in phrase_search_indexed(idx, phrase).collect()
            )
            assert a == b, phrase


def test_phrase_indexed_no_base_scan(sfdocs, spark, sf_terms):
    """Served entirely from the materialized index table."""
    import tempfile

    _, phrase = sf_terms
    with tempfile.TemporaryDirectory() as d:
        positional_postings(sfdocs).write.parquet(d + "/posidx")
        idx = spark.read.parquet(d + "/posidx")
        df = phrase_search_indexed(idx, phrase)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "documents" not in plan
        assert df.count() > 0


# ------------------------------------------------------------------- bm25


def test_bm25_ranking_and_determinism(corpus):
    rows = bm25_search(corpus, ["quick", "fox"], top_k=5).collect()
    ids = [r.doc_id for r in rows]
    # doc 5 has the highest tf for both terms in the shortest text
    assert ids[0] == 5
    assert set(ids) == {1, 2, 5}
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r.n_matched == 2 for r in rows)


def test_bm25_idf_prefers_rare_terms(spark):
    # "rare" appears in 1 of 10 docs, "common" in all 10; a doc matching
    # only the rare term must outrank one matching only the common term.
    docs = spark.createDataFrame(
        [(0, "rare common")]
        + [(i, "common filler") for i in range(1, 10)],
        "doc_id long, text string",
    )
    rows = bm25_search(docs, ["rare"], top_k=1).collect()
    assert rows[0].doc_id == 0
    all_scores = {
        r.doc_id: r.score
        for r in bm25_search(
            docs, ["rare", "common"], top_k=None
        ).collect()
    }
    assert all_scores[0] > max(v for k, v in all_scores.items() if k != 0)


def test_bm25_precomputed_stats_match_inline(corpus):
    inline = {
        r.doc_id: r.score
        for r in bm25_search(corpus, ["fox"], top_k=None).collect()
    }
    # N counts all 6 docs; avgdl averages the 5 non-null texts
    # (lengths 9,4,3,0,6) — null text has no token array in either
    # engine, matching DuckDB AVG semantics.
    pre = {
        r.doc_id: r.score
        for r in bm25_search(
            corpus, ["fox"], top_k=None, n_docs=6, avgdl=22 / 5
        ).collect()
    }
    assert inline.keys() == pre.keys()
    for k in inline:
        assert inline[k] == pytest.approx(pre[k], rel=1e-12)


def test_bm25_from_index_equals_inline(sfdocs, spark, tmp_path, sf_terms):
    """BM25 over materialized (parquet round-tripped) index artifacts
    equals the inline corpus-scan form, score for score."""
    idx, stats = build_search_index(sfdocs)
    idx.write.parquet(str(tmp_path / "sidx"))
    stats.write.parquet(str(tmp_path / "sstats"))
    idx2 = spark.read.parquet(str(tmp_path / "sidx"))
    stats2 = spark.read.parquet(str(tmp_path / "sstats"))

    terms, _ = sf_terms
    inline = {
        r.doc_id: (r.score, r.n_matched)
        for r in bm25_search(sfdocs, terms, top_k=None).collect()
    }
    served = {
        r.doc_id: (r.score, r.n_matched)
        for r in bm25_search_from_index(
            idx2, stats2, terms, top_k=None
        ).collect()
    }
    assert inline.keys() == served.keys() and len(inline) > 0
    for k in inline:
        assert inline[k][1] == served[k][1]
        assert inline[k][0] == pytest.approx(served[k][0], rel=1e-12)
    # the served plan reads only index artifacts, never the corpus
    plan = (
        bm25_search_from_index(idx2, stats2, terms)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "documents" not in plan


# ----------------------------------------------------------- oracle twins


def test_boolean_search_matches_duckdb(con, sfdocs, sf_terms):
    terms, _ = sf_terms
    got = sorted(
        (r.doc_id, r.n_matched)
        for r in boolean_search(sfdocs, terms).collect()
    )
    lst = ", ".join(f"'{t}'" for t in terms)
    want = sorted(
        con.execute(
            f"""
            SELECT doc_id, COUNT(*) AS n_matched FROM (
              SELECT doc_id,
                     unnest(list_distinct({tokens_sql('text')})) AS term
              FROM documents
            ) WHERE term IN ({lst})
            GROUP BY doc_id HAVING COUNT(*) = {len(terms)}
            """
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_phrase_search_matches_duckdb(con, sfdocs, sf_terms):
    _, phrase = sf_terms
    got = sorted(r.doc_id for r in phrase_search(sfdocs, phrase).collect())
    want = sorted(
        r[0]
        for r in con.execute(
            f"""
            SELECT doc_id FROM documents
            WHERE contains(
              ' ' || array_to_string({tokens_sql('text')}, ' ') || ' ',
              ' {phrase} ')
            """
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_bm25_matches_duckdb(con, sfdocs, sf_terms):
    """Full-formula BM25 twin in DuckDB; per-doc approx compare (float
    sum order differs between engines)."""
    terms, _ = sf_terms
    k1, b = 1.2, 0.75
    got = {
        r.doc_id: (r.score, r.n_matched)
        for r in bm25_search(
            sfdocs, terms, k1=k1, b=b, top_k=None
        ).collect()
    }
    lst = ", ".join(f"'{t}'" for t in terms)
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            f"""
            WITH tl AS (
              SELECT doc_id, {tokens_sql('text')} AS toks FROM documents
            ),
            stats AS (
              SELECT COUNT(*) AS n_docs, AVG(len(toks)) AS avgdl FROM tl
            ),
            tf AS (
              SELECT doc_id, term, COUNT(*) AS tf, MAX(dl) AS dl FROM (
                SELECT doc_id, len(toks) AS dl, unnest(toks) AS term
                FROM tl
              ) WHERE term IN ({lst})
              GROUP BY doc_id, term
            ),
            dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term)
            SELECT tf.doc_id,
                   SUM(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                       * tf * ({k1} + 1.0)
                       / (tf + {k1} * (1.0 - {b} + {b} * dl / avgdl))
                   ) AS score,
                   COUNT(*) AS n_matched
            FROM tf, dfreq, stats
            WHERE tf.term = dfreq.term
            GROUP BY tf.doc_id
            """
        ).fetchall()
    }
    assert got.keys() == want.keys() and len(got) > 0
    for k, (s, m) in got.items():
        assert m == want[k][1]
        assert s == pytest.approx(want[k][0], rel=1e-9)


def test_chunking_matches_duckdb(con, sfdocs):
    w, s = 32, 24
    got = sorted(
        tuple(r)
        for r in chunk_documents(sfdocs, window=w, stride=s).collect()
    )
    want = sorted(
        con.execute(chunk_documents_sql(window=w, stride=s)).fetchall()
    )
    assert got == want and len(got) > 0


# --------------------------------------------------------------- chunking


def test_chunk_windows_and_tail_suppression(corpus):
    rows = sorted(
        tuple(r)
        for r in chunk_documents(corpus, window=4, stride=3).collect()
    )
    assert rows == [
        (1, 0, 4, "the quick brown fox"),
        (1, 1, 4, "fox jumps over the"),
        (1, 2, 3, "the lazy dog"),
        (2, 0, 4, "the quick red fox"),
        (3, 0, 3, "lazy dog sleeps"),
        (5, 0, 4, "quick quick quick fox"),
        (5, 1, 3, "fox fox dog"),
    ]


def test_chunk_covers_every_token_with_overlap(spark):
    text = " ".join(f"t{i}" for i in range(100))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    w, s = 16, 10
    rows = chunk_documents(docs, window=w, stride=s).collect()
    seen = set()
    for r in rows:
        seen.update(r.chunk_text.split())
    assert seen == {f"t{i}" for i in range(100)}
    # overlap: consecutive chunks share window - stride tokens
    ordered = sorted(rows, key=lambda r: r.chunk_idx)
    for a, bb in zip(ordered, ordered[1:]):
        assert a.chunk_text.split()[s:] == bb.chunk_text.split()[: w - s]


def test_chunk_no_overlap_mode(spark):
    text = " ".join(f"t{i}" for i in range(10))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        (r.chunk_idx, r.n_tokens)
        for r in chunk_documents(docs, window=4, stride=4).collect()
    )
    assert rows == [(0, 4), (1, 4), (2, 2)]


def test_chunk_short_doc_single_window(corpus):
    rows = chunk_documents(corpus, window=128, stride=96).where(
        "doc_id = 3"
    ).collect()
    assert len(rows) == 1 and rows[0].n_tokens == 3


def test_chunk_min_tokens_and_validation(corpus):
    assert (
        chunk_documents(corpus, window=4, stride=3, min_tokens=4)
        .where("n_tokens < 4")
        .count()
        == 0
    )
    with pytest.raises(ValueError):
        chunk_documents(corpus, window=4, stride=5)
    with pytest.raises(ValueError):
        chunk_documents(corpus, window=0, stride=1)


def test_chunk_plan_is_narrow(corpus):
    """No shuffle anywhere in the chunking plan (pure narrow map)."""
    plan = (
        chunk_documents(corpus, window=8, stride=6)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_bm25_plan_single_scan_and_takeordered(sfdocs):
    """Precomputed corpus stats ⇒ exactly ONE corpus scan (the window-
    based df avoids the second aggregation branch); top-k is TakeOrdered
    (partial per-partition top-k), never a global sort."""
    plan = (
        bm25_search(sfdocs, ["vector"], top_k=10, n_docs=500, avgdl=40.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1
    assert "TakeOrderedAndProject" in plan
    # inline stats cost exactly one extra pass, no more
    plan2 = (
        bm25_search(sfdocs, ["vector"], top_k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan2.count("Scan parquet") == 2


def test_phrase_search_plan_has_no_cartesian(sfdocs):
    plan = (
        phrase_search(sfdocs, "fast table")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# -- keyword extraction ------------------------------------------------------

def test_top_tfidf_terms_matches_duckdb(spark):
    import duckdb

    from polars_w_inverted_index_spark.operators.search import (
        top_tfidf_terms,
    )

    sf = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text"
    )
    got = sorted(
        (r["doc_id"], r["term"], r["tf"], r["tfidf"], r["rank"])
        for r in top_tfidf_terms(docs, k=5).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT doc_id, text FROM"
        f" '{sf}/documents.parquet'"
    )
    exp = con.execute(
        """
        WITH tl AS (
          SELECT doc_id, unnest(list_filter(regexp_split_to_array(
            lower(trim(text)), '\\s+'), t -> t != '')) AS term
          FROM documents
        ), tf AS (
          SELECT doc_id, term, count(*) AS tf FROM tl GROUP BY 1, 2
        ), dft AS (
          SELECT term, count(*) AS df FROM tf GROUP BY 1
        ), n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.term, tf.tf,
                 ROUND(tf.tf * (ln((n.n + 1.0) / (dft.df + 1)) + 1.0), 6)
                   AS tfidf
          FROM tf JOIN dft USING (term) CROSS JOIN n
        ), ranked AS (
          SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
          FROM scored
        )
        SELECT doc_id, term, tf, tfidf, rank FROM ranked WHERE rank <= 5
        ORDER BY doc_id, rank
        """
    ).fetchall()
    assert got == sorted(tuple(r) for r in exp)


def test_top_tfidf_prefers_rare_terms(spark):
    from polars_w_inverted_index_spark.operators.search import (
        top_tfidf_terms,
    )

    docs = spark.createDataFrame(
        [
            (0, "common rareword"),
            (1, "common other text here"),
            (2, "common more words again"),
        ],
        "doc_id long, text string",
    )
    top = {
        r["doc_id"]: r["term"]
        for r in top_tfidf_terms(docs, k=1).collect()
    }
    # equal tf in doc 0: 'common' appears in every doc (idf = 1),
    # 'rareword' only here (idf = ln(2) + 1) — idf must rank it first
    assert top[0] == "rareword"
