"""DuckDB oracle checks for operators OUTSIDE the 50-row driver registry.

Same rigor as the driver's correctness gate — the Spark pipeline and an
independent DuckDB SQL twin over the same parquet must agree hash-exact
— applied to the unregistered extension operators (the registry is
capped at 50 rows, so these carry their oracle evidence here).
"""

from __future__ import annotations

import duckdb
import pytest

from polars_w_inverted_index_spark.functions.hashing import md5_long_sql
from polars_w_inverted_index_spark.operators import dedup as DD
from polars_w_inverted_index_spark.operators.sampling import (
    mixture_sample,
    stratified_sample,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "orders"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return c


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_simhash_pairs_match_duckdb(spark, con, docs):
    """Banded SimHash pairs vs an independent DuckDB twin composed from
    the registered hash-exact simhash oracle + band slicing + popcount."""
    from polars_w_inverted_index_spark.registry_ext import _simhash_sql

    n_bands, max_h, bits = 12, 11, DD.SIMHASH_BITS
    got = sorted(
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in DD.simhash_pairs(
            docs, n_bands=n_bands, max_hamming=max_h
        ).collect()
    )
    w = bits // n_bands
    widths = [w + (1 if i < bits % n_bands else 0) for i in range(n_bands)]
    offs = [sum(widths[:i]) for i in range(n_bands)]
    band_sel = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {i} AS band_idx,"
        f" (simhash >> {offs[i]}) & {(1 << widths[i]) - 1} AS band_val"
        f" FROM sims"
        for i in range(n_bands)
    )
    want = sorted(
        con.execute(
            f"""
            WITH sims AS ({_simhash_sql()}),
            bands AS ({band_sel})
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   MIN(bit_count(xor(a.simhash, b.simhash))) AS hamming
            FROM bands a JOIN bands b
              ON a.band_idx = b.band_idx AND a.band_val = b.band_val
             AND a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_h}
            GROUP BY 1, 2
            """
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_rollup_matches_duckdb(spark, con):
    """sql_rollup's driver-row check, relocated verbatim (r11 rotation:
    its slot went to similarity_ann_auto_topk — ROLLUP is pure Catalyst
    grouping-sets with no engine code in the path, so the hash proof
    belongs here, not in one of the 50 driver rows)."""
    from polars_w_inverted_index_spark.registry_ext import (
        SQL_ROLLUP,
        q_rollup,
    )

    con.execute(
        f"CREATE VIEW IF NOT EXISTS lineitem AS"
        f" SELECT * FROM '{SF_DIR}/lineitem.parquet'"
    )
    key = lambda r: tuple("␀" if v is None else str(v) for v in r)  # noqa: E731
    got = sorted(
        (key((r["l_returnflag"], r["l_linestatus"], r["n"], r["sum_qty"]))
         for r in q_rollup(spark, SF_DIR).collect())
    )
    want = sorted(key(r) for r in con.execute(SQL_ROLLUP).fetchall())
    assert got == want and len(got) > 4  # groups + subtotals + grand


def test_stratified_sample_matches_duckdb(spark, con, docs):
    """The hash-threshold membership itself, hash-exact vs DuckDB."""
    frac, seed = 0.37, 5
    got = sorted(
        r["doc_id"]
        for r in stratified_sample(
            docs, "lang", {"en": frac}, seed=seed
        ).collect()
    )
    h = md5_long_sql("doc_id::VARCHAR", salt=seed)
    want = sorted(
        r[0]
        for r in con.execute(
            f"""
            SELECT doc_id FROM documents
            WHERE lang = 'en' AND {h} < {int(frac * (1 << 60))}
            """
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_mixture_sample_matches_duckdb(spark, con, docs):
    """mixture_sample = per-domain fractions (derived from counts, the
    same arithmetic in Python) + the stratified hash threshold; DuckDB
    recomputes both from scratch."""
    weights, t, seed = {"en": 3.0, "de": 1.0}, 2.0, 0
    got = sorted(
        r["doc_id"]
        for r in mixture_sample(
            docs, "lang", weights, temperature=t, seed=seed
        ).collect()
    )
    counts = dict(
        con.execute(
            "SELECT lang, COUNT(*) FROM documents"
            " WHERE lang IN ('en','de') GROUP BY lang"
        ).fetchall()
    )
    shares = {d: w ** (1.0 / t) for d, w in weights.items()}
    z = sum(shares.values())
    shares = {d: s / z for d, s in shares.items()}
    total = min(counts[d] / shares[d] for d in shares)
    fracs = {
        d: min(1.0, shares[d] * total / counts[d]) for d in shares
    }
    h = md5_long_sql("doc_id::VARCHAR", salt=seed)
    cases = " ".join(
        f"WHEN lang = '{d}' THEN {int(f * (1 << 60))}" for d, f in fracs.items()
    )
    want = sorted(
        r[0]
        for r in con.execute(
            f"""
            SELECT doc_id FROM documents
            WHERE lang IN ('en','de')
              AND {h} < (CASE {cases} END)
            """
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_unigram_surprisal_matches_duckdb(spark, con, docs):
    """Self-corpus MLE surprisal vs DuckDB (approx per-doc compare —
    float summation order differs between engines, so 1e-6 tolerance
    instead of the hash-exact bar integer pipelines meet)."""
    from polars_w_inverted_index_spark.functions.text import (
        tokens_sql,
        unigram_surprisal_df,
    )

    got = {
        r["doc_id"]: (r["n_tokens"], r["mean_surprisal_bits"])
        for r in unigram_surprisal_df(docs).collect()
    }
    want = {
        d: (n, s)
        for d, n, s in con.execute(
            f"""
            WITH tok AS (
              SELECT doc_id, unnest({tokens_sql('text')}) AS t
              FROM documents
            ),
            lm AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
            tot AS (SELECT SUM(c) AS total FROM lm)
            SELECT doc_id, COUNT(*) AS n_tokens,
                   AVG(-log2(c / total)) AS s
            FROM tok JOIN lm USING (t) CROSS JOIN tot
            GROUP BY doc_id
            """
        ).fetchall()
    }
    assert set(got) == set(want) and len(got) > 0
    for d in got:
        assert got[d][0] == want[d][0], d
        assert got[d][1] == pytest.approx(want[d][1], abs=1e-5), d


def test_exact_dedup_against_matches_duckdb(spark, con, docs):
    from pyspark.sql import functions as F

    from polars_w_inverted_index_spark.operators.dedup import (
        exact_dedup_against,
    )

    corpus = docs.where(F.col("doc_id") % 7 != 0)
    batch = docs.where(F.col("doc_id") % 7 == 0)
    got = sorted(
        r["doc_id"] for r in exact_dedup_against(corpus, batch).collect()
    )
    want = sorted(
        r[0]
        for r in con.execute(
            """
            SELECT doc_id FROM documents b
            WHERE doc_id % 7 = 0
              AND md5(text) NOT IN (
                SELECT md5(text) FROM documents WHERE doc_id % 7 != 0
              )
            """
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_jaccard_against_matches_duckdb(spark, con, docs):
    from pyspark.sql import functions as F

    from polars_w_inverted_index_spark.functions import text as TX
    from polars_w_inverted_index_spark.operators.dedup import (
        ngram_jaccard_pairs_against,
    )

    corpus = docs.where(F.col("doc_id") % 7 != 0)
    batch = docs.where(F.col("doc_id") % 7 == 0)
    got = sorted(
        (r["batch_doc_id"], r["corpus_doc_id"], r["jaccard"])
        for r in ngram_jaccard_pairs_against(
            corpus, batch, threshold=0.2
        ).collect()
    )
    sh = TX.word_shingles_sql("text")
    hashed = md5_long_sql("unnest(" + sh + ")")
    want = sorted(
        con.execute(
            f"""
            WITH csh AS (
              SELECT doc_id, {hashed} AS sh FROM documents
              WHERE doc_id % 7 != 0
            ),
            bsh AS (
              SELECT doc_id, {hashed} AS sh FROM documents
              WHERE doc_id % 7 = 0
            ),
            cs AS (SELECT doc_id, COUNT(*) AS nc FROM csh GROUP BY doc_id),
            bs AS (SELECT doc_id, COUNT(*) AS nb FROM bsh GROUP BY doc_id),
            inter AS (
              SELECT b.doc_id AS bid, c.doc_id AS cid, COUNT(*) AS i
              FROM bsh b JOIN csh c ON b.sh = c.sh GROUP BY 1, 2
            )
            SELECT bid, cid,
                   ROUND(i / (nb + nc - i), 6) AS jaccard
            FROM inter
            JOIN bs ON bs.doc_id = bid
            JOIN cs ON cs.doc_id = cid
            WHERE ROUND(i / (nb + nc - i), 6) >= 0.2
            """
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_embedding_cosine_against_matches_duckdb(spark, con):
    from pyspark.sql import functions as F

    from polars_w_inverted_index_spark.functions.vectors import cosine_sql
    from polars_w_inverted_index_spark.operators.dedup import (
        embedding_cosine_pairs_against,
    )
    from polars_w_inverted_index_spark.registry_ext import (
        _hyperplane_sig_sql,
    )

    con.execute(
        f"CREATE VIEW IF NOT EXISTS embeddings AS"
        f" SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    corpus = emb.where(F.col("vec_id") % 7 != 0)
    batch = emb.where(F.col("vec_id") % 7 == 0)
    got = sorted(
        (r["batch_vec_id"], r["corpus_vec_id"], r["cos_sim"])
        for r in embedding_cosine_pairs_against(
            corpus, batch, threshold=0.2
        ).collect()
    )
    mask = (1 << 4) - 1
    want = sorted(
        con.execute(
            f"""
            WITH sig AS (
              SELECT vec_id,
                     ({_hyperplane_sig_sql('embedding', 16)}) & {mask}
                       AS bucket,
                     embedding
              FROM embeddings
            )
            SELECT b.vec_id, c.vec_id,
                   ROUND({cosine_sql('b.embedding', 'c.embedding')}, 5)
            FROM sig b JOIN sig c ON b.bucket = c.bucket
            WHERE b.vec_id % 7 = 0 AND c.vec_id % 7 != 0
              AND ROUND({cosine_sql('b.embedding', 'c.embedding')}, 5)
                  >= 0.2
            """
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_corpus_divergence_identity_and_disjoint(spark):
    """KL and JS are 0 on identical corpora; JS approaches its 1-bit
    bound on disjoint vocabularies."""
    from polars_w_inverted_index_spark.functions.text import (
        corpus_divergence,
        unigram_lm,
    )

    a = spark.createDataFrame(
        [(1, "alpha beta gamma alpha")], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(1, "delta epsilon zeta delta")], "doc_id long, text string"
    )
    same = corpus_divergence(unigram_lm(a), unigram_lm(a)).collect()[0]
    assert same.kl_a_b_bits == 0.0 and same.kl_b_a_bits == 0.0
    assert same.js_bits == 0.0
    assert same.vocab_a == same.vocab_b == same.vocab_shared == 3

    diff = corpus_divergence(
        unigram_lm(a), unigram_lm(b), alpha=0.01
    ).collect()[0]
    assert diff.vocab_shared == 0
    assert diff.js_bits > 0.9
    assert diff.kl_a_b_bits > 0 and diff.kl_b_a_bits > 0


def test_corpus_divergence_matches_duckdb(spark, con, docs):
    """Full-formula twin in DuckDB over two document-table halves;
    approx compare (float accumulation order)."""
    from polars_w_inverted_index_spark.functions.text import (
        corpus_divergence,
        tokens_sql,
        unigram_lm,
    )

    half_a = docs.where("doc_id % 2 = 0")
    half_b = docs.where("doc_id % 2 = 1")
    got = corpus_divergence(
        unigram_lm(half_a), unigram_lm(half_b), alpha=0.5
    ).collect()[0]
    want = con.execute(
        f"""
        WITH tok AS (
          SELECT doc_id, unnest({tokens_sql('text')}) AS t
          FROM documents
        ),
        la AS (SELECT t, COUNT(*) AS ca FROM tok
               WHERE doc_id % 2 = 0 GROUP BY t),
        lb AS (SELECT t, COUNT(*) AS cb FROM tok
               WHERE doc_id % 2 = 1 GROUP BY t),
        j AS (
          SELECT t, COALESCE(ca, 0)::DOUBLE AS ca,
                 COALESCE(cb, 0)::DOUBLE AS cb
          FROM la FULL OUTER JOIN lb USING (t)
        ),
        tot AS (
          SELECT SUM(ca) AS ta, SUM(cb) AS tb, COUNT(*) AS v,
                 SUM(CASE WHEN ca > 0 THEN 1 ELSE 0 END) AS va,
                 SUM(CASE WHEN cb > 0 THEN 1 ELSE 0 END) AS vb,
                 SUM(CASE WHEN ca > 0 AND cb > 0 THEN 1 ELSE 0 END)
                   AS vs
          FROM j
        )
        SELECT SUM(p * log2(p / q)) AS kl_ab,
               SUM(q * log2(q / p)) AS kl_ba,
               (SUM(p * log2(p / ((p + q) / 2)))
                + SUM(q * log2(q / ((p + q) / 2)))) / 2 AS js,
               MAX(va) AS va, MAX(vb) AS vb, MAX(vs) AS vs
        FROM (
          SELECT (ca + 0.5) / (ta + 0.5 * v) AS p,
                 (cb + 0.5) / (tb + 0.5 * v) AS q
          FROM j CROSS JOIN tot
        ), tot
        """
    ).fetchone()
    assert got.kl_a_b_bits == pytest.approx(want[0], abs=1e-5)
    assert got.kl_b_a_bits == pytest.approx(want[1], abs=1e-5)
    assert got.js_bits == pytest.approx(want[2], abs=1e-5)
    assert (got.vocab_a, got.vocab_b, got.vocab_shared) == (
        want[3],
        want[4],
        want[5],
    )


def test_semantic_dedup_matches_duckdb(spark, con):
    """End-to-end semantic dedup (pairs → components → survivors) vs a
    DuckDB twin: the registered cosine-pair SQL + a recursive-CTE
    transitive closure + anti-join.  Hash-exact on surviving ids."""
    from polars_w_inverted_index_spark.operators.dedup import (
        semantic_dedup,
    )
    from polars_w_inverted_index_spark.registry_ext import (
        EMB_NEARDUP_THRESHOLD,
        _embedding_neardup_sql,
    )

    con.execute(
        f"CREATE VIEW IF NOT EXISTS embeddings AS"
        f" SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    want = sorted(
            r[0]
            for r in con.execute(
                f"""
                WITH RECURSIVE pairs AS (
                  {_embedding_neardup_sql(EMB_NEARDUP_THRESHOLD)}
                ),
                edges AS (
                  SELECT doc_a AS src, doc_b AS dst FROM pairs
                  UNION
                  SELECT doc_b, doc_a FROM pairs
                ),
                reach(src, dst) AS (
                  SELECT src, dst FROM edges
                  UNION
                  SELECT r.src, e.dst FROM reach r
                  JOIN edges e ON r.dst = e.src
                ),
                clusters AS (
                  SELECT src AS doc_id,
                         LEAST(src, MIN(dst)) AS cluster_id
                  FROM reach GROUP BY src
                )
                SELECT vec_id FROM embeddings
                WHERE vec_id NOT IN (
                  SELECT doc_id FROM clusters WHERE doc_id <> cluster_id
                )
                """
            ).fetchall()
    )
    for use_gemm in (False, True):
        got = sorted(
            r["vec_id"]
            for r in semantic_dedup(
                emb, threshold=EMB_NEARDUP_THRESHOLD, use_gemm=use_gemm
            ).collect()
        )
        assert got == want and len(got) > 0
        assert len(got) < emb.count()  # something was actually dropped


def test_chunked_catalog_index_matches_duckdb(spark, tmp_path_factory):
    """Chunk-STORED postings index (IndexCatalog.build(chunked=True))
    served transparently through lookup() and the Engine must match the
    DuckDB postings oracle hash-exact — the same bar the registered
    index_catalog_lookup entry meets for the unchunked layout.  The
    chunk cap is set low enough that hot values genuinely split on the
    real sf0.01 lineitem table (asserted, not assumed)."""
    import duckdb
    from pyspark.sql import functions as F

    from polars_w_inverted_index_spark import Engine
    from polars_w_inverted_index_spark.plans.catalog import IndexCatalog

    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    root = str(tmp_path_factory.mktemp("chunked_idx"))
    cat = IndexCatalog(spark, root)
    path = cat.build(
        lineitem,
        "lineitem",
        "l_returnflag",
        doc_id_col="l_orderkey",
        chunked=True,
        max_postings_per_row=500,
    )
    raw = spark.read.parquet(path)
    n_rows = raw.count()
    n_values = raw.select("value").distinct().count()
    assert n_rows > n_values  # hot values actually split into chunks
    assert "chunk" in raw.columns

    got = {
        r["value"]: list(r["doc_ids"])
        for r in cat.lookup("lineitem", "l_returnflag").collect()
    }
    c = duckdb.connect()
    want = {
        v: ids
        for v, ids in c.execute(
            f"""
            SELECT CAST(l_returnflag AS VARCHAR) AS value,
                   list_sort(list(l_orderkey)) AS ids
            FROM '{SF_DIR}/lineitem.parquet'
            WHERE l_returnflag IS NOT NULL AND l_orderkey IS NOT NULL
            GROUP BY 1
            """
        ).fetchall()
    }
    assert got == want

    # transparent serving through the engine path: the plan reads the
    # chunked index files, never the base table
    eng = Engine(
        spark,
        df=lineitem,
        doc_id_col="l_orderkey",
        index_catalog=cat,
        table_name="lineitem",
    )
    out = eng.get_field_values("l_returnflag")
    files = out.inputFiles()
    assert files and all(root in f for f in files)
    assert {r["value"]: list(r["doc_ids"]) for r in out.collect()} == want
