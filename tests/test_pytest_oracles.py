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
