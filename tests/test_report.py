"""Corpus report / data card (report.py) vs DuckDB-exact twins."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from polars_w_inverted_index_spark.report import corpus_report


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


@pytest.fixture(scope="module")
def report(docs):
    rows = corpus_report(docs, lang_col="lang").collect()
    return {(r["section"], r["metric"]): r for r in rows}


def test_exact_size_metrics(report, sf_dir):
    con = duckdb.connect()
    path = os.path.join(sf_dir, "documents.parquet")
    n, tok, ch = con.execute(
        f"""SELECT count(*),
              sum(length(list_filter(regexp_split_to_array(
                  lower(trim(text)), '\\s+'), t -> t != ''))),
              sum(length(text))
            FROM '{path}'"""
    ).fetchone()
    assert report[("size", "n_docs")]["value_num"] == n
    assert report[("size", "total_tokens")]["value_num"] == tok
    assert report[("size", "total_chars")]["value_num"] == ch


def test_language_mix_exact(report, sf_dir):
    con = duckdb.connect()
    path = os.path.join(sf_dir, "documents.parquet")
    for lang, cnt in con.execute(
        f"SELECT lang, count(*) FROM '{path}' GROUP BY 1"
    ).fetchall():
        r = report[("language_mix", f"n_docs[{lang}]")]
        assert r["value_num"] == cnt
        assert r["value_str"] == lang


def test_duplication_estimate_sane(report, sf_dir):
    con = duckdb.connect()
    path = os.path.join(sf_dir, "documents.parquet")
    exact_unique = con.execute(
        f"SELECT count(DISTINCT text) FROM '{path}'"
    ).fetchone()[0]
    est = report[("duplication", "approx_unique_texts")]["value_num"]
    assert abs(est - exact_unique) <= max(0.1 * exact_unique, 3)
    frac = report[("duplication", "approx_exact_dup_frac")]["value_num"]
    assert 0.0 <= frac <= 1.0


def test_report_is_driver_sized_and_derived_lang_path(docs):
    # derived-language path (lang_col=None) also works and the report
    # stays a handful of rows
    rep = corpus_report(docs.limit(50))
    assert rep.count() < 30
    assert rep.where(
        (F.col("section") == "language_mix") & (F.col("value_num") > 0)
    ).count() >= 1
