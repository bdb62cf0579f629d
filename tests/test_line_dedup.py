"""Line-level boilerplate removal (operators/line_dedup.py):
DuckDB twin on the fixture corpus + semantic invariants."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from polars_w_inverted_index_spark.operators.line_dedup import (
    line_doc_frequency,
    remove_boilerplate_lines,
)

SF_DIR = "/root/testdata/sf0.01"

BANNER = "Accept all cookies to continue"
FOOTER = "© example.com — all rights reserved"
DOCS = [
    (0, f"{BANNER}\nunique alpha text one\n{FOOTER}"),
    (1, f"{BANNER}\nunique beta text two\n\n{FOOTER}"),
    (2, f"{BANNER}\nunique gamma text three\n{FOOTER}"),
    (3, "completely original document\nwith its own two lines"),
    (4, f"{BANNER.upper()}\nunique delta text four"),  # case-normalized hit
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_line_df_counts(docs):
    rows = {r["line"].lower(): r["df"]
            for r in line_doc_frequency(docs).collect()}
    assert rows[BANNER.lower()] == 4  # case-insensitive key
    assert rows[FOOTER.lower()] == 3
    assert rows["unique alpha text one"] == 1


def test_removal_semantics(docs):
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(docs, max_line_df=2).collect()
    }
    # banner (df=4) and footer (df=3) removed everywhere; blank lines +
    # unique lines untouched, original casing preserved for survivors
    assert out[0]["text"] == "unique alpha text one"
    assert out[1]["text"] == "unique beta text two\n"
    assert out[4]["text"] == "unique delta text four"
    assert out[3]["text"] == DOCS[3][1]
    assert out[0]["n_removed_lines"] == 2
    assert out[3]["n_removed_lines"] == 0


def test_identity_when_threshold_high(docs):
    out = remove_boilerplate_lines(docs, max_line_df=100)
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert got == dict(DOCS)
    assert out.where(F.col("n_removed_lines") != 0).count() == 0


def test_matches_duckdb_on_fixture(spark):
    """Full pipeline vs an independent DuckDB twin on the sf0.01
    documents table (trim+lower line keys, df > 3, reassembled text) —
    hash-exact per document."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    got = sorted(
        (r["doc_id"], r["text"], r["n_removed_lines"])
        for r in remove_boilerplate_lines(docs, max_line_df=3).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT doc_id, text FROM"
        f" '{SF_DIR}/documents.parquet'"
    )
    exp = con.execute(
        """
        WITH parts AS (
          SELECT doc_id, string_split(text, chr(10)) AS p FROM documents
        ), lines AS (
          SELECT doc_id, r.i AS idx, p[r.i] AS line
          FROM parts, UNNEST(range(1, len(p) + 1)) AS r(i)
        ), hot AS (
          SELECT lower(trim(line)) AS k
          FROM (SELECT DISTINCT doc_id, lower(trim(line)) AS line
                FROM lines WHERE trim(line) != '')
          GROUP BY 1 HAVING count(*) > 3
        ), kept AS (
          SELECT l.* FROM lines l
          WHERE trim(l.line) = ''
             OR lower(trim(l.line)) NOT IN (SELECT k FROM hot)
        ), rebuilt AS (
          SELECT doc_id,
                 string_agg(line, chr(10) ORDER BY idx) AS new_text,
                 count(*) AS n_kept
          FROM kept GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(r.new_text, '') AS text,
               len(string_split(d.text, chr(10))) - COALESCE(r.n_kept, 0)
                 AS n_removed
        FROM documents d LEFT JOIN rebuilt r USING (doc_id)
        ORDER BY d.doc_id
        """
    ).fetchall()
    assert got == [tuple(r) for r in exp]


def test_plan_has_no_python_and_bounded_state(spark, docs):
    out = remove_boilerplate_lines(docs, max_line_df=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
    assert "CartesianProduct" not in plan
