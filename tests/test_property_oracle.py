"""Property-based oracle fuzz: engine vs DuckDB on random tiny frames.

Randomizes exactly the §1.4 fine print the fixed fixtures can only spot-
check — null doc_ids, null values, duplicate ids in the table AND in the
request list, empty inputs — and asserts the Spark engine agrees with
DuckDB running the contract SQL on the same rows.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from polars_w_inverted_index_spark import Engine
from polars_w_inverted_index_spark.session import get_session

ROWS = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 15)),            # doc_id
        st.one_of(
            st.none(),
            # '' and multi-byte are legal field values the log fixtures
            # never contain — the postings contract must not bend there
            st.sampled_from(["a", "b", "c", "", "é中", " a "]),
        ),  # value
        st.one_of(st.none(), st.integers(-5, 5)),            # metric
    ),
    min_size=0,
    max_size=25,
)
IDS = st.lists(st.integers(0, 15), min_size=0, max_size=8)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _frames(rows):
    spark = get_session("property_tests")
    sdf = spark.createDataFrame(
        rows, "doc_id long, value string, metric long"
    )
    con = duckdb.connect()
    con.register(
        "t",
        pd.DataFrame(rows, columns=["doc_id", "value", "metric"]).astype(
            {"doc_id": "Int64", "metric": "Int64"}
        ),
    )
    return spark, sdf, con


@_SETTINGS
@given(rows=ROWS)
def test_postings_match_duckdb(rows):
    spark, sdf, con = _frames(rows)
    got = {
        r["value"]: list(r["doc_ids"])
        for r in Engine(spark, df=sdf).get_field_values("value").collect()
    }
    want = dict(
        con.execute(
            "SELECT value, list_sort(list(doc_id)) FROM t "
            "WHERE value IS NOT NULL AND doc_id IS NOT NULL GROUP BY 1"
        ).fetchall()
    )
    assert got == want


@_SETTINGS
@given(rows=ROWS, ids=IDS)
def test_postings_by_ids_match_duckdb(rows, ids):
    spark, sdf, con = _frames(rows)
    got = {
        r["value"]: list(r["doc_ids"])
        for r in Engine(spark, df=sdf)
        .get_field_values_by_doc_ids("value", ids)
        .collect()
    }
    id_rows = pd.DataFrame({"doc_id": pd.Series(ids, dtype="Int64")})
    con.register("ids", id_rows)
    # inner join: absent ids dropped, duplicate requested ids multiply
    want = dict(
        con.execute(
            "SELECT value, list_sort(list(t.doc_id)) FROM t "
            "JOIN ids ON t.doc_id = ids.doc_id "
            "WHERE value IS NOT NULL GROUP BY 1"
        ).fetchall()
    )
    assert got == want


@_SETTINGS
@given(rows=ROWS)
def test_numeric_stats_match_duckdb(rows):
    spark, sdf, con = _frames(rows)
    result, _ = Engine(spark, df=sdf).get_numeric_stats_collected("metric")
    want = con.execute(
        "SELECT CAST(MIN(metric) AS DOUBLE), CAST(MAX(metric) AS DOUBLE),"
        " AVG(CAST(metric AS DOUBLE)) FROM t"
    ).fetchone()
    assert (result.min, result.max) == want[:2]
    if want[2] is None:
        assert result.avg is None
    else:
        assert result.avg == pytest.approx(want[2])


def test_set_intersect_oracle(spark, sf_dir):
    """INTERSECT evidence for the de-registered sql_set_intersect slot
    (registry caps at 50 driver rows): Spark intersect vs DuckDB on the
    real orders fixture."""
    import duckdb

    from polars_w_inverted_index_spark.registry_ext import (
        SET_INTERSECT_SQL,
        q_both_status_customers,
    )

    got = sorted(
        r["o_custkey"] for r in q_both_status_customers(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'"
    )
    want = sorted(r[0] for r in con.execute(SET_INTERSECT_SQL).fetchall())
    assert got == want and len(got) > 0


# ---------------------------------------------------------------------------
# N-gram construction vs the DuckDB twins (r8: the arrays_zip rewrite)
# ---------------------------------------------------------------------------
# fingerprint()/word_shingles() were rewritten from zip_with chains to a
# single arrays_zip + fused lambda; the driver oracle pins them on the
# (ASCII-ish) corpus, this fuzz pins the edge semantics the rewrite
# could have bent: empty text, whitespace-only, runs of separators,
# shorter-than-n docs, multi-byte code points (both engines split and
# substring by CODE POINT and hash UTF-8 bytes, so values must agree).

_TEXT_ALPHABET = (
    "ab z09.,!?  \t\n" + "éÜß中ø"  # ascii + separators + multi-byte
)
TEXTS = st.lists(
    st.text(alphabet=_TEXT_ALPHABET, min_size=0, max_size=40),
    min_size=1,
    max_size=6,
)


def _text_frames(texts):
    spark = get_session("property_tests")
    rows = [(i, t) for i, t in enumerate(texts)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    con = duckdb.connect()
    con.register(
        "t", pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    return spark, sdf, con


@_SETTINGS
@given(texts=TEXTS)
def test_fingerprint_matches_duckdb(texts):
    from pyspark.sql import functions as F

    from polars_w_inverted_index_spark.functions.text import (
        fingerprint,
        fingerprint_sql,
    )

    spark, sdf, con = _text_frames(texts)
    got = {
        r["doc_id"]: list(r["fp"])
        for r in sdf.select(
            "doc_id", fingerprint("text").alias("fp")
        ).collect()
    }
    want = {
        r[0]: list(r[1])
        for r in con.execute(
            f"SELECT doc_id, {fingerprint_sql('text')} FROM t"
        ).fetchall()
    }
    assert got == want


@_SETTINGS
@given(texts=TEXTS)
def test_word_shingles_match_duckdb(texts):
    from polars_w_inverted_index_spark.functions.text import (
        word_shingles,
        word_shingles_sql,
    )

    spark, sdf, con = _text_frames(texts)
    got = {
        r["doc_id"]: sorted(r["sh"])
        for r in sdf.select(
            "doc_id", word_shingles("text").alias("sh")
        ).collect()
    }
    want = {
        r[0]: sorted(r[1])
        for r in con.execute(
            f"SELECT doc_id, {word_shingles_sql('text')} FROM t"
        ).fetchall()
    }
    assert got == want


def test_csv_array_twin_empty_and_null(spark):
    """The csv canonicalizer's DuckDB twin must agree with Spark's
    array_join on the edges: empty array -> '' (DuckDB's raw
    array_to_string is NULL there), NULL input -> NULL on both, null
    ELEMENTS skipped on both."""
    from pyspark.sql import functions as F

    from polars_w_inverted_index_spark.functions.canon import (
        csv_array,
        csv_array_sql,
    )

    rows = [(0, []), (1, None), (2, ["b", None, "a"])]
    sdf = spark.createDataFrame(rows, "doc_id long, xs array<string>")
    got = {
        r["doc_id"]: r["xs"] for r in csv_array(sdf, "xs").collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["doc_id", "xs"]))
    want = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT doc_id, {csv_array_sql('xs')} FROM t"
        ).fetchall()
    }
    assert got == want == {0: "", 1: None, 2: "a,b"}


@_SETTINGS
@given(texts=TEXTS)
def test_text_profile_matches_duckdb(texts):
    """Full text-profile row (token counts, BPE-ish count, lang-id,
    quality metrics) vs the DuckDB twins on adversarial text — empty
    docs, whitespace-only, separator runs, multi-byte code points.
    Ratio metrics divide by token/char counts, so the zero-token edge
    is exactly where an engine-side guard could silently differ."""
    from pyspark.sql import functions as F

    from polars_w_inverted_index_spark.functions import text as TX

    spark, sdf, con = _text_frames(texts)
    tok = F.col("_toks")
    got = {
        r["doc_id"]: tuple(r)[1:]
        for r in sdf.withColumn("_toks", TX.tokens("text"))
        .select(
            "doc_id",
            F.size(tok).cast("long").alias("n_tok"),
            TX.bpe_token_count("text").alias("n_bpe_tok"),
            TX.lang_id("text", tok=tok).alias("pred_lang"),
            *TX.quality_metrics("text", tok=tok),
        )
        .collect()
    }
    want = {
        r[0]: tuple(r)[1:]
        for r in con.execute(
            f"""
            SELECT doc_id,
                   {TX.token_count_sql('text')} AS n_tok,
                   {TX.bpe_token_count_sql('text')} AS n_bpe_tok,
                   {TX.lang_id_sql('text')} AS pred_lang,
                   {', '.join(TX.quality_metrics_sql('text'))}
            FROM t
            """
        ).fetchall()
    }
    assert got == want


VECS = st.lists(
    st.lists(
        st.floats(
            min_value=-4.0, max_value=4.0,
            allow_nan=False, allow_infinity=False, width=32,
        ),
        min_size=0,
        max_size=5,
    ),
    min_size=2,
    max_size=5,
)


@_SETTINGS
@given(vecs=VECS)
def test_cosine_twin_matches_duckdb(vecs):
    """cosine() vs cosine_sql on adversarial vectors: zero vectors,
    EMPTY vectors, and RAGGED length pairs (out of contract — both
    engines must answer NULL there, not a silent partial prefix dot,
    unless a zero norm forces the 0.0 branch first)."""
    import math

    from pyspark.sql import functions as F

    from polars_w_inverted_index_spark.functions.vectors import (
        cosine,
        cosine_sql,
    )

    spark = get_session("property_tests")
    pairs = [
        (i, a, b)
        for i, (a, b) in enumerate(
            (x, y) for x in vecs for y in vecs
        )
    ]
    sdf = spark.createDataFrame(
        pairs, "pid long, a array<double>, b array<double>"
    )
    got = {
        r["pid"]: r["cos"]
        for r in sdf.select(
            "pid", F.round(cosine("a", "b"), 6).alias("cos")
        ).collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame(pairs, columns=["pid", "a", "b"]))
    want = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT pid, ROUND({cosine_sql('a', 'b')}, 6) FROM t"
        ).fetchall()
    }
    assert set(got) == set(want)
    for pid, g in got.items():
        w = want[pid]
        if g is None or w is None:
            assert g == w, (pid, g, w)
        else:
            assert math.isclose(g, w, rel_tol=1e-9, abs_tol=1e-9), (
                pid, g, w,
            )


EPOCH_US = st.lists(
    st.integers(
        min_value=-2_208_988_800_000_000,  # 1900-01-01
        max_value=4_102_444_800_000_000,   # 2100-01-01
    ),
    min_size=1,
    max_size=12,
)


@_SETTINGS
@given(micros=EPOCH_US)
def test_hour_bucket_and_epoch_twins_match_duckdb(micros):
    """The events rows bucket on strftime(date_trunc('hour')) and the
    asof/interval/resample family on epoch microseconds — testdata ts
    TYPES drift between rounds (NTZ vs TZ), so pin the twins across a
    wide epoch range including pre-1970 (where floor-vs-truncate
    divides engines) and exact hour boundaries."""
    import datetime as dt

    from pyspark.sql import functions as F

    from polars_w_inverted_index_spark.functions.timeutil import epoch_us

    spark = get_session("property_tests")
    rows = [
        (i, dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=us))
        for i, us in enumerate(micros)
    ]
    sdf = spark.createDataFrame(rows, "rid long, ts timestamp")
    got = {
        r["rid"]: (r["hour"], r["us"])
        for r in sdf.select(
            "rid",
            F.date_format(
                F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss"
            ).alias("hour"),
            epoch_us("ts").alias("us"),
        ).collect()
    }
    con = duckdb.connect()
    pdf = pd.DataFrame(rows, columns=["rid", "ts"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    con.register("t", pdf)
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            "SELECT rid,"
            " strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S'),"
            " epoch_us(ts) FROM t"
        ).fetchall()
    }
    assert got == want
