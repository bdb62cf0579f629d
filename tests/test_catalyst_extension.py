"""Catalyst-level index rewrite (jvm/src/org/polarsindex/*.java).

The ``spark.sql.extensions`` rule is the engine-level form of the Python
planning layer (plans/catalog.py): with ``spark.polars.index.root`` set,
a postings aggregate over a base table whose (table, field) index is
materialized is answered from the index parquet — no base-table scan, no
shuffle, no aggregate.

The extension binds at JVM creation, so these tests drive a fresh
subprocess instead of the session-scoped fixture.  Skipped when the jar
hasn't been built (``sh jvm/build.sh``).
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JAR = os.path.join(REPO, "jvm", "polars-index-ext.jar")

pytestmark = pytest.mark.skipif(
    not os.path.exists(JAR), reason="extension jar not built (sh jvm/build.sh)"
)

_DRIVER = textwrap.dedent(
    """
    import json, sys, tempfile
    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession
    import pyspark.sql.functions as F

    root = tempfile.mkdtemp(prefix="idxroot_")
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.jars", {jar!r})
        .config("spark.driver.extraClassPath", {jar!r})
        .config("spark.sql.extensions",
                "org.polarsindex.PostingsIndexExtensions")
        .config("spark.polars.index.root", root)
        .getOrCreate()
    )
    from polars_w_inverted_index_spark.operators.inverted_index import (
        postings,
    )
    from polars_w_inverted_index_spark.plans.catalog import IndexCatalog

    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    IndexCatalog(spark, root).build(
        df, "lineitem", "l_returnflag", doc_id_col="l_orderkey"
    )

    def physical(q):
        return q._jdf.queryExecution().executedPlan().toString()

    out = {{}}

    # 1. postings on the indexed field: answered from the index.
    q = postings(df, "l_returnflag", doc_id_col="l_orderkey")
    plan = physical(q)
    out["indexed_scans_index"] = "lineitem__l_returnflag" in plan
    out["indexed_no_agg"] = "Aggregate" not in plan and "Exchange" not in plan
    got = {{r["value"]: list(r["doc_ids"]) for r in q.collect()}}
    truth = {{
        r["value"]: sorted(r["ids"])
        for r in df.where(
            F.col("l_returnflag").isNotNull()
            & F.col("l_orderkey").isNotNull()
        )
        .groupBy(F.col("l_returnflag").cast("string").alias("value"))
        .agg(F.collect_list("l_orderkey").alias("ids"))
        .collect()
    }}
    out["indexed_results_match"] = got == truth

    # 2. un-indexed field: rule declines, base scan + aggregate remain.
    q2 = postings(df, "l_linestatus", doc_id_col="l_orderkey")
    out["unindexed_keeps_agg"] = "lineitem.parquet" in physical(q2)

    # 3. extra predicate: NOT the whole-table postings build — no rewrite
    #    (an index answer would silently drop the predicate).
    q3 = postings(
        df.where(F.col("l_quantity") > 25),
        "l_returnflag",
        doc_id_col="l_orderkey",
    )
    p3 = physical(q3)
    out["filtered_keeps_base"] = "lineitem.parquet" in p3
    out["filtered_differs"] = (
        {{r["value"]: list(r["doc_ids"]) for r in q3.collect()}} != truth
    )

    # 4. value lookup THROUGH the rewrite: the filter lands as pushdown
    #    on the index parquet scan — a point lookup never aggregates.
    from polars_w_inverted_index_spark.operators.inverted_index import (
        value_lookup,
    )

    q4 = value_lookup(
        postings(df, "l_returnflag", doc_id_col="l_orderkey"), "R"
    )
    p4 = physical(q4)
    out["lookup_scans_index"] = "lineitem__l_returnflag" in p4
    out["lookup_pushed_filter"] = "PushedFilters: [IsNotNull(value), EqualTo(value,R)]" in p4
    out["lookup_rows"] = q4.count() == 1

    # 5. wrong recorded source: an index whose _index_source does not
    #    cover the scanned path must decline (stem-collision guard).
    import os
    marker = os.path.join(root, "lineitem__l_returnflag", "_index_source")
    orig = open(marker).read()
    with open(marker, "w") as fh:
        fh.write("/somewhere/else/lineitem.parquet")
    out["wrong_source_declines"] = "lineitem.parquet" in physical(
        postings(df, "l_returnflag", doc_id_col="l_orderkey")
    )
    with open(marker, "w") as fh:
        fh.write(orig)

    # 6. id-set postings (main.rs:271-395, isin strategy): the doc_id
    #    restriction is rebound onto the index postings as
    #    filter(doc_ids, x -> pred(x)) + drop-empty — no base scan, and
    #    results (incl. per-value id multiplicity) match the base plan.
    from polars_w_inverted_index_spark.plans.rewrite import (
        filter_by_doc_ids,
    )

    ids = list(range(0, 1500, 15))
    q6 = postings(
        filter_by_doc_ids(df, ids, "l_orderkey"),
        "l_returnflag",
        doc_id_col="l_orderkey",
    )
    p6 = physical(q6)
    out["ids_scans_index"] = "lineitem__l_returnflag" in p6
    out["ids_no_base_scan"] = "lineitem.parquet" not in p6
    idset = set(ids)
    truth6 = {{}}
    for v, l in truth.items():
        kept = [i for i in l if i in idset]
        if kept:
            truth6[v] = kept
    out["ids_results_match"] = {{
        r["value"]: list(r["doc_ids"]) for r in q6.collect()
    }} == truth6

    # 7. chunked index: partial (value, chunk, doc_ids) rows must never
    #    serve a plain postings query — rule declines on meta + schema.
    IndexCatalog(spark, root).build(
        df, "lineitem", "l_linestatus", doc_id_col="l_orderkey",
        chunked=True, max_postings_per_row=100,
    )
    out["chunked_declines"] = "lineitem.parquet" in physical(
        postings(df, "l_linestatus", doc_id_col="l_orderkey")
    )

    # 8. doc_id_col mismatch: the l_returnflag index was built over
    #    l_orderkey; a postings query collecting l_partkey for the same
    #    field must NOT be answered from it.
    out["wrong_doc_id_col_declines"] = "lineitem.parquet" in physical(
        postings(df, "l_returnflag", doc_id_col="l_partkey")
    )

    # 9. staleness: a fingerprint that no longer matches the base
    #    table's file listing (simulated by tampering the recorded
    #    digest — testdata is read-only) must decline; restoring it
    #    re-serves.  Same contract as IndexCatalog.lookup, enforced at
    #    the Catalyst layer.
    meta_p = os.path.join(root, "lineitem__l_returnflag", "_index_meta.json")
    meta_orig = open(meta_p).read()
    tampered = json.loads(meta_orig)
    assert tampered.get("fingerprint"), "build should record a fingerprint"
    tampered["fingerprint"] = "0" * 64
    with open(meta_p, "w") as fh:
        json.dump(tampered, fh)
    out["stale_fingerprint_declines"] = "lineitem.parquet" in physical(
        postings(df, "l_returnflag", doc_id_col="l_orderkey")
    )
    with open(meta_p, "w") as fh:
        fh.write(meta_orig)
    out["fresh_fingerprint_serves"] = "lineitem__l_returnflag" in physical(
        postings(df, "l_returnflag", doc_id_col="l_orderkey")
    )

    # 11. supplementary-plane filename in the table listing: Python
    #     digests the listing in code-point order; the JVM gate must
    #     compute the IDENTICAL digest (UTF-8 byte comparator — ADVICE
    #     r5: String.compareTo is UTF-16 code-unit order, which flips
    #     the order of U+FF5E vs U+1F600 prefixed names) and serve.
    import glob, shutil
    exo = os.path.join(root, "exotic_tbl")
    df.limit(500).repartition(2).write.mode("overwrite").parquet(exo)
    parts = sorted(glob.glob(os.path.join(exo, "part-*")))
    assert len(parts) >= 2
    # U+FF5E (BMP, sorts AFTER the surrogate range in UTF-16) vs
    # U+1F600 (supplementary, leads with a 0xD83D surrogate): code-point
    # order and UTF-16 code-unit order disagree on this pair.
    os.rename(parts[0], os.path.join(exo, "p～a.parquet"))
    os.rename(parts[1], os.path.join(exo, "p\U0001f600b.parquet"))
    df_exo = spark.read.parquet(exo)
    IndexCatalog(spark, root).build(
        df_exo, "exotic_tbl", "l_returnflag", doc_id_col="l_orderkey"
    )
    out["exotic_listing_serves"] = "exotic_tbl__l_returnflag" in physical(
        postings(df_exo, "l_returnflag", doc_id_col="l_orderkey")
    )

    # 12. output-type gates (r8): the index serves value as STRING and
    #     doc_ids as ARRAY<LONG>.  A hand-written postings-shaped
    #     aggregate whose analyzed output types differ must DECLINE —
    #     a rewrite would change the plan's schema post-analysis
    #     (resolveColumn looks through casts, so only the type gate
    #     stands between these plans and a silently-retyped rewrite).
    IndexCatalog(spark, root).build(
        df, "lineitem", "l_suppkey", doc_id_col="l_orderkey"
    )
    out["numeric_postings_serves"] = "lineitem__l_suppkey" in physical(
        postings(df, "l_suppkey", doc_id_col="l_orderkey")
    )
    raw_val = (
        df.where(
            F.col("l_suppkey").isNotNull() & F.col("l_orderkey").isNotNull()
        )
        .groupBy(F.col("l_suppkey").alias("value"))  # no string cast
        .agg(
            F.collect_list(F.col("l_orderkey").cast("long")).alias("doc_ids")
        )
        .withColumn("doc_ids", F.sort_array("doc_ids"))
    )
    out["raw_value_type_declines"] = "lineitem.parquet" in physical(raw_val)
    int_ids = (
        df.where(
            F.col("l_returnflag").isNotNull()
            & F.col("l_orderkey").isNotNull()
        )
        .groupBy(F.col("l_returnflag").cast("string").alias("value"))
        .agg(
            F.collect_list(F.col("l_orderkey").cast("int")).alias("doc_ids")
        )
        .withColumn("doc_ids", F.sort_array("doc_ids"))
    )
    out["int_ids_type_declines"] = "lineitem.parquet" in physical(int_ids)

    # 13. fingerprint-walk caching (r9 VERDICT task 3): warm indexed
    #     planning must NOT re-walk the base table's file listing (the
    #     O(#files) cost that grows with corpus size at 100 TB); an
    #     append must still flip the gate through the cache.  The table
    #     is backdated past the 2 s race window so caching engages.
    import time
    cache_tbl = os.path.join(root, "cache_tbl")
    df.limit(400).write.mode("overwrite").parquet(cache_tbl)
    df_c = spark.read.parquet(cache_tbl)
    IndexCatalog(spark, root).build(
        df_c, "cache_tbl", "l_returnflag", doc_id_col="l_orderkey"
    )
    def backdate(p, secs=10.0):
        t = time.time() - secs
        for dp, _dn, _fn in os.walk(p):
            os.utime(dp, (t, t))
    backdate(cache_tbl)
    Rule = spark._jvm.org.polarsindex.PostingsIndexRule
    Rule.invalidateFingerprintCache()
    # py4j converts the AtomicLong (a java.lang.Number) to a plain int
    w0 = Rule.FULL_WALKS
    p13 = physical(postings(df_c, "l_returnflag", doc_id_col="l_orderkey"))
    out["cache_cold_serves"] = "cache_tbl__l_returnflag" in p13
    w1 = Rule.FULL_WALKS
    out["cache_cold_walked"] = w1 > w0
    out["cache_warm_serves"] = all(
        "cache_tbl__l_returnflag"
        in physical(postings(df_c, "l_returnflag", doc_id_col="l_orderkey"))
        for _ in range(2)
    )
    out["cache_warm_no_rewalk"] = Rule.FULL_WALKS == w1
    df.limit(10).write.mode("append").parquet(cache_tbl)
    spark.catalog.refreshByPath(cache_tbl)
    out["cache_append_declines"] = "cache_tbl__l_returnflag" not in physical(
        postings(
            spark.read.parquet(cache_tbl), "l_returnflag",
            doc_id_col="l_orderkey",
        )
    )

    # 10. flag off: same session semantics, rule inert.
    spark.conf.unset("spark.polars.index.root")
    out["flag_off_keeps_base"] = "lineitem.parquet" in physical(
        postings(df, "l_returnflag", doc_id_col="l_orderkey")
    )

    print("RESULT_JSON:" + json.dumps(out))
    """
)


def test_index_rewrite_end_to_end():
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER.format(repo=REPO, jar=JAR)],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = next(
        (
            ln
            for ln in proc.stdout.splitlines()
            if ln.startswith("RESULT_JSON:")
        ),
        None,
    )
    assert line, proc.stdout[-4000:]
    import json

    res = json.loads(line[len("RESULT_JSON:"):])
    assert res == {
        "indexed_scans_index": True,
        "indexed_no_agg": True,
        "indexed_results_match": True,
        "unindexed_keeps_agg": True,
        "filtered_keeps_base": True,
        "filtered_differs": True,
        "lookup_scans_index": True,
        "lookup_pushed_filter": True,
        "lookup_rows": True,
        "wrong_source_declines": True,
        "ids_scans_index": True,
        "ids_no_base_scan": True,
        "ids_results_match": True,
        "chunked_declines": True,
        "wrong_doc_id_col_declines": True,
        "stale_fingerprint_declines": True,
        "fresh_fingerprint_serves": True,
        "exotic_listing_serves": True,
        "numeric_postings_serves": True,
        "raw_value_type_declines": True,
        "int_ids_type_declines": True,
        "cache_cold_serves": True,
        "cache_cold_walked": True,
        "cache_warm_serves": True,
        "cache_warm_no_rewalk": True,
        "cache_append_declines": True,
        "flag_off_keeps_base": True,
    }, res


_COMPOSITE_DRIVER = textwrap.dedent(
    """
    import json, os, sys, tempfile
    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession
    import pyspark.sql.functions as F

    root = tempfile.mkdtemp(prefix="idxroot_")
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.jars", {jar!r})
        .config("spark.driver.extraClassPath", {jar!r})
        .config("spark.sql.extensions",
                "org.polarsindex.PostingsIndexExtensions")
        .config("spark.polars.index.root", root)
        .getOrCreate()
    )
    from polars_w_inverted_index_spark import Engine
    from polars_w_inverted_index_spark.plans.catalog import IndexCatalog

    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    IndexCatalog(spark, root).build_composite(
        df, "lineitem", ["l_returnflag", "l_linestatus"],
        doc_id_col="l_orderkey",
    )

    def physical(q):
        return q._jdf.queryExecution().executedPlan().toString()

    out = {{}}
    # Engine WITHOUT a catalog: the base-path conjunctive plan — the
    # JVM rule must serve it transparently from the composite index.
    eng = Engine(spark, df=df, doc_id_col="l_orderkey")
    q = eng.get_doc_ids_where(
        {{"l_returnflag": "R", "l_linestatus": "F"}}
    )
    p = physical(q)
    out["conj_scans_index"] = "__AND__" in p
    out["conj_no_base_scan"] = "lineitem.parquet" not in p
    out["conj_pushed_filters"] = (
        "PushedFilters" in p and "v_l_returnflag" in p
    )
    got = sorted(r[0] for r in q.collect())
    want = sorted(
        r[0]
        for r in df.where(
            (F.col("l_returnflag") == "R")
            & (F.col("l_linestatus") == "F")
            & F.col("l_orderkey").isNotNull()
        ).select("l_orderkey").collect()
    )
    out["conj_results_match"] = got == want and len(got) > 0

    # subset conjunction: no composite index for (l_returnflag,) alone
    # — decline to the base plan (parity with lookup_composite)
    q2 = eng.get_doc_ids_where({{"l_returnflag": "R"}})
    out["subset_keeps_base"] = "lineitem.parquet" in physical(q2)

    # null-matching conjunct: the build suppressed null tuples, so an
    # IS NULL predicate (true on exactly those rows) must DECLINE —
    # no isnotnull(l_returnflag) guard exists in this plan, which is
    # the gate
    qn = df.where(
        F.col("l_returnflag").isNull()
        & (F.col("l_linestatus") == "F")
        & F.col("l_orderkey").isNotNull()
    ).select("l_orderkey")
    out["isnull_keeps_base"] = "lineitem.parquet" in physical(qn)

    # output-type safety (r8): a cast-wrapped id projection passes the
    # relation-type gate (resolveColumn looks through casts) but fixes
    # a DIFFERENT analyzed output type — the rewrite would retype the
    # plan's schema.  Both a string-typed output and a value-changing
    # long->int->long round-trip (output type long, values truncated)
    # must keep the base scan.
    conj = (
        (F.col("l_returnflag") == "R")
        & (F.col("l_linestatus") == "F")
        & F.col("l_orderkey").isNotNull()
    )
    out["cast_id_keeps_base"] = "lineitem.parquet" in physical(
        df.where(conj).select(
            F.col("l_orderkey").cast("string").alias("l_orderkey")
        )
    )
    out["roundtrip_cast_id_keeps_base"] = "lineitem.parquet" in physical(
        df.where(conj).select(
            F.col("l_orderkey").cast("int").cast("long").alias("l_orderkey")
        )
    )

    # staleness: tampered fingerprint must decline; restored re-serves
    idx = os.path.join(
        root, "lineitem__l_linestatus__AND__l_returnflag"
    )
    meta_p = os.path.join(idx, "_index_meta.json")
    meta_orig = open(meta_p).read()
    tam = json.loads(meta_orig)
    tam["fingerprint"] = "0" * 64
    with open(meta_p, "w") as fh:
        json.dump(tam, fh)
    out["stale_declines"] = "lineitem.parquet" in physical(
        eng.get_doc_ids_where(
            {{"l_returnflag": "R", "l_linestatus": "F"}}
        )
    )
    with open(meta_p, "w") as fh:
        fh.write(meta_orig)
    out["fresh_serves"] = "__AND__" in physical(
        eng.get_doc_ids_where(
            {{"l_returnflag": "R", "l_linestatus": "F"}}
        )
    )
    print("RESULT_JSON:" + json.dumps(out))
    """
)


def test_composite_conjunctive_rewrite_end_to_end():
    proc = subprocess.run(
        [sys.executable, "-c", _COMPOSITE_DRIVER.format(repo=REPO, jar=JAR)],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = next(
        (
            ln
            for ln in proc.stdout.splitlines()
            if ln.startswith("RESULT_JSON:")
        ),
        None,
    )
    assert line, proc.stdout[-4000:]
    import json

    res = json.loads(line[len("RESULT_JSON:"):])
    assert res == {
        "conj_scans_index": True,
        "conj_no_base_scan": True,
        "conj_pushed_filters": True,
        "conj_results_match": True,
        "subset_keeps_base": True,
        "isnull_keeps_base": True,
        "cast_id_keeps_base": True,
        "roundtrip_cast_id_keeps_base": True,
        "stale_declines": True,
        "fresh_serves": True,
    }, res
