"""Query registry: named engine queries + DuckDB oracle SQL.

Single source of truth consumed by ``__spark_entry__.py`` (the driver
contract).  Every entry pairs a PySpark query ``(spark, sf_dir) ->
DataFrame`` with an equivalent ANSI-SQL string DuckDB runs on the same
parquet; the driver hash-compares results order-insensitively at sf0.01.

Conventions for oracle stability:
- every computed column aliased identically on both sides;
- postings arrays sorted on both sides (reference postings order is
  unspecified, SURVEY.md §1.4.4);
- floating aggregates that sum many doubles are rounded to a fixed number of
  decimals on BOTH sides (summation order differs between engines; the
  underlying engine API is unrounded — rounding is comparison discipline,
  SURVEY.md §7 hard part #3).

``lineitem`` plays the reference's ``logs`` role (FIXTURES.md):
``l_orderkey`` ≈ doc_id, ``l_returnflag``/``l_linestatus`` ≈ categorical
fields, ``l_extendedprice``/``l_quantity`` ≈ numeric fields.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .engine import Engine
from .functions.canon import csv_array, csv_array_sql
from .sources.tables import load_table

# Canonical id set for *_by_doc_ids queries — the reference uses
# ``[i * (N/100) for i in 0..100]`` (main.rs:731); lineitem orderkeys start
# at 0 and are dense-ish, so stepping by 15 keeps all 100 ids in-range at
# every sf (sf0.001 max orderkey = 1499).
DOC_IDS: list[int] = list(range(0, 1500, 15))

_IDS_SQL = "SELECT UNNEST([" + ",".join(map(str, DOC_IDS)) + "]) AS doc_id"


def _lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem")


def scratch_dir(name: str, sf_dir: str, wipe: bool = False) -> str:
    """Stable scratch directory for queries that materialize artifacts
    (index builds, write roundtrips).  A fresh ``mkdtemp`` per invocation
    leaked a full table copy every run (bench runs each query twice,
    pytest again); a fixed per-(name, sf) path bounds accumulation — the
    writers all use overwrite mode.  ``wipe`` clears it first for paths
    that must start empty (incremental index merges)."""
    import getpass
    import shutil
    import tempfile

    # Per-user component: a world-readable fixed path shared by two users
    # (or two concurrent CI runs under different accounts) would let their
    # parquet/index artifacts overwrite each other mid-read.
    try:
        user = getpass.getuser()
    except Exception:  # no passwd entry (containers)
        user = str(os.getuid()) if hasattr(os, "getuid") else "u"
    d = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_{user}",
        f"scratch_{name}_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    if wipe:
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    return d


# --------------------------------------------------------------------------
# Reference-parity queries (SURVEY.md §2.10)
# --------------------------------------------------------------------------

def q_field_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-table postings on l_returnflag (≈ get_field_values, main.rs:398)."""
    eng = Engine(spark, df=_lineitem(spark, sf_dir), doc_id_col="l_orderkey")
    return csv_array(eng.get_field_values("l_returnflag"), "doc_ids")


SQL_FIELD_VALUES = f"""
SELECT CAST(l_returnflag AS VARCHAR) AS value,
       {csv_array_sql('list(l_orderkey)')} AS doc_ids
FROM lineitem
WHERE l_returnflag IS NOT NULL AND l_orderkey IS NOT NULL
GROUP BY 1
"""


def q_field_values_by_doc_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Id-set postings on l_linestatus (≈ main.rs:271-395)."""
    eng = Engine(spark, df=_lineitem(spark, sf_dir), doc_id_col="l_orderkey")
    return csv_array(
        eng.get_field_values_by_doc_ids("l_linestatus", DOC_IDS), "doc_ids"
    )


SQL_FIELD_VALUES_BY_DOC_IDS = f"""
SELECT CAST(l_linestatus AS VARCHAR) AS value,
       {csv_array_sql('list(l_orderkey)')} AS doc_ids
FROM lineitem JOIN ({_IDS_SQL}) ids ON l_orderkey = ids.doc_id
WHERE l_linestatus IS NOT NULL AND l_orderkey IS NOT NULL
GROUP BY 1
"""


def q_numeric_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-table min/max/avg on l_extendedprice (≈ main.rs:611-689).
    avg rounded on both sides for cross-engine float stability."""
    eng = Engine(spark, df=_lineitem(spark, sf_dir), doc_id_col="l_orderkey")
    df = eng.get_numeric_stats("l_extendedprice")
    return df.select("min", "max", F.round("avg", 4).alias("avg"))


SQL_NUMERIC_STATS = """
SELECT CAST(MIN(l_extendedprice) AS DOUBLE) AS min,
       CAST(MAX(l_extendedprice) AS DOUBLE) AS max,
       ROUND(AVG(CAST(l_extendedprice AS DOUBLE)), 4) AS avg
FROM lineitem
"""


def q_numeric_stats_by_doc_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Id-set min/max/avg on l_quantity (≈ main.rs:510-608)."""
    eng = Engine(spark, df=_lineitem(spark, sf_dir), doc_id_col="l_orderkey")
    df = eng.get_numeric_stats_by_doc_ids("l_quantity", DOC_IDS)
    return df.select("min", "max", F.round("avg", 4).alias("avg"))


SQL_NUMERIC_STATS_BY_DOC_IDS = f"""
SELECT CAST(MIN(l_quantity) AS DOUBLE) AS min,
       CAST(MAX(l_quantity) AS DOUBLE) AS max,
       ROUND(AVG(CAST(l_quantity AS DOUBLE)), 4) AS avg
FROM lineitem JOIN ({_IDS_SQL}) ids ON l_orderkey = ids.doc_id
"""


def q_value_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-point-lookup semantic (SURVEY.md §4: "which doc_ids hold value
    X") — the query an IndexCatalog hit answers without scanning the base
    table; here expressed over the live postings build."""
    from .operators.inverted_index import value_lookup

    eng = Engine(spark, df=_lineitem(spark, sf_dir), doc_id_col="l_orderkey")
    return csv_array(
        value_lookup(eng.get_field_values("l_returnflag"), "R"), "doc_ids"
    )


SQL_VALUE_LOOKUP = f"""
SELECT CAST(l_returnflag AS VARCHAR) AS value,
       {csv_array_sql('list(l_orderkey)')} AS doc_ids
FROM lineitem
WHERE l_returnflag IS NOT NULL AND l_orderkey IS NOT NULL
  AND CAST(l_returnflag AS VARCHAR) = 'R'
GROUP BY 1
"""


def q_postings_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunked postings path (SURVEY.md §7 hard part #1): a deliberately
    small ``max_postings_per_row`` forces real multi-chunk splitting at
    sf0.01 (~20k rows/value ÷ 500 → ~40 chunks per value), then chunks are
    re-merged to the logical ``[value, doc_ids]`` shape so the oracle is
    the plain full-table postings SQL — chunked == unchunked, proven."""
    from .operators.inverted_index import postings_chunked

    chunked = postings_chunked(
        _lineitem(spark, sf_dir),
        "l_returnflag",
        doc_id_col="l_orderkey",
        max_postings_per_row=500,
    )
    merged = chunked.groupBy("value").agg(
        F.sort_array(F.flatten(F.collect_list("doc_ids"))).alias("doc_ids")
    )
    return csv_array(merged, "doc_ids", sort=False)  # sorted by the merge


def q_index_by_doc_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Id-set postings served FROM the materialized index (main.rs:271-395
    semantics, zero base-table scan): build the (lineitem, l_returnflag)
    index, then answer get_field_values_by_doc_ids through the attached
    catalog — the index's postings are filtered to the requested ids and
    emptied values dropped.  Must equal the base-table id-set build, so the
    oracle is the plain join-restricted postings SQL.  The plan is pinned
    index-only in tests/test_index_catalog.py."""
    from .plans.catalog import IndexCatalog

    cat = IndexCatalog(spark, scratch_dir("idxcat_ids", sf_dir))
    cat.build(
        _lineitem(spark, sf_dir), "lineitem", "l_returnflag",
        doc_id_col="l_orderkey",
    )
    eng = Engine(
        spark,
        df=_lineitem(spark, sf_dir),
        doc_id_col="l_orderkey",
        index_catalog=cat,
        table_name="lineitem",
    )
    pf = eng.get_field_values_by_doc_ids("l_returnflag", DOC_IDS)
    # r13 VERDICT task 7: the driver-facing Arrow materialization
    # (to_value_map_arrow — FieldValueResult.value_map's hot path,
    # main.rs:265-268) is pinned IN-PATH against its pickle-collect twin
    # on this row's bounded id-set postings, so the last untested
    # reference-API convenience fails the driver gate if the two ever
    # diverge (cheap: the frame is DOC_IDS-bounded at any SF).
    from .operators.inverted_index import to_value_map, to_value_map_arrow

    vm_arrow = {
        k: [int(x) for x in v] for k, v in to_value_map_arrow(pf).items()
    }
    if vm_arrow != to_value_map(pf):
        raise AssertionError(
            "index row: to_value_map_arrow diverged from to_value_map"
        )
    return csv_array(pf, "doc_ids")


SQL_INDEX_BY_DOC_IDS = f"""
SELECT CAST(l_returnflag AS VARCHAR) AS value,
       {csv_array_sql('list(l_orderkey)')} AS doc_ids
FROM lineitem JOIN ({_IDS_SQL}) ids ON l_orderkey = ids.doc_id
WHERE l_returnflag IS NOT NULL AND l_orderkey IS NOT NULL
GROUP BY 1
"""


def q_index_catalog_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IndexCatalog build→lookup roundtrip (SURVEY.md §4's "one custom
    piece"): materialize the postings index as a parquet side table, then
    answer the field-values query FROM the index — must equal the
    base-table build (same oracle SQL as ``field_values``)."""
    from .plans.catalog import IndexCatalog

    cat = IndexCatalog(spark, scratch_dir("idxcat", sf_dir))
    cat.build(
        _lineitem(spark, sf_dir), "lineitem", "l_returnflag",
        doc_id_col="l_orderkey",
    )
    return csv_array(cat.lookup("lineitem", "l_returnflag"), "doc_ids")


def q_index_composite_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite (multi-field) index serving a CONJUNCTIVE lookup (r7
    VERDICT task 6): materialize tuple-keyed postings over
    (l_returnflag, l_linestatus), then answer "doc_ids where returnflag
    = 'R' AND linestatus = 'F'" FROM the index — each equality a parquet
    pushed filter on its own ``v_<field>`` column, zero base-table scan
    (plan pinned index-only in tests/test_index_catalog.py).  Output is
    multiplicity-preserving exploded ids, so the oracle is the plain
    conjunctive base-table filter."""
    from .plans.catalog import IndexCatalog

    cat = IndexCatalog(spark, scratch_dir("idxcat_comp", sf_dir))
    li = _lineitem(spark, sf_dir)
    cat.build_composite(
        li, "lineitem", ["l_returnflag", "l_linestatus"],
        doc_id_col="l_orderkey",
    )
    eng = Engine(
        spark, df=li, doc_id_col="l_orderkey", index_catalog=cat,
        table_name="lineitem",
    )
    return eng.get_doc_ids_where(
        {"l_returnflag": "R", "l_linestatus": "F"}
    ).withColumnRenamed("l_orderkey", "doc_id")


SQL_INDEX_COMPOSITE = """
SELECT l_orderkey AS doc_id
FROM lineitem
WHERE CAST(l_returnflag AS VARCHAR) = 'R'
  AND CAST(l_linestatus AS VARCHAR) = 'F'
  AND l_orderkey IS NOT NULL
"""


def q_index_composite_streaming_lookup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The r9 streaming-maintained composite index serving the SAME
    conjunctive lookup as ``index_composite_lookup``: the tuple postings
    are built by TWO foreachBatch-style merges (halves of lineitem)
    instead of a static build, adopted into the catalog, and served via
    the re-resolved pointer — same oracle (the conjunctive base filter),
    so a hash match proves the incremental merge converges to the static
    build's answer.  r10: the merges run in the chunked/LSM mode
    (``max_postings_per_row``) so the hash match now ALSO pins the
    segment-append path — per-merge bytes track the batch, not the
    index (streaming/index_maintenance.py module docstring).  r11: the
    served index additionally passes through ``compact_index`` (the LSM
    fold) and ``rebucket_index`` (the skew dial, 16→32 buckets) before
    adoption, so the driver hash now re-proves BOTH maintenance
    mutations against the same oracle every round (r10 VERDICT task 2 —
    they were pytest-only)."""
    from .plans.catalog import IndexCatalog
    from .streaming.index_maintenance import (
        compact_index,
        merge_composite_postings_batch,
        rebucket_index,
    )

    li = _lineitem(spark, sf_dir)
    idx = scratch_dir("idxcat_comp_stream_idx2", sf_dir, wipe=True)
    fields = ["l_returnflag", "l_linestatus"]
    merge_composite_postings_batch(
        li.where(F.col("l_orderkey") % 2 == 0), fields, idx,
        "l_orderkey", batch_id=0, max_postings_per_row=4096,
    )
    merge_composite_postings_batch(
        li.where(F.col("l_orderkey") % 2 == 1), fields, idx,
        "l_orderkey", batch_id=1,
    )
    compact_index(spark, idx)
    rebucket_index(spark, idx, 32)
    cat = IndexCatalog(spark, scratch_dir("idxcat_comp_stream", sf_dir))
    cat.adopt_streaming_composite(
        "lineitem", fields, idx, doc_id_col="l_orderkey"
    )
    eng = Engine(
        spark, df=li, doc_id_col="l_orderkey", index_catalog=cat,
        table_name="lineitem",
    )
    return eng.get_doc_ids_where(
        {"l_returnflag": "R", "l_linestatus": "F"}
    ).withColumnRenamed("l_orderkey", "doc_id")


# --------------------------------------------------------------------------
# Registry assembly
# --------------------------------------------------------------------------

from .registry_slot import Slot  # noqa: E402

_CORE: list[Slot] = [
    Slot("field_values", q_field_values, SQL_FIELD_VALUES),
    Slot(
        "field_values_by_doc_ids",
        q_field_values_by_doc_ids,
        SQL_FIELD_VALUES_BY_DOC_IDS,
    ),
    Slot("numeric_stats", q_numeric_stats, SQL_NUMERIC_STATS),
    Slot(
        "numeric_stats_by_doc_ids",
        q_numeric_stats_by_doc_ids,
        SQL_NUMERIC_STATS_BY_DOC_IDS,
    ),
    Slot("index_value_lookup", q_value_lookup, SQL_VALUE_LOOKUP),
    # ROTATED OUT r9 (slot went to index_composite_streaming_lookup):
    # its oracle is literally SQL_FIELD_VALUES (chunked == unchunked,
    # so the driver row duplicated field_values' check), and the
    # chunked machinery is pinned by
    # tests/test_reference_queries.py::test_postings_chunked_bounded_rows
    # (row-bound invariant), tests/test_plan_quality.py (no static
    # broadcast of per-value counts),
    # tests/test_index_catalog.py::test_chunked_index_merges_on_lookup
    # (catalog merge), and the JVM chunked-declines gate in
    # tests/test_catalyst_extension.py.
    Slot(
        "postings_chunked_merged",
        q_postings_chunked,
        SQL_FIELD_VALUES,
        registered=False,
        evidence=(
            "rotated out r9 (slot went to "
            "index_composite_streaming_lookup): oracle duplicated "
            "field_values by construction; chunked path pinned in "
            "tests/test_reference_queries.py, tests/test_plan_quality.py, "
            "tests/test_index_catalog.py, tests/test_catalyst_extension.py"
        ),
    ),
    # ROTATED OUT r8 (slot went to index_composite_lookup): the
    # single-field build→lookup roundtrip duplicated field_values'
    # oracle, is plan-pinned index-only in tests/test_index_catalog.py,
    # and its catalog machinery (markers, fingerprint staleness, source
    # identity) is exercised by the composite row's build path too.
    Slot(
        "index_catalog_lookup",
        q_index_catalog_lookup,
        SQL_FIELD_VALUES,
        registered=False,
        evidence=(
            "rotated out r8 (slot went to index_composite_lookup): "
            "equals field_values' oracle by construction; roundtrip + "
            "index-only plan pinned in tests/test_index_catalog.py"
        ),
    ),
    Slot("index_by_doc_ids_lookup", q_index_by_doc_ids, SQL_INDEX_BY_DOC_IDS),
    Slot(
        "index_composite_lookup",
        q_index_composite_lookup,
        SQL_INDEX_COMPOSITE,
    ),
    # REGISTERED r9 (slot from postings_chunked_merged): the
    # STREAMING-maintained composite index serving the same conjunctive
    # lookup — two foreachBatch-style merges must converge to the
    # static build's answer (hash-matched against the conjunctive base
    # oracle).  Also pinned by tests/test_index_catalog.py::
    # test_streaming_composite_index_serves_and_stays_fresh.
    Slot(
        "index_composite_streaming_lookup",
        q_index_composite_streaming_lookup,
        SQL_INDEX_COMPOSITE,
    ),
]

# Extension operators (dedup / similarity / text analysis / SQL breadth)
from . import registry_ext as _ext  # noqa: E402

# Driver-verification round 2 (sources, predicates, paths, as-of join)
from . import registry_round2 as _r2  # noqa: E402

# ---------------------------------------------------------------------------
# THE slot table (VERDICT r5 task 7): every candidate query across the
# three declaration modules in one auditable list — name, fn, oracle,
# registered (holds one of the ≤50 driver rows), and the evidence that
# covers it.  Unregistered candidates (engine-path twins, folded
# sub-sources, redundant set-ops) stay in the table with pointers to the
# pytest/folded evidence that replaced their driver row, so a cap
# rotation is a reviewable diff of `registered=` flags, never a silent
# drop.
# ---------------------------------------------------------------------------
TABLE: list[Slot] = _CORE + _ext.CANDIDATES + _r2.CANDIDATES

_names = [s.name for s in TABLE]
assert len(_names) == len(set(_names)), (
    f"duplicate slot names: {[n for n in _names if _names.count(n) > 1]}"
)
for _s in TABLE:
    assert _s.registered is False or _s.oracle is not None, (
        f"registered slot {_s.name} must carry a DuckDB oracle"
    )

# The driver's correctness sweep records at most 50 rows in registration
# order (CORRECTNESS_r02 held exactly 50 of 51 registered entries; the
# 51st — events_asof_join, registered last — was the one without a row,
# while the same snapshot's bench did include it).  Defensive ordering:
# rows that most need fresh evidence (previously missing or failed, newly
# added) run first; the registry itself is kept to ≤50 entries.
_PRIORITY = [
    "index_composite_streaming_lookup",  # newly registered r9
    "index_composite_lookup",
    "span_dedup_spans",
    "events_asof_join",
    "index_by_doc_ids_lookup",
    "sql_events_sessionize",
    "pipeline_train_val_split",
    "source_inmemory_json_roundtrip",
]


def _reorder(d: dict) -> dict:
    head = {k: d[k] for k in _PRIORITY if k in d}
    head.update({k: v for k, v in d.items() if k not in head})
    return head


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = _reorder(
    {s.name: s.fn for s in TABLE if s.registered}
)
ORACLES: dict[str, str] = _reorder(
    {s.name: s.oracle for s in TABLE if s.registered and s.oracle is not None}
)
assert len(QUERIES) <= 50, f"driver sweep caps at 50 rows, have {len(QUERIES)}"


def slot_table() -> str:
    """Human-readable audit of the full candidate table — one line per
    slot: driver-registered or not, oracle presence, and evidence."""
    lines = []
    for s in TABLE:
        mark = "DRIVER" if s.registered else "  --  "
        orc = "sql" if s.oracle is not None else " - "
        lines.append(f"{mark} [{orc}] {s.name:<40} {s.evidence}")
    reg = sum(1 for s in TABLE if s.registered)
    lines.append(f"{reg} registered of {len(TABLE)} candidates (cap 50)")
    return "\n".join(lines)


def flagship(spark: SparkSession) -> DataFrame:
    """Driver smoke query: id-set postings at sf0.001."""
    sf_dir = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
    return q_field_values_by_doc_ids(spark, sf_dir)
