"""The unified slot table (registry.TABLE) — VERDICT r5 task 7.

The driver's correctness sweep caps at 50 rows, so slots rotate; the
table makes every rotation auditable: all candidates in one list, each
either holding a driver row or carrying a pointer to the evidence that
replaced it.  No Spark session needed — these are pure-structure checks.
"""

from polars_w_inverted_index_spark import registry as R
from polars_w_inverted_index_spark.registry_slot import DRIVER_EVIDENCE


def test_registered_slots_match_driver_contract():
    registered = [s for s in R.TABLE if s.registered]
    assert len(registered) == len(R.QUERIES) <= 50
    assert set(R.QUERIES) == {s.name for s in registered}
    # every registered slot carries a DuckDB oracle (hash-compared, not
    # just rows-only) and the ORACLES dict mirrors them exactly
    assert set(R.ORACLES) == set(R.QUERIES)
    for s in registered:
        assert s.oracle is not None, s.name


def test_table_names_unique_and_rotations_documented():
    names = [s.name for s in R.TABLE]
    assert len(names) == len(set(names))
    unregistered = [s for s in R.TABLE if not s.registered]
    # rotations must exist in the table (nothing silently dropped) ...
    assert {"similarity_bruteforce_topk_gemm", "sql_set_intersect",
            "source_inmemory_rows", "source_json_roundtrip"} <= {
        s.name for s in unregistered
    }
    # ... and each must say where its evidence lives instead
    for s in unregistered:
        assert s.evidence != DRIVER_EVIDENCE, s.name
        assert ("tests/" in s.evidence) or ("folded into" in s.evidence), (
            s.name,
            s.evidence,
        )


def test_priority_rows_lead_registration_order():
    # the defensive ordering puts evidence-hungry rows first, so a
    # driver snapshot that truncates at 50 keeps them
    head = list(R.QUERIES)[: len(R._PRIORITY)]
    assert head == [p for p in R._PRIORITY if p in R.QUERIES]


def test_slot_table_renders_every_candidate():
    rendered = R.slot_table()
    for s in R.TABLE:
        assert s.name in rendered
    assert f"{sum(s.registered for s in R.TABLE)} registered" in rendered
