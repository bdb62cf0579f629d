"""Property fuzz for the streaming LSM index (r11).

The targeted tests pin each maintenance path one at a time (segment
append, compact, rebucket, autocompact dial, replay, crash); this file
drives RANDOM INTERLEAVINGS of them — merge / replay / compact /
rebucket in hypothesis-chosen orders over hypothesis-chosen batches
(null values, null doc ids, hot values, empty batches) — and asserts
after every sequence:

- the logical view equals ``postings()`` of everything merged exactly
  once (replays are no-ops EVEN right after a compaction/rebucket,
  whose ``batch_id=None`` commits must preserve the replay guard);
- chunk rows stay bounded and per-segment (value, chunk) stays unique
  whenever the last mutation was a fold (compact/rebucket);
- the marker's fragmentation stats match the on-disk pointer state.
"""

from __future__ import annotations

import json
import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

import polars_w_inverted_index_spark.streaming.index_maintenance as im
from polars_w_inverted_index_spark.operators.inverted_index import postings
from polars_w_inverted_index_spark.session import get_session

ROWS = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 40)),          # doc_id
        st.one_of(
            st.none(), st.sampled_from(["a", "b", "hot", "", "é中"])
        ),                                                  # value
    ),
    min_size=0,
    max_size=12,
)

OPS = st.lists(
    st.one_of(
        st.tuples(st.just("merge"), ROWS),
        st.tuples(st.just("replay"), st.none()),
        st.tuples(st.just("compact"), st.none()),
        st.tuples(st.just("rebucket"), st.sampled_from([1, 3, 8])),
    ),
    min_size=2,
    max_size=6,
)

_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@_SETTINGS
@given(ops=OPS, cap=st.sampled_from([1, 3]))
def test_fuzz_interleaved_maintenance_converges(ops, cap, tmp_path_factory):
    spark = get_session("property_tests")
    idx = str(tmp_path_factory.mktemp("lsm_fuzz") / "idx")

    merged: list[tuple] = []   # rows merged exactly once (truth input)
    last_batch_rows = None
    batch_id = 0
    folded = False
    for op, arg in ops:
        if op == "merge":
            im.merge_postings_batch(
                spark.createDataFrame(
                    arg, "event_id long, event_type string"
                ) if arg else spark.createDataFrame(
                    [], "event_id long, event_type string"
                ),
                "event_type", idx, "event_id",
                batch_id=batch_id, max_postings_per_row=cap,
                n_buckets=2, max_segments_per_bucket=None,
            )
            merged.extend(arg)
            last_batch_rows = arg
            batch_id += 1
            folded = False
        elif op == "replay":
            if last_batch_rows is None:
                continue  # nothing committed yet
            # foreachBatch at-least-once: same batch_id re-delivered —
            # must be a no-op even right after compact/rebucket
            im.merge_postings_batch(
                spark.createDataFrame(
                    last_batch_rows, "event_id long, event_type string"
                ) if last_batch_rows else spark.createDataFrame(
                    [], "event_id long, event_type string"
                ),
                "event_type", idx, "event_id",
                batch_id=batch_id - 1,
            )
        elif op == "compact":
            im.compact_index(spark, idx)
            folded = os.path.exists(os.path.join(idx, "_LATEST"))
        elif op == "rebucket":
            if not os.path.exists(os.path.join(idx, "_LATEST")):
                continue  # rebucket on an empty index raises by contract
            im.rebucket_index(spark, idx, arg)
            folded = True

    if not os.path.exists(os.path.join(idx, "_LATEST")):
        return  # sequence never merged anything

    truth_df = spark.createDataFrame(
        merged, "event_id long, event_type string"
    ) if merged else spark.createDataFrame(
        [], "event_id long, event_type string"
    )
    truth = {
        r["value"]: sorted(r["doc_ids"])
        for r in postings(truth_df, "event_type", "event_id").collect()
    }
    view = im.read_index_postings(spark, idx)
    got = {} if view is None else {
        r["value"]: list(r["doc_ids"]) for r in view.collect()
    }
    assert got == truth

    # marker stats match the pointer state it describes
    with open(os.path.join(idx, "_LATEST")) as f:
        marker = json.load(f)
    frag = im.index_fragmentation(idx)
    segs = [
        len(v) if isinstance(v, list) else 1
        for v in marker["buckets"].values()
    ]
    assert frag["segments"] == sum(segs)
    assert frag["max_segments_per_bucket"] == max(segs, default=0)

    raw = im.read_index(spark, idx)
    if raw is not None:
        # chunk rows bounded (merge slices exactly; folds re-chunk with
        # the hash assignment, bound 2x in expectation at tiny caps we
        # allow a wide multiplicative margin)
        assert all(
            len(r["doc_ids"]) <= max(4 * cap, 8) for r in raw.collect()
        )
        if folded:  # last mutation folded -> single segments, unique keys
            assert all(len(v) == 1 for v in marker["buckets"].values())
            dupes = (
                raw.groupBy("value", "chunk")
                .count()
                .where("count > 1")
                .count()
            )
            assert dupes == 0


CROWS = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 30)),                # doc_id
        st.one_of(st.none(), st.sampled_from(["R", "N", ""])),   # f1
        st.one_of(st.none(), st.sampled_from(["F", "O"])),       # f2
    ),
    min_size=0,
    max_size=10,
)

COPS = st.lists(
    st.one_of(
        st.tuples(st.just("merge"), CROWS),
        st.tuples(st.just("replay"), st.none()),
        st.tuples(st.just("compact"), st.none()),
        st.tuples(st.just("rebucket"), st.sampled_from([1, 4])),
    ),
    min_size=2,
    max_size=5,
)


@_SETTINGS
@given(ops=COPS, cap=st.sampled_from([1, 3]))
def test_fuzz_composite_interleaved_maintenance(ops, cap, tmp_path_factory):
    """The composite (tuple-keyed) twin of the interleaving fuzz: the
    same maintenance mutations over two-field tuples, converging to the
    distinct-(tuple, id) truth with NULL components dropped (the
    postings null-pair rule applies to the WHOLE tuple)."""
    spark = get_session("property_tests")
    idx = str(tmp_path_factory.mktemp("lsm_cfuzz") / "idx")
    schema = "event_id long, f1 string, f2 string"

    merged: list[tuple] = []
    last_batch_rows = None
    batch_id = 0
    for op, arg in ops:
        if op == "merge":
            im.merge_composite_postings_batch(
                spark.createDataFrame(arg, schema),
                ["f1", "f2"], idx, "event_id",
                batch_id=batch_id, max_postings_per_row=cap,
                n_buckets=2, max_segments_per_bucket=None,
            )
            merged.extend(arg)
            last_batch_rows = arg
            batch_id += 1
        elif op == "replay":
            if last_batch_rows is None:
                continue
            im.merge_composite_postings_batch(
                spark.createDataFrame(last_batch_rows, schema),
                ["f1", "f2"], idx, "event_id", batch_id=batch_id - 1,
            )
        elif op == "compact":
            im.compact_index(spark, idx)
        elif op == "rebucket":
            if not os.path.exists(os.path.join(idx, "_LATEST")):
                continue
            im.rebucket_index(spark, idx, arg)

    if not os.path.exists(os.path.join(idx, "_LATEST")):
        return

    truth: dict = {}
    for did, f1, f2 in merged:  # multiplicity-preserving (P5 on tuples)
        if did is None or f1 is None or f2 is None:
            continue
        truth.setdefault((f1, f2), []).append(did)
    truth = {k: sorted(v) for k, v in truth.items()}

    view = im.read_composite_index(spark, idx)
    got = {} if view is None else {
        (r["v_f1"], r["v_f2"]): list(r["doc_ids"]) for r in view.collect()
    }
    assert got == truth
