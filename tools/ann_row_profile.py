"""Per-leg wall-clock + Spark-job-count profile of the ANN lifecycle row
(`similarity_ann_auto_topk`) — the r14 optimization round's measurement
harness (guide §1: measure first, label jobs).

Runs the EXACT leg sequence of registry_ext.q_ann_auto with a timer and
a job-count delta around each leg.  Runs the whole lifecycle
ANN_PROFILE_PASSES times (default 2) in one session and prints one JSON
line per pass — the last pass is steady-state (workers warm, codegen
cached), which is the regime the bench's timed reps see.

Usage: python tools/ann_row_profile.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def run_once(spark, emb, sf_dir):
    from polars_w_inverted_index_spark.functions.text import unigram_lm
    from polars_w_inverted_index_spark.operators import ann_deploy as AD
    from polars_w_inverted_index_spark.operators import ann_index as AI
    from polars_w_inverted_index_spark.registry import scratch_dir
    from polars_w_inverted_index_spark.registry_ext import N_QUERY_VECS, TOPK
    from polars_w_inverted_index_spark.streaming import ann_ingest_batch
    from polars_w_inverted_index_spark.streaming.ann_ingest import (
        mark_rebuilt,
        should_rebuild,
    )
    from polars_w_inverted_index_spark.streaming.drift import (
        drift_monitor_batch,
    )

    sc = spark.sparkContext
    legs = []

    def _alljobs():
        return int(sc._jsc.sc().dagScheduler().nextJobId())

    class leg:
        def __init__(self, name):
            self.name = name

        def __enter__(self):
            sc.setJobDescription(f"ann_row:{self.name}")
            self.j0 = _alljobs()
            self.t0 = time.perf_counter()
            return self

        def __exit__(self, *exc):
            legs.append(
                {
                    "leg": self.name,
                    "s": round(time.perf_counter() - self.t0, 3),
                    "jobs": _alljobs() - self.j0,
                }
            )
            sc.setJobDescription(None)

    dep = scratch_dir("ann_auto_idx_profile", sf_dir, wipe=True)
    report = os.path.join(dep, "_drift_reports")
    state = os.path.join(dep, "_drift_state")

    t_row0 = time.perf_counter()
    with leg("deployment_build"):
        root = AD.ann_deployment_build(
            emb.where(F.col("vec_id") % 48 == 0).select(
                "vec_id", "embedding"
            ),
            dep,
            n_centroids=4,
            n_iters=1,
            pq={"m_subspaces": 8, "n_codes": 8, "n_iters": 1},
        )
    with leg("mark_rebuilt"):
        mark_rebuilt(spark, root, report)
    b0 = emb.where(F.col("vec_id") % 48 == 12)
    b1 = emb.where(F.col("vec_id") % 48 == 24)
    with leg("ingest_b0_dial1"):
        ann_ingest_batch(b0, root, batch_id=0, max_batch_dirs_per_cell=1)
    with leg("ingest_b0_replay"):
        assert ann_ingest_batch(b0, root, batch_id=0) == 0
    with leg("ingest_b1_dial1"):
        ann_ingest_batch(b1, root, batch_id=1, max_batch_dirs_per_cell=1)
    m = AI._load_manifest(root)
    assert any(
        len(tags) == 1 and tags[0] < -1 for tags in m["cells"].values()
    )
    with leg("drift_ref_lm+monitor"):
        ref_lm = unigram_lm(
            spark.createDataFrame(
                [("alpha beta gamma delta",)], "text string"
            ),
            "text",
        )
        rep = drift_monitor_batch(
            spark.createDataFrame(
                [("zeta eta theta iota kappa",)], "text string"
            ),
            state,
            ref_lm,
            batch_id=0,
        )
        rep.write.mode("append").parquet(report)
    with leg("should_rebuild"):
        assert should_rebuild(spark, root, report)
    with leg("deployment_rebuild"):
        root = AD.ann_deployment_rebuild(spark, dep, report_path=report)
    with leg("post_rebuild_checks"):
        assert AD.resolve_ann_root(dep) == root
        assert not should_rebuild(spark, root, report)
        assert ann_ingest_batch(b1, root, batch_id=1) == 0
    b2 = emb.where(F.col("vec_id") % 48 == 36)
    with leg("ingest_b2_nodial"):
        ann_ingest_batch(b2, root, batch_id=2, max_batch_dirs_per_cell=None)
    q = emb.where(F.col("vec_id") < N_QUERY_VECS)
    with leg("serve_auto"):
        auto = AI.ann_search_auto(spark, root, q, k=TOPK, nprobe=4)
        auto.write.format("noop").mode("overwrite").save()
    with leg("emb_count"):
        n_rows = emb.count()
    with leg("serve_pq"):
        pq = AI.ann_search_pq(
            spark,
            root,
            q,
            k=TOPK,
            nprobe=4,
            rerank_factor=-(-n_rows // TOPK) + 1,
        )
        pq.write.format("noop").mode("overwrite").save()
    total = time.perf_counter() - t_row0
    return {
        "total_s": round(total, 3),
        "total_jobs": sum(x["jobs"] for x in legs),
        "legs": legs,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from polars_w_inverted_index_spark.session import get_session
    from polars_w_inverted_index_spark.sources.tables import load_table

    spark = get_session("ann_row_profile")
    emb = load_table(spark, sf_dir, "embeddings")
    emb.count()  # warm footers
    n_pass = int(os.environ.get("ANN_PROFILE_PASSES", "2"))
    for i in range(n_pass):
        out = run_once(spark, emb, sf_dir)
        out["pass"] = i
        out["sf_dir"] = sf_dir
        print(json.dumps(out))


if __name__ == "__main__":
    main()
