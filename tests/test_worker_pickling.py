"""Worker closures must not require the repo on the executor path.

A mapInPandas/applyInPandas callback that references a module-level
function pickles it BY REFERENCE, so the executor-side Python worker
must ``import polars_w_inverted_index_spark`` — which only resolves
when the driver's cwd happens to be the repo root.  The grading
harness imports the contract from wherever IT runs, so every
Python-closure operator is driven here from a subprocess whose cwd is
a temp dir (repo reachable only via driver-side sys.path, exactly the
hostile layout).  pack_documents failed this in r8 (bfd_assign was a
module-global reference, fixed via functions/pickling.by_value).
"""

from __future__ import annotations

import subprocess
import sys
import textwrap


_DRIVER = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from polars_w_inverted_index_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    emb = load_table(spark, sf, "embeddings")
    out = {}

    from polars_w_inverted_index_spark.operators.packing import (
        pack_documents,
    )
    from polars_w_inverted_index_spark.functions.text import token_count

    out["pack"] = pack_documents(
        docs.select("doc_id", token_count("text").alias("tc")), "tc", 2048
    ).count()

    from polars_w_inverted_index_spark.operators import pq as PQ

    cb = PQ.pq_train(emb, m_subspaces=4, n_codes=8, n_iters=2)
    enc = PQ.pq_encode(emb, cb)
    out["pq_encode"] = enc.count()
    out["pq_topk"] = PQ.pq_topk(
        enc, emb.where(F.col("vec_id") < 3), cb, k=3
    ).count()

    import tempfile

    from polars_w_inverted_index_spark.operators.ann_index import (
        ann_search_pq,
        build_ann_index,
        pq_augment_ann_index,
    )

    root = tempfile.mkdtemp()
    build_ann_index(emb, root, n_centroids=4)
    pq_augment_ann_index(spark, root, m_subspaces=4, n_codes=8)
    out["ann_pq"] = ann_search_pq(
        spark, root, emb.where(F.col("vec_id") < 3), k=3
    ).count()

    from polars_w_inverted_index_spark.operators.dedup import (
        embedding_cosine_pairs_gemm,
    )

    out["gemm_pairs"] = embedding_cosine_pairs_gemm(
        emb, threshold=0.2
    ).count()

    from polars_w_inverted_index_spark.operators.similarity import (
        brute_force_topk_gemm,
    )

    out["btk_gemm"] = brute_force_topk_gemm(
        emb, emb.where(F.col("vec_id") < 3), k=3
    ).count()

    from polars_w_inverted_index_spark.registry import QUERIES

    for name in (
        "multimodal_image_features",
        "multimodal_resize",
        "multimodal_frame_sample",
        "streaming_session_windows",
        "dedup_embedding_cosine_pairs",
        "similarity_pq_rerank_topk",
        # r11 GEMM serving rows: mapInArrow closures shipping the
        # shared decode via pickling.by_value — exactly this gate's
        # failure class if a repo-global reference sneaks in
        "similarity_lsh_topk",
        "similarity_ivf_topk",
        "similarity_ann_auto_topk",
    ):
        out[name] = QUERIES[name](spark, "/root/testdata/sf0.01").count()

    print("RESULT", out)
    """
)


def test_python_closure_operators_run_with_foreign_cwd(tmp_path):
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER],
        cwd=str(tmp_path),  # NOT the repo root — the hostile layout
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = next(
        ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT")
    )
    res = eval(line[len("RESULT "):])  # noqa: S307 - our own output
    assert all(v > 0 for v in res.values()), res


def test_by_value_is_callable_and_rejects_repo_globals():
    """by_value copies stdlib-only helpers verbatim and REFUSES one
    that references a repo global (which would re-ship by reference
    and silently reintroduce the worker-import trap)."""
    import pytest

    from polars_w_inverted_index_spark.functions.pickling import by_value
    from polars_w_inverted_index_spark.operators.packing import bfd_assign

    copy = by_value(bfd_assign)
    assert copy([5, 3, 9, 2], 10) == bfd_assign([5, 3, 9, 2], 10)

    # a helper that leans on a repo object must be refused — both when
    # it arrives via a closure cell (nested def, the common shape) ...
    def leaky_closure(counts, budget):
        return bfd_assign(counts, budget)  # freevar -> closure cell

    with pytest.raises(ValueError, match="worker-import trap"):
        by_value(leaky_closure)

    # ... and via a module global (top-level def shape)
    import polars_w_inverted_index_spark.operators.packing as packing_mod

    code = compile(
        "def leaky_global(counts, budget):\n"
        "    return bfd_assign(counts, budget)\n",
        "<test>",
        "exec",
    )
    ns = {"bfd_assign": packing_mod.bfd_assign}
    exec(code, ns)
    with pytest.raises(ValueError, match="worker-import trap"):
        by_value(ns["leaky_global"])


def test_by_value_sees_through_nested_defs():
    """r8 ADVICE: by_value scanned only the top-level co_names, so a
    global referenced ONLY inside a nested def was (a) dropped from the
    restricted globals (NameError on executors) and (b) never checked
    for repo references (silent guard bypass).  Both paths must recurse
    through nested code objects."""
    import math

    import pytest

    from polars_w_inverted_index_spark.functions.pickling import by_value
    import polars_w_inverted_index_spark.operators.packing as packing_mod

    # (a) a stdlib global used only inside a nested def must survive
    # into the copy's restricted globals
    code = compile(
        "def outer_ok(xs):\n"
        "    def inner(x):\n"
        "        return math.sqrt(x)\n"
        "    return [inner(x) for x in xs]\n",
        "<test>",
        "exec",
    )
    ns = {"math": math}
    exec(code, ns)
    copy = by_value(ns["outer_ok"])
    assert copy([4.0, 9.0]) == [2.0, 3.0]

    # (b) a repo global reachable only through a nested def must be
    # refused, not silently shipped by reference
    code = compile(
        "def outer_leaky(counts, budget):\n"
        "    def inner():\n"
        "        return bfd_assign(counts, budget)\n"
        "    return inner()\n",
        "<test>",
        "exec",
    )
    ns = {"bfd_assign": packing_mod.bfd_assign}
    exec(code, ns)
    with pytest.raises(ValueError, match="worker-import trap"):
        by_value(ns["outer_leaky"])
