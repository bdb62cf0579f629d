"""Z-order clustered writes (sources/parquet.write_zordered).

The testable claim is in the parquet FOOTERS: after z-ordering on
(a, b), every file covers a small fraction of BOTH columns' global
ranges — whereas a single-column sort leaves the secondary column
spanning ~the full range in every file.  Footer min/max is exactly what
row-group/file pruning consumes, so this is engine-independent evidence
of pruning power, not a timing flake.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from polars_w_inverted_index_spark.sources.parquet import (
    write_sorted_parquet,
    write_zordered,
)


def _file_range_fractions(path: str, col: str) -> list[float]:
    """Per-file (max-min)/(global range) for ``col`` from footer stats."""
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    spans = []
    glo, ghi = None, None
    per_file = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo = min(
            md.row_group(i).column(idx).statistics.min
            for i in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(i).column(idx).statistics.max
            for i in range(md.num_row_groups)
        )
        per_file.append((lo, hi))
        glo = lo if glo is None else min(glo, lo)
        ghi = hi if ghi is None else max(ghi, hi)
    rng = float(ghi - glo) or 1.0
    for lo, hi in per_file:
        spans.append((hi - lo) / rng)
    return spans


@pytest.fixture(scope="module")
def paths(spark, sf_dir, tmp_path_factory):
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    base = tmp_path_factory.mktemp("zorder")
    zpath = str(base / "z")
    spath = str(base / "s")
    write_zordered(li, zpath, ["l_orderkey", "l_partkey"],
                   target_partitions=8)
    write_sorted_parquet(li, spath, sort_col="l_orderkey",
                         target_partitions=8)
    return li, zpath, spath


def test_roundtrip_identical_rows(spark, paths):
    li, zpath, _ = paths
    back = spark.read.parquet(zpath)
    assert back.count() == li.count()
    key = lambda df: sorted(  # noqa: E731
        (r["l_orderkey"], r["l_partkey"], float(r["l_quantity"]))
        for r in df.collect()
    )
    assert key(back) == key(li)


def test_zorder_bounds_both_columns(paths):
    _, zpath, spath = paths
    # sorted-by-orderkey layout: orderkey tightly bounded per file,
    # partkey spans ~everything in every file
    s_order = _file_range_fractions(spath, "l_orderkey")
    s_part = _file_range_fractions(spath, "l_partkey")
    assert sum(s_order) / len(s_order) < 0.35
    assert sum(s_part) / len(s_part) > 0.8

    # z-ordered layout: BOTH columns bounded well below the sorted
    # layout's secondary column
    z_order = _file_range_fractions(zpath, "l_orderkey")
    z_part = _file_range_fractions(zpath, "l_partkey")
    assert sum(z_order) / len(z_order) < 0.7
    assert sum(z_part) / len(z_part) < 0.7
    assert sum(z_part) / len(z_part) < 0.75 * (sum(s_part) / len(s_part))


def test_zorder_key_is_jvm_expression(spark, paths):
    li, _, _ = paths
    from polars_w_inverted_index_spark.sources.parquet import zorder_key

    z = li.select(
        zorder_key(["l_orderkey", "l_partkey"], [0, 0], [100, 100], 8)
        .alias("z")
    )
    plan = z._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
    # interleave really maps distinct (a, b) to distinct z at full bits
    n_in = li.select("l_orderkey", "l_partkey").distinct().count()
    li2 = li.select("l_orderkey", "l_partkey").distinct()
    mins = [0, 0]
    maxs = [
        li.agg(F.max("l_orderkey")).first()[0],
        li.agg(F.max("l_partkey")).first()[0],
    ]
    nz = li2.select(
        zorder_key(["l_orderkey", "l_partkey"], mins, maxs, 20).alias("z")
    ).distinct().count()
    # 20 bits/col over ranges << 2^20: quantization is injective
    assert nz == n_in


def test_degenerate_and_null_columns(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 5, None), (2, 5, 3), (3, 5, 9)],
        "a long, c long, n long",  # c constant, n has a null
    )
    p = str(tmp_path / "zdeg")
    write_zordered(df, p, ["a", "c", "n"], target_partitions=2)
    back = spark.read.parquet(p)
    assert back.count() == 3
    assert back.where(F.col("n").isNull()).count() == 1


def test_all_null_cluster_column(spark, tmp_path):
    """r11: an ALL-null cluster column has None min/max — it must be
    treated as degenerate (constant bits), not crash on float(None)."""
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, None)], "a long, n long"
    )
    p = str(tmp_path / "zallnull")
    write_zordered(df, p, ["n", "a"], target_partitions=2)
    back = spark.read.parquet(p)
    assert back.count() == 3
    assert back.where(F.col("n").isNull()).count() == 3
