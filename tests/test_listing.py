"""functions/listing.py — the O(#dirs) token guarding the O(#files)
fingerprint walks (r8 VERDICT task 3).  Pure-filesystem tests, no Spark.
"""

from __future__ import annotations

import os
import time

from polars_w_inverted_index_spark.functions.listing import (
    cached_listing_digest,
    invalidate_listing_cache,
    listing_token,
)


def _backdate(path, secs=10.0):
    t = time.time() - secs
    for dp, _dn, _fn in os.walk(path):
        os.utime(dp, (t, t))


def _mk_tree(tmp_path):
    root = tmp_path / "tbl"
    (root / "cell=1").mkdir(parents=True)
    (root / "cell=2").mkdir()
    (root / "cell=1" / "part-0.parquet").write_bytes(b"a" * 10)
    (root / "cell=2" / "part-1.parquet").write_bytes(b"b" * 20)
    (root / "_SUCCESS").write_bytes(b"")
    return str(root)


def test_fresh_tree_is_never_cached(tmp_path):
    src = _mk_tree(tmp_path)
    assert listing_token(src) is None  # inside the race window
    calls = []

    def compute(p):
        calls.append(p)
        return "D"

    invalidate_listing_cache()
    assert cached_listing_digest(src, compute, "t") == "D"
    assert cached_listing_digest(src, compute, "t") == "D"
    assert len(calls) == 2  # racily fresh: every call re-computes


def test_settled_tree_caches_and_any_dir_change_invalidates(tmp_path):
    src = _mk_tree(tmp_path)
    _backdate(src)
    t0 = listing_token(src)
    assert t0 is not None and t0 == listing_token(src)  # stable

    calls = []

    def compute(p):
        calls.append(p)
        return f"D{len(calls)}"

    invalidate_listing_cache()
    assert cached_listing_digest(src, compute, "t") == "D1"
    assert cached_listing_digest(src, compute, "t") == "D1"  # warm hit
    assert len(calls) == 1

    # a file landing in a NESTED partition dir moves that dir's mtime:
    # token changes, digest recomputes (after the window settles)
    with open(os.path.join(src, "cell=2", "part-9.parquet"), "wb") as f:
        f.write(b"c" * 5)
    assert listing_token(src) is None  # fresh again -> uncached
    _backdate(src)
    t1 = listing_token(src)
    assert t1 is not None and t1 != t0
    assert cached_listing_digest(src, compute, "t") == "D2"
    assert len(calls) == 2

    # namespaces are independent cache slots for one path
    assert cached_listing_digest(src, compute, "other") == "D3"
    assert cached_listing_digest(src, compute, "t") == "D2"
    assert len(calls) == 3


def test_missing_and_file_sources_never_cache(tmp_path):
    calls = []

    def compute(p):
        calls.append(p)
        return "D"

    invalidate_listing_cache()
    missing = str(tmp_path / "nope")
    assert listing_token(missing) is None
    assert cached_listing_digest(missing, compute, "t") == "D"

    lone = tmp_path / "table.parquet"
    lone.write_bytes(b"x")
    os.utime(lone, (time.time() - 10, time.time() - 10))
    # a lone file is one stat either way: token declines, compute runs
    # on EVERY call (never cached)
    assert listing_token(str(lone)) is None
    assert cached_listing_digest(str(lone), compute, "t") == "D"
    assert cached_listing_digest(str(lone), compute, "t") == "D"
    assert len(calls) == 3


def test_invalidate_by_path_and_all(tmp_path):
    src = _mk_tree(tmp_path)
    _backdate(src)
    calls = []

    def compute(p):
        calls.append(p)
        return "D"

    invalidate_listing_cache()
    cached_listing_digest(src, compute, "t")
    cached_listing_digest(src, compute, "t")
    assert len(calls) == 1
    invalidate_listing_cache(src)
    cached_listing_digest(src, compute, "t")
    assert len(calls) == 2
    invalidate_listing_cache()
    cached_listing_digest(src, compute, "t")
    assert len(calls) == 3
