from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from polars_w_inverted_index_spark.session import get_session  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_session("tests", extra_conf={"spark.sql.shuffle.partitions": "4"})
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
