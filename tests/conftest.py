"""Shared fixtures: one local SparkSession + generated fixture tiers."""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


@pytest.fixture(scope="session")
def spark():
    from qfilter.session import get_spark

    s = get_spark(app="qfilter-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def smoke_dir() -> str:
    from make_fixtures import ensure_fixtures

    return ensure_fixtures("smoke")
