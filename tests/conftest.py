from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SF_SMOKE = "/root/testdata/sf0.001"
SF_T2 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from wikidata2pg_spark.session import get_session

    s = get_session("pytest")
    yield s


@pytest.fixture(scope="session")
def duck():
    from wikidata2pg_spark.oracle import duck_connection

    return duck_connection(SF_T2)
