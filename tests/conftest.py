from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from accounting_etl_spark.session import get_spark

    s = get_spark("tests")
    yield s


@pytest.fixture(autouse=True)
def _fresh_cache(request):
    """Hermetic plans: the merged union builders persist shared
    subframes, and Spark's CacheManager substitutes InMemoryRelation
    into any later IDENTICAL analyzed plan session-wide — a prior
    test's cache would silently replace the scans plan-asserting
    tests inspect. Clear the cache before every test that uses the
    session (cheap; within-test persists are unaffected)."""
    if "spark" in request.fixturenames:
        request.getfixturevalue("spark").catalog.clearCache()
    yield


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    from accounting_etl_spark.sources.tables import TABLES

    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    yield con
