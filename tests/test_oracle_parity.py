"""Differential oracle tests (SURVEY §5.1) at sf0.001 for speed.

The driver runs the same comparison at sf0.01; tools/check_oracle.py
reproduces that exactly — run it before committing new queries.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


def _pairs():
    from accounting_etl_spark.registry import all_queries

    return sorted(all_queries().items())


@pytest.mark.parametrize("name,q", _pairs(), ids=[n for n, _ in _pairs()])
def test_oracle_parity(spark, duck, name, q):
    from tools.check_oracle import compare

    spark_pdf = q.fn(spark, SF_SMOKE).toPandas()
    if q.sql is None:
        assert len(spark_pdf) > 0, f"{name}: rows-only query returned 0 rows"
        return
    duck_pdf = duck.execute(q.sql).df()
    problems = compare(spark_pdf, duck_pdf)
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    assert df.count() > 0
    assert len(df.columns) > 0


def test_registry_contract():
    import __spark_entry__ as mod

    qs = mod.queries()
    sqls = mod.oracle_sql()
    assert qs, "no queries declared"
    assert set(sqls) <= set(qs)
