"""Property-based tests (SURVEY §5.4, hypothesis): invariances the
oracle can't observe — input-order independence, row-offset jitter
within the clustering tolerance, salting equivalence, sessionize vs
a python reference model.
"""

from __future__ import annotations

import random

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from accounting_etl_spark.plans import fixtures as FX


def _base_output(spark):
    from accounting_etl_spark.plans.statement import extract_transactions

    out = extract_transactions(FX.words_df(spark))
    return sorted(
        (r.src_path, r.page, r.stmt_date_str, r.description, r.amount)
        for r in out.collect()
    )


@settings(max_examples=5, deadline=None)
@given(seed=st.integers(0, 2**31))
def test_statement_invariant_under_shuffle_and_row_jitter(spark, seed):
    """Shuffling input row order and shifting whole rows by a uniform
    offset < (gap - row span) must not change the parse (mirrors the
    3pt clustering tolerance, reference pdf_parser.py:271)."""
    from accounting_etl_spark.plans.statement import extract_transactions

    rng = random.Random(seed)
    # group fixture words into visual rows by (path, page, int(top/15))
    # — the fixture's rows are >=14pt apart, spans <=2.1pt, so a
    # ±0.4pt whole-row offset stays well inside the tolerance
    jitter: dict[tuple, float] = {}
    rows = []
    for (path, page, text, x0, x1, top, bottom) in FX.WORDS_ROWS:
        key = (path, page, round(top / 15))
        if key not in jitter:
            jitter[key] = rng.uniform(-0.4, 0.4)
        d = jitter[key]
        rows.append((path, page, text, x0, x1, top + d, bottom + d))
    rng.shuffle(rows)

    out = extract_transactions(
        spark.createDataFrame(rows, FX.WORDS_DDL)
    )
    got = sorted(
        (r.src_path, r.page, r.stmt_date_str, r.description, r.amount)
        for r in out.collect()
    )
    assert got == _base_output(spark)


@settings(max_examples=10, deadline=None)
@given(
    gaps=st.lists(st.floats(0.1, 10.0, allow_nan=False), min_size=1, max_size=40),
    threshold=st.floats(1.0, 5.0, allow_nan=False),
)
def test_sessionize_matches_python_model(spark, gaps, threshold):
    """Lag-based sessionize == the obvious sequential model."""
    from accounting_etl_spark.operators.sessionize import sessionize

    xs = []
    acc = 0.0
    for g in gaps:
        acc += g
        xs.append(acc)
    df = spark.createDataFrame(
        [(1, i, x) for i, x in enumerate(xs)], "k int, i int, x double"
    )
    out = sessionize(df, ["k"], "x", threshold, tiebreak_cols=["i"])
    got = [r.session_id for r in out.orderBy("i").collect()]

    # the model must diff the accumulated positions exactly as the
    # operator does — (acc+g)-acc != g in floats, and hypothesis finds
    # gaps within an ulp of the threshold
    expected, sid = [], 0
    for j in range(len(xs)):
        if j > 0 and xs[j] - xs[j - 1] >= threshold:
            sid += 1
        expected.append(sid)
    assert got == expected


def test_salted_agg_equals_plain_agg(spark):
    from accounting_etl_spark.operators.salting import salted_agg
    from accounting_etl_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    li = load_table(spark, SF_SMOKE, "lineitem").withColumn(
        "qty_dec", F.col("l_quantity").cast("decimal(12,2)")
    )
    salted = salted_agg(
        li,
        ["l_returnflag"],
        [
            ("total_qty", "sum", "qty_dec"),
            ("n", "count", "l_orderkey"),
            ("min_qty", "min", "qty_dec"),
            ("max_qty", "max", "qty_dec"),
        ],
        num_salts=8,
    ).toPandas().set_index("l_returnflag").sort_index()
    plain = (
        li.groupBy("l_returnflag")
        .agg(
            F.sum("qty_dec").alias("total_qty"),
            F.count("l_orderkey").alias("n"),
            F.min("qty_dec").alias("min_qty"),
            F.max("qty_dec").alias("max_qty"),
        )
        .toPandas()
        .set_index("l_returnflag")
        .sort_index()
    )
    assert (salted["total_qty"] == plain["total_qty"]).all()
    assert (salted["n"] == plain["n"]).all()
    assert (salted["min_qty"] == plain["min_qty"]).all()
    assert (salted["max_qty"] == plain["max_qty"]).all()


def test_salted_agg_rejects_non_decomposable(spark):
    import pytest

    from accounting_etl_spark.operators.salting import salted_agg
    from accounting_etl_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    li = load_table(spark, SF_SMOKE, "lineitem")
    with pytest.raises(ValueError, match="non-decomposable"):
        salted_agg(li, ["l_returnflag"], [("x", "avg", "l_quantity")])
