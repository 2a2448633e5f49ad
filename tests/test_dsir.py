"""DSIR importance resampling (operators/dsir.py) semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from accounting_etl_spark.operators.dsir import (
    RATIO_SCALE,
    dsir_select,
    importance_ratios,
)
from tests.conftest import SF_SMOKE


def _docs(spark):
    rows = [
        (0, "t", "a a b"),  # target: defines the distribution
        (1, "r", "a b c"),
        (2, "r", "c c c c"),
        (3, "r", "a a a"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )


def test_importance_ratios_integer_math(spark):
    words = spark.createDataFrame(
        [("a", True), ("a", True), ("b", True), ("a", False), ("b", False)],
        "word string, is_target boolean",
    )
    got = {
        r["word"]: (r["count_target"], r["count_raw"], r["ratio"])
        for r in importance_ratios(words).collect()
    }
    # ratio = ((ct+1) * SCALE) DIV (cr+1)
    assert got["a"] == (2, 1, (3 * RATIO_SCALE) // 2)
    assert got["b"] == (1, 1, (2 * RATIO_SCALE) // 2)


def test_dsir_select_hand_computed(spark):
    sel = dsir_select(
        _docs(spark),
        tokens_col=F.split(F.col("text"), " "),
        is_target=F.col("source") == "t",
    )
    rows = {r["doc_id"]: r for r in sel.collect()}
    # target doc is never scored
    assert set(rows) == {1, 2, 3}
    # counts: a ct=2 cr=4; b ct=1 cr=1; c ct=0 cr=5
    ra = (3 * RATIO_SCALE) // 5
    rb = (2 * RATIO_SCALE) // 2
    rc = (1 * RATIO_SCALE) // 6
    assert rows[1]["importance"] == ra + rb + rc
    assert rows[2]["importance"] == 4 * rc
    assert rows[3]["importance"] == 3 * ra
    # budget: half of the 10 raw tokens, best-importance first —
    # doc3 (cum 3) fits, doc1 (cum 6) and doc2 (cum 10) do not
    assert rows[3]["keep"] and not rows[1]["keep"] and not rows[2]["keep"]
    assert rows[3]["cum_tokens"] == 3


def test_dsir_unscored_doc_gets_zero(spark):
    # a raw doc sharing no vocabulary still comes back (importance of
    # its words is computed, so it scores > 0; a doc whose words all
    # miss the ratio table is impossible by construction — the ratio
    # table is built from the SAME token stream). Verify the
    # left-join + coalesce path with an empty-ish doc anyway.
    docs = spark.createDataFrame(
        [(0, "t", "x y"), (1, "r", "z")],
        "doc_id long, source string, text string",
    )
    sel = dsir_select(
        docs,
        tokens_col=F.split(F.col("text"), " "),
        is_target=F.col("source") == "t",
    )
    row = sel.collect()[0]
    # z: ct=0, cr=1 → ratio = SCALE // 2
    assert row["importance"] == RATIO_SCALE // 2
    # half-budget of a 1-token pool is 0.5 tokens: nothing fits
    # (keep iff cum*2 <= total*1, i.e. 2 <= 1)
    assert not row["keep"]


def test_dsir_fixture_selects_half_by_tokens(spark):
    from accounting_etl_spark.queries.analytics import q_dsir_stats

    out = q_dsir_stats(spark, SF_SMOKE).collect()
    assert out, "empty dsir rollup"
    kept = sum(r["n"] for r in out)
    total = sum(int(r["v2"]) for r in out)
    assert 0 < kept < total
    # every reported group is a raw-pool source (target stratum 0
    # sources are excluded from the rollup by construction)
    for r in out:
        assert r["variant"] == "dsir"
        assert 0.0 <= r["v3"] <= 1.0
