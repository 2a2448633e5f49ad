"""Approximate sketches vs exact: verdict rows and error bounds."""

from __future__ import annotations

from tests.conftest import SF_ORACLE, SF_SMOKE


def test_sketch_verdict_rows_all_pass(spark):
    """The reshaped 'sketch' variant emits one verdict row per
    (priority, sketch): |cust = HLL vs exact distinct within 3×rsd,
    |p50 / |p90 = the GK feasible-rank window check. Every verdict
    must hold on the fixtures — the rows-only entry now audits
    itself (VERDICT r8 Next #4)."""
    from accounting_etl_spark.queries.analytics import q_approx_sketches

    for sf in (SF_SMOKE, SF_ORACLE):
        pdf = q_approx_sketches(spark, sf).toPandas()
        assert (pdf["variant"] == "sketch").all()
        suffixes = {g.split("|")[1] for g in pdf["grp"]}
        assert suffixes == {"cust", "p50", "p90"}
        bad = pdf[pdf["v3"] != 1.0]
        assert bad.empty, f"verdict failures at {sf}: {bad.to_dict('records')}"
        # the quantile rows' v1 is the estimate's exact lower feasible
        # rank — positive and at most n by construction
        q = pdf[pdf["grp"].str.contains(r"\|p")]
        assert ((q["v1"] >= 1) & (q["v1"] <= q["n"])).all()


def test_quantile_guarantee_verdict_matches_rank_math(spark):
    """'qv' (the oracle-paired twin): window bounds are pure integer
    math from n, and the verdict is 1 everywhere — percentile_approx
    satisfying its deterministic Greenwald-Khanna bound."""
    from accounting_etl_spark.queries.analytics import q_quantile_guarantee

    pdf = q_quantile_guarantee(spark, SF_ORACLE).toPandas()
    assert (pdf["v3"] == 1.0).all()
    for r in pdf.itertuples():
        pm = 500 if r.grp.endswith("|p50") else 900
        assert r.v1 == (pm - 1) * r.n // 1000 - 1
        assert r.v2 == ((pm + 1) * r.n + 999) // 1000 + 1


def test_hll_close_to_exact_distinct(spark):
    from pyspark.sql import functions as F

    from accounting_etl_spark.sources.tables import load_table

    orders = load_table(spark, SF_ORACLE, "orders")
    exact = orders.select(F.countDistinct("o_custkey")).collect()[0][0]
    approx = orders.select(F.approx_count_distinct("o_custkey")).collect()[0][0]
    assert abs(approx - exact) / exact < 0.15


def test_kmv_portable_math_matches_pure_python(spark):
    """'kmv' (the oracle-paired portable distinct sketch, VERDICT r9
    Next #3): n / h_(k) / estimate reproduce a pure-Python KMV over
    the same md5-nibble hashes — the estimate VALUE is portable, not
    just a bound verdict."""
    import hashlib

    from accounting_etl_spark.queries.analytics import (
        _KMV_DOMAIN,
        _KMV_K,
        q_kmv_distinct,
    )
    from accounting_etl_spark.sources.tables import load_table

    pdf = q_kmv_distinct(spark, SF_SMOKE).toPandas()
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderpriority", "o_custkey"
    ).toPandas()
    for r in pdf.itertuples():
        prio = r.grp[: -len("|cust")]
        keys = set(
            orders[orders["o_orderpriority"] == prio]["o_custkey"]
        )
        hashes = sorted(
            int(hashlib.md5(str(int(c)).encode()).hexdigest()[:15], 16)
            for c in keys
        )
        m = len(set(hashes))
        assert r.n == m
        bottom = sorted(set(hashes))[:_KMV_K]
        assert r.v1 == float(bottom[-1])
        if m <= _KMV_K:
            assert r.v2 == float(m)
        else:
            assert r.v2 == (_KMV_K - 1) * _KMV_DOMAIN / float(bottom[-1])
        # sanity: a 32-min sketch lands within ~50% on these sizes
        assert abs(r.v3) < 0.5
