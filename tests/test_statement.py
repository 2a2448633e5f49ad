"""Unit tests for the statement extraction pipeline (SURVEY §5.3-5.4):
expected-output assertions on the reference-layout fixture, plus the
anchor-vs-lag clustering divergence the SQL oracle can't observe.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_statement_expected_transactions(spark):
    from accounting_etl_spark.plans import fixtures as FX
    from accounting_etl_spark.plans.statement import extract_transactions

    out = extract_transactions(FX.words_df(spark))
    rows = {
        (r.src_path, r.stmt_date_str, r.description): r.amount
        for r in out.collect()
    }
    assert rows == {
        ("stmt1.pdf", "01/03", "AMAZON MKTPL"): 39.12,
        ("stmt1.pdf", "01/06", "REFUND ITEM"): -15.00,          # credit
        ("stmt1.pdf", "01/09", "ACME 12.50 FEE"): 27.80,        # O3 rightmost
        ("stmt1.pdf", "01/16", "BIGVENDOR PURCHASE"): 1234.56,  # comma amount
        ("stmt1.pdf", "01/21", "STORE OUTLET"): 22.22,          # jitter row
        ("stmt1.pdf", "01/23", "CAFE LUNCH"): -8.40,
        ("stmt2.pdf", "02/02", "VENDOR2 SERVICES"): 55.00,
        ("stmt2.pdf", "02/03", "VENDOR3 PARTS"): -44.10,        # page-2 geometry
    }
    # vendor mirrors description; receipt flag forced false (P12)
    assert all(r.vendor == r.description for r in out.collect())
    assert all(r.receipt_received is False for r in out.collect())


def test_anchor_clustering_diverges_from_lag(spark):
    """Chained jitter: tops 0,2,4 — consecutive gaps are 2 (<3) but 4
    drifts >=3 from the anchor. Reference semantics split at 4
    (pdf_parser.py:267-279); the lag rule would keep one cluster."""
    from accounting_etl_spark.operators.cluster import cluster_rows_anchor
    from accounting_etl_spark.operators.sessionize import sessionize

    df = spark.createDataFrame(
        [("p", 1, "w0", 0.0, 1.0, 0.0, 1.0),
         ("p", 1, "w1", 0.0, 1.0, 2.0, 3.0),
         ("p", 1, "w2", 0.0, 1.0, 4.0, 5.0)],
        "path string, page int, text string, x0 double, x1 double, top double, bottom double",
    )
    anchored = cluster_rows_anchor(df, gap=3.0)
    got = {r.text: r.row_id for r in anchored.collect()}
    assert got == {"w0": 0, "w1": 0, "w2": 1}

    lagged = sessionize(df, ["path", "page"], "top", 3.0,
                        tiebreak_cols=["x0", "text"], session_col="sid")
    lag_ids = {r.text: r.sid for r in lagged.collect()}
    assert lag_ids == {"w0": 0, "w1": 0, "w2": 0}


def test_pages_without_headers_produce_nothing(spark):
    from accounting_etl_spark.plans import fixtures as FX
    from accounting_etl_spark.plans.statement import extract_transactions

    out = extract_transactions(FX.words_df(spark))
    assert out.filter((F.col("src_path") == "stmt1.pdf") & (F.col("page") == 2)).count() == 0


def test_coa_expected_codes(spark):
    from accounting_etl_spark.plans import fixtures as FX
    from accounting_etl_spark.plans.coa import extract_codes

    got = {
        (r.code_type, r.code): r.name
        for r in extract_codes(FX.coa_df(spark)).collect()
    }
    assert got == {
        ("funder", "1001"): "General Fund Revised",  # last wins (A2)
        ("funder", "1002"): "Capital Fund",
        ("gl", "50010"): "Salaries",
        ("gl", "50020"): "Benefits",
        ("location", "01"): "Main Office",
        ("location", "02"): "Annex",
        ("program", "7"): "Outreach",
        ("program", "712"): "Education",
        ("dept", "300"): "Finance",
        ("dept", "302"): "Operations",
    }


def test_vendor_enrich_tiers(spark):
    from accounting_etl_spark.queries.reference_pipeline import q_vendor_enrich

    out = {r.txn_vendor: (r.tier, r.matched_vendor)
           for r in q_vendor_enrich(spark, "").collect()}
    assert out["AMAZON MKTPL"] == (1, "AMAZON MKTPL")              # exact
    assert out["STORE OUTLET"] == (2, "MEGA STORE OUTLET INC")     # fuzzy
    assert out["CAFE LUNCH"] == (2, "A CAFE LUNCH")                # tie-break
    assert out["BIGVENDOR PURCHASE"] == (0, None)                  # miss
