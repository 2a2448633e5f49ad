"""SQLite source/sink (S5) over REAL .db files, and the reference's
full batch pipeline end-to-end from real artifacts: statement PDFs
rendered by the built-in PDF engine + a vendor dimension point-read
from a real SQLite file → enriched 10-column output."""

from __future__ import annotations

import sqlite3

import pytest

from accounting_etl_spark.sources.sqlite import (
    read_sqlite,
    read_sqlite_partitioned,
    write_sqlite,
)

VENDORS = [
    ("AMAZON MKTPL", "50010", "01", "100", "1001", "IT"),
    ("WHOLE REFUND ITEM SUPPLY", "50020", "02", "200", "1002", "OPS"),
    ("ACME", "50010", "01", "100", "1001", "FIN"),
]


def _mk_db(path):
    with sqlite3.connect(path) as conn:
        conn.execute(
            "CREATE TABLE vendors (vendor TEXT PRIMARY KEY, "
            "gl_account TEXT, location TEXT, program TEXT, "
            "funder TEXT, department TEXT)"
        )
        conn.executemany(
            "INSERT INTO vendors VALUES (?,?,?,?,?,?)", VENDORS
        )
        conn.execute("CREATE TABLE nums (k INTEGER PRIMARY KEY, v TEXT)")
        conn.executemany(
            "INSERT INTO nums VALUES (?,?)",
            [(i, f"v{i}") for i in range(1000)],
        )
        conn.commit()
    return str(path)


def test_read_sqlite_and_predicate(spark, tmp_path):
    db = _mk_db(tmp_path / "dims.db")
    dim = read_sqlite(spark, db, "vendors")
    assert dim.count() == 3
    assert set(dim.columns) == {
        "vendor", "gl_account", "location", "program", "funder",
        "department",
    }
    some = read_sqlite(
        spark, db, "vendors", columns=["vendor", "gl_account"],
        predicate="gl_account = '50010'",
    )
    assert sorted(r.vendor for r in some.collect()) == [
        "ACME", "AMAZON MKTPL",
    ]
    with pytest.raises(ValueError, match="max_rows"):
        read_sqlite(spark, db, "nums", max_rows=10)


def test_read_sqlite_partitioned_exactly_once(spark, tmp_path):
    db = _mk_db(tmp_path / "dims.db")
    df = read_sqlite_partitioned(
        spark, db, "nums", partition_col="k", num_partitions=8
    )
    assert df.rdd.getNumPartitions() == 8
    rows = df.collect()
    assert len(rows) == 1000  # no dupes, no gaps across range bounds
    assert {r.k for r in rows} == set(range(1000))
    filt = read_sqlite_partitioned(
        spark, db, "nums", partition_col="k", num_partitions=4,
        predicate="k % 10 = 0",
    )
    assert filt.count() == 100
    with sqlite3.connect(db) as conn:
        conn.execute("CREATE TABLE empty (a INTEGER, b TEXT)")
    assert read_sqlite_partitioned(
        spark, db, "empty", partition_col="a"
    ).count() == 0


def test_write_sqlite_modes(spark, tmp_path):
    db = str(tmp_path / "out.db")
    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0)], "vendor string, amount double"
    )
    assert write_sqlite(df, db, "t") == 2
    assert write_sqlite(df, db, "t", mode="append") == 2  # 4 total
    with sqlite3.connect(db) as conn:
        assert conn.execute("SELECT COUNT(*) FROM t").fetchone()[0] == 4
    write_sqlite(df, db, "t", mode="overwrite")
    upd = spark.createDataFrame(
        [("b", 9.0), ("c", 3.0)], "vendor string, amount double"
    )
    write_sqlite(upd, db, "t", mode="upsert", key="vendor")
    with sqlite3.connect(db) as conn:
        got = dict(conn.execute("SELECT vendor, amount FROM t"))
    assert got == {"a": 1.0, "b": 9.0, "c": 3.0}
    with pytest.raises(ValueError, match="max_rows"):
        write_sqlite(df, db, "t2", max_rows=1)


def test_full_pipeline_real_pdfs_real_sqlite(spark, tmp_path):
    """main.py:18-133 parity from real artifacts: PDF bytes → words →
    transactions → SQLite-dim enrichment → Excel projection."""
    from accounting_etl_spark.plans import fixtures as FX
    from accounting_etl_spark.plans.etl import run_pipeline

    FX.write_statement_pdfs(tmp_path / "downloads")
    db = _mk_db(tmp_path / "gl_codes.db")
    vendor_dim = read_sqlite(spark, db, "vendors")

    out = run_pipeline(
        spark, str(tmp_path / "downloads"), vendor_dim
    ).collect()
    by_vendor = {r.Vendor: r for r in out}
    assert len(out) == len(FX.STATEMENT_PDF_EXPECTED)
    # tier-1 exact: AMAZON MKTPL hits its dim row
    assert by_vendor["AMAZON MKTPL"]["G/L Account"] == "50010"
    assert by_vendor["AMAZON MKTPL"]["Funder"] == "1001"
    # tier-2 containment: stored vendor contains the fact vendor
    assert by_vendor["REFUND ITEM"]["G/L Account"] == "50020"
    # no dim match -> null codes, row still present
    assert by_vendor["VENDOR3 PARTS"]["G/L Account"] is None
    assert by_vendor["VENDOR3 PARTS"].Amount == pytest.approx(-44.10)
