"""Source/sink format round-trips: parquet, CSV, JSON, ORC — the
general-format surface beyond the driver's parquet tables.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _nation(spark):
    from accounting_etl_spark.sources.tables import load_table

    return load_table(spark, SF_SMOKE, "nation")


def _assert_same(a, b, key="n_nationkey"):
    pa = a.orderBy(key).toPandas().reset_index(drop=True)
    pb = b.orderBy(key).toPandas().reset_index(drop=True)
    assert pa.equals(pb), f"\n{pa}\nvs\n{pb}"


def test_csv_roundtrip(spark, tmp_path):
    nation = _nation(spark)
    out = str(tmp_path / "nation_csv")
    nation.write.option("header", True).csv(out)
    back = spark.read.schema(
        "n_nationkey int, n_name string, n_regionkey int"
    ).option("header", True).csv(out)
    _assert_same(nation, back)


def test_json_roundtrip(spark, tmp_path):
    nation = _nation(spark)
    out = str(tmp_path / "nation_json")
    nation.write.json(out)
    back = spark.read.schema(
        "n_nationkey int, n_name string, n_regionkey int"
    ).json(out)
    _assert_same(nation, back)


def test_orc_roundtrip(spark, tmp_path):
    nation = _nation(spark)
    out = str(tmp_path / "nation_orc")
    nation.write.orc(out)
    _assert_same(nation, spark.read.orc(out))


def test_json_permissive_corrupt_records(spark, tmp_path):
    """S8 semantics: parse errors yield null-padded rows (PERMISSIVE),
    not job failure — the engine-side form of config.py:20-35's
    'None on parse error'."""
    p = tmp_path / "mixed.json"
    p.write_text('{"a": 1, "b": "x"}\n{not json at all}\n{"a": 2, "b": "y"}\n')
    df = spark.read.schema("a int, b string, _corrupt_record string").json(
        str(p)
    )
    rows = df.collect()
    assert len(rows) == 3
    good = [r for r in rows if r.a is not None]
    bad = [r for r in rows if r._corrupt_record is not None]
    assert len(good) == 2 and len(bad) == 1
