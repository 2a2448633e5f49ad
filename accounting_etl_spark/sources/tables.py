"""Loaders for the driver's parquet star schema (TESTDATA.md).

Plain ``spark.read.parquet`` — Catalyst gets predicate pushdown,
column pruning, and partition pruning for free on these scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def normalize_events(df: DataFrame) -> DataFrame:
    """Normalize the events table's ``ts`` to a canonical layout
    regardless of how the fixture encodes it.

    The driver fixtures have shipped ``ts`` two ways: INT64 nanoseconds
    (read as ``bigint`` under ``nanosAsLong``) and ``timestamp[us]``
    (read as TIMESTAMP/TIMESTAMP_NTZ; the session zone is pinned UTC in
    :mod:`accounting_etl_spark.session`, so the NTZ→timestamp cast is
    micros-exact). Output contract, identical for both encodings:

    - ``ts_ns``: bigint epoch nanoseconds (exact for the ns encoding,
      micros*1000 for the µs encoding),
    - ``ts``: µs-truncated ``TimestampType`` (truncation, not rounding —
      the DuckDB oracle mirrors this with ``epoch_ns(ts) // 1000``).

    Column order matches the historical loader: ``ts_ns`` takes the
    source ``ts`` slot and ``ts`` is appended last.
    """
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes)["ts"]
    if dtype == "bigint":
        ts_ns = F.col("ts")
    elif dtype.startswith("timestamp"):
        ts_ns = F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)
    else:
        raise TypeError(
            f"events.ts must be bigint (epoch ns) or timestamp, got {dtype}"
        )
    cols = [
        ts_ns.alias("ts_ns") if c == "ts" else F.col(c) for c in df.columns
    ]
    return df.select(*cols).withColumn(
        "ts", F.timestamp_micros(F.expr("ts_ns DIV 1000"))
    )


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch events loader. ``nanosAsLong`` is set so an INT64-nanos
    fixture reads as bigint (Spark 4 rejects TIMESTAMP(NANOS) without
    it); a ``timestamp[us]`` fixture is unaffected by the conf. Either
    way :func:`normalize_events` produces the canonical layout."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    return normalize_events(raw)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view (for the SQL API)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
