"""SQLite source/sink (S5; reference database.py:1-159) — real .db
files via the stdlib ``sqlite3`` module, no JDBC jars.

The reference keeps its GL-code and vendor dimensions in a SQLite
file and point-reads it per transaction (database.py:83-126, the N+1
pattern). Spark-first, the same file backs two access paths:

- :func:`read_sqlite` — ONE driver-side read of a dimension table
  into a DataFrame. Dimensions are broadcast-sized by definition
  (they must fit an executor to be joinable as the build side); the
  driver read is the same O(|dim|) transfer the broadcast would do.
  A ``max_rows`` guard refuses silently collecting a fact table.
- :func:`read_sqlite_partitioned` — the scale path: executors read
  disjoint rowid/key ranges in parallel (the classic JDBC
  partitioned-read pattern re-expressed over ``mapInPandas``).
  Requires the .db visible on every executor (shared FS) — true for
  local mode and NFS/object-mounted clusters.

Writes (:func:`write_sqlite`) land driver-side and capped — SQLite is
a single-writer file; a 1000-executor cluster writing one .db is a
design error, so the API refuses to pretend otherwise.
"""

from __future__ import annotations

import sqlite3
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession


def _connect_ro(db_path: str) -> sqlite3.Connection:
    return sqlite3.connect(f"file:{db_path}?mode=ro", uri=True)


_AFFINITY_TO_SPARK = (
    ("INT", "bigint"),
    ("CHAR", "string"), ("CLOB", "string"), ("TEXT", "string"),
    ("BLOB", "binary"),
    ("REAL", "double"), ("FLOA", "double"), ("DOUB", "double"),
    ("NUMERIC", "double"), ("DECIMAL", "double"), ("BOOL", "boolean"),
    ("DATE", "string"), ("TIME", "string"),
)


def table_ddl(
    db_path: str, table: str, columns: list[str] | None = None
) -> str:
    """Spark DDL schema from SQLite's declared column types (the
    standard type-affinity rules, public SQLite docs §3.1)."""
    with _connect_ro(db_path) as conn:
        info = conn.execute(f'PRAGMA table_info("{table}")').fetchall()
    if not info:
        raise ValueError(f"table {table!r} not found in {db_path}")
    fields = []
    for _cid, name, decl, *_ in info:
        if columns and name not in columns:
            continue
        decl_u = (decl or "").upper()
        spark_t = "string"
        for marker, t in _AFFINITY_TO_SPARK:
            if marker in decl_u:
                spark_t = t
                break
        fields.append(f"`{name}` {spark_t}")
    return ", ".join(fields)


def read_sqlite(
    spark: SparkSession,
    db_path: str,
    table: str,
    *,
    columns: list[str] | None = None,
    predicate: str | None = None,
    max_rows: int = 5_000_000,
) -> DataFrame:
    """Load a (dimension-sized) SQLite table as a DataFrame.

    ``predicate`` is a SQL WHERE fragment pushed into SQLite — the
    file is indexed storage, so let it do its own pruning.
    """
    cols = ", ".join(f'"{c}"' for c in columns) if columns else "*"
    sql = f'SELECT {cols} FROM "{table}"'
    if predicate:
        sql += f" WHERE {predicate}"
    with _connect_ro(db_path) as conn:
        n = conn.execute(
            f"SELECT COUNT(*) FROM ({sql})"
        ).fetchone()[0]
        if n > max_rows:
            raise ValueError(
                f"{table} has {n} rows (> max_rows={max_rows}); use "
                "read_sqlite_partitioned for fact-sized tables"
            )
        pdf = pd.read_sql_query(sql, conn)
    return spark.createDataFrame(pdf)


def read_sqlite_partitioned(
    spark: SparkSession,
    db_path: str,
    table: str,
    *,
    partition_col: str = "rowid",
    num_partitions: int = 16,
    columns: list[str] | None = None,
    predicate: str | None = None,
) -> DataFrame:
    """Parallel range read: bounds come from one tiny driver query,
    then each task opens the file read-only and scans its slice.
    Stride boundaries are half-open so rows land exactly once."""
    ddl = table_ddl(db_path, table, columns)
    with _connect_ro(db_path) as conn:
        lo, hi = conn.execute(
            f'SELECT MIN({partition_col}), MAX({partition_col}) '
            f'FROM "{table}"'
        ).fetchone()
    if lo is None:  # empty table
        return spark.createDataFrame([], ddl)
    cols = ", ".join(f'"{c}"' for c in columns) if columns else "*"
    span = int(hi) - int(lo) + 1
    stride = max(1, -(-span // num_partitions))
    bounds = [
        (int(lo) + i * stride, int(lo) + (i + 1) * stride)
        for i in range(num_partitions)
        if int(lo) + i * stride <= int(hi)
    ]
    ranges = spark.createDataFrame(
        bounds, "range_lo bigint, range_hi bigint"
    ).repartition(len(bounds))

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        with _connect_ro(db_path) as conn:
            for pdf in batches:
                for lo_, hi_ in zip(pdf["range_lo"], pdf["range_hi"]):
                    where = (
                        f"{partition_col} >= {int(lo_)} "
                        f"AND {partition_col} < {int(hi_)}"
                    )
                    if predicate:
                        where += f" AND ({predicate})"
                    out = pd.read_sql_query(
                        f'SELECT {cols} FROM "{table}" WHERE {where}',
                        conn,
                    )
                    if len(out):
                        yield out

    return ranges.mapInPandas(scan, schema=ddl)


def write_sqlite(
    df: DataFrame,
    db_path: str,
    table: str,
    *,
    mode: str = "append",
    key: str | None = None,
    max_rows: int = 1_000_000,
) -> int:
    """Land a (capped) DataFrame into a SQLite table driver-side.

    ``mode``: 'append' | 'overwrite' | 'upsert' (needs ``key``;
    INSERT OR REPLACE — the reference's dimension maintenance,
    database.py:128-153). Returns rows written."""
    pdf = df.limit(max_rows + 1).toPandas()
    if len(pdf) > max_rows:
        raise ValueError(
            f"refusing to write > max_rows={max_rows} rows into a "
            "single-writer SQLite file; write parquet instead"
        )
    cols = list(pdf.columns)
    col_defs = ", ".join(f'"{c}"' for c in cols)
    ph = ", ".join("?" * len(cols))
    with sqlite3.connect(db_path) as conn:
        if mode == "overwrite":
            conn.execute(f'DROP TABLE IF EXISTS "{table}"')
        if mode == "upsert":
            if not key:
                raise ValueError("mode='upsert' requires key=")
            conn.execute(
                f'CREATE TABLE IF NOT EXISTS "{table}" '
                f"({col_defs}, PRIMARY KEY (\"{key}\"))"
            )
            stmt = (
                f'INSERT OR REPLACE INTO "{table}" ({col_defs}) '
                f"VALUES ({ph})"
            )
        else:
            conn.execute(
                f'CREATE TABLE IF NOT EXISTS "{table}" ({col_defs})'
            )
            stmt = f'INSERT INTO "{table}" ({col_defs}) VALUES ({ph})'
        conn.executemany(
            stmt, [tuple(rec) for rec in pdf.itertuples(index=False)]
        )
        conn.commit()
    return len(pdf)
