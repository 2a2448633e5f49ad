"""Local differential harness — mirrors the driver's correctness gate.

Runs every registry query on Spark AND its oracle SQL on DuckDB at a
given sf dir, then compares row count + exact values (columns sorted
by name, rows sorted by all columns — the driver hashes the same
canonical form, so an exact match here predicts a hash match there).

Usage:
    python tools/check_oracle.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Normalize away engine-side representation differences that the
    # value compare should not care about (dtype objects vs numpy).
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype("string")
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="last", kind="mergesort")
    return df.reset_index(drop=True)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    a, b = canon(spark_pdf), canon(duck_pdf)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns differ: spark={list(a.columns)} duck={list(b.columns)}")
        return problems
    if len(a) != len(b):
        problems.append(f"row count differs: spark={len(a)} duck={len(b)}")
        return problems
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            af = a[c].astype("float64").to_numpy()
            bf = b[c].astype("float64").to_numpy()
            neq = ~((af == bf) | (np.isnan(af) & np.isnan(bf)))
        else:
            neq = (~((a[c] == b[c]) | (a[c].isna() & b[c].isna()))).to_numpy()
        if neq.any():
            i = int(np.argmax(neq))
            problems.append(
                f"column {c!r}: {int(neq.sum())}/{len(a)} values differ; "
                f"first at row {i}: spark={a[c].iloc[i]!r} duck={b[c].iloc[i]!r}"
            )
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from accounting_etl_spark.registry import all_queries
    from accounting_etl_spark.session import get_spark

    qs = all_queries()
    names = args.names or sorted(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    failed = []
    for name in names:
        q = qs[name]
        t0 = time.time()
        try:
            spark_pdf = q.fn(spark, args.sf).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failed.append(name)
            continue
        if q.sql is None:
            print(f"rows  {name}: {len(spark_pdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            if len(spark_pdf) == 0:
                print(f"WARN  {name}: 0 rows")
            continue
        try:
            duck_pdf = con.execute(q.sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failed.append(name)
            continue
        # per-variant row counts localize a future mismatch inside a
        # union-tagged entry (merged entries otherwise flag as a whole)
        def vcounts(pdf: pd.DataFrame) -> str:
            if "variant" not in pdf.columns:
                return ""
            vc = pdf["variant"].value_counts().sort_index()
            return " {" + ", ".join(f"{k}:{v}" for k, v in vc.items()) + "}"

        problems = compare(spark_pdf, duck_pdf)
        if problems:
            print(f"FAIL  {name}{vcounts(spark_pdf)} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      {p}")
            dv = vcounts(duck_pdf)
            if dv and dv != vcounts(spark_pdf):
                print(f"      oracle variants{dv}")
            failed.append(name)
        else:
            print(
                f"PASS  {name}: {len(spark_pdf)} rows"
                f"{vcounts(spark_pdf)} [{time.time()-t0:.1f}s]"
            )

    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
