"""End-to-end pipeline runner — the engine's analog of the reference's
one-command flow (main.py:18-133: load COA codes → parse statements →
enrich vendors → build the Excel review workbook).

Stages (each is the same plan the registry queries verify):
  [1/4] COA code dimension        (plans/coa.py)
  [2/4] statement extraction      (plans/statement.py)
  [3/4] vendor enrichment         (two-tier lookup, tiered)
  [4/4] review workbook           (sinks/excel.py — openpyxl-gated:
        falls back to parquet + csv when the lib is absent)

Usage:
    python tools/run_pipeline.py [--out /tmp/etl_out] [--sf-dir DIR]

Inputs default to the same literal fixtures the oracle checks run on
(plans/fixtures.py); with a real PDF lander + pdfplumber the words
source swaps in transparently (sources/binary_files.py).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/etl_out")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from accounting_etl_spark.queries.reference_pipeline import (
        q_coa_codes,
        q_excel_projection,
        q_statement_pipeline,
        q_vendor_enrich,
    )
    from pyspark.sql import functions as F

    from accounting_etl_spark.session import get_spark
    from accounting_etl_spark.sinks.excel import write_workbook

    spark = get_spark("etl-pipeline")
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    print("[1/4] COA code dimension")
    codes = q_coa_codes(spark, args.sf_dir)
    codes.write.mode("overwrite").parquet(str(out / "coa_codes"))
    print(f"      {codes.count()} codes")

    print("[2/4] statement extraction")
    txns = q_statement_pipeline(spark, args.sf_dir)
    txns.write.mode("overwrite").parquet(str(out / "transactions"))
    print(f"      {txns.count()} transactions")

    print("[3/4] vendor enrichment")
    enriched = q_vendor_enrich(spark, args.sf_dir)
    enriched.write.mode("overwrite").parquet(str(out / "enriched"))
    tiers = {
        r["tier"]: r["n"]
        for r in enriched.groupBy("tier")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    print(f"      tiers: {tiers}")

    print("[4/4] review workbook")
    rows = q_excel_projection(spark, args.sf_dir)
    try:
        path = write_workbook(rows, codes, str(out / "review.xlsx"))
        print(f"      workbook: {path}")
    except (ImportError, NotImplementedError) as e:
        csv_dir = out / "review_csv"
        rows.coalesce(1).write.mode("overwrite").option(
            "header", True
        ).csv(str(csv_dir))
        print(f"      openpyxl unavailable ({e}); wrote CSV: {csv_dir}")

    print(f"done: {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
