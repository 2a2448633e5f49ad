"""The reference's end-to-end batch pipeline (main.py:18-133) as ONE
lazy Spark job.

Reference stage list → this plan:
  1. COA parse (main.py:37-38)      → plans/coa.py over the cell grid
  2. source scan (main.py:65-69)    → binaryFile scan (S1)
  3. per-PDF extract (main.py:88-91)→ words UDF (U1) + plans/statement.py
  4. enrich (main.py:93-101)        → two-tier broadcast lookup (J1) —
     the reference's per-row SQLite round trip (its N+1 anti-pattern,
     SURVEY §4) becomes one join
  5. union (main.py:103)            → implicit: one scan over all files
  6. sink (main.py:114-117)         → excel projection + optional
     workbook / parquet

Nothing materializes until the sink: Catalyst sees the whole graph,
so column pruning reaches the binary scan and the enrichment
broadcast happens once per job, not per file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.lookup_join import two_tier_lookup_join
from ..sinks.excel import excel_rows
from ..sources.binary_files import PdfExtractor, scan_binary_files, words_from_pdfs
from .statement import extract_transactions

DIM_COLS = ["gl_account", "location", "program", "funder", "department"]


def run_pipeline(
    spark: SparkSession,
    downloads_dir: str,
    vendor_dim: DataFrame | None = None,
    *,
    extractor: PdfExtractor | None = None,
) -> DataFrame:
    """downloads dir of PDFs → enriched 10-column output rows."""
    binaries = scan_binary_files(spark, downloads_dir)
    words = words_from_pdfs(binaries, extractor=extractor)
    txns = extract_transactions(words)
    if vendor_dim is not None:
        import pyspark.sql.functions as F

        fact = txns.withColumnRenamed("vendor", "txn_vendor").withColumn(
            "txn_id",
            F.md5(
                F.concat_ws(
                    "#",
                    "src_path",
                    F.col("page").cast("string"),
                    "stmt_date_str",
                    "description",
                )
            ),
        )
        enriched = two_tier_lookup_join(
            fact,
            vendor_dim.select("vendor", *DIM_COLS),
            fact_id="txn_id",
            fact_key="txn_vendor",
            dim_key="vendor",
            dim_cols=DIM_COLS,
        )
        # the join output carries BOTH keys: rename the dim's to
        # matched_vendor before restoring the transaction's own name
        txns = enriched.withColumnRenamed(
            "vendor", "matched_vendor"
        ).withColumnRenamed("txn_vendor", "vendor")
    return excel_rows(txns)
