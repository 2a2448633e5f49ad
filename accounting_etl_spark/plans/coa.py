"""Chart-of-accounts pipeline (reference pdf_parser.py:398-512).

cells(path, page, table_idx, row_idx, cells:array<string>) → codes
(code_type, code, name).

Reference semantics preserved exactly:
- table classification scans the first 3 rows for header keywords
  with priority funder > gl > location > program > dept
  (pdf_parser.py:439-465); the first matching row decides;
- the joined row text uses '' for null cells, keeping double spaces
  (pdf_parser.py:444 — ' '.join of possibly-empty strings);
- code/name cells trimmed; empty or 'CODE'-containing rows skipped
  (pdf_parser.py:476-484);
- per-type code-shape gates: funder ^\\d{4}$, gl ^\\d{5}$, location
  ^\\d{2}$, program/dept ^\\d+$ (pdf_parser.py:487-510);
- duplicate codes: LAST wins in document order (dict insert) — made
  deterministic with max_by over (page, table, row) rank (A2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def classify_row() -> F.Column:
    rt = F.upper(
        F.concat_ws(
            " ", F.transform("cells", lambda c: F.coalesce(c, F.lit("")))
        )
    )
    return (
        F.when(rt.contains("FUNDER"), F.lit("funder"))
        .when(
            rt.contains("EXP CODE")
            | rt.contains("GL CODE")
            | (rt.contains("EXP") & rt.contains("CODE")),
            F.lit("gl"),
        )
        .when(
            rt.contains("LOC CODE")
            | rt.contains("LOCATION CODE")
            | (rt.contains("LOC") & rt.contains("CODE")),
            F.lit("location"),
        )
        .when(
            rt.contains("PROG CODE")
            | rt.contains("PROGRAM CODE")
            | (rt.contains("PROG") & rt.contains("CODE")),
            F.lit("program"),
        )
        .when(
            rt.contains("DEPT CODE")
            | rt.contains("DEPARTMENT CODE")
            | (rt.contains("DEPT") & rt.contains("CODE")),
            F.lit("dept"),
        )
    )


def extract_codes(cells: DataFrame) -> DataFrame:
    classified = cells.withColumn("rtype", classify_row())
    w = Window.partitionBy("path", "page", "table_idx").orderBy("row_idx")
    table_types = (
        classified.filter((F.col("row_idx") <= 2) & F.col("rtype").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("path", "page", "table_idx", F.col("rtype").alias("code_type"))
    )
    rows = cells.join(table_types, ["path", "page", "table_idx"]).select(
        "code_type",
        "page",
        "table_idx",
        "row_idx",
        F.trim(F.coalesce(F.get("cells", 0), F.lit(""))).alias("code"),
        F.trim(F.coalesce(F.get("cells", 1), F.lit(""))).alias("name"),
    )
    gated = rows.filter(
        (F.col("code") != "")
        & (F.col("name") != "")
        & ~F.upper("code").contains("CODE")
        & ~F.upper("name").contains("CODE")
        & (
            ((F.col("code_type") == "funder") & F.col("code").rlike(r"^\d{4}$"))
            | ((F.col("code_type") == "gl") & F.col("code").rlike(r"^\d{5}$"))
            | ((F.col("code_type") == "location") & F.col("code").rlike(r"^\d{2}$"))
            | (
                F.col("code_type").isin("program", "dept")
                & F.col("code").rlike(r"^\d+$")
            )
        )
    )
    ord_key = (
        F.col("page").cast("bigint") * 1000000
        + F.col("table_idx") * 10000
        + F.col("row_idx")
    )
    return gated.groupBy("code_type", "code").agg(
        F.max_by("name", ord_key).alias("name")
    )
