"""Statement extraction pipeline — the reference's heart, Spark-first.

words(path, page, text, x0, x1, top, bottom) → transactions.

Stage map (reference file:line → Spark):
- J2 header-pair detection (pdf_parser.py:160-203): per-page band
  self-join Credits×Charges, |Δtop|<2 ∧ charges.x1>credits.x1,
  first pair in document order via row_number.
- J3 threshold distribution (pdf_parser.py:141-142): (c.x1+h.x1)/2
  joined back per (path, page).
- J4 sub-header location (pdf_parser.py:205-226): 'Trans' with
  'Post' AND 'Reference' within 2pt — two semi-joins, first by
  document order.
- A1 row clustering (pdf_parser.py:228-281): anchor-gap clustering,
  operators/cluster.py (applyInPandas per page).
- U2 row parse (pdf_parser.py:283-383) decomposed into native
  expressions: P2 arity, P3 MM/DD shape, O3 rightmost amount scan,
  P14 amount normalization, P16/P15 credit classification and sign
  flip, P13 description slice, P5 payment filter, P6 length filter.

Everything after the clustering UDF is Catalyst expressions — the
parse never leaves the JVM. One narrow shuffle per stage boundary:
(path,page) for geometry joins and clustering, then map-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.cluster import cluster_rows_anchor

DATE_RE = r"^\d{2}/\d{2}$"
AMOUNT_RE = r"^[\d,]+\.\d{2}$"
HEADER_BUFFER = 5.0
ROW_GAP = 3.0


def find_column_thresholds(words: DataFrame) -> DataFrame:
    """J2+J3: (path, page, threshold) from the Credits/Charges pair."""
    c = words.filter(F.col("text") == "Credits").select(
        "path", "page",
        F.col("x0").alias("c_x0"), F.col("x1").alias("c_x1"),
        F.col("top").alias("c_top"),
    )
    h = words.filter(F.col("text") == "Charges").select(
        F.col("path").alias("h_path"), F.col("page").alias("h_page"),
        F.col("x0").alias("h_x0"), F.col("x1").alias("h_x1"),
        F.col("top").alias("h_top"),
    )
    # one 'Charges' word per page: broadcast — the non-equi pair
    # predicate then runs as a broadcast hash join on (path,page)
    # instead of sorting both sides
    pairs = c.join(
        F.broadcast(h),
        (F.col("path") == F.col("h_path"))
        & (F.col("page") == F.col("h_page"))
        & (F.abs(F.col("c_top") - F.col("h_top")) < 2)
        & (F.col("h_x1") > F.col("c_x1")),
    )
    w = Window.partitionBy("path", "page").orderBy("c_top", "c_x0", "h_top", "h_x0")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "path", "page",
            ((F.col("c_x1") + F.col("h_x1")) / 2).alias("threshold"),
        )
    )


def find_header_tops(words: DataFrame) -> DataFrame:
    """J4: (path, page, header_top) of the Trans/Post/Reference row."""
    trans = words.filter(F.col("text") == "Trans").select("path", "page", "top", "x0")
    out = trans
    for needed in ("Post", "Reference"):
        near = words.filter(F.col("text") == needed).select(
            F.col("path").alias("n_path"),
            F.col("page").alias("n_page"),
            F.col("top").alias("n_top"),
        )
        out = out.join(
            F.broadcast(near),  # one header word per page
            (F.col("path") == F.col("n_path"))
            & (F.col("page") == F.col("n_page"))
            & (F.abs(F.col("n_top") - F.col("top")) < 2),
            "left_semi",
        )
    w = Window.partitionBy("path", "page").orderBy("top", "x0")
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("path", "page", F.col("top").alias("header_top"))
    )


def extract_transactions(words: DataFrame) -> DataFrame:
    """Full words → transactions plan (see module docstring)."""
    thresholds = find_column_thresholds(words)
    headers = find_header_tops(words)
    # thresholds/headers carry ONE row per page — broadcast both so the
    # full words relation never shuffles for these joins
    data_words = (
        words.join(F.broadcast(thresholds), ["path", "page"])
        .join(F.broadcast(headers), ["path", "page"])
        .filter(F.col("top") > F.col("header_top") + HEADER_BUFFER)
        .drop("header_top", "bottom")
    )
    clustered = cluster_rows_anchor(data_words, gap=ROW_GAP)
    rows = clustered.groupBy("path", "page", "row_id").agg(
        F.min("threshold").alias("threshold"),
        F.sort_array(
            F.collect_list(F.struct("top", "x0", "text", "x1"))
        ).alias("ws"),
    )
    n = F.size("ws")
    # F.get is 0-based and null-safe out of bounds (ANSI mode is on
    # in Spark 4 — element_at would throw on short arrays)
    txt = lambda i: F.get("ws", i - 1).getField("text")  # noqa: E731
    shaped = rows.filter(
        (n >= 4) & txt(F.lit(1)).rlike(DATE_RE) & txt(F.lit(2)).rlike(DATE_RE)
    )
    # O3: rightmost amount-shaped word, scanning positions n..3
    with_amt = shaped.withColumn(
        "p",
        F.array_max(
            F.filter(
                F.sequence(F.lit(3), n),
                lambda i: F.get("ws", i - 1).getField("text").rlike(AMOUNT_RE),
            )
        ),
    ).filter(F.col("p").isNotNull() & (F.col("p") >= 5))
    amt_word = F.get("ws", F.col("p") - 1)
    amount = F.regexp_replace(amt_word.getField("text"), r"[$,]", "").cast(
        "decimal(12,2)"
    )
    desc = F.concat_ws(
        " ",
        F.transform(
            F.slice("ws", F.lit(4), F.col("p") - 4),
            lambda w: w.getField("text"),
        ),
    )
    parsed = (
        with_amt.withColumn("description", desc)
        .withColumn("is_credit", amt_word.getField("x1") < F.col("threshold"))
        .withColumn("amount_dec", amount)
        .filter(
            F.col("amount_dec").isNotNull()
            & ~F.upper("description").contains("PAYMENT THANK YOU")
            & (F.length("description") >= 3)
        )
    )
    return parsed.select(
        F.col("path").alias("src_path"),
        "page",
        txt(F.lit(2)).alias("stmt_date_str"),
        F.col("description").alias("vendor"),
        F.when(F.col("is_credit"), -F.col("amount_dec"))
        .otherwise(F.col("amount_dec"))
        .cast("double")
        .alias("amount"),
        "description",
        F.lit(False).alias("receipt_received"),
    )
