"""Benchmark decontamination — n-gram overlap against an eval set.

The training-data-pipeline stage that removes corpus documents which
leak evaluation/benchmark content (the GPT-3 / Pile "13-gram overlap"
rule, scaled down to the synthetic corpus): a document is contaminated
when any of its word n-grams also occurs in the benchmark set.

Scale posture (100 TB corpus, MB-scale benchmark): the benchmark gram
set is tiny by construction — eval suites are thousands of documents,
not billions — so it is built once, deduplicated, and **broadcast**.
The corpus side explodes each document's *distinct* gram hashes
(map-side, no shuffle), hits the broadcast set with an inner join
(map-side, no shuffle), and aggregates hit counts per ``doc_id``
(partial aggregation; the only shuffle, and only over the hit subset,
which is far smaller than the corpus). Documents with zero hits never
reach the shuffle — the final left join restores them with a zero
count. No all-pairs stage, no driver data beyond the plan.

Grams travel as 16-hex md5 prefixes, not raw strings: fixed-width,
engine-portable (DuckDB md5 agrees byte-for-byte), and the broadcast
table stays compact regardless of gram text length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens_ws, word_shingles


def _gram_hashes(text: Column, n: int) -> Column:
    grams = word_shingles(tokens_ws(text), n)
    return F.array_distinct(
        F.transform(grams, lambda g: F.substring(F.md5(g), 1, 16))
    )


def eval_ngrams(
    eval_docs: DataFrame, *, n: int = 4, text_col: str = "text"
) -> DataFrame:
    """Distinct gram-hash set of the benchmark corpus: one ``gh``
    column, deduplicated — the small side every corpus shard joins
    against."""
    return (
        eval_docs.select(
            F.explode(_gram_hashes(F.col(text_col), n)).alias("gh")
        )
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    eval_grams: DataFrame,
    *,
    n: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document contamination verdict against a benchmark gram set.

    ``eval_grams`` is the output of :func:`eval_ngrams` (or any
    one-column ``gh`` DataFrame). Returns
    ``(id_col, n_contam_grams, is_contaminated)`` with one row per
    input document.
    """
    ids = docs.select(id_col)
    exploded = docs.select(
        id_col, F.explode(_gram_hashes(F.col(text_col), n)).alias("gh")
    )
    hits = (
        exploded.join(F.broadcast(eval_grams), "gh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contam_grams"))
    )
    return (
        ids.join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_contam_grams"), F.lit(0))
            .cast("bigint")
            .alias("n_contam_grams"),
        )
        .withColumn("is_contaminated", F.col("n_contam_grams") > 0)
    )
