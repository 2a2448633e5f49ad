"""Corpus curation — the LLM-training-data pipeline composed.

One plan chains the data-quality stages this engine provides into a
per-document keep/drop verdict with an auditable reason:

1. benchmark decontamination (optional) — documents sharing a word
   n-gram with the eval set are dropped (operators/decontam.py);
2. quality gate — the deterministic quality score (queries/text.py
   semantics) must clear ``min_quality``;
3. exact dedup — one survivor (min doc_id) per normalized content
   hash among quality survivors;
4. near-dup dedup — connected components over exact-Jaccard pair
   edges (operators/graph.py); one survivor (cluster min) per
   component.

Drop reasons are assigned in that order (a contaminated low-quality
doc reports ``contaminated``; a low-quality exact dup reports
``low_quality``). Every stage is the operator already used by the
registry queries, so the composition inherits their scale posture:
broadcast gram set, map-side hashing, posting-list pair generation,
label propagation — no all-pairs stage, no driver data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import normalize_text
from ..operators.decontam import decontaminate
from ..operators.graph import connected_components


def curate_corpus(
    docs: DataFrame,
    near_dup_pairs: DataFrame,
    *,
    min_quality: float = 0.45,
    eval_grams: DataFrame | None = None,
    contam_ngram: int = 4,
) -> DataFrame:
    """Per-document curation verdict.

    ``docs`` needs (doc_id, text, n_chars); ``near_dup_pairs`` is an
    edge list (doc_a, doc_b) from any candidate generator (exact
    Jaccard, MinHash-LSH, SimHash — caller's recall/precision trade).
    ``eval_grams`` (optional) is a benchmark gram-hash set from
    :func:`..operators.decontam.eval_ngrams`; when given, documents
    overlapping it drop first with reason ``contaminated``.
    Returns (doc_id, quality_score, keep, drop_reason).
    """
    ws = F.split(F.trim(F.col("text")), " ")
    uniq = F.size(F.array_distinct(ws)).cast("double") / F.size(ws)
    quality = (
        F.least(F.col("n_chars").cast("double") / 400, F.lit(1.0)) * 0.5
        + uniq * 0.5
    )
    scored = docs.select(
        "doc_id",
        quality.alias("quality_score"),
        F.md5(normalize_text(F.col("text"))).alias("__hash"),
    )
    if eval_grams is not None:
        contam = decontaminate(docs, eval_grams, n=contam_ngram).select(
            "doc_id", "is_contaminated"
        )
        scored = scored.join(contam, "doc_id", "left").withColumn(
            "is_contaminated", F.coalesce("is_contaminated", F.lit(False))
        )
    else:
        scored = scored.withColumn("is_contaminated", F.lit(False))
    passing = scored.filter(
        (F.col("quality_score") >= min_quality) & ~F.col("is_contaminated")
    )
    w = Window.partitionBy("__hash")
    exact = passing.withColumn("__keep_id", F.min("doc_id").over(w))
    exact_survivors = exact.filter(F.col("doc_id") == F.col("__keep_id"))

    # near-dup components restricted to exact survivors: edges whose
    # endpoints both survived (semi-joins keep the edge list lean)
    ids = exact_survivors.select("doc_id")
    edges = (
        near_dup_pairs.select(
            F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")
        )
        .join(ids.withColumnRenamed("doc_id", "id_a"), "id_a", "left_semi")
        .join(ids.withColumnRenamed("doc_id", "id_b"), "id_b", "left_semi")
    )
    labels = connected_components(edges, src="id_a", dst="id_b").select(
        F.col("node").alias("doc_id"), F.col("label").alias("__cluster")
    )
    verdicts = (
        scored.join(
            exact.select("doc_id", "__keep_id"), "doc_id", "left"
        )
        .join(labels, "doc_id", "left")
        .select(
            "doc_id",
            "quality_score",
            F.when(F.col("is_contaminated"), "contaminated")
            .when(F.col("quality_score") < min_quality, "low_quality")
            .when(F.col("doc_id") != F.col("__keep_id"), "exact_dup")
            .when(
                F.col("__cluster").isNotNull()
                & (F.col("doc_id") != F.col("__cluster")),
                "near_dup",
            )
            .alias("drop_reason"),
        )
        .withColumn("keep", F.col("drop_reason").isNull())
    )
    return verdicts.select("doc_id", "quality_score", "keep", "drop_reason")


def dataset_card(docs: DataFrame, verdicts: DataFrame) -> DataFrame:
    """The dataset card — the one-aggregate summary a curated corpus
    ships with: per drop-reason document counts, whitespace-token
    volume, and the kept share in exact parts-per-million.

    ``verdicts`` is :func:`curate_corpus` output; ``docs`` the source
    it was computed from (joined on ``doc_id`` for token volume).
    Returns one row per verdict class (``kept`` or the drop reason):
    ``(verdict, n_docs, n_tokens, docs_ppm, tokens_ppm)`` — ppm
    shares are integer floor divisions against the corpus totals, so
    the card is hash-portable like everything else.
    """
    toks = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), " ")).cast("bigint").alias(
            "__nt"
        ),
    )
    per = (
        verdicts.join(toks, "doc_id")
        .groupBy(
            F.coalesce(F.col("drop_reason"), F.lit("kept")).alias(
                "verdict"
            )
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("__nt").cast("bigint").alias("n_tokens"),
        )
    )
    totals = per.agg(
        F.sum("n_docs").alias("__td"), F.sum("n_tokens").alias("__tt")
    )
    return per.crossJoin(F.broadcast(totals)).select(
        "verdict",
        "n_docs",
        "n_tokens",
        F.expr("(n_docs * 1000000) div __td").alias("docs_ppm"),
        F.expr("(n_tokens * 1000000) div __tt").alias("tokens_ppm"),
    )
