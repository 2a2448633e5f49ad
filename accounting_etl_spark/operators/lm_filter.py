"""Language-model perplexity filtering (SURVEY §2.11 text-analysis
family) — the CCNet/KenLM-style quality signal: score each document
under a cheap n-gram LM trained on a reference corpus; documents with
high perplexity (improbable token sequences) are dropped or bucketed.

Spark-first restatement, no external LM library:

- **Model = two aggregations.** Unigram counts ``U(w)`` and bigram
  counts ``B(w1, w2)`` over the reference corpus — one groupBy each,
  map-side partial aggregation, no driver state. The "model" is a
  pair of DataFrames, exactly how a 100 TB LM table should live
  (joinable, incrementally updatable), not a broadcast blob.
- **Scoring = two equi-joins.** Doc bigrams left-join ``B`` (shuffle
  on the bigram) and ``U`` (shuffle on the first token), then
  per-bigram add-one logprob ``ln((B + 1) / (U + V))`` with vocab
  size ``V``, aggregated per doc into cross-entropy and
  log2-perplexity. Hot tokens are plain aggregation keys — nothing
  quadratic, no skew-sensitive pair expansion.

Determinism note: the log/odds math is IEEE-double and the per-doc
mean divides by a bigint count, but SUMs of doubles are
float-order-dependent — so the oracle-checked rollup (queries/
analytics.py 'lm' variant) pins only the all-integer parts (bigram
counts, unseen/rare counts) and the unit tests pin the float math
against a NumPy reference on hand-built corpora.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _doc_bigrams(df: DataFrame, text_col: str):
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    return F.when(
        F.size(toks) >= 2,
        F.transform(
            F.slice(toks, 1, F.size(toks) - 1),
            lambda t, i: F.struct(
                t.alias("w1"), F.element_at(toks, i + 2).alias("w2")
            ),
        ),
    ).otherwise(
        F.array().cast("array<struct<w1:string,w2:string>>")
    )


def train_bigram_lm(
    reference: DataFrame, *, text_col: str = "text"
) -> dict[str, DataFrame]:
    """Count tables of the reference corpus: ``{"uni", "bi", "vocab"}``.
    ``vocab`` is a 1-row frame (count distinct unigrams) so nothing is
    collected at train time."""
    bg = reference.select(
        F.explode(_doc_bigrams(reference, text_col)).alias("g")
    ).select("g.w1", "g.w2")
    uni = (
        reference.select(
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("w1")
        )
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("u_cnt"))
    )
    bi = (
        bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("b_cnt"))
    )
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    return {"uni": uni, "bi": bi, "vocab": vocab}


def score_perplexity(
    lm: dict[str, DataFrame],
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    rare_threshold: int = 1,
) -> DataFrame:
    """Per-document LM statistics under ``lm``:

    - ``n_bigrams``: scored bigram count,
    - ``n_unseen``: bigrams absent from the reference model,
    - ``n_rare``: bigrams with reference count ≤ ``rare_threshold``
      (unseen included) — the integer rarity signal,
    - ``sum_b`` / ``sum_u``: total reference bigram/unigram mass the
      doc touched (integers; with ``n_*`` these are the oracle-
      checkable parts),
    - ``cross_entropy``: −mean ln P(w2|w1), add-one smoothing,
    - ``log2_ppl``: cross-entropy / ln 2 (log2 of perplexity — the
      number CCNet buckets on).

    Docs with no bigrams score NULL entropy and 0 counts.
    """
    v = F.broadcast(lm["vocab"])
    pairs = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_doc_bigrams(docs, text_col)).alias("g"),
    ).select("doc_id", "g.w1", "g.w2")
    joined = (
        pairs.join(lm["bi"], ["w1", "w2"], "left")
        .join(lm["uni"], ["w1"], "left")
        .crossJoin(v)
    )
    b = F.coalesce(F.col("b_cnt"), F.lit(0)).cast("bigint")
    u = F.coalesce(F.col("u_cnt"), F.lit(0)).cast("bigint")
    logp = F.log((b + 1).cast("double") / (u + F.col("v")).cast("double"))
    per_doc = joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.count(F.when(b == 0, 1)).alias("n_unseen"),
        F.count(F.when(b <= rare_threshold, 1)).alias("n_rare"),
        F.sum(b).alias("sum_b"),
        F.sum(u).alias("sum_u"),
        (-F.sum(logp) / F.count(F.lit(1))).alias("cross_entropy"),
    )
    base = docs.select(F.col(id_col).alias("doc_id"))
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
        F.coalesce("n_unseen", F.lit(0)).cast("bigint").alias("n_unseen"),
        F.coalesce("n_rare", F.lit(0)).cast("bigint").alias("n_rare"),
        F.coalesce("sum_b", F.lit(0)).cast("bigint").alias("sum_b"),
        F.coalesce("sum_u", F.lit(0)).cast("bigint").alias("sum_u"),
        F.col("cross_entropy").cast("double").alias("cross_entropy"),
        (F.col("cross_entropy") / math.log(2.0))
        .cast("double")
        .alias("log2_ppl"),
    )
