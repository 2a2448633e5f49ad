"""Data Selection with Importance Resampling (DSIR-style).

Xie et al. 2023 ("Data Selection for Language Models via Importance
Resampling") select pretraining documents whose hashed n-gram
distribution looks like a small target corpus: each document gets an
importance weight from per-feature target-vs-raw frequency ratios and
the raw pool is resampled toward the target distribution. This module
is that estimator re-expressed as DataFrame aggregations:

- **Feature counts are one shuffle.** Target and raw token streams
  are counted in a single ``groupBy(word)`` with conditional sums
  (``count_target``, ``count_raw`` per word) — not two passes over
  the corpus.
- **Weights are exact integer math.** The paper's per-feature
  log-ratio ``log p_t(w)/p_r(w)`` is replaced by a quantized linear
  ratio ``((c_t(w)+1) * SCALE) DIV (c_r(w)+1)`` (add-one smoothing,
  64-bit integer division). The global normalizer ``(N_r+V)/(N_t+V)``
  multiplies every word's ratio by the same constant, so it cannot
  change any ranking and is dropped. A document's importance score is
  then ``Σ_w c_{w,d} · ratio(w)`` — pure ``bigint`` arithmetic,
  bit-identical across engines and partitionings (the repo's
  determinism conventions), unlike a float log-sum whose value
  depends on accumulation order.
- **Selection is the distributed prefix-sum** (operators/budget.py):
  keep the top-importance documents until a token budget is spent —
  no single-task global window.

Scale notes: the word-ratio table is |vocab|-sized and joined back to
the per-doc word counts on the hashed word key — an ordinary shuffled
equi-join; nothing here is broadcast or collected, and no stage holds
more than (word, count) pairs. Words are hashed with ``xxhash64``
(equality-only keys; collisions merge two words with probability
~V²/2⁶⁴ — count rollups are insensitive).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: fixed-point scale for the quantized importance ratio
RATIO_SCALE = 1_000_000


def importance_ratios(
    words: DataFrame,
    *,
    word_col: str = "word",
    is_target_col: str = "is_target",
) -> DataFrame:
    """Per-word quantized importance ratios from ONE token stream.

    ``words`` has one row per token occurrence with a boolean
    ``is_target`` tag. One hash aggregation produces both count
    columns; the ratio is 64-bit integer math throughout.

    Returns ``(word, count_target, count_raw, ratio)`` where
    ``ratio = ((count_target+1) * RATIO_SCALE) DIV (count_raw+1)``.
    """
    counts = words.groupBy(F.col(word_col).alias("word")).agg(
        F.count(F.when(F.col(is_target_col), 1)).alias("count_target"),
        F.count(F.when(~F.col(is_target_col), 1)).alias("count_raw"),
    )
    return counts.withColumn(
        "ratio",
        F.expr(
            f"((count_target + 1L) * {RATIO_SCALE}L) DIV (count_raw + 1L)"
        ),
    )


def dsir_scores(
    doc_words: DataFrame,
    ratios: DataFrame,
    *,
    doc_col: str = "doc_id",
    word_col: str = "word",
) -> DataFrame:
    """Per-document importance scores: ``Σ_w c_{w,d} · ratio(w)``.

    ``doc_words`` is one row per token occurrence of the documents to
    score (the raw pool). Token occurrences are pre-aggregated to
    per-doc word counts before the ratio join so the join input is
    (doc, distinct-word) grain, then one more aggregation folds the
    products. Both aggregations are map-side-combinable; everything is
    ``bigint``.
    """
    per_doc = doc_words.groupBy(doc_col, word_col).agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        per_doc.join(ratios.select(word_col, "ratio"), word_col)
        .groupBy(doc_col)
        .agg(F.sum(F.col("c") * F.col("ratio")).alias("importance"))
    )


def dsir_select(
    docs: DataFrame,
    *,
    tokens_col: Column,
    is_target: Column,
    doc_col: str = "doc_id",
    size_col: str = "n_tokens",
    budget_frac: tuple[int, int] = (1, 2),
) -> DataFrame:
    """End-to-end DSIR selection over a corpus DataFrame.

    ``is_target`` tags the target slice (it defines the distribution
    to match and is never scored); every other document is scored and
    the top-importance prefix that fits ``budget_frac`` of the raw
    pool's tokens is flagged ``keep``.

    Returns the raw-pool rows with ``importance`` (bigint),
    ``cum_tokens`` and ``keep`` columns appended.
    """
    from .budget import select_token_budget

    base = docs.select(
        F.col(doc_col),
        is_target.alias("__is_target"),
        tokens_col.alias("__tokens"),
        F.size(tokens_col).cast("bigint").alias(size_col),
        *[F.col(c) for c in docs.columns if c != doc_col],
    )
    words = base.select(
        doc_col,
        "__is_target",
        F.explode("__tokens").alias("word"),
    ).withColumn("word", F.xxhash64("word"))
    # ONE pass over the token stream: aggregate to (doc, word) grain
    # first, then both the |vocab|-sized ratio table and the per-doc
    # scores derive from that compact table — the naive shape
    # (importance_ratios + dsir_scores on the raw stream) explodes
    # and shuffles the full token stream twice
    doc_word = words.groupBy(doc_col, "word", "__is_target").agg(
        F.count(F.lit(1)).alias("c")
    )
    counts = doc_word.groupBy("word").agg(
        F.sum(F.when(F.col("__is_target"), F.col("c")).otherwise(0)).alias(
            "count_target"
        ),
        F.sum(F.when(~F.col("__is_target"), F.col("c")).otherwise(0)).alias(
            "count_raw"
        ),
    )
    ratios = counts.withColumn(
        "ratio",
        F.expr(
            f"((count_target + 1L) * {RATIO_SCALE}L) DIV (count_raw + 1L)"
        ),
    )
    scores = (
        doc_word.filter(~F.col("__is_target"))
        .join(ratios.select("word", "ratio"), "word")
        .groupBy(doc_col)
        .agg(F.sum(F.col("c") * F.col("ratio")).alias("importance"))
    )
    raw = base.filter(~F.col("__is_target")).drop("__tokens", "__is_target")
    scored = raw.join(scores, doc_col, "left").withColumn(
        "importance", F.coalesce(F.col("importance"), F.lit(0).cast("bigint"))
    )
    return select_token_budget(
        scored,
        order_col=[F.col("importance").desc(), F.col(doc_col)],
        size_col=size_col,
        budget_frac=budget_frac,
    )
