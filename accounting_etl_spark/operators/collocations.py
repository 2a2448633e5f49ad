"""Collocation mining — adjacent-token association by integer-scaled
lift, the PMI workhorse for tokenizer-vocabulary seeding and phrase
detection over a training corpus.

PMI(x, y) = log[ p(xy) / (p(x) p(y)) ]. The log and the corpus-size
normalization are monotone per fixed corpus, so RANKING by PMI is
ranking by the raw lift ratio ``c_xy / (c_x * c_y)`` — computed here
as one integer expression ``(c_xy * scale) div (c_x * c_y)``, exact
and bit-identical across engines (no libm). The caller sizes
``scale`` for the corpus: the product must stay under 2^63
(``c_xy * scale < 9.2e18``; at the default 1e9 scale that allows
9.2e9 occurrences of a single bigram).

Shape: bigrams are formed MAP-SIDE inside the token array (an array
``transform`` over adjacent positions — no positional self-join),
then one groupBy each for bigram and unigram counts and two joins of
the bigram table against the unigram counts. ``min_count`` prunes
the rare-pair noise floor (classic PMI failure: hapax pairs score
highest) before the joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bigram_lift(
    docs: DataFrame,
    text_col: str = "text",
    *,
    min_count: int = 5,
    scale: int = 10**9,
) -> DataFrame:
    """(left, right, c_xy, c_x, c_y, lift) for adjacent whitespace
    token pairs with support >= ``min_count``; ``lift`` =
    ``(c_xy * scale) div (c_x * c_y)`` as a BIGINT."""
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    toks = docs.select(
        F.split(F.trim(F.col(text_col)), " ").alias("t")
    ).where(F.size("t") >= 1)
    uni = (
        toks.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = (
        toks.where(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(slice(t, 1, size(t) - 1),"
                    " (x, i) -> struct(x AS l, t[i + 1] AS r))"
                )
            ).alias("b")
        )
        .groupBy(F.col("b.l").alias("left"), F.col("b.r").alias("right"))
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .where(F.col("c_xy") >= min_count)
    )
    cx = uni.select(F.col("tok").alias("left"), F.col("c").alias("c_x"))
    cy = uni.select(F.col("tok").alias("right"), F.col("c").alias("c_y"))
    return (
        bi.join(cx, "left")
        .join(cy, "right")
        .select(
            "left",
            "right",
            "c_xy",
            "c_x",
            "c_y",
            F.expr(f"(c_xy * CAST({int(scale)} AS BIGINT))"
                   " div (c_x * c_y)").alias("lift"),
        )
    )
