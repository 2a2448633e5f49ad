"""Corpus drift — exact L1 distance between token distributions of
corpus slices (sources, snapshots, domains).

Distribution shift is the first thing a training-data pipeline
checks when a new crawl lands: "does slice B look like slice A?".
Total-variation distance (half the L1 distance between the unigram
distributions) is the standard bounded metric, but float
probabilities are not hash-portable. Here each slice's token
distribution is quantized to integer PARTS-PER-MILLION first
(``(count * 1e6) div total``), and the pairwise L1 sum over the
shared vocabulary grid is pure integer arithmetic — bit-identical on
any engine, with quantization error bounded by vocab_size / 1e6.

Shape: one groupBy for per-(slice, token) counts, a join against
per-slice totals, then a vocab x slices DENSE grid (missing tokens
are explicit ppm-0 rows — cross join of the distinct vocabulary with
the tiny slice list) self-joined per token for the pairwise sums.
Grid size = vocabulary x n_slices, never corpus-sized; n_slices is
assumed small (it is the GROUP count, not the row count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def token_ppm(
    rows: DataFrame, group_col: str, token_col: str
) -> DataFrame:
    """Quantized token distribution per group: ``(group, token, q)``
    with ``q = (count * 1e6) div group_total``."""
    tf = rows.groupBy(group_col, token_col).agg(
        F.count(F.lit(1)).alias("__c")
    )
    return token_ppm_from_counts(tf, group_col, token_col, "__c")


def token_ppm_from_counts(
    tf: DataFrame, group_col: str, token_col: str, count_col: str
) -> DataFrame:
    """:func:`token_ppm` from a pre-aggregated ``(group, token,
    count)`` table — the group totals are the per-group SUM of the
    counts, identical to counting the raw token rows. Lets a caller
    that already materialized the counts (e.g. the tfidf/drift shared
    subtree, r12) skip re-tokenizing the corpus."""
    totals = tf.groupBy(group_col).agg(
        F.sum(count_col).alias("__n")
    )
    return tf.join(totals, group_col).select(
        group_col,
        token_col,
        F.expr(f"({count_col} * {PPM}) div __n").alias("q"),
    )


def l1_drift(
    ppm: DataFrame, group_col: str, token_col: str
) -> DataFrame:
    """Pairwise L1 ppm distance between group distributions.

    Returns one row per unordered group pair: ``(grp_a, grp_b,
    n_diff, l1_ppm)`` — the count of tokens whose quantized shares
    differ and the exact integer L1 sum (2,000,000 x the
    total-variation distance, up to quantization). Missing tokens
    enter as explicit zeros via the dense vocab x groups grid.
    """
    vocab = ppm.select(token_col).distinct()
    groups = ppm.select(group_col).distinct()
    # groups is the slice list (a handful of sources/snapshots) —
    # broadcast is safe by the operator's contract; vocab stays
    # distributed
    grid = (
        vocab.join(F.broadcast(groups))
        .join(ppm, [group_col, token_col], "left")
        .select(
            group_col,
            token_col,
            F.coalesce("q", F.lit(0)).alias("q"),
        )
    )
    a = grid.select(
        F.col(group_col).alias("grp_a"),
        F.col(token_col).alias("__t"),
        F.col("q").alias("qa"),
    )
    b = grid.select(
        F.col(group_col).alias("grp_b"),
        F.col(token_col).alias("__t"),
        F.col("q").alias("qb"),
    )
    return (
        a.join(b, "__t")
        .where(F.col("grp_a") < F.col("grp_b"))
        .groupBy("grp_a", "grp_b")
        .agg(
            F.sum(
                (F.col("qa") != F.col("qb")).cast("bigint")
            ).alias("n_diff"),
            F.sum(F.abs(F.col("qa") - F.col("qb"))).alias("l1_ppm"),
        )
    )
