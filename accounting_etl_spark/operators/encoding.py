"""Leakage-free categorical target encoding (leave-one-out).

The feature-engineering step a training pipeline runs before fitting
on high-cardinality categoricals: replace the category with the mean
of the TARGET over the category's OTHER rows — leave-one-out, so a
row never sees its own label (plain mean encoding leaks the label
into the feature and inflates validation scores; see the
feature-store leakage discipline in operators/feature_store.py).

Exactness contract: encodings are parts-per-million INTEGERS,
``floor((sum - y) * 1e6 / (n - 1))`` over bigint sums — deterministic
across engines, partitionings and reruns (a float mean would fold in
engine order and never hash-match; cf. functions/detsum.py).

Scale shape: ONE groupBy on the category builds the (sum, count)
table; rows re-join it on the category key (category cardinality is
tiny next to the fact table, so AQE broadcasts it — no hint, same
policy as the incremental-dedup index join); the global prior for
singleton categories rides a 1-row scalar-aggregate cross join (the
sanctioned BNLJ shape). No window over the fact table, no shuffle of
the fact side beyond the category join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def target_encode_loo(
    df: DataFrame,
    *,
    category_col: str,
    target: Column,
    out_col: str = "te_ppm",
) -> DataFrame:
    """Add ``out_col``: the leave-one-out target-mean of the row's
    category in exact ppm (bigint).

    ``target`` must evaluate to an integer 0/1 column. Rows whose
    category has a single occurrence fall back to the GLOBAL
    leave-one-out prior (the mean over all other rows) — the standard
    cold-category rule, and still leakage-free.

    NULL categories are a category of their own (the join is
    null-safe, so no row is silently dropped — ADVICE r7), and a
    degenerate 1-row input gets a NULL encoding instead of riding a
    divide-by-zero.
    """
    y = target.cast("bigint")
    tagged = df.withColumn("__y", y)
    # rename the grouping key so the fact→stats equi-join is an
    # unambiguous null-safe comparison (NULL is a real category — an
    # inner join on the bare column name would drop those rows)
    stats = (
        tagged.groupBy(category_col)
        .agg(
            F.sum("__y").alias("__gs"),
            F.count(F.lit(1)).alias("__gn"),
        )
        .withColumnRenamed(category_col, "__cat")
    )
    totals = tagged.agg(
        F.sum("__y").alias("__ts"), F.count(F.lit(1)).alias("__tn")
    )
    # bigint `div`: exact at any scale (a float divide + floor loses
    # bits once sums pass 2^53 — 1e10 rows x 1e6 ppm is already there)
    loo_cat = F.expr(f"((__gs - __y) * {PPM}) div (__gn - 1)")
    loo_all = F.expr(f"((__ts - __y) * {PPM}) div (__tn - 1)")
    return (
        tagged.join(stats, F.col(category_col).eqNullSafe(F.col("__cat")))
        .crossJoin(F.broadcast(totals))
        .withColumn(
            out_col,
            F.when(F.col("__gn") > 1, loo_cat)
            .when(F.col("__tn") > 1, loo_all)
            .otherwise(F.lit(None))
            .cast("bigint"),
        )
        .drop("__y", "__cat", "__gs", "__gn", "__ts", "__tn")
    )
