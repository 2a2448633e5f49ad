"""Two-tier lookup join (J1) — the reference's vendor enrichment.

Reference semantics (database.py:83-126, driven per-row from
main.py:93-101 — an N+1 point-lookup anti-pattern):

    tier 1: exact ``vendor = ?`` equality;
    tier 2 (on miss): case-insensitive containment — the *stored*
        vendor string contains the fact vendor
        (``LOWER(vendor) LIKE LOWER('%<fact>%')``, database.py:110-114)
        — taking the first row (``fetchone`` — non-deterministic);

Spark-first re-expression: ONE broadcast equi-join for tier 1, then a
broadcast theta-join restricted to the miss set for tier 2, with a
``row_number`` pick ordered by the dim key (deterministic tightening
of ``fetchone``, SURVEY §4). No per-row round trips; the dim is
broadcast once. At 100 TB the fact side streams through both joins
with no shuffle (broadcast hash + broadcast nested loop); only if the
dim outgrows broadcast does tier 2 need an LSH/prefix prefilter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _char_trigrams(col: F.Column) -> F.Column:
    """All lowercase character 3-grams of a string (keys shorter than
    3 chars fall back to the whole string)."""
    s = F.lower(col)
    n = F.length(s)
    return F.when(
        n >= 3,
        F.transform(F.sequence(F.lit(1), n - 2), lambda i: s.substr(i, F.lit(3))),
    ).otherwise(F.array(s))


def two_tier_lookup_join(
    fact: DataFrame,
    dim: DataFrame,
    *,
    fact_id: str,
    fact_key: str,
    dim_key: str,
    dim_cols: list[str],
    prefilter: str = "broadcast",
) -> DataFrame:
    """Enrich ``fact`` from ``dim``: exact tier, containment tier, miss.

    Returns all ``fact`` columns plus ``dim_key``, ``dim_cols`` and an
    int ``tier`` column (1 = exact, 2 = fuzzy, 0 = no match).

    ``prefilter`` picks the tier-2 strategy:
    - ``"broadcast"``: broadcast nested-loop containment — right while
      the dim is broadcastable;
    - ``"trigram"``: the scale path once it isn't. Substring
      containment implies every char-3-gram of the fact key occurs in
      the dim key, so joining the fact's (deterministic) minimum
      trigram against exploded dim trigrams is a CONSERVATIVE
      candidate filter — no true match can be lost — and turns the
      nested loop into an equi-join whose fan-out is bounded by
      trigram selectivity. Candidates are then verified with the
      exact containment predicate. Both strategies produce identical
      results (tests/test_lookup_scale.py).
    """
    out_dim = [dim_key, *dim_cols]
    dim_types = dict(dim.dtypes)

    # One hash exchange on the lookup id materializes the fact once
    # (branches below reference it; without a shuffle boundary every
    # reference would RE-EXECUTE the upstream fact pipeline — 4 runs
    # of the PDF-extraction UDF in the enrichment plan) and
    # co-partitions the tier-2 row_number window for free.
    fact = fact.repartition(F.col(fact_id))

    if prefilter == "broadcast":
        # Single-pass form: exact left join → containment left join
        # restricted to exact misses via the join condition → one
        # window pick. The fact subtree appears EXACTLY once in the
        # plan (no union of hit/fuzzy/miss branches), so the expensive
        # extraction upstream runs once regardless of exchange reuse.
        d1 = dim.select(
            F.col(dim_key).alias("__k1"),
            *[F.col(c).alias(f"__c1_{c}") for c in dim_cols],
        )
        d2 = dim.select(
            F.col(dim_key).alias("__k2"),
            *[F.col(c).alias(f"__c2_{c}") for c in dim_cols],
        )
        t1 = fact.join(
            F.broadcast(d1), fact[fact_key] == F.col("__k1"), "left"
        )
        fuzzy_cond = F.col("__k1").isNull() & (
            F.instr(F.lower(F.col("__k2")), F.lower(t1[fact_key])) > 0
        )
        t2 = t1.join(F.broadcast(d2), fuzzy_cond, "left")
        w1 = Window.partitionBy(fact_id).orderBy("__k2")
        pick = t2.withColumn("__rn", F.row_number().over(w1)).filter(
            F.col("__rn") == 1
        )
        return pick.select(
            *fact.columns,
            F.coalesce(F.col("__k1"), F.col("__k2")).alias(dim_key),
            *[
                F.coalesce(F.col(f"__c1_{c}"), F.col(f"__c2_{c}")).alias(c)
                for c in dim_cols
            ],
            F.when(F.col("__k1").isNotNull(), F.lit(1))
            .when(F.col("__k2").isNotNull(), F.lit(2))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("tier"),
        )

    tier1 = fact.join(F.broadcast(dim), fact[fact_key] == dim[dim_key], "left")
    matched = tier1.filter(F.col(dim_key).isNotNull()).select(
        *fact.columns, *out_dim, F.lit(1).cast("int").alias("tier")
    )
    misses = tier1.filter(F.col(dim_key).isNull()).select(*fact.columns)

    if prefilter != "trigram":
        raise ValueError(f"unknown prefilter strategy: {prefilter!r}")

    w = Window.partitionBy(fact_id).orderBy(dim_key)
    # keys shorter than the gram width can't hit dim trigrams, so
    # they take the nested-loop branch (they are rare; the bulk of
    # the miss set goes through the equi-join)
    long_miss = misses.filter(F.length(fact_key) >= 3)
    short_miss = misses.filter(F.length(fact_key) < 3)
    dim_tri = dim.select(
        *[F.col(c) for c in [dim_key, *dim_cols]],
        F.explode(F.array_distinct(_char_trigrams(F.col(dim_key)))).alias(
            "__g"
        ),
    )
    miss_tri = long_miss.withColumn(
        "__g", F.array_min(_char_trigrams(F.col(fact_key)))
    )
    candidates = miss_tri.join(dim_tri, "__g").drop("__g")
    verified_long = candidates.filter(
        F.instr(F.lower(F.col(dim_key)), F.lower(F.col(fact_key))) > 0
    )
    verified_short = short_miss.join(
        F.broadcast(dim),
        F.instr(F.lower(dim[dim_key]), F.lower(short_miss[fact_key])) > 0,
        "inner",
    )
    verified = verified_long.unionByName(verified_short)
    tier2 = (
        verified.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*fact.columns, *out_dim, F.lit(2).cast("int").alias("tier"))
    )

    unmatched = misses.join(
        tier2.select(fact_id), on=fact_id, how="left_anti"
    ).select(
        *fact.columns,
        *[F.lit(None).cast(dim_types[c]).alias(c) for c in out_dim],
        F.lit(0).cast("int").alias("tier"),
    )

    return matched.unionByName(tier2).unionByName(unmatched)
