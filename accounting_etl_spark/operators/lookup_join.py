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

    tier1 = fact.join(F.broadcast(dim), fact[fact_key] == dim[dim_key], "left")
    matched = tier1.filter(F.col(dim_key).isNotNull()).select(
        *fact.columns, *out_dim, F.lit(1).cast("int").alias("tier")
    )
    misses = tier1.filter(F.col(dim_key).isNull()).select(*fact.columns)

    w = Window.partitionBy(fact_id).orderBy(dim_key)
    if prefilter == "trigram":
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
    else:
        contains = (
            F.instr(F.lower(dim[dim_key]), F.lower(misses[fact_key])) > 0
        )
        verified = misses.join(F.broadcast(dim), contains, "inner")
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
