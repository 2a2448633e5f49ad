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


def two_tier_lookup_join(
    fact: DataFrame,
    dim: DataFrame,
    *,
    fact_id: str,
    fact_key: str,
    dim_key: str,
    dim_cols: list[str],
) -> DataFrame:
    """Enrich ``fact`` from ``dim``: exact tier, containment tier, miss.

    Returns all ``fact`` columns plus ``dim_key``, ``dim_cols`` and an
    int ``tier`` column (1 = exact, 2 = fuzzy, 0 = no match).
    """
    out_dim = [dim_key, *dim_cols]
    dim_types = dict(dim.dtypes)

    tier1 = fact.join(F.broadcast(dim), fact[fact_key] == dim[dim_key], "left")
    matched = tier1.filter(F.col(dim_key).isNotNull()).select(
        *fact.columns, *out_dim, F.lit(1).cast("int").alias("tier")
    )
    misses = tier1.filter(F.col(dim_key).isNull()).select(*fact.columns)

    contains = F.instr(F.lower(dim[dim_key]), F.lower(misses[fact_key])) > 0
    w = Window.partitionBy(fact_id).orderBy(dim_key)
    tier2 = (
        misses.join(F.broadcast(dim), contains, "inner")
        .withColumn("__rn", F.row_number().over(w))
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
