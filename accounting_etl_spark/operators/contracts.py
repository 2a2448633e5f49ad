"""Data-contract auditing — declarative expectation checks over
tables, Deequ-style (row-level rules, key uniqueness, referential
integrity), each emitting ``(check, violations, checked)``.

The reference validates cell values against a codes table and
drop-down constraints (reference ``excel.py`` validation +
``matcher.py`` code checks); at pipeline scale the same need
generalizes to contracts over whole tables: NOT NULL, accepted
values, ranges, cross-field rules, primary-key uniqueness, and
foreign-key orphans — the audit a training-data ingest runs before
trusting an upstream drop.

Scale shape:

- :func:`audit_rules` folds EVERY row-level rule for a table into
  ONE aggregate pass (``sum(case when violated)`` per rule + one
  ``count(*)``), then explodes the single result row into one row
  per rule — N rules never cost N scans;
- :func:`audit_unique` is one groupBy on the key with a bounded
  second aggregate (duplicate groups only);
- :func:`audit_fk` is a left-anti join of the child's non-null keys
  against the parent key set — shuffle-partitioned, no broadcast
  hints (AQE may convert small parents at runtime).

NULL semantics: a rule whose predicate evaluates to NULL on a row
counts that row as NON-violating (both engines skip NULLs in the
conditional sum) — contracts that care must pair the rule with an
explicit ``IS NOT NULL`` rule. FK orphan checks exclude NULL child
keys by construction (``checked`` counts non-null keys only).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEMA = ("check", "violations", "checked")


def audit_rules(
    df: DataFrame, rules: Sequence[tuple[str, Column]]
) -> DataFrame:
    """Row-level rules in one aggregate pass.

    ``rules`` maps check name -> boolean VIOLATION expression (true =
    the row breaks the contract). Returns one row per rule:
    ``(check, violations, checked)``.
    """
    if not rules:
        raise ValueError("at least one rule required")
    aggs = [F.count(F.lit(1)).alias("__checked")]
    for i, (_, cond) in enumerate(rules):
        aggs.append(
            F.coalesce(
                F.sum(cond.cast("bigint")), F.lit(0)
            ).alias(f"__v{i}")
        )
    one = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("check"),
                F.col(f"__v{i}").alias("violations"),
            )
            for i, (name, _) in enumerate(rules)
        ]
    )
    return one.select(
        F.explode(entries).alias("e"), F.col("__checked")
    ).select(
        F.col("e.check").alias("check"),
        F.col("e.violations").cast("bigint").alias("violations"),
        F.col("__checked").cast("bigint").alias("checked"),
    )


def audit_unique(
    df: DataFrame, keys: Sequence[str], name: str
) -> DataFrame:
    """Key-uniqueness check: ``violations`` counts the surplus rows
    (group size minus one, summed over duplicated key groups) so a
    clean table reports 0 and each extra copy counts once."""
    per_key = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
    dup = per_key.agg(
        F.coalesce(
            F.sum(
                F.when(F.col("__n") > 1, F.col("__n") - 1).otherwise(0)
            ),
            F.lit(0),
        ).alias("violations"),
        F.coalesce(F.sum("__n"), F.lit(0)).alias("checked"),
    )
    return dup.select(
        F.lit(name).alias("check"),
        F.col("violations").cast("bigint").alias("violations"),
        F.col("checked").cast("bigint").alias("checked"),
    )


def audit_fk(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    name: str,
) -> DataFrame:
    """Referential-integrity check: non-null child keys with no
    matching parent key. One anti join + two 1-row aggregates."""
    keys = child.select(F.col(child_key).alias("__k")).where(
        F.col("__k").isNotNull()
    )
    pk = parent.select(F.col(parent_key).alias("__k")).distinct()
    orphans = (
        keys.join(pk, "__k", "left_anti")
        .agg(F.count(F.lit(1)).alias("violations"))
    )
    checked = keys.agg(F.count(F.lit(1)).alias("checked"))
    return orphans.crossJoin(checked).select(
        F.lit(name).alias("check"),
        F.col("violations").cast("bigint").alias("violations"),
        F.col("checked").cast("bigint").alias("checked"),
    )


def audit_union(parts: Sequence[DataFrame]) -> DataFrame:
    """Union audit fragments into one (check, violations, checked)
    report."""
    if not parts:
        raise ValueError("no audit fragments")
    out = parts[0].select(*_SCHEMA)
    for p in parts[1:]:
        out = out.unionByName(p.select(*_SCHEMA))
    return out
