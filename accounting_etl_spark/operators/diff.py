"""Snapshot diff — dataset-versioning audit between two table states.

Incremental dataset releases (a re-crawled corpus, a re-scored quality
table, a post-MERGE dimension) need an auditable answer to "what
changed since the last snapshot": which keys were added, which
removed, which rows changed in place.  Delta/Iceberg expose this as
table history + CDC; on plain tables it is one keyed comparison:

- ONE full-outer equi-join on the key — a single shuffle both sides,
  co-partitioned, no data-sized driver transfer;
- per-column null-safe equality (``eqNullSafe``) decides
  added / removed / changed / unchanged — no row-hash collisions, and
  a changed verdict can name its columns;
- output carries the NEW row's payload for added/changed and the OLD
  row's for removed, so the diff alone can drive a downstream apply.

At 100 TB both snapshots shuffle on the same key; if the snapshots are
bucketed or written by :func:`..layout.write_clustered` on the key,
the join co-locates without either shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    *,
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Keyed diff of two snapshots.

    Returns ``(change, <key>, <compare_cols...>, changed_cols)`` with
    ``change`` in {added, removed, changed, unchanged} (unchanged rows
    dropped unless ``include_unchanged``), payload columns from the
    NEW side for added/changed and the OLD side for removed, and
    ``changed_cols`` the sorted array of differing column names
    (empty for added/removed/unchanged).

    ``key`` must be unique per snapshot (it is a dimension/key-value
    contract — enforce upstream with dedup_exact); duplicate keys
    would fan out the outer join.
    """
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c != key]
    o = old.select(
        F.col(key).alias("__k"),
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        F.col(key).alias("__k"),
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    j = o.join(n, "__k", "full_outer")
    diffs = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")),
                        F.lit(c),
                    )
                    for c in compare_cols
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.size("__changed") > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = (
        j.withColumn("__changed", diffs)
        .withColumn("change", change)
        .select(
            "change",
            F.col("__k").alias(key),
            *[
                F.when(
                    F.col("change") == "removed", F.col(f"__o_{c}")
                ).otherwise(F.col(f"__n_{c}")).alias(c)
                for c in compare_cols
            ],
            F.when(F.col("change") == "changed", F.col("__changed"))
            .otherwise(F.array().cast("array<string>"))
            .alias("changed_cols"),
        )
    )
    if not include_unchanged:
        out = out.filter(F.col("change") != "unchanged")
    return out
