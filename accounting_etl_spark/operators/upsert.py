"""Keyed MERGE/upsert emulation (K2, reference database.py:128-153).

The reference's ``INSERT ... ON CONFLICT(vendor) DO UPDATE SET ...,
updated_at=CURRENT_TIMESTAMP``. With Delta available this is one
``MERGE INTO``; the parquet-only form used here is the standard
anti-join + union decomposition:

    kept      = dim  ⟕̸ updates   (left_anti: rows not being updated)
    refreshed = updates ⋈ dim     (matched: new values, created_at kept)
    new       = updates ⟕̸ dim    (unmatched: inserted)

One shuffle on the key (all three joins share it — at scale,
pre-bucket the dim by key and all three are co-located). The
timestamp is an explicit ``batch_ts`` parameter, not now(): exactly-
once reruns must be idempotent, and correctness comparisons need
determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    dim: DataFrame,
    updates: DataFrame,
    *,
    key: str,
    set_cols: list[str],
    created_col: str = "created_at",
    updated_col: str = "updated_at",
    batch_ts: str,
) -> DataFrame:
    """Upsert ``updates`` into ``dim`` (SQLite upsert semantics)."""
    out_cols = [key, *set_cols, created_col, updated_col]
    kept = dim.join(updates.select(key), key, "left_anti").select(*out_cols)
    refreshed = (
        updates.join(dim.select(key, created_col), key, "inner")
        .withColumn(updated_col, F.lit(batch_ts))
        .select(*out_cols)
    )
    new = (
        updates.join(dim.select(key), key, "left_anti")
        .withColumn(created_col, F.lit(batch_ts))
        .withColumn(updated_col, F.lit(batch_ts))
        .select(*out_cols)
    )
    return kept.unionByName(refreshed).unionByName(new)
