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


def _one_row_per_key(
    updates: DataFrame, key: str, set_cols: list[str]
) -> DataFrame:
    """Collapse duplicate keys inside one batch deterministically.

    A batch carrying the same key twice would fan out the matched dim
    row per duplicate — merge_upsert emits conflicting refreshed rows
    and scd2_upsert corrupts its one-open-row-per-key invariant
    (multiple simultaneous is_current versions). Winner = max over the
    value struct: replay-stable regardless of input order or
    partitioning (there is no reliable "last" in a distributed batch).
    """
    s = F.struct(*[F.col(c) for c in set_cols])
    return (
        updates.select(key, s.alias("__s"))
        .groupBy(key)
        .agg(F.max("__s").alias("__s"))
        .select(key, *[F.col(f"__s.{c}").alias(c) for c in set_cols])
    )


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
    updates = _one_row_per_key(updates, key, set_cols)
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


def scd2_upsert(
    dim: DataFrame,
    updates: DataFrame,
    *,
    key: str,
    set_cols: list[str],
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_col: str = "is_current",
    batch_ts: str,
) -> DataFrame:
    """SCD Type-2 history-preserving upsert.

    ``dim`` carries versioned rows (``valid_from``, ``valid_to`` NULL
    while open, ``is_current``). Per update key:
    - values CHANGED vs the current row → the current row closes
      (valid_to = batch_ts, is_current = false) and a new current
      version inserts;
    - values identical (null-safe compare) → no-op, no spurious
      version churn;
    - new key → first version inserts.
    History rows pass through untouched. Same single-shuffle posture
    as :func:`merge_upsert` (every join keys on ``key``; pre-bucketing
    the dim co-locates them all), and the same explicit ``batch_ts``
    idempotency contract.
    """
    updates = _one_row_per_key(updates, key, set_cols)
    out_cols = [key, *set_cols, valid_from, valid_to, current_col]
    hist = dim.filter(~F.col(current_col)).select(*out_cols)
    cur = dim.filter(F.col(current_col))
    u = updates.select(
        key,
        *[F.col(c).alias(f"__u_{c}") for c in set_cols],
        F.lit(True).alias("__has_u"),
    )
    j = cur.join(u, key, "left")
    same = F.lit(True)
    for c in set_cols:
        same = same & F.col(c).eqNullSafe(F.col(f"__u_{c}"))
    changed = F.coalesce(F.col("__has_u"), F.lit(False)) & ~same
    kept_cur = j.filter(~changed).select(*out_cols)
    closed = j.filter(changed).select(
        key,
        *set_cols,
        valid_from,
        F.lit(batch_ts).alias(valid_to),
        F.lit(False).alias(current_col),
    )
    new_versions = j.filter(changed).select(
        key,
        *[F.col(f"__u_{c}").alias(c) for c in set_cols],
        F.lit(batch_ts).alias(valid_from),
        F.lit(None).cast("string").alias(valid_to),
        F.lit(True).alias(current_col),
    )
    brand_new = (
        updates.join(cur.select(key), key, "left_anti")
        .select(
            key,
            *set_cols,
            F.lit(batch_ts).alias(valid_from),
            F.lit(None).cast("string").alias(valid_to),
            F.lit(True).alias(current_col),
        )
    )
    return (
        hist.unionByName(kept_cur)
        .unionByName(closed)
        .unionByName(new_versions)
        .unionByName(brand_new)
    )


def apply_cdc(
    log: DataFrame,
    *,
    key: str,
    seq_col: str,
    op_col: str,
    payload_cols: list[str],
    delete_op: str = "D",
) -> DataFrame:
    """Materialize the final state of an ordered change log
    (Debezium/CDC apply): per key the HIGHEST-sequence event wins,
    and a winning delete tombstone removes the key entirely.

    One aggregation — ``max(struct(seq, op, payload...))`` per key —
    so the whole apply is a single map-side-combining shuffle (no
    per-key window sort; a key's log can be arbitrarily long and
    still reduces incrementally). The struct max compares the
    sequence first; the caller's contract is a unique sequence per
    key (Kafka offset, LSN) — if sequences ever tie, the op and
    payload bytes break the tie deterministically rather than
    nondeterministically.

    Returns one row per surviving key: ``(key, *payload_cols,
    seq_col, op_col)`` — the applied state plus the winning event's
    provenance.
    """
    last = (
        log.groupBy(key)
        .agg(
            F.max(
                F.struct(
                    F.col(seq_col),
                    F.col(op_col),
                    *[F.col(c) for c in payload_cols],
                )
            ).alias("__last")
        )
    )
    return last.where(F.col(f"__last.{op_col}") != delete_op).select(
        key,
        *[F.col(f"__last.{c}").alias(c) for c in payload_cols],
        F.col(f"__last.{seq_col}").alias(seq_col),
        F.col(f"__last.{op_col}").alias(op_col),
    )
