"""Point-in-time feature joins — the feature-store correctness
primitive for training-set assembly.

A training example is a LABEL observed at some time; its features
must be the values that were knowable AT THAT TIME. Joining the
latest feature row regardless of time leaks the future into training
(the most common silent corruption in ML pipelines). The
point-in-time join takes each label (entity, label_time) and, for
every feature table, attaches the newest feature row with
``feature_time <= label_time`` — exactly the backward as-of join
(operators/asof.py), composed once per feature table.

Scale shape inherits from the as-of operator: per feature table one
union-sort/last-carry pass shuffled on the entity key — no range
explosion, no per-label window over a user's full history. Feature
tables join sequentially (k tables = k passes); they cannot be
folded into one pass because each carries its own timeline.

Each feature's payload columns arrive with an optional prefix
(collision-proof when two tables share column names), plus
``<prefix>asof_time`` — the feature row's own timestamp, so staleness
is auditable downstream (NULL when no feature row predates the
label).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

from .asof import asof_join


class FeatureTable:
    """One feature source: ``df`` with an entity column named like
    the label side's ``on``, an integer event-time column, payload
    columns, and an optional output prefix."""

    def __init__(
        self,
        df: DataFrame,
        *,
        time_col: str,
        payload: Sequence[str],
        prefix: str = "",
        tiebreak: Sequence[str] | None = None,
        max_staleness: int | None = None,
    ) -> None:
        if not payload:
            raise ValueError("payload must be non-empty")
        if tiebreak and not set(tiebreak) <= set(payload):
            raise ValueError("tiebreak columns must be in payload")
        self.df = df
        self.time_col = time_col
        self.payload = list(payload)
        self.prefix = prefix
        self.tiebreak = list(tiebreak or [])
        # feature-store TTL: a feature row older than this (in the
        # time column's own units) is treated as absent — serving a
        # week-old balance as "current" is a correctness bug, not a
        # staleness footnote
        self.max_staleness = max_staleness


def point_in_time_join(
    labels: DataFrame,
    features: Sequence[FeatureTable],
    *,
    on: str,
    label_time: str,
) -> DataFrame:
    """Attach, for every feature table, the newest feature row at or
    before each label's time. Returns all label columns plus each
    table's prefixed payload and ``<prefix>asof_time``."""
    if not features:
        raise ValueError("at least one feature table required")
    out = labels
    for ft in features:
        t_out = f"{ft.prefix}asof_time"
        renamed = ft.df.select(
            ft.df[on],
            ft.df[ft.time_col].alias(t_out),
            *[
                ft.df[c].alias(f"{ft.prefix}{c}")
                for c in ft.payload
            ],
        )
        out = asof_join(
            out,
            renamed,
            on=on,
            left_time=label_time,
            right_time=t_out,
            payload=[t_out]
            + [f"{ft.prefix}{c}" for c in ft.payload],
            tiebreak=[f"{ft.prefix}{c}" for c in ft.tiebreak]
            if ft.tiebreak
            else None,
            tolerance=ft.max_staleness,
        )
    return out
