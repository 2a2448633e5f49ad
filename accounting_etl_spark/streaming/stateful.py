"""Custom stateful streaming operator: per-key running totals via
``applyInPandasWithState`` (SURVEY §2.9 T4 'custom stateful
operators').

Each micro-batch folds its rows into per-user persistent state
(event count + value cents) and emits the refreshed totals — the
streaming generalization of the reference's cumulative counters
(main.py:104-106). Cents are exact integers so restarts and
re-orderings can't drift the totals (same policy as
functions/detsum.py for batch money).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_cents bigint"
STATE_SCHEMA = "n bigint, cents bigint"


def running_user_totals(events: DataFrame) -> DataFrame:
    """events stream (user_id, value) → running per-user totals."""

    def fold(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, cents = state.get if state.exists else (0, 0)
        for pdf in batches:
            n += len(pdf)
            cents += int(pdf["value_cents"].sum())
        state.update((n, cents))
        yield pd.DataFrame(
            [{"user_id": key[0], "n_events": n, "total_cents": cents}]
        )

    prepared = events.select(
        "user_id",
        F.round(F.col("value") * 100).cast("bigint").alias("value_cents"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EXPIRING_OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_cents bigint, final boolean"
)
EXPIRING_STATE_SCHEMA = "n bigint, cents bigint, last_ms bigint"


def expiring_session_totals(
    events: DataFrame,
    *,
    gap_ms: int = 3600_000,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-user totals whose state EXPIRES on event-time inactivity.

    ``running_user_totals`` keeps a state row per key forever — fine
    for a bounded key space, a leak at 100 TB. This variant sets an
    event-time timeout ``gap_ms`` past each key's latest event; when
    the watermark passes it, the state fires once as a closed summary
    (``final=true``) and is REMOVED. Live batches emit refreshed open
    summaries (``final=false``). Deterministic: expiry is driven by
    the event-time watermark, not wall clock.
    """

    def fold(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, cents, _last = state.get
            state.remove()
            yield pd.DataFrame(
                [{"user_id": key[0], "n_events": n, "total_cents": cents,
                  "final": True}]
            )
            return
        n, cents, last_ms = state.get if state.exists else (0, 0, 0)
        for pdf in batches:
            n += len(pdf)
            cents += int(pdf["value_cents"].sum())
            last_ms = max(last_ms, int(pdf["ts_ms"].max()))
        state.update((n, cents, last_ms))
        state.setTimeoutTimestamp(last_ms + gap_ms)
        yield pd.DataFrame(
            [{"user_id": key[0], "n_events": n, "total_cents": cents,
              "final": False}]
        )

    prepared = events.withWatermark("ts", watermark).select(
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("value_cents"),
        (F.unix_micros("ts") / 1000).cast("bigint").alias("ts_ms"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=EXPIRING_OUTPUT_SCHEMA,
        stateStructType=EXPIRING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
