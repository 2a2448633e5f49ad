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
