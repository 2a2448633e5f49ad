"""Streaming data-quality monitor — per-micro-batch contract audits
accumulated through the rollup state machine.

An ingest pipeline doesn't audit its contracts once; it watches them:
every arriving batch is checked (operators/contracts.py) and the
per-check violation/checked counters accumulate exactly-once across
epochs. The composition is deliberately thin — the audit report
``(check, violations, checked)`` IS a set of algebraic partials
(sums), so the continuous-rollup maintainer (streaming/rollup.py)
provides the state discipline for free: touched-check-only re-merge,
immutable epoch directories, atomic manifest swap, committed-replay
early return. A check that degrades mid-stream shows up as a rising
violation counter without re-scanning history.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession

from ..operators.contracts import audit_rules
from .rollup import merge_epoch, read_rollup, serve

_AGGS = [("violations", "sum", "violations"), ("checked", "sum", "checked")]


def monitor_epoch(
    state_dir: str,
    batch: DataFrame,
    rules: Sequence[tuple[str, Column]],
    epoch_id: int,
) -> bool:
    """Audit one batch and fold the counters into the monitor state;
    False on a committed-replay early return."""
    return merge_epoch(
        state_dir,
        audit_rules(batch, rules),
        bucket_col="check",
        keys=[],
        aggs=_AGGS,
        epoch_id=epoch_id,
    )


def read_monitor(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Cumulative (check, violations, checked) across every committed
    epoch; None before the first batch."""
    state = read_rollup(spark, state_dir)
    if state is None:
        return None
    return serve(state, ["check"], _AGGS)


def stream_contract_monitor(
    stream: DataFrame,
    state_dir: str,
    checkpoint: str,
    rules: Sequence[tuple[str, Column]],
):
    """Wire the monitor as an exactly-once foreachBatch sink
    (availableNow trigger; the caller awaits termination)."""

    def _sink(batch: DataFrame, epoch_id: int) -> None:
        monitor_epoch(state_dir, batch, rules, epoch_id)

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
