"""Stateful streaming operator vs batch totals."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_running_totals_converge_to_batch(spark):
    from accounting_etl_spark.sources.tables import load_table
    from accounting_etl_spark.streaming.stateful import running_user_totals
    from accounting_etl_spark.streaming.windows import (
        read_events_stream,
        run_to_memory,
    )

    name = f"totals_{uuid.uuid4().hex[:8]}"
    stream = running_user_totals(read_events_stream(spark, SF_SMOKE))
    q = run_to_memory(stream, name, mode="update")
    try:
        # update mode appends one refreshed row per key per batch; the
        # max per key is the final state
        final = (
            spark.sql(f"SELECT * FROM {name}")
            .groupBy("user_id")
            .agg(
                F.max("n_events").alias("n_events"),
                F.max("total_cents").alias("total_cents"),
            )
            .toPandas()
            .set_index("user_id")
            .sort_index()
        )
        batch = (
            load_table(spark, SF_SMOKE, "events")
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                    "total_cents"
                ),
            )
            .toPandas()
            .set_index("user_id")
            .sort_index()
        )
        assert len(final) == len(batch) > 0
        assert (final["n_events"] == batch["n_events"]).all()
        assert (final["total_cents"] == batch["total_cents"]).all()
    finally:
        q.stop()
