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


def test_expiring_state_emits_final_and_removes(spark, tmp_path):
    """Event-time timeout: after the watermark passes a key's
    inactivity gap, its state fires once as final=true and is removed
    (bounded state — the 100 TB posture for per-key state)."""
    import json as _json
    import uuid

    from accounting_etl_spark.streaming.stateful import expiring_session_totals

    src = tmp_path / "ev_exp"
    src.mkdir()
    schema = "user_id bigint, ts timestamp, value double"

    def land(fname, rows):
        (src / fname).write_text(
            "\n".join(
                _json.dumps({"user_id": u, "ts": t, "value": v})
                for u, t, v in rows
            )
        )

    # epoch 1: user 1 active at 10:00
    land("b1.json", [(1, "2026-08-10T10:00:00Z", 1.25),
                     (1, "2026-08-10T10:05:00Z", 2.00)])
    stream = spark.readStream.schema(schema).json(str(src))
    out = expiring_session_totals(
        stream, gap_ms=3600_000, watermark="30 minutes"
    )
    name = f"exp_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_exp"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows1 = spark.sql(f"SELECT * FROM {name}").collect()
        open1 = [r for r in rows1 if r.user_id == 1 and not r.final]
        assert open1 and open1[-1].n_events == 2
        assert open1[-1].total_cents == 325
        assert not [r for r in rows1 if r.final]
        # epoch 2: user 2 at 20:00 — watermark advances to 19:30,
        # far past user 1's timeout (11:05 + 1h)
        land("b2.json", [(2, "2026-08-10T20:00:00Z", 5.00)])
        q.processAllAvailable()
        # one more empty-ish batch so the timeout pass runs if the
        # engine deferred it
        land("b3.json", [(2, "2026-08-10T20:10:00Z", 1.00)])
        q.processAllAvailable()
        rows2 = spark.sql(f"SELECT * FROM {name}").collect()
        finals = [r for r in rows2 if r.final]
        assert [(r.user_id, r.n_events, r.total_cents) for r in finals] == [
            (1, 2, 325)
        ]
    finally:
        q.stop()
