"""Streaming surface tests (SURVEY §5.5): finite streams through
memory sinks, compared against the oracle-checked batch forms; the
ingest path end-to-end through a tmp landing dir with foreachBatch
MERGE.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _cleanup(spark, q):
    q.stop()


def test_streaming_tumbling_matches_batch(spark):
    from accounting_etl_spark.queries.events import q_tumbling_window
    from accounting_etl_spark.streaming.windows import (
        read_events_stream,
        run_to_memory,
        tumbling_counts,
    )

    name = f"tumb_{uuid.uuid4().hex[:8]}"
    stream = tumbling_counts(read_events_stream(spark, SF_SMOKE))
    q = run_to_memory(stream, name)
    try:
        got = {
            (r.window_start_s, r.event_type): (r.n, r.total)
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
        batch = {
            (r.window_start_s, r.event_type): (r.n, r.total)
            for r in q_tumbling_window(spark, SF_SMOKE).collect()
        }
        # append mode withholds windows the watermark hasn't passed
        assert got, "stream emitted nothing"
        assert set(got) <= set(batch)
        assert all(batch[k] == v for k, v in got.items())
        # everything older than the final watermark must have emitted
        assert len(got) >= len(batch) - 60
    finally:
        _cleanup(spark, q)


def test_streaming_sessions_match_batch_sessionize(spark):
    from accounting_etl_spark.queries.windows import q_sessionize_events
    from accounting_etl_spark.streaming.windows import (
        read_events_stream,
        run_to_memory,
        session_counts,
    )

    name = f"sess_{uuid.uuid4().hex[:8]}"
    stream = session_counts(read_events_stream(spark, SF_SMOKE))
    q = run_to_memory(stream, name)
    try:
        got = {
            (r.user_id, r.session_start_s): (r.n_events, r.session_value)
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
        batch = {
            (r.user_id, r.session_start_s): (r.n_events, r.session_value)
            for r in q_sessionize_events(spark, SF_SMOKE).collect()
        }
        assert got, "stream emitted nothing"
        assert set(got) <= set(batch)
        assert all(batch[k] == v for k, v in got.items())
    finally:
        _cleanup(spark, q)


def test_ingest_dedup_and_upsert(spark, tmp_path):
    from accounting_etl_spark.streaming.ingest import (
        foreach_batch_upsert,
        read_dim,
        read_landing_stream,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    recs = [
        # kept: pdf + statement subject + recent
        {"filename": "stmt_jan.pdf", "subject": "Your credit card statement",
         "sender": "bank@example.com", "received_at": "2026-08-10T00:00:00Z",
         "size_bytes": 1000},
        # duplicate filename -> dropDuplicates keeps one
        {"filename": "stmt_jan.pdf", "subject": "Your credit card statement",
         "sender": "bank@example.com", "received_at": "2026-08-10T01:00:00Z",
         "size_bytes": 1000},
        # wrong extension -> dropped (P11)
        {"filename": "notes.txt", "subject": "statement", "sender": "x",
         "received_at": "2026-08-10T00:00:00Z", "size_bytes": 10},
        # wrong subject -> dropped (P10)
        {"filename": "cat.pdf", "subject": "cute cat pics", "sender": "x",
         "received_at": "2026-08-10T00:00:00Z", "size_bytes": 10},
        # too old -> dropped (P9)
        {"filename": "old.pdf", "subject": "mastercard statement", "sender": "x",
         "received_at": "2020-01-01T00:00:00Z", "size_bytes": 10},
    ]
    (landing / "batch1.json").write_text("\n".join(json.dumps(r) for r in recs))

    stream = read_landing_stream(spark, str(landing))
    dim_path = str(tmp_path / "dim")
    sink = foreach_batch_upsert(
        dim_path, key="filename", set_cols=["subject", "ingest_month"]
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    dim = read_dim(spark, dim_path).toPandas()
    assert sorted(dim["filename"]) == ["stmt_jan.pdf"]
    assert dim.iloc[0]["ingest_month"] == "2026-08"

    # second epoch: same file again (idempotent re-land) + a new one
    recs2 = [
        {"filename": "stmt_jan.pdf", "subject": "Your credit card statement",
         "sender": "bank@example.com", "received_at": "2026-08-10T00:00:00Z",
         "size_bytes": 1000},
        {"filename": "stmt_feb.pdf", "subject": "statement february",
         "sender": "bank@example.com", "received_at": "2026-08-11T00:00:00Z",
         "size_bytes": 2000},
    ]
    (landing / "batch2.json").write_text("\n".join(json.dumps(r) for r in recs2))
    q2 = (
        read_landing_stream(spark, str(landing))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    dim2 = read_dim(spark, dim_path).toPandas()
    assert sorted(dim2["filename"]) == ["stmt_feb.pdf", "stmt_jan.pdf"]

    # snapshot layout: atomic _CURRENT pointer + bounded version history
    import os

    entries = sorted(os.listdir(dim_path))
    assert "_CURRENT" in entries
    versions = [d for d in entries if d.startswith("v-")]
    assert 1 <= len(versions) <= 2  # keep_versions prunes older snapshots
    with open(os.path.join(dim_path, "_CURRENT")) as f:
        assert f.read().strip() == versions[-1]


def test_binaryfile_words_plumbing(spark, tmp_path):
    """U1 plumbing with an injected extractor (pdfplumber absent)."""
    from accounting_etl_spark.sources.binary_files import (
        scan_binary_files,
        words_from_pdfs,
    )
    from accounting_etl_spark.plans.statement import extract_transactions
    from accounting_etl_spark.plans import fixtures as FX

    # lay fake "pdfs" on disk: content = path key into the fixture
    pdf_dir = tmp_path / "downloads" / "2026-08"
    pdf_dir.mkdir(parents=True)
    (pdf_dir / "stmt1.pdf").write_bytes(b"stmt1.pdf")
    (pdf_dir / "stmt2.pdf").write_bytes(b"stmt2.pdf")
    (pdf_dir / "ignore.txt").write_bytes(b"nope")

    by_path: dict[str, list[tuple]] = {}
    for (path, page, text, x0, x1, top, bottom) in FX.WORDS_ROWS:
        by_path.setdefault(path, []).append((page, text, x0, x1, top, bottom))

    def fake_extractor(payload: bytes) -> list[tuple]:
        return by_path.get(payload.decode(), [])

    binaries = scan_binary_files(spark, str(tmp_path / "downloads"))
    assert binaries.count() == 2  # glob filtered the .txt
    words = words_from_pdfs(binaries, extractor=fake_extractor)
    # provenance: path comes from the file scan, not the payload
    words = words.withColumn(
        "path", F.element_at(F.split("path", "/"), -1)
    )
    txns = extract_transactions(words)
    assert txns.count() == 8

    def broken_extractor(payload: bytes):
        raise ImportError("pdfplumber is not installed")

    import pytest as _pytest

    with _pytest.raises(Exception, match="pdfplumber"):
        words_from_pdfs(binaries, extractor=broken_extractor).collect()


def test_stream_stream_join_matches_batch(spark):
    from accounting_etl_spark.sources.tables import load_table
    from accounting_etl_spark.streaming.joins import stream_event_pairs
    from accounting_etl_spark.streaming.windows import (
        read_events_stream,
        run_to_memory,
    )

    name = f"ssj_{uuid.uuid4().hex[:8]}"
    stream = stream_event_pairs(read_events_stream(spark, SF_SMOKE))
    q = run_to_memory(stream, name)
    try:
        got = {
            (r.user_id, r.id_a, r.id_b): r.dt_s
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
        ev = load_table(spark, SF_SMOKE, "events").select(
            "user_id", "event_id", F.unix_micros("ts").alias("us")
        )
        a, b = ev.alias("a"), ev.alias("b")
        batch = {
            (r["user_id"], r["id_a"], r["id_b"]): r["dt_s"]
            for r in a.join(
                b,
                (F.col("a.user_id") == F.col("b.user_id"))
                & (F.col("a.event_id") < F.col("b.event_id"))
                & (F.col("b.us") >= F.col("a.us"))
                & (F.col("b.us") <= F.col("a.us") + 30 * 60 * 1000000),
            )
            .select(
                F.col("a.user_id").alias("user_id"),
                F.col("a.event_id").alias("id_a"),
                F.col("b.event_id").alias("id_b"),
                F.expr("CAST((b.us - a.us) DIV 1000000 AS BIGINT)").alias("dt_s"),
            )
            .collect()
        }
        assert got, "stream-stream join emitted nothing"
        assert got == batch
    finally:
        q.stop()


def test_dedup_within_watermark_bounded_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicates inside the watermark
    delay are suppressed, and the key state is evicted after the
    watermark passes (bounded state — the 100 TB posture)."""
    import uuid

    from accounting_etl_spark.streaming.ingest import read_landing_stream

    landing = tmp_path / "landing_wm"
    landing.mkdir()
    recs = [
        {"filename": "stmt.pdf", "subject": "statement", "sender": "b",
         "received_at": "2026-08-10T00:00:00Z", "size_bytes": 1},
        # duplicate key 2h later — inside the 1-day watermark delay
        {"filename": "stmt.pdf", "subject": "statement", "sender": "b",
         "received_at": "2026-08-10T02:00:00Z", "size_bytes": 1},
        {"filename": "other.pdf", "subject": "statement", "sender": "b",
         "received_at": "2026-08-10T03:00:00Z", "size_bytes": 1},
    ]
    (landing / "b1.json").write_text("\n".join(json.dumps(r) for r in recs))
    name = f"wmdd_{uuid.uuid4().hex[:8]}"
    q = (
        read_landing_stream(spark, str(landing), dedup_within_watermark=True)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt_wm"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    try:
        rows = spark.sql(f"SELECT filename FROM {name}").collect()
        names = sorted(r.filename for r in rows)
        assert names == ["other.pdf", "stmt.pdf"]
    finally:
        q.stop()


def test_stream_stream_join_drops_late_data(spark, tmp_path):
    """A row older than the advanced watermark must be dropped from
    the stream-stream join state — no pairs involve the late event."""
    import time
    import uuid

    from accounting_etl_spark.streaming.joins import stream_event_pairs

    src = tmp_path / "events_src"
    src.mkdir()
    schema = "user_id bigint, event_id bigint, ts timestamp"

    def write_batch(fname, rows):
        df = spark.createDataFrame(rows, schema)
        df.coalesce(1).write.mode("overwrite").json(str(tmp_path / fname))
        # land as a single json file the stream picks up
        import glob
        import shutil

        part = glob.glob(str(tmp_path / fname / "part-*.json"))[0]
        shutil.copy(part, str(src / f"{fname}.json"))

    from datetime import datetime, timezone

    def t(h, m=0):
        return datetime(2026, 8, 10, h, m, tzinfo=timezone.utc)

    # epoch 1: two close events (a pair) far in the future so the
    # watermark (max ts - 1h) advances well past the late event below
    write_batch("b1", [(1, 1, t(10, 0)), (1, 2, t(10, 10)), (1, 99, t(20, 0))])

    events = (
        spark.readStream.schema(schema)
        .json(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    pairs = stream_event_pairs(events, window="30 minutes", watermark="1 hour")
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    q = (
        pairs.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj"))
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = {(r.id_a, r.id_b) for r in spark.sql(f"SELECT * FROM {name}").collect()}
        assert (1, 2) in got1
        # epoch 2: a late event at 10:05 — within pairing range of
        # events 1 and 2, but hours older than the watermark (19:00)
        write_batch("b2", [(1, 3, t(10, 5))])
        q.processAllAvailable()
        time.sleep(1)
        q.processAllAvailable()
        got2 = {(r.id_a, r.id_b) for r in spark.sql(f"SELECT * FROM {name}").collect()}
        late_pairs = {p for p in got2 if 3 in p}
        assert late_pairs == set(), f"late event paired: {late_pairs}"
    finally:
        q.stop()


def test_read_dim_survives_unswapped_snapshot(spark, tmp_path):
    """A snapshot directory written WITHOUT the pointer swap (a crash
    between write and rename) must be invisible to readers."""
    from accounting_etl_spark.streaming.ingest import read_dim

    dim_path = tmp_path / "dim_crash"
    dim_path.mkdir()
    good = spark.createDataFrame([("a", 1)], "k string, v int")
    good.write.parquet(str(dim_path / "v-00000001"))
    (dim_path / "_CURRENT").write_text("v-00000001")
    # crash scenario: half-landed newer snapshot, pointer not swapped
    bad = spark.createDataFrame([("b", 2)], "k string, v int")
    bad.write.parquet(str(dim_path / "v-00000002"))
    got = read_dim(spark, str(dim_path)).collect()
    assert [(r.k, r.v) for r in got] == [("a", 1)]
    # and before any pointer exists at all: no dim
    empty = tmp_path / "dim_none"
    empty.mkdir()
    assert read_dim(spark, str(empty)) is None


def test_upsert_replay_of_committed_epoch_is_noop(spark, tmp_path):
    """foreachBatch is at-least-once: replaying an epoch whose
    _CURRENT pointer already swapped (the streaming checkpoint commit
    was lost) must return early — re-running would read the snapshot
    it is about to overwrite (ADVICE r2 medium)."""
    import os

    from accounting_etl_spark.streaming.ingest import (
        foreach_batch_upsert,
        read_dim,
    )

    dim_path = str(tmp_path / "dim")
    os.makedirs(dim_path)
    sink = foreach_batch_upsert(dim_path, key="k", set_cols=["v"])
    b0 = spark.createDataFrame([("a", "1"), ("b", "2")], "k string, v string")
    sink(b0, 0)
    before = sorted(
        (r.k, r.v) for r in read_dim(spark, dim_path).collect()
    )
    sink(b0, 0)  # replay: guard no-ops instead of self-overwriting
    after = sorted((r.k, r.v) for r in read_dim(spark, dim_path).collect())
    assert before == after == [("a", "1"), ("b", "2")]
    # a replay that raced a crash BEFORE the pointer swap (partial
    # snapshot dir exists, _CURRENT still points at the old version)
    # rebuilds via staging and completes
    partial = spark.createDataFrame([("junk", "x")], "k string, v string")
    partial.write.parquet(os.path.join(dim_path, "v-00000001"))
    b1 = spark.createDataFrame([("a", "9")], "k string, v string")
    sink(b1, 1)
    cur = {r.k: r.v for r in read_dim(spark, dim_path).collect()}
    assert cur == {"a": "9", "b": "2"}
    # no staging leftovers
    assert not [d for d in os.listdir(dim_path) if d.endswith(".staging")]


def test_stream_restart_recovers_exactly_once(spark, tmp_path):
    """Kill/resume a checkpointed ingest query: drop the final
    checkpoint commit (crash between sink commit and checkpoint
    commit), restart, and assert the dim survives the forced epoch
    replay unchanged, then keeps advancing on new data."""
    import os

    from accounting_etl_spark.streaming.ingest import (
        foreach_batch_upsert,
        read_dim,
        read_landing_stream,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    ckpt = str(tmp_path / "ckpt")
    dim_path = str(tmp_path / "dim")
    rec = {
        "filename": "stmt_jan.pdf",
        "subject": "Your credit card statement",
        "sender": "bank@example.com",
        "received_at": "2026-08-10T00:00:00Z",
        "size_bytes": 1000,
    }
    (landing / "b1.json").write_text(json.dumps(rec))
    sink = foreach_batch_upsert(
        dim_path, key="filename", set_cols=["subject", "ingest_month"]
    )

    def run_once():
        q = (
            read_landing_stream(spark, str(landing))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    dim1 = sorted(
        r.filename for r in read_dim(spark, dim_path).collect()
    )
    assert dim1 == ["stmt_jan.pdf"]

    # simulate the crash window: the sink committed (pointer swapped)
    # but the streaming commit log never landed -> on restart Spark
    # REPLAYS the last epoch into foreachBatch
    commits = sorted(
        f for f in os.listdir(os.path.join(ckpt, "commits"))
        if f.isdigit()
    )
    os.remove(os.path.join(ckpt, "commits", commits[-1]))
    # the local ChecksumFs keeps a hidden .N.crc sibling; a real crash
    # loses both, and leaving it makes the re-commit rename fail
    crc = os.path.join(ckpt, "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    # new data arrives while "down"
    rec2 = dict(rec, filename="stmt_feb.pdf", subject="statement feb")
    (landing / "b2.json").write_text(json.dumps(rec2))

    run_once()  # restart: replayed epoch no-ops, new epoch applies
    dim2 = sorted(
        r.filename for r in read_dim(spark, dim_path).collect()
    )
    assert dim2 == ["stmt_feb.pdf", "stmt_jan.pdf"]
