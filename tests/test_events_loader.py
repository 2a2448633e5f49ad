"""Loader contract tests for the events table and the driver fixtures.

The driver fixtures have shipped ``events.ts`` as INT64 nanoseconds
(round ≤2) and as ``timestamp[us]`` (round ≥3); the round-3 loader
assumed the former and broke on the latter (VERDICT round 3, item 1).
These tests pin the loader against BOTH encodings and pin every
table's loaded schema against what pyarrow reads from the current
fixtures, so the next silent fixture regeneration fails here at commit
time instead of at CORRECTNESS time.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMOKE

_TS_US = [
    1_700_000_000_000_000,
    1_700_000_000_123_456,
    1_700_003_600_999_999,
]


def _write_events(path: str, ts_arr: pa.Array) -> None:
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": ts_arr,
            "user_id": pa.array([10, 20, 10], pa.int64()),
            "event_type": pa.array(["a", "b", "a"]),
            "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
            "props": pa.array(['{"k":1}', "{}", "{}"]),
        }
    )
    pq.write_table(tbl, path)


@pytest.mark.parametrize(
    "encoding",
    ["ns_int64", "ts_ns_logical", "ts_us"],
)
def test_events_loader_both_encodings(spark, tmp_path, encoding):
    """Identical canonical output regardless of the fixture encoding."""
    from accounting_etl_spark.sources.tables import _load_events

    d = tmp_path / encoding
    d.mkdir()
    if encoding == "ns_int64":
        ts = pa.array([t * 1000 for t in _TS_US], pa.int64())
    elif encoding == "ts_ns_logical":
        ts = pa.array([t * 1000 for t in _TS_US], pa.timestamp("ns"))
    else:
        ts = pa.array(_TS_US, pa.timestamp("us"))
    _write_events(str(d / "events.parquet"), ts)

    out = _load_events(spark, str(d))
    assert out.columns == [
        "event_id",
        "ts_ns",
        "user_id",
        "event_type",
        "value",
        "props",
        "ts",
    ]
    dtypes = dict(out.dtypes)
    assert dtypes["ts_ns"] == "bigint"
    assert dtypes["ts"] == "timestamp"
    rows = {r.event_id: r for r in out.collect()}
    for eid, us in zip([1, 2, 3], _TS_US):
        assert rows[eid].ts_ns == us * 1000
        expect = datetime.datetime.fromtimestamp(
            us / 1_000_000, tz=datetime.timezone.utc
        ).replace(tzinfo=None)
        # collect() renders in the session zone (pinned UTC)
        assert rows[eid].ts == expect, (eid, rows[eid].ts, expect)


def test_events_loader_rejects_unknown_dtype(spark):
    from accounting_etl_spark.sources.tables import normalize_events

    df = spark.createDataFrame([("x",)], "ts string")
    with pytest.raises(TypeError, match="events.ts"):
        normalize_events(df)


def test_streaming_events_schema_matches_batch(spark):
    """The stream source derives its schema from the batch read, so the
    normalized layouts are identical by construction."""
    from accounting_etl_spark.sources.tables import load_table
    from accounting_etl_spark.streaming.windows import read_events_stream

    batch = load_table(spark, SF_SMOKE, "events")
    stream = read_events_stream(spark, SF_SMOKE)
    assert stream.isStreaming
    assert [
        (f.name, f.dataType.simpleString()) for f in stream.schema.fields
    ] == [(f.name, f.dataType.simpleString()) for f in batch.schema.fields]


# Arrow physical/logical type -> acceptable Spark dtypes for the pin.
_ARROW_TO_SPARK = {
    "int64": {"bigint"},
    "int32": {"int"},
    "double": {"double"},
    "float": {"float"},
    "string": {"string"},
    "large_string": {"string"},
    "binary": {"binary"},
    "large_binary": {"binary"},
    "bool": {"boolean"},
    "date32[day]": {"date"},
}


def _spark_ok(arrow_type: pa.DataType, spark_dtype: str) -> bool:
    s = str(arrow_type)
    if s in _ARROW_TO_SPARK:
        return spark_dtype in _ARROW_TO_SPARK[s]
    if pa.types.is_timestamp(arrow_type):
        return spark_dtype.startswith("timestamp") or spark_dtype == "bigint"
    if pa.types.is_decimal(arrow_type):
        return spark_dtype.startswith("decimal")
    if pa.types.is_list(arrow_type) or pa.types.is_large_list(arrow_type):
        return spark_dtype.startswith("array")
    return True  # don't over-pin exotic types


def test_fixture_schema_pin(spark):
    """Every driver table's loaded Spark schema is consistent with what
    pyarrow reads from the current fixture files."""
    from accounting_etl_spark.sources.tables import TABLES, load_table

    for name in TABLES:
        arrow = pq.read_schema(f"{SF_SMOKE}/{name}.parquet")
        df = load_table(spark, SF_SMOKE, name)
        spark_types = dict(df.dtypes)
        if name == "events":
            # canonical layout contract (see normalize_events)
            assert spark_types["ts"] == "timestamp"
            assert spark_types["ts_ns"] == "bigint"
            continue
        assert set(arrow.names) == set(spark_types), name
        for field in arrow:
            assert _spark_ok(field.type, spark_types[field.name]), (
                name,
                field.name,
                str(field.type),
                spark_types[field.name],
            )


def test_stable_checkpoint_modes(spark, tmp_path, monkeypatch):
    """Both checkpoint modes: local blocks by default; reliable
    directory checkpoint when SPARK_GRAFT_CHECKPOINT_DIR is set."""
    import os

    from accounting_etl_spark.functions.checkpointing import (
        CHECKPOINT_DIR_ENV,
        stable_checkpoint,
    )

    df = spark.range(100).withColumnRenamed("id", "k")

    monkeypatch.delenv(CHECKPOINT_DIR_ENV, raising=False)
    local = stable_checkpoint(df)
    assert local.count() == 100
    # lineage is truncated: the plan is a scan of the checkpointed RDD,
    # not the original Range
    opt = local._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in opt and "Range" not in opt, opt

    ckdir = str(tmp_path / "ck")
    monkeypatch.setenv(CHECKPOINT_DIR_ENV, ckdir)
    rel = stable_checkpoint(df, eager=True)
    assert rel.count() == 100
    assert os.path.isdir(ckdir) and any(os.scandir(ckdir))
