"""CDC apply: last-write-wins, tombstones, reinsert after delete,
order independence, tie-break determinism."""

from accounting_etl_spark.operators.upsert import apply_cdc


def _apply(spark, rows):
    df = spark.createDataFrame(rows, ["k", "v", "seq", "op"])
    return {
        r.k: (r.v, r.seq, r.op)
        for r in apply_cdc(
            df, key="k", seq_col="seq", op_col="op", payload_cols=["v"]
        ).collect()
    }


def test_highest_seq_wins_and_tombstone_removes(spark):
    rows = [
        ("a", "v1", 1, "U"),
        ("a", "v2", 2, "U"),
        ("b", "w1", 1, "U"),
        ("b", None, 2, "D"),
        ("c", "x1", 5, "U"),
    ]
    assert _apply(spark, rows) == {
        "a": ("v2", 2, "U"),
        "c": ("x1", 5, "U"),
    }


def test_log_order_is_irrelevant(spark):
    rows = [
        ("a", "v3", 3, "U"),
        ("a", "v1", 1, "U"),
        ("a", None, 2, "D"),
    ]
    # the seq-3 upsert outranks the earlier delete regardless of the
    # physical row order the log arrives in
    for perm in (rows, rows[::-1], [rows[1], rows[0], rows[2]]):
        assert _apply(spark, perm) == {"a": ("v3", 3, "U")}


def test_reinsert_after_delete(spark):
    rows = [
        ("a", "v1", 1, "U"),
        ("a", None, 2, "D"),
        ("a", "v2", 3, "U"),
    ]
    assert _apply(spark, rows) == {"a": ("v2", 3, "U")}


def test_delete_as_final_event_removes_key_entirely(spark):
    rows = [("a", "v1", 1, "U"), ("a", None, 9, "D")]
    assert _apply(spark, rows) == {}


def test_tied_sequence_breaks_deterministically(spark):
    # two conflicting events share seq 2 (contract violation, but the
    # outcome must still be a pure function of the input): struct max
    # compares op then payload, so 'U'/'z9' beats 'U'/'a1'
    rows = [
        ("a", "a1", 2, "U"),
        ("a", "z9", 2, "U"),
    ]
    assert _apply(spark, rows) == {"a": ("z9", 2, "U")}
