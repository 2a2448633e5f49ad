"""Robust anomaly flags: exact lower-median/MAD vs a pure-Python
reference, zero-MAD guard, threshold boundary, column preservation."""

import random

from pyspark.sql import functions as F

from accounting_etl_spark.operators.anomaly import (
    lower_median,
    robust_flags,
)


def _py_lower_median(vals):
    s = sorted(vals)
    return s[(len(s) + 1) // 2 - 1]


def test_lower_median_matches_reference(spark):
    rng = random.Random(11)
    rows = [
        (k, rng.randrange(-50, 50))
        for k in ("a", "b", "c")
        for _ in range(rng.randrange(1, 40))
    ]
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {r.k: r.med for r in lower_median(df, "k", "v").collect()}
    want = {}
    for k, v in rows:
        want.setdefault(k, []).append(v)
    assert got == {k: _py_lower_median(vs) for k, vs in want.items()}


def test_even_count_takes_lower_of_the_two(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("a", 10)], ["k", "v"]
    )
    assert lower_median(df, "k", "v").collect()[0].med == 2


def test_flags_match_python_reference(spark):
    rng = random.Random(23)
    rows = [(i, "t", rng.randrange(90, 111)) for i in range(200)]
    rows += [(900, "t", 500), (901, "t", -400)]  # planted outliers
    df = spark.createDataFrame(rows, ["id", "k", "v"])
    vals = [v for _, _, v in rows]
    med = _py_lower_median(vals)
    mad = _py_lower_median([abs(v - med) for v in vals])
    want = {
        i: (abs(v - med) * 1000) // max(mad, 1)
        for i, _, v in rows
        if (abs(v - med) * 1000) // max(mad, 1) >= 5000
    }
    got = {
        r.id: r.z_milli for r in robust_flags(df, "k", "v").collect()
    }
    assert got == want
    assert {900, 901} <= set(got)


def test_zero_mad_guard_and_original_columns_kept(spark):
    # 9 identical values -> MAD 0; the greatest(mad, 1) guard makes
    # the lone outlier's z finite and huge instead of a div-by-zero
    rows = [(i, "k", 7, f"p{i}") for i in range(9)] + [(99, "k", 1007, "x")]
    df = spark.createDataFrame(rows, ["id", "g", "v", "payload"])
    out = robust_flags(df, "g", "v").collect()
    assert [(r.id, r.payload, r.z_milli) for r in out] == [
        (99, "x", 1000000)
    ]
    assert {"med", "mad"} <= set(out[0].asDict())


def test_threshold_boundary_inclusive(spark):
    # med = 0, mad = 1 by construction; v = 5 sits exactly at 5 MADs
    rows = [("k", v) for v in (-1, -1, 0, 0, 0, 1, 1)] + [("k", 5)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = robust_flags(df, "g", "v", z_milli_threshold=5000).collect()
    assert [(r.v, r.z_milli) for r in out] == [(5, 5000)]
