"""Collocation lift and corpus drift: hand-computed references,
min-count pruning, missing-token zeros, symmetry bounds."""

import pytest

from accounting_etl_spark.operators.collocations import bigram_lift
from accounting_etl_spark.operators.drift import PPM, l1_drift, token_ppm


def test_bigram_lift_hand_computed(spark):
    # "a b" appears 3x, "b a" 2x; c_a = 5, c_b = 5
    docs = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "b a b a")], ["doc_id", "text"]
    )
    rows = bigram_lift(docs, min_count=2, scale=100).collect()
    got = {(r.left, r.right): (r.c_xy, r.c_x, r.c_y, r.lift) for r in rows}
    # doc1 bigrams: ab, ba, ab, ba, ab; doc2: ba, ab, ba
    assert got == {
        ("a", "b"): (4, 5, 5, 16),  # (4*100) div 25
        ("b", "a"): (4, 5, 5, 16),
    }


def test_min_count_prunes_rare_pairs(spark):
    docs = spark.createDataFrame(
        [(1, "x y x y"), (2, "p q")], ["doc_id", "text"]
    )
    rows = bigram_lift(docs, min_count=2).collect()
    assert {(r.left, r.right) for r in rows} == {("x", "y")}
    with pytest.raises(ValueError):
        bigram_lift(docs, min_count=0)


def test_bigrams_never_cross_documents(spark):
    docs = spark.createDataFrame(
        [(1, "a end"), (2, "start b")], ["doc_id", "text"]
    )
    rows = bigram_lift(docs, min_count=1).collect()
    pairs = {(r.left, r.right) for r in rows}
    assert ("end", "start") not in pairs
    assert pairs == {("a", "end"), ("start", "b")}


def test_token_ppm_quantization(spark):
    rows = spark.createDataFrame(
        [("s1", "a"), ("s1", "a"), ("s1", "b")], ["src", "tok"]
    )
    got = {
        (r.src, r.tok): r.q
        for r in token_ppm(rows, "src", "tok").collect()
    }
    assert got == {
        ("s1", "a"): (2 * PPM) // 3,
        ("s1", "b"): PPM // 3,
    }


def test_l1_drift_hand_computed_with_missing_tokens(spark):
    # s1: a,a,b  -> a:666666 b:333333 c:0
    # s2: a,c    -> a:500000 b:0      c:500000
    rows = spark.createDataFrame(
        [("s1", "a"), ("s1", "a"), ("s1", "b"), ("s2", "a"), ("s2", "c")],
        ["src", "tok"],
    )
    out = l1_drift(token_ppm(rows, "src", "tok"), "src", "tok").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.grp_a, r.grp_b) == ("s1", "s2")
    want = abs(666666 - 500000) + abs(333333 - 0) + abs(0 - 500000)
    assert r.l1_ppm == want and r.n_diff == 3


def test_identical_slices_have_zero_drift(spark):
    rows = spark.createDataFrame(
        [(s, t) for s in ("s1", "s2") for t in ("a", "a", "b")],
        ["src", "tok"],
    )
    r = l1_drift(token_ppm(rows, "src", "tok"), "src", "tok").collect()[0]
    assert (r.l1_ppm, r.n_diff) == (0, 0)


def test_pairwise_output_is_unordered_pairs(spark):
    rows = spark.createDataFrame(
        [("s1", "a"), ("s2", "b"), ("s3", "c")], ["src", "tok"]
    )
    out = l1_drift(token_ppm(rows, "src", "tok"), "src", "tok").collect()
    pairs = {(r.grp_a, r.grp_b) for r in out}
    assert pairs == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    # disjoint vocabularies: each pair differs on both tokens, l1 = 2M
    assert all(r.l1_ppm == 2 * PPM for r in out)


def test_token_ppm_from_counts_equals_token_ppm(spark):
    # r12: drift derives ppm from a pre-aggregated (group, token, tf)
    # table shared with tfidf — per-group totals as the SUM of counts
    # must equal counting the raw token rows
    from pyspark.sql import functions as F

    from accounting_etl_spark.operators.drift import token_ppm_from_counts

    rows = spark.createDataFrame(
        [("s1", "a"), ("s1", "a"), ("s1", "b"), ("s2", "a"), ("s2", "c"),
         ("s2", "c"), ("s2", "c")],
        ["src", "tok"],
    )
    tf = rows.groupBy("src", "tok").agg(F.count(F.lit(1)).alias("tf"))
    direct = {
        (r.src, r.tok): r.q for r in token_ppm(rows, "src", "tok").collect()
    }
    from_counts = {
        (r.src, r.tok): r.q
        for r in token_ppm_from_counts(tf, "src", "tok", "tf").collect()
    }
    assert from_counts == direct
