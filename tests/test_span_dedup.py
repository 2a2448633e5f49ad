"""Substring-span dedup (operators/span_dedup.py): hand-computable
fixtures pin the cross-doc k-gram detection and the interval-union
coverage math that the dist_stats 'span' oracle rollup then re-checks
at corpus scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from accounting_etl_spark.operators.span_dedup import span_dup_metrics


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_shared_span_detected_and_merged(spark):
    # doc 1 and 2 share the 6-token run "a b c d e f": with k=3 that
    # is 4 duplicated gram positions whose intervals merge to ONE
    # 6-token covered region (not 4*3=12)
    rows = [
        (1, "a b c d e f x y z"),
        (2, "q a b c d e f"),
        (3, "totally different words here"),
    ]
    out = {
        r["doc_id"]: r
        for r in span_dup_metrics(_docs(spark, rows), k=3).collect()
    }
    assert out[1]["n_tokens"] == 9 and out[1]["n_grams"] == 7
    assert out[1]["n_dup_grams"] == 4
    assert out[1]["covered_tokens"] == 6
    assert abs(out[1]["coverage_frac"] - 6 / 9) < 1e-12
    assert out[2]["n_dup_grams"] == 4 and out[2]["covered_tokens"] == 6
    assert out[3]["n_dup_grams"] == 0 and out[3]["covered_tokens"] == 0
    assert out[3]["coverage_frac"] == 0.0


def test_within_doc_repeat_does_not_count(spark):
    # "a b c" repeats INSIDE doc 1 but appears in no other doc —
    # cross-doc span dedup must not flag it
    rows = [(1, "a b c z a b c"), (2, "u v w x y")]
    out = {
        r["doc_id"]: r
        for r in span_dup_metrics(_docs(spark, rows), k=3).collect()
    }
    assert out[1]["n_dup_grams"] == 0 and out[1]["covered_tokens"] == 0


def test_disjoint_spans_sum_separately(spark):
    # doc 1 shares "a b c" (tokens 1-3) and "x y z" (tokens 7-9) with
    # different partners; the two islands must not merge
    rows = [
        (1, "a b c m n o x y z"),
        (2, "a b c p q"),
        (3, "r s x y z"),
    ]
    out = {
        r["doc_id"]: r
        for r in span_dup_metrics(_docs(spark, rows), k=3).collect()
    }
    assert out[1]["n_dup_grams"] == 2
    assert out[1]["covered_tokens"] == 6  # 3 + 3, disjoint
    assert out[2]["covered_tokens"] == 3
    assert out[3]["covered_tokens"] == 3


def test_short_docs_and_full_duplicates(spark):
    rows = [
        (1, "tiny"),  # shorter than k: zero grams
        (2, "dup dup dup dup"),
        (3, "dup dup dup dup"),  # exact copy: full coverage
    ]
    out = {
        r["doc_id"]: r
        for r in span_dup_metrics(_docs(spark, rows), k=3).collect()
    }
    assert out[1]["n_grams"] == 0 and out[1]["coverage_frac"] == 0.0
    assert out[2]["covered_tokens"] == 4
    assert out[2]["coverage_frac"] == 1.0
    assert out[3]["coverage_frac"] == 1.0


def test_no_pair_expansion_in_plan(spark):
    # the scale claim: a gram shared by MANY docs costs an aggregate
    # counter, never a posting-list pair blowup — the plan must have
    # no cartesian/nested-loop join anywhere
    rows = [(i, "hot common phrase here") for i in range(1, 21)]
    df = span_dup_metrics(_docs(spark, rows), k=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert all(r["coverage_frac"] == 1.0 for r in df.collect())
