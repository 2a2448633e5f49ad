"""Line-level corpus dedup (operators/line_dedup.py): hand-computable
fixtures pin the RefinedWeb/CCNet rule — any normalized line in >=
min_docs distinct documents is stripped everywhere — that the
dist_stats 'line' oracle then re-checks at corpus scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from accounting_etl_spark.operators.line_dedup import line_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _run(spark, rows, **kw):
    docs = _docs(spark, rows)
    out = line_dedup(docs, F.split(F.col("text"), "\n"), **kw)
    return {r["doc_id"]: r for r in out.collect()}


def test_boilerplate_stripped_from_all_docs(spark):
    # "subscribe now" appears in docs 1 and 2 -> removed from BOTH
    # (boilerplate has no first owner); unique lines survive in order.
    rows = [
        (1, "subscribe now\nalpha story line\nbeta ending"),
        (2, "gamma opener\nsubscribe now\ndelta closer"),
        (3, "entirely unique document"),
    ]
    out = _run(spark, rows)
    assert out[1]["n_lines"] == 3 and out[1]["n_removed"] == 1
    assert out[1]["cleaned_text"] == "alpha story line\nbeta ending"
    assert out[2]["cleaned_text"] == "gamma opener\ndelta closer"
    assert out[3]["n_removed"] == 0
    assert out[3]["cleaned_text"] == "entirely unique document"


def test_normalization_matches_spacing_and_case_variants(spark):
    # "Subscribe  NOW" vs "subscribe now": same normalized key.
    rows = [
        (1, "Subscribe  NOW\nkeep one"),
        (2, "subscribe now\nkeep two"),
    ]
    out = _run(spark, rows)
    assert out[1]["cleaned_text"] == "keep one"
    assert out[2]["cleaned_text"] == "keep two"


def test_within_doc_repeat_does_not_count(spark):
    # a line repeated twice INSIDE one doc is not corpus boilerplate
    # (count(DISTINCT doc) == 1) and survives both times.
    rows = [
        (1, "echo line\nmiddle\necho line"),
        (2, "other content"),
    ]
    out = _run(spark, rows)
    assert out[1]["n_removed"] == 0
    assert out[1]["cleaned_text"] == "echo line\nmiddle\necho line"


def test_fully_boilerplate_doc_survives_empty(spark):
    rows = [
        (1, "header\nfooter"),
        (2, "header\nfooter"),
    ]
    out = _run(spark, rows)
    assert set(out) == {1, 2}
    for d in (1, 2):
        assert out[d]["n_removed"] == 2 and out[d]["n_kept"] == 0
        assert out[d]["cleaned_text"] == ""


def test_min_docs_threshold(spark):
    # with min_docs=3 a 2-doc repeat is NOT boilerplate
    rows = [
        (1, "shared line\na"),
        (2, "shared line\nb"),
        (3, "unique\nc"),
    ]
    out = _run(spark, rows, min_docs=3)
    assert out[1]["n_removed"] == 0 and out[2]["n_removed"] == 0


def test_shuffled_join_fallback_matches_broadcast(spark):
    rows = [
        (1, "dup line\nalpha"),
        (2, "dup line\nbeta"),
        (3, "dup line\ngamma"),
    ]
    a = _run(spark, rows)
    b = _run(spark, rows, broadcast_limit=0)
    assert {k: (v["n_removed"], v["cleaned_text"]) for k, v in a.items()} == {
        k: (v["n_removed"], v["cleaned_text"]) for k, v in b.items()
    }
