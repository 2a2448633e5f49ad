"""Trainable quality classifier (operators/quality_model.py): the
weak-supervision train→score loop on synthetic good/junk text, plus
the scale-shape claims (no shuffle in scoring, sparse fixed-dim
features)."""

from __future__ import annotations

from pyspark.sql import functions as F

from accounting_etl_spark.operators.quality_model import (
    score_quality,
    train_quality_classifier,
)
from tests.conftest import SF_SMOKE

_GOOD = [
    "the quarterly statement shows a healthy balance across accounts",
    "researchers published a detailed analysis of the new method",
    "the committee reviewed the proposal and suggested improvements",
    "a clear explanation of the algorithm with worked examples",
    "the report summarizes findings from the annual field survey",
    "engineers documented the design tradeoffs behind the system",
]
_JUNK = [
    "buy buy buy click click click free free free",
    "zzz zzz zzz zzz zzz zzz zzz zzz",
    "click here click here click here click here",
    "free money free money free money free money",
    "aaa bbb aaa bbb aaa bbb aaa bbb",
    "spam spam spam spam spam spam spam spam",
]


def _labeled(spark):
    rows = [(t, 1) for t in _GOOD] + [(t, 0) for t in _JUNK]
    return spark.createDataFrame(rows, "text string, label int")


def test_train_separates_good_from_junk(spark):
    model = train_quality_classifier(_labeled(spark))
    held_out = spark.createDataFrame(
        [
            ("the analysis explains the method with concrete examples", 1),
            ("the survey findings support the committee proposal", 1),
            ("free free click click buy buy spam spam", 0),
            ("zzz aaa zzz aaa zzz aaa", 0),
        ],
        "text string, label int",
    )
    scored = score_quality(model, held_out).collect()
    good = [r["quality_prob"] for r in scored if r["label"] == 1]
    junk = [r["quality_prob"] for r in scored if r["label"] == 0]
    # every held-out good doc must outscore every held-out junk doc
    assert min(good) > max(junk)


def test_score_preserves_rows_and_columns(spark):
    from accounting_etl_spark.sources.tables import load_table

    model = train_quality_classifier(_labeled(spark))
    docs = load_table(spark, SF_SMOKE, "documents")
    out = score_quality(model, docs)
    assert out.count() == docs.count()
    assert set(docs.columns) <= set(out.columns)
    probs = [r["quality_prob"] for r in out.select("quality_prob").collect()]
    assert all(0.0 <= p <= 1.0 for p in probs)


def test_scoring_plan_is_map_side(spark):
    # the 100 TB claim: transform adds no shuffle — scoring a corpus
    # is scan → project, embarrassingly parallel
    model = train_quality_classifier(_labeled(spark))
    df = spark.createDataFrame(
        [(i, f"doc number {i} with words") for i in range(100)],
        "doc_id bigint, text string",
    )
    plan = (
        score_quality(model, df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_weak_supervision_from_heuristic_gate(spark):
    # label source = the existing heuristic quality score; the learned
    # model must broadly agree with the gate it was trained to imitate
    from accounting_etl_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    ws = F.split(F.trim(F.col("text")), " ")
    uniq = F.size(F.array_distinct(ws)).cast("double") / F.size(ws)
    q = (
        F.least(F.col("n_chars").cast("double") / 400, F.lit(1.0)) * 0.5
        + uniq * 0.5
    )
    med = docs.select(q.alias("q")).agg(F.percentile("q", 0.5))
    threshold = med.collect()[0][0]
    labeled = docs.select(
        "text", (q >= threshold).cast("int").alias("label")
    )
    model = train_quality_classifier(labeled)
    scored = score_quality(model, labeled)
    agree = scored.filter(
        ((F.col("quality_prob") >= 0.5) & (F.col("label") == 1))
        | ((F.col("quality_prob") < 0.5) & (F.col("label") == 0))
    ).count()
    total = scored.count()
    assert agree / total >= 0.7  # learned filter imitates the gate


def test_compression_ratio_orders_repetitive_below_diverse(spark):
    from accounting_etl_spark.operators.quality_model import (
        compression_ratio,
    )

    rows = [
        (1, "spam spam spam spam spam spam spam spam spam spam " * 20),
        (2, "the quick brown fox jumps over one lazy dog near a very "
            "old riverbank while seventeen distinct words wander 93 "
            "miles through unusual quiet meadows tonight " * 5),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["compression_ratio"]
           for r in compression_ratio(df).collect()}
    assert got[1] < got[2] < 1.0  # repetitive compresses far better
    assert got[3] == 1.0
    # map-side only: no shuffle introduced
    plan = compression_ratio(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
