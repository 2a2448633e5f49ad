"""Corpus-curation composition invariants (plans/curation.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _setup(spark):
    from accounting_etl_spark.plans.curation import curate_corpus
    from accounting_etl_spark.queries.text import q_near_dup_jaccard

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    pairs = q_near_dup_jaccard(spark, SF_SMOKE).select("doc_a", "doc_b")
    verdicts = curate_corpus(docs, pairs, min_quality=0.45)
    return docs, pairs, verdicts.toPandas().set_index("doc_id")


def test_curation_invariants(spark):
    from accounting_etl_spark.functions.text import normalize_text

    docs, pairs, v = _setup(spark)
    assert len(v) == docs.count()  # every doc gets a verdict
    assert set(v[~v["keep"]]["drop_reason"]) <= {
        "low_quality", "exact_dup", "near_dup"
    }
    assert v[v["keep"]]["drop_reason"].isna().all()
    # quality gate: every kept doc clears the threshold
    assert (v[v["keep"]]["quality_score"] >= 0.45).all()
    # exact dedup: at most one kept doc per content hash
    hashes = (
        docs.select(
            "doc_id", F.md5(normalize_text(F.col("text"))).alias("h")
        )
        .toPandas()
        .set_index("doc_id")["h"]
    )
    kept = v[v["keep"]].index
    assert hashes.loc[kept].is_unique
    # near-dup: no two kept docs are directly paired
    kept_set = set(kept)
    for r in pairs.collect():
        assert not (
            r.doc_a in kept_set and r.doc_b in kept_set
        ), f"kept near-dup pair {(r.doc_a, r.doc_b)}"


def test_curation_deterministic(spark):
    _, _, v1 = _setup(spark)
    _, _, v2 = _setup(spark)
    assert v1.sort_index().equals(v2.sort_index())
