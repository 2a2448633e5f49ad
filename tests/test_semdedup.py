"""SemDeDup (queries/similarity.py q_semdedup) semantics.

Characterization on the bounded fixture slice: the keep flags are
EXACTLY determined by the thresholded pair list plus the cluster
assignment — a vector is dropped iff a lower-id vector in the same
cluster is a near-duplicate of it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _frames(spark):
    from accounting_etl_spark.queries.similarity import (
        q_near_dup_embedding,
        q_semdedup,
    )

    sem = {r["va"]: r for r in q_semdedup(spark, SF_SMOKE).collect()}
    pairs = q_near_dup_embedding(spark, SF_SMOKE).collect()
    return sem, pairs


def test_drop_rule_is_exact(spark):
    sem, pairs = _frames(spark)
    # expected drops: higher id of every same-cluster thresholded pair
    expect_dropped = {
        p["vb"]
        for p in pairs
        if sem[p["va"]]["vb"] == sem[p["vb"]]["vb"]  # same anchor
    }
    got_dropped = {v for v, r in sem.items() if not r["keep"]}
    assert got_dropped == expect_dropped
    assert len(sem) == 200  # one verdict per bounded vector


def test_assignment_is_nearest_anchor(spark):
    from accounting_etl_spark.queries.similarity import (
        _SEM_K,
        _bounded_cosines,
    )

    sem, _ = _frames(spark)
    cos, _norms = _bounded_cosines(spark, SF_SMOKE)
    to_anchor = (
        cos.filter(F.col("vb") < _SEM_K)
        .select(F.col("va").alias("doc"), F.col("vb").alias("anchor"), "cosine")
        .unionByName(
            cos.filter(F.col("va") < _SEM_K).select(
                F.col("vb").alias("doc"),
                F.col("va").alias("anchor"),
                "cosine",
            )
        )
        .collect()
    )
    best: dict[int, float] = {}
    for r in to_anchor:
        best[r["doc"]] = max(best.get(r["doc"], -2.0), r["cosine"])
    for doc, r in sem.items():
        if doc < _SEM_K:
            # anchors assign to themselves (self-cosine ~1 beats all)
            assert r["vb"] == doc
        else:
            assert r["cosine"] == best[doc]


def test_survivor_is_cluster_min_of_each_dup_group(spark):
    sem, pairs = _frames(spark)
    # within every same-cluster thresholded pair the LOWER id survives
    # that edge (it may still be dropped by an even lower neighbor)
    for p in pairs:
        if sem[p["va"]]["vb"] == sem[p["vb"]]["vb"]:
            assert not sem[p["vb"]]["keep"]
