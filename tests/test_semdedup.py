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


def _emb(spark):
    from accounting_etl_spark.sources.tables import load_table

    return load_table(spark, SF_SMOKE, "embeddings")


def test_semantic_dedup_drop_rule_matches_brute_force(spark):
    from accounting_etl_spark.operators.similarity import (
        _cosine,
        semantic_dedup,
    )

    emb = _emb(spark)
    out = semantic_dedup(emb, threshold=0.35, n_cells=8).cache()
    n_vec = emb.count()
    assert out.count() == n_vec  # one verdict per vector
    # brute-force the same rule within the cells the operator chose,
    # with the SAME double cosine fold (bit-identical, no tolerance)
    with_vec = out.join(emb, "vec_id").select("vec_id", "cell", "embedding")
    a = with_vec.select(
        F.col("vec_id").alias("id_a"),
        F.col("cell"),
        F.col("embedding").cast("array<double>").alias("va"),
    )
    b = with_vec.select(
        F.col("vec_id").alias("id_b"),
        F.col("cell"),
        F.col("embedding").cast("array<double>").alias("vb"),
    )
    expect_dropped = {
        r["id_b"]
        for r in a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(_cosine(F.col("va"), F.col("vb")) >= 0.35)
        .select("id_b")
        .distinct()
        .collect()
    }
    got_dropped = {r["vec_id"] for r in out.filter(~F.col("keep")).collect()}
    assert got_dropped == expect_dropped
    assert 0 < len(got_dropped) < n_vec
    out.unpersist()


def test_semantic_dedup_chunking_invariant(spark):
    from accounting_etl_spark.operators.similarity import semantic_dedup

    emb = _emb(spark)
    big = {
        (r["vec_id"], r["cell"], r["keep"])
        for r in semantic_dedup(
            emb, threshold=0.35, n_cells=8, max_cell=10**6
        ).collect()
    }
    chunked = {
        (r["vec_id"], r["cell"], r["keep"])
        for r in semantic_dedup(
            emb, threshold=0.35, n_cells=8, max_cell=16
        ).collect()
    }
    assert big == chunked  # hot-cell chunking never changes results


def test_semantic_dedup_kmeans_mode(spark):
    from accounting_etl_spark.operators.similarity import semantic_dedup

    emb = _emb(spark)
    out = semantic_dedup(
        emb, threshold=0.35, n_cells=4, centroids="kmeans"
    ).collect()
    assert len(out) == emb.count()
    assert any(not r["keep"] for r in out)


def test_multi_assignment_catches_cross_cell_near_dups(spark):
    """VERDICT r4 #3: with explicit centroids, plant a near-dup pair
    straddling the cell boundary — n_assign=1 misses it (the paper's
    accepted caveat), n_assign=2 examines and drops the higher id.
    The reported primary cell must be unchanged by n_assign."""
    import math

    from accounting_etl_spark.operators.similarity import semantic_dedup

    cents = [[1.0, 0.0], [0.0, 1.0]]

    def unit(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)]

    rows = [
        (1, unit(44.0)),   # just on the x-centroid side of the bisector
        (2, unit(46.0)),   # just on the y-centroid side; cos(2°)≈0.999
        (3, unit(5.0)),    # deep in cell 0
        (4, unit(85.0)),   # deep in cell 1
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    single = {
        r["vec_id"]: r
        for r in semantic_dedup(
            emb, threshold=0.9, centroids=cents, n_assign=1
        ).collect()
    }
    multi = {
        r["vec_id"]: r
        for r in semantic_dedup(
            emb, threshold=0.9, centroids=cents, n_assign=2
        ).collect()
    }
    # primary assignment identical under both
    for v in (1, 2, 3, 4):
        assert single[v]["cell"] == multi[v]["cell"]
    assert single[1]["cell"] != single[2]["cell"]  # pair straddles cells
    # n_assign=1: the straddling pair is never examined — both keep
    assert single[1]["keep"] and single[2]["keep"]
    # n_assign=2: pair examined, min-id survivor rule drops id 2
    assert multi[1]["keep"] and not multi[2]["keep"]
    assert multi[3]["keep"] and multi[4]["keep"]


def test_n_assign_validation(spark):
    import pytest

    from accounting_etl_spark.operators.similarity import semantic_dedup

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="n_assign"):
        semantic_dedup(emb, centroids=[[1.0, 0.0], [0.0, 1.0]], n_assign=3)
