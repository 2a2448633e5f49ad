"""Persisted IVF index (operators/ann_index.py): build/query parity
with the in-memory IVF, partition-pruned probes, incremental append."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _emb(spark):
    from accounting_etl_spark.sources.tables import load_table

    return load_table(spark, SF_SMOKE, "embeddings")


def _build(spark, tmp_path, **kw):
    from accounting_etl_spark.operators.ann_index import build_ivf_index

    path = str(tmp_path / "ivf")
    build_ivf_index(_emb(spark), path, n_cells=8, **kw)
    return path


def test_query_matches_in_memory_ivf(spark, tmp_path):
    from accounting_etl_spark.operators.ann_index import query_ivf_index
    from accounting_etl_spark.operators.similarity import ivf_topk

    path = _build(spark, tmp_path)
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 8)
    got = {
        (r["q_id"], r["rank"]): (r["nb_id"], r["cosine"])
        for r in query_ivf_index(
            spark, path, queries, k=3, n_probe=2
        ).collect()
    }
    # same deterministic "sample" centroids → identical candidates,
    # identical double cosine fold → bit-identical results
    expect = {
        (r["q_id"], r["rank"]): (r["nb_id"], r["cosine"])
        for r in ivf_topk(
            emb, queries.select("vec_id"), k=3, n_probe=2, n_cells=8
        ).collect()
    }
    assert got == expect and got


def test_probe_scan_is_partition_pruned(spark, tmp_path):
    from accounting_etl_spark.operators.ann_index import query_ivf_index

    path = _build(spark, tmp_path)
    queries = _emb(spark).filter(F.col("vec_id") < 2)
    df = query_ivf_index(spark, path, queries, k=3, n_probe=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the postings scan (the only partitioned input) must carry the
    # cell filter — not read-all-prune-later; the fixture scans print
    # "PartitionFilters: []"
    assert "PartitionFilters: [cell" in plan


def test_append_serves_new_vectors(spark, tmp_path):
    from accounting_etl_spark.operators.ann_index import (
        append_to_ivf_index,
        query_ivf_index,
    )

    path = _build(spark, tmp_path)
    emb = _emb(spark)
    # clone vector 3 under a fresh id: it must become an exact
    # (cosine≈1) neighbor of query 3 after the append
    clone = emb.filter(F.col("vec_id") == 3).select(
        F.lit(999_999).cast(emb.schema["vec_id"].dataType).alias("vec_id"),
        "embedding",
    )
    append_to_ivf_index(clone, path)
    top = query_ivf_index(
        spark, path, emb.filter(F.col("vec_id") == 3), k=1, n_probe=1
    ).collect()
    assert top[0]["nb_id"] == 999_999
    assert abs(top[0]["cosine"] - 1.0) < 1e-9


def test_kmeans_build_roundtrip(spark, tmp_path):
    from accounting_etl_spark.operators.ann_index import (
        load_centroids,
        query_ivf_index,
    )

    path = _build(spark, tmp_path, centroids="kmeans")
    cents = load_centroids(spark, path)
    assert len(cents) == 8
    out = query_ivf_index(
        spark, path, _emb(spark).filter(F.col("vec_id") < 4), k=3
    ).collect()
    assert {r["q_id"] for r in out} == {0, 1, 2, 3}


def _np_vectors(spark):
    import numpy as np

    rows = _emb(spark).select("vec_id", "embedding").collect()
    return {r["vec_id"]: np.array(r["embedding"], float) for r in rows}


def test_semantic_decontam_exact_at_full_probe(spark, tmp_path):
    """n_probe >= n_cells examines every eval candidate — the verdict
    must equal the numpy brute force exactly."""
    import numpy as np

    from accounting_etl_spark.operators.ann_index import (
        build_ivf_index,
        semantic_decontaminate,
    )

    emb = _emb(spark)
    ev = emb.filter(F.col("vec_id") % 9 == 0)
    tr = emb.filter(F.col("vec_id") % 9 != 0)
    path = str(tmp_path / "eval_ivf")
    build_ivf_index(ev, path, n_cells=4)
    got = {
        r["vec_id"]: (r["best_eval_id"], r["keep"])
        for r in semantic_decontaminate(
            tr, path, threshold=0.30, n_probe=4
        ).collect()
    }
    vecs = _np_vectors(spark)
    evs = {i: v for i, v in vecs.items() if i % 9 == 0}
    for tid, v in vecs.items():
        if tid % 9 == 0:
            continue
        cos = {
            eid: float(v @ e / (np.linalg.norm(v) * np.linalg.norm(e)))
            for eid, e in evs.items()
        }
        best = max(cos, key=lambda i: (cos[i], -i))
        want_keep = cos[best] < 0.30
        assert got[tid][0] == best, (tid, got[tid], best)
        assert got[tid][1] == want_keep, (tid, got[tid], want_keep)
    assert any(not k for _, k in got.values())  # non-degenerate


def test_semantic_decontam_partial_probe_is_subset(spark, tmp_path):
    """A bounded probe can only MISS contamination, never invent it:
    the contaminated set at n_probe=1 is a subset of the exact one,
    and any reported best pair carries its true exact cosine."""
    from accounting_etl_spark.operators.ann_index import (
        build_ivf_index,
        semantic_decontaminate,
    )

    emb = _emb(spark)
    ev = emb.filter(F.col("vec_id") % 9 == 0)
    tr = emb.filter(F.col("vec_id") % 9 != 0)
    path = str(tmp_path / "eval_ivf")
    build_ivf_index(ev, path, n_cells=4)
    exact = {
        r["vec_id"]: r["keep"]
        for r in semantic_decontaminate(
            tr, path, threshold=0.30, n_probe=4
        ).collect()
    }
    part = semantic_decontaminate(tr, path, threshold=0.30, n_probe=1)
    rows = part.collect()
    assert len(rows) == len(exact)
    for r in rows:
        if not r["keep"]:  # flagged contaminated under partial probe
            assert not exact[r["vec_id"]]


def test_semantic_decontam_broadcast_gate(spark, tmp_path):
    from accounting_etl_spark.operators.ann_index import (
        build_ivf_index,
        semantic_decontaminate,
    )

    emb = _emb(spark)
    ev = emb.filter(F.col("vec_id") % 9 == 0)
    tr = emb.filter(F.col("vec_id") % 9 != 0)
    path = str(tmp_path / "eval_ivf")
    build_ivf_index(ev, path, n_cells=4)
    small = semantic_decontaminate(tr, path, threshold=0.30, n_probe=2)
    opt = small._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" in opt
    large = semantic_decontaminate(
        tr, path, threshold=0.30, n_probe=2, broadcast_limit=0
    )
    opt = large._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" not in opt
    a = {r["vec_id"]: (r["best_eval_id"], r["keep"]) for r in small.collect()}
    b = {r["vec_id"]: (r["best_eval_id"], r["keep"]) for r in large.collect()}
    assert a == b
