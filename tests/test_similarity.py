"""ANN recall/determinism vs the exact brute-force baseline."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def _pairs(df):
    return {(r.q_id, r.nb_id) for r in df.collect()}


def test_ann_recall_vs_exact(spark):
    from accounting_etl_spark.queries.similarity import (
        q_ann_topk,
        q_cosine_topk,
    )

    exact = _pairs(q_cosine_topk(spark, SF_SMOKE))
    approx = _pairs(q_ann_topk(spark, SF_SMOKE))
    assert approx, "ANN returned nothing"
    recall = len(exact & approx) / len(exact)
    # random embeddings are LSH's worst case; 4 planes x 4 tables on
    # 500 vectors must still recover a solid fraction of true top-3
    assert recall >= 0.4, f"ANN recall {recall:.2f}"


def test_ann_deterministic(spark):
    from accounting_etl_spark.queries.similarity import q_ann_topk

    a = sorted(map(tuple, q_ann_topk(spark, SF_SMOKE).collect()))
    b = sorted(map(tuple, q_ann_topk(spark, SF_SMOKE).collect()))
    assert a == b


def test_ann_candidates_bounded(spark):
    """The candidate set must be a strict subset of all pairs — the
    point of bucketing is never touching most of the corpus."""
    from accounting_etl_spark.queries.similarity import q_ann_topk
    from accounting_etl_spark.sources.tables import load_table

    n_corpus = load_table(spark, SF_SMOKE, "embeddings").count()
    out = q_ann_topk(spark, SF_SMOKE).toPandas()
    assert out.groupby("q_id")["nb_id"].count().max() <= 3
    assert out["nb_id"].between(0, n_corpus - 1).all()


def test_ivf_recall_vs_exact(spark):
    from accounting_etl_spark.queries.similarity import (
        q_ann_ivf,
        q_cosine_topk,
    )

    exact = _pairs(q_cosine_topk(spark, SF_SMOKE))
    approx = _pairs(q_ann_ivf(spark, SF_SMOKE))
    assert approx, "IVF returned nothing"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"IVF recall {recall:.2f}"


def test_ivf_deterministic(spark):
    from accounting_etl_spark.queries.similarity import q_ann_ivf

    a = sorted(map(tuple, q_ann_ivf(spark, SF_SMOKE).collect()))
    b = sorted(map(tuple, q_ann_ivf(spark, SF_SMOKE).collect()))
    assert a == b


def test_int8_quantization_reconstruction_bound(spark):
    """Half-up int8 quantization: |x - q*scale| <= scale/2 for every
    element, codes stay in [-127, 127], and q_max saturates on the
    max-|x| element."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    vec = F.col("embedding").cast("array<double>")
    maxabs = F.array_max(F.transform(vec, F.abs))
    scale = maxabs / F.lit(127.0)
    q = F.transform(vec, lambda x: F.floor(x / scale + 0.5).cast("int"))
    base = emb.filter(maxabs > 0).select(
        vec.alias("v"), scale.alias("s"), q.alias("q")
    )
    checked = base.select(
        F.size(
            F.filter(
                F.zip_with(
                    "v", "q", lambda x, c: F.abs(x - c * F.col("s"))
                ),
                lambda e: e > F.col("s") / 2 + 1e-12,
            )
        ).alias("n_bad"),
        F.array_max(F.transform("q", F.abs)).alias("amax"),
    )
    agg = checked.agg(
        F.sum("n_bad").alias("bad"), F.max("amax").alias("amax"),
        F.min("amax").alias("amin"),
    ).collect()[0]
    assert agg.bad == 0
    assert agg.amax == 127 and agg.amin == 127  # max element always saturates


def test_ivf_kmeans_centroids_recall(spark):
    """MLlib-trained centroids: same IVF body, cells follow data
    density — recall must clear at least the sample-centroid floor."""
    from pyspark.sql import functions as F

    from accounting_etl_spark.operators.similarity import ivf_topk
    from accounting_etl_spark.queries.similarity import q_cosine_topk
    from accounting_etl_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20).select("vec_id")
    out = ivf_topk(emb, queries, k=3, centroids="kmeans")
    approx = _pairs(out)
    assert approx, "kmeans-IVF returned nothing"
    exact = _pairs(q_cosine_topk(spark, SF_SMOKE))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"kmeans-IVF recall {recall:.2f}"


def test_ivf_rejects_unknown_centroid_mode(spark):
    import pytest
    from pyspark.sql import functions as F

    from accounting_etl_spark.operators.similarity import ivf_topk
    from accounting_etl_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 2).select("vec_id")
    with pytest.raises(ValueError, match="centroids"):
        ivf_topk(emb, q, centroids="nope")


def test_pq_recall_vs_exact(spark):
    from accounting_etl_spark.queries.similarity import (
        q_ann_pq,
        q_cosine_topk,
    )

    exact = _pairs(q_cosine_topk(spark, SF_SMOKE))
    approx = _pairs(q_ann_pq(spark, SF_SMOKE))
    assert approx, "IVF-PQ returned nothing"
    recall = len(exact & approx) / len(exact)
    # ADC-scored shortlist + exact rerank must clear the IVF floor
    assert recall >= 0.3, f"IVF-PQ recall {recall:.2f}"


def test_pq_deterministic(spark):
    from accounting_etl_spark.queries.similarity import q_ann_pq

    a = sorted(map(tuple, q_ann_pq(spark, SF_SMOKE).collect()))
    b = sorted(map(tuple, q_ann_pq(spark, SF_SMOKE).collect()))
    assert a == b


def test_pq_adc_approximates_cosine(spark):
    """ADC score (sum of subspace LUT dots over normalized vectors)
    must track true cosine: for each query, the PQ top-1 after rerank
    is a genuinely high-cosine neighbor (>= 0.8 * the exact top-1)."""
    from accounting_etl_spark.queries.similarity import (
        q_ann_pq,
        q_cosine_topk,
    )

    exact_best = {
        r.q_id: r.cosine
        for r in q_cosine_topk(spark, SF_SMOKE).collect()
        if r.rank == 1
    }
    got = [r for r in q_ann_pq(spark, SF_SMOKE).collect() if r.rank == 1]
    assert got
    ratios = [r.cosine / exact_best[r.q_id] for r in got]
    # per-query floor tolerates one routing miss on random vectors;
    # the mean pins that ADC ordering genuinely tracks cosine
    assert min(ratios) >= 0.7, ratios
    assert sum(ratios) / len(ratios) >= 0.85, ratios


def test_pq_codebooks_shape(spark):
    from pyspark.sql import functions as F

    from accounting_etl_spark.operators.similarity import pq_codebooks
    from accounting_etl_spark.queries.similarity import _N_QUERIES  # noqa
    from accounting_etl_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    dim = len(emb.select(F.col("embedding")).first()[0])
    books = pq_codebooks(
        emb, id_col="vec_id", vec_col="embedding",
        dim=dim, m_sub=4, n_codes=16,
    )
    assert len(books) == 4
    assert all(len(b) == 16 for b in books)
    assert all(len(c) == dim // 4 for b in books for c in b)


def test_random_projection_preserves_neighborhoods(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from accounting_etl_spark.operators.similarity import (
        projection_matrix,
        random_projection,
    )
    from accounting_etl_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings").filter(
        F.col("vec_id") < 100
    )
    dim = len(emb.select("embedding").first()[0])
    out = random_projection(emb, dim=dim, out_dim=32).collect()
    # determinism: identical across calls (seeded matrix, no RNG state)
    out2 = random_projection(emb, dim=dim, out_dim=32).collect()
    assert {r["vec_id"]: r["projected"] for r in out} == {
        r["vec_id"]: r["projected"] for r in out2
    }
    # Spark fold == numpy matmul (same seeded matrix)
    mat = np.array(projection_matrix(dim, 32))
    for r in out[:5]:
        expect = mat @ np.array(r["embedding"], dtype=np.float64)
        assert np.allclose(np.array(r["projected"]), expect, atol=1e-9)
    # JL property: per-pair distance distortion d_proj/d_orig is
    # concentrated around 1 (correlation is the WRONG metric here —
    # random high-dim distances concentrate, so their fluctuations
    # are mostly noise; the lemma bounds each pair's distortion,
    # std ≈ 1/sqrt(2·out_dim) ≈ 0.125 at out_dim=32)
    X = np.array([r["embedding"] for r in out], dtype=np.float64)
    P = np.array([r["projected"] for r in out])
    iu = np.triu_indices(len(X), k=1)
    d_orig = np.linalg.norm(X[:, None, :] - X[None, :, :], axis=2)[iu]
    d_proj = np.linalg.norm(P[:, None, :] - P[None, :, :], axis=2)[iu]
    ratio = d_proj / d_orig
    assert abs(ratio.mean() - 1.0) < 0.05, ratio.mean()
    assert ratio.std() < 0.25, ratio.std()
    assert ratio.min() > 0.4 and ratio.max() < 1.8
    # map-only: no Exchange in the projection plan
    plan = (
        random_projection(emb, dim=dim, out_dim=32)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_ivf_pinned_full_probe_equals_exact(spark):
    """The hash-pinned IVF variant (queries/similarity.py
    q_ivf_pinned): probing EVERY cell must return exactly the
    brute-force top-k (keep all-true) — the recall-1.0 limit of the
    probe plan; the driver's oracle pins the partial-probe form."""
    from accounting_etl_spark.queries.similarity import (
        _SEM_K,
        q_ivf_pinned,
    )
    from conftest import SF_SMOKE

    rows = q_ivf_pinned(spark, SF_SMOKE, n_probe=_SEM_K).collect()
    assert len(rows) == 24 and all(r["keep"] for r in rows)


def test_ivf_pinned_partial_probe_structure(spark):
    """Partial probe: 3 ranked rows per query in [8, 16), and the
    keep flag agrees with membership in the exact top-3 (computed
    through the same decimal-cosine subtree)."""
    from accounting_etl_spark.queries.similarity import (
        _SEM_K,
        q_ivf_pinned,
    )
    from conftest import SF_SMOKE

    got = q_ivf_pinned(spark, SF_SMOKE).collect()
    per_q = {}
    for r in got:
        per_q.setdefault(r["va"], []).append(r)
    assert set(per_q) == set(range(8, 16))
    exact = {
        (r["va"], r["vb"])
        for r in q_ivf_pinned(spark, SF_SMOKE, n_probe=_SEM_K).collect()
    }
    for q, rs in per_q.items():
        assert len(rs) == 3
        cs = [r["cosine"] for r in sorted(rs, key=lambda r: -r["cosine"])]
        assert cs == sorted(cs, reverse=True)
        for r in rs:
            assert r["keep"] == ((r["va"], r["vb"]) in exact)


def test_semantic_admission_variant_replays_deterministically(spark):
    """Driver-exposed two-epoch semantic admission
    (q_semantic_admission): epoch parity is by construction, the
    scratch index is wiped per invocation so a re-run reproduces the
    admission decisions exactly."""
    from accounting_etl_spark.queries.similarity import (
        _SEM_ADMIT_BATCH,
        q_semantic_admission,
    )
    from conftest import SF_SMOKE

    rows = q_semantic_admission(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["q_id"] < _SEM_ADMIT_BATCH
        assert r["q_id"] % 2 == r["rank"] - 1  # epoch parity
    again = q_semantic_admission(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_rhp_pinned_buckets_and_cosines_match_numpy(spark):
    """'rhp' (r10): every pair the pinned ann_topk run returns must
    share >= 1 LSH table bucket under an independent numpy
    recomputation of the SAME seeded hyperplanes, and its cosine must
    match numpy's float64 value closely (the oracle pins exact bits;
    this unit pins the semantics against a second implementation)."""
    import numpy as np

    from accounting_etl_spark.operators.similarity import _hyperplanes
    from accounting_etl_spark.queries.similarity import (
        _EMB_DD_LIMIT,
        _RHP_PLANES,
        _RHP_TABLES,
        q_rhp_pinned,
    )
    from accounting_etl_spark.sources.tables import load_table

    rows = q_rhp_pinned(spark, SF_SMOKE).collect()
    assert rows, "rhp returned nothing"
    emb = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in load_table(spark, SF_SMOKE, "embeddings")
        .where(f"vec_id < {_EMB_DD_LIMIT}")
        .collect()
    }
    planes = np.asarray(
        [p for tbl in _hyperplanes(64, _RHP_PLANES, _RHP_TABLES) for p in tbl]
    )

    def buckets(v):
        bits = (planes @ v >= 0).astype(int)
        return [
            tuple(bits[t * _RHP_PLANES : (t + 1) * _RHP_PLANES])
            for t in range(_RHP_TABLES)
        ]

    for r in rows:
        ba, bb = buckets(emb[r.va]), buckets(emb[r.vb])
        assert any(x == y for x, y in zip(ba, bb)), (r.va, r.vb)
        a, b = emb[r.va], emb[r.vb]
        want = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(r.cosine - want) < 1e-9
