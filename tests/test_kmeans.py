"""Quantized k-means units (operators/kmeans.py)."""

from __future__ import annotations

import numpy as np
import pytest

from accounting_etl_spark.operators.kmeans import (
    OFFSET,
    SCALE,
    kmeans_quantized,
    quantize_vectors,
)


def _py_kmeans(vecs: dict[int, list[int]], k: int, iters: int) -> dict[int, int]:
    """Reference: same integer recurrence in plain Python."""
    ids = sorted(vecs)
    cents = [list(vecs[i]) for i in ids[:k]]
    assign: dict[int, int] = {}
    for it in range(iters):
        for vid in ids:
            dists = [
                sum((x - y) ** 2 for x, y in zip(vecs[vid], c)) for c in cents
            ]
            assign[vid] = dists.index(min(dists))
        if it == iters - 1:
            break
        for c in range(k):
            members = [vecs[v] for v, cl in assign.items() if cl == c]
            if members:
                n = len(members)
                cents[c] = [
                    sum(m[i] for m in members) // n
                    for i in range(len(cents[c]))
                ]
    return assign


def test_quantize_is_floor_of_double_product(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -0.5, 0.0, 1e-7])], "vec_id bigint, embedding array<float>"
    )
    (row,) = quantize_vectors(df).collect()
    f = np.array([0.5, -0.5, 0.0, 1e-7], np.float32).astype(np.float64)
    exp = [int(np.floor(x * SCALE)) + OFFSET for x in f]
    assert list(row["qv"]) == exp
    assert all(v >= 0 for v in row["qv"])  # offset keeps integers positive


def test_kmeans_matches_python_reference(spark):
    rng = np.random.RandomState(3)
    # three planted blobs + noise, dim 6
    pts = np.concatenate(
        [
            rng.normal(0.0, 0.05, (20, 6)),
            rng.normal(0.4, 0.05, (20, 6)),
            rng.normal(-0.4, 0.05, (20, 6)),
        ]
    ).astype(np.float32)
    rows = [(i, [float(x) for x in pts[i]]) for i in range(len(pts))]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    q = quantize_vectors(df)
    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_quantized(q, k=3, iters=3).collect()
    }
    vecs = {r["vec_id"]: list(r["qv"]) for r in q.collect()}
    assert got == _py_kmeans(vecs, k=3, iters=3)
    # the planted blobs separate: each blob lands in ONE cluster
    for lo in (0, 20, 40):
        assert len({got[i] for i in range(lo, lo + 20)}) == 1


def test_kmeans_deterministic_under_partitioning(spark):
    rng = np.random.RandomState(9)
    rows = [
        (i, [float(x) for x in rng.uniform(-0.5, 0.5, 8)]) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    a = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_quantized(
            quantize_vectors(df).repartition(1), k=4, iters=2
        ).collect()
    }
    b = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_quantized(
            quantize_vectors(df).repartition(13), k=4, iters=2
        ).collect()
    }
    assert a == b  # integer math: no partitioning sensitivity


def test_kmeans_needs_k_rows(spark):
    df = quantize_vectors(
        spark.createDataFrame(
            [(1, [0.1, 0.2])], "vec_id bigint, embedding array<float>"
        )
    )
    with pytest.raises(ValueError):
        kmeans_quantized(df, k=3, iters=1)


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # two identical far points seed clusters 1..2; every point sits at
    # the origin → clusters 1+ go empty after round 1 and must keep
    # their initial centroids without crashing
    rows = [(0, [0.0, 0.0]), (1, [0.5, 0.5]), (2, [0.5, 0.5])] + [
        (i, [0.0, 0.0]) for i in range(3, 10)
    ]
    df = quantize_vectors(
        spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    )
    out = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_quantized(df, k=3, iters=3).collect()
    }
    assert out[1] == out[2]
    assert out[0] == out[3]
