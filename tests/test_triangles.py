"""Triangle listing/counting: exactness vs brute force, canonical
edge handling, per-node credit, skew behavior of the orientation."""

import itertools
import random

from accounting_etl_spark.operators.graph import (
    triangle_counts,
    triangle_listing,
)


def _brute(edges):
    es = set()
    for u, v in edges:
        if u != v:
            es.add((min(u, v), max(u, v)))
    nodes = sorted({n for e in es for n in e})
    tris = set()
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in es and (a, c) in es and (b, c) in es:
            tris.add((a, b, c))
    return es, tris


def test_k4_lists_all_four_triangles(spark):
    edges = [(u, v) for u, v in itertools.combinations(range(4), 2)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        tuple(sorted((r.u, r.x, r.y)))
        for r in triangle_listing(df).collect()
    }
    assert got == {(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)}
    # listing emits each triangle exactly once
    assert triangle_listing(df).count() == 4
    pn = {r.node: (r.deg, r.tri) for r in triangle_counts(df).collect()}
    assert pn == {i: (3, 3) for i in range(4)}


def test_path_graph_has_no_triangles(spark):
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], ["src", "dst"]
    )
    assert triangle_listing(df).count() == 0
    pn = {r.node: r.tri for r in triangle_counts(df).collect()}
    assert pn == {i: 0 for i in range(7)}


def test_self_loops_duplicates_and_reversals_collapse(spark):
    raw = [(1, 2), (2, 1), (1, 2), (2, 3), (3, 1), (1, 1), (3, 3)]
    df = spark.createDataFrame(raw, ["src", "dst"])
    tris = triangle_listing(df).collect()
    assert len(tris) == 1
    assert tuple(sorted((tris[0].u, tris[0].x, tris[0].y))) == (1, 2, 3)
    pn = {r.node: (r.deg, r.tri) for r in triangle_counts(df).collect()}
    assert pn == {1: (2, 1), 2: (2, 1), 3: (2, 1)}


def test_matches_brute_force_on_random_graph(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(220)]
    es, tris = _brute(edges)
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        tuple(sorted((r.u, r.x, r.y)))
        for r in triangle_listing(df).collect()
    }
    assert got == tris
    assert triangle_listing(df).count() == len(tris)
    # per-node credit: each triangle counts at all three vertices
    want = {n: 0 for e in es for n in e}
    for a, b, c in tris:
        want[a] += 1
        want[b] += 1
        want[c] += 1
    pn = {r.node: r.tri for r in triangle_counts(df).collect()}
    assert pn == want


def test_star_hub_is_triangle_free_and_cheap(spark):
    # a hub of degree 60 with no closing edges: orientation points
    # every edge AWAY from the leaves INTO the hub, so the hub's
    # oriented out-degree is 0 and the wedge stage sees nothing
    df = spark.createDataFrame(
        [(0, i) for i in range(1, 61)], ["src", "dst"]
    )
    assert triangle_listing(df).count() == 0
    pn = {r.node: (r.deg, r.tri) for r in triangle_counts(df).collect()}
    assert pn[0] == (60, 0)
