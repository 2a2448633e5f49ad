"""k-core peeling: fixpoint vs brute-force reference, fixed-rounds
mode, degenerate cores, canonical edge handling."""

import itertools
import random

import pytest

from accounting_etl_spark.operators.graph import k_core


def _brute_kcore(edges, k):
    adj = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    changed = True
    while changed:
        changed = False
        for n in [n for n, nb in adj.items() if len(nb) < k]:
            for m in adj.pop(n):
                adj[m].discard(n)
            changed = True
    return {n: len(nb) for n, nb in adj.items()}


def test_clique_survives_peripheral_tree_peels(spark):
    clique = [(u, v) for u, v in itertools.combinations(range(5), 2)]
    # a pendant chain hanging off node 0 must peel away entirely
    chain = [(0, 10), (10, 11), (11, 12)]
    df = spark.createDataFrame(clique + chain, ["src", "dst"])
    got = {r.node: r.deg for r in k_core(df, 4).collect()}
    assert got == {i: 4 for i in range(5)}


def test_matches_brute_force_on_random_graph(spark):
    rng = random.Random(5)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(140)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    for k in (2, 3, 5, 8):
        got = {r.node: r.deg for r in k_core(df, k).collect()}
        assert got == _brute_kcore(edges, k), f"k={k}"


def test_fixed_iters_reproduces_partial_peel_state(spark):
    # path graph: 1-core peels nothing, but a 2-core peels one
    # endpoint per round from each side — iters=1 must stop mid-peel
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], ["src", "dst"]
    )
    one_round = {r.node: r.deg for r in k_core(df, 2, iters=1).collect()}
    # after one round the two endpoints (0 and 6) are gone; the rest
    # keep their induced degrees, endpoints of the remnant now deg 1
    assert one_round == {1: 1, 2: 2, 3: 2, 4: 2, 5: 1}
    # fixpoint: a path has an empty 2-core
    assert k_core(df, 2).count() == 0


def test_duplicates_reversals_self_loops_collapse(spark):
    tri = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 2), (1, 2)]
    df = spark.createDataFrame(tri, ["src", "dst"])
    got = {r.node: r.deg for r in k_core(df, 2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_k_too_high_gives_empty_core(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    assert k_core(df, 3).count() == 0


def test_k_validation(spark):
    df = spark.createDataFrame([(1, 2)], ["src", "dst"])
    with pytest.raises(ValueError):
        k_core(df, 0)
