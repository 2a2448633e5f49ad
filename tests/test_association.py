"""Association rules: hand-computed support/confidence/lift,
direction asymmetry, min-support pruning, within-basket dedup,
hot-basket chunked pair expansion, a-priori prefilter plan shape,
int64 lift overflow guard, and a rational-arithmetic property
reference for the div/floor conventions the oracle pins."""

import pytest
from hypothesis import given, settings, strategies as st

from accounting_etl_spark.operators.association import association_rules


def _rules(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["b", "i"])
    out = association_rules(df, "b", "i", **kw)
    return {
        (r.antecedent, r.consequent): (
            r.c_xy,
            r.c_x,
            r.c_y,
            r.conf_milli,
            r.lift_scaled,
        )
        for r in out.collect()
    }


def test_hand_computed_measures(spark):
    # 4 baskets; x in 3, y in 2, {x,y} together in 2
    rows = [
        (1, "x"), (1, "y"),
        (2, "x"), (2, "y"),
        (3, "x"),
        (4, "z"),
    ]
    got = _rules(spark, rows, scale=100)
    # conf(x->y) = 2/3 -> 666; conf(y->x) = 2/2 -> 1000
    # lift = 2*4/(3*2) = 4/3 -> 133 at scale 100 (floor)
    assert got == {
        ("x", "y"): (2, 3, 2, 666, 133),
        ("y", "x"): (2, 2, 3, 1000, 133),
    }


def test_min_support_prunes(spark):
    rows = [(1, "x"), (1, "y"), (2, "p"), (2, "q"), (3, "x"), (3, "y")]
    got2 = _rules(spark, rows, min_support=2)
    assert set(got2) == {("x", "y"), ("y", "x")}
    got1 = _rules(spark, rows, min_support=1)
    assert ("p", "q") in got1 and ("q", "p") in got1
    with pytest.raises(ValueError):
        _rules(spark, rows, min_support=0)


def test_within_basket_duplicates_count_once(spark):
    rows = [(1, "x"), (1, "x"), (1, "y"), (2, "x"), (2, "y")]
    got = _rules(spark, rows, min_support=2)
    # c_x = 2 baskets (not 3 rows)
    assert got[("x", "y")][:3] == (2, 2, 2)


def test_independent_items_have_lift_scale(spark):
    # y in every basket: lift(x->y) = c_xy*nb/(c_x*c_y) = 1 exactly
    rows = [(b, "y") for b in range(4)] + [(0, "x"), (1, "x")]
    got = _rules(spark, rows, min_support=2, scale=1000)
    assert got[("x", "y")][4] == 1000


def test_hot_basket_chunked_matches_unchunked(spark):
    """A planted hot basket (300 items, chunk cap 16) must produce
    the identical rule table as the single-chunk expansion — the
    chunking only bounds per-row pair structs, never the output."""
    n = 300
    rows = [(b, f"i{k:03d}") for b in (1, 2) for k in range(n)]
    rows += [(3, "i000"), (4, "i001")]  # perturb c_x for two items
    small = _rules(spark, rows, min_support=2, max_basket_chunk=16)
    big = _rules(spark, rows, min_support=2, max_basket_chunk=4096)
    assert small == big
    # every ordered pair of the 300 co-occurs in exactly 2 baskets
    assert len(small) == n * (n - 1)
    assert small[("i002", "i003")][:3] == (2, 2, 2)


def test_apriori_prefilter_runs_before_pairing(spark):
    """min_support > 1 must inject a left-semi prune of infrequent
    items BEFORE pair expansion (a-priori); min_support = 1 must
    not pay for it."""
    df = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "x"), (2, "y")], ["b", "i"]
    )
    plan2 = (
        association_rules(df, "b", "i", min_support=2)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "LeftSemi" in plan2
    plan1 = (
        association_rules(df, "b", "i", min_support=1)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "LeftSemi" not in plan1


def test_hot_basket_prefilter_prunes_hapax_items(spark):
    """Items below min_support never enter pair generation: a hot
    basket made almost entirely of hapax items collapses to just
    its frequent core after the prefilter."""
    rows = [(1, f"h{k}") for k in range(500)]  # 500 hapax items
    rows += [(1, "a"), (1, "b"), (2, "a"), (2, "b")]
    got = _rules(spark, rows, min_support=2, max_basket_chunk=8)
    assert set(got) == {("a", "b"), ("b", "a")}


def test_lift_overflow_raises(spark):
    # 10 baskets x scale 1e18 -> nb*scale > int64 max: guard trips
    rows = [(b, i) for b in range(10) for i in ("x", "y")]
    df = spark.createDataFrame(rows, ["b", "i"])
    out = association_rules(df, "b", "i", min_support=2, scale=10**18)
    with pytest.raises(Exception, match="overflows int64"):
        out.collect()
    with pytest.raises(ValueError, match="scale"):
        association_rules(df, "b", "i", scale=10**19)


def test_bad_params_raise(spark):
    df = spark.createDataFrame([(1, "x")], ["b", "i"])
    with pytest.raises(ValueError):
        association_rules(df, "b", "i", max_basket_chunk=1)


@settings(max_examples=12, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.sampled_from("abcdef")),
        min_size=1,
        max_size=30,
    ),
    min_support=st.integers(1, 3),
    scale=st.sampled_from([1, 100, 10**6]),
)
def test_measures_match_rational_reference(spark, rows, min_support, scale):
    """Exact-integer property check (VERDICT r5 #4): confidence and
    lift floor-division conventions must match a pure-Python integer
    reference on random baskets — protecting the div conventions the
    DuckDB oracle pins."""
    pairs = set(rows)
    baskets: dict[int, set] = {}
    for b, i in pairs:
        baskets.setdefault(b, set()).add(i)
    nb = len(baskets)
    c: dict[str, int] = {}
    cxy: dict[tuple, int] = {}
    for bs in baskets.values():
        for i in bs:
            c[i] = c.get(i, 0) + 1
        srt = sorted(bs)
        for ai in range(len(srt)):
            for bi in range(ai + 1, len(srt)):
                k = (srt[ai], srt[bi])
                cxy[k] = cxy.get(k, 0) + 1
    want = {}
    for (a, b), n in cxy.items():
        if n < min_support:
            continue
        for x, y in ((a, b), (b, a)):
            want[(x, y)] = (
                n,
                c[x],
                c[y],
                (n * 1000) // c[x],
                (n * nb * scale) // (c[x] * c[y]),
            )
    got = _rules(
        spark, list(pairs), min_support=min_support, scale=scale
    )
    assert got == want
