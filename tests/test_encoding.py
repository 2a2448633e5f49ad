"""Leave-one-out target encoding (operators/encoding.py): leakage
freedom, integer exactness vs a pure-Python reference, singleton
fallback, plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from accounting_etl_spark.operators.encoding import PPM, target_encode_loo


def _df(spark, rows):
    return spark.createDataFrame(rows, "id bigint, cat string, y int")


def test_loo_matches_python_reference(spark):
    rows = [
        (1, "a", 1), (2, "a", 0), (3, "a", 1), (4, "a", 1),
        (5, "b", 0), (6, "b", 0),
        (7, "c", 1),  # singleton -> global prior
    ]
    got = {
        r.id: r.te_ppm
        for r in target_encode_loo(
            _df(spark, rows), category_col="cat", target=F.col("y")
        ).collect()
    }
    by_cat: dict[str, list[tuple[int, int]]] = {}
    for i, c, y in rows:
        by_cat.setdefault(c, []).append((i, y))
    ts = sum(y for _, _, y in rows)
    tn = len(rows)
    for i, c, y in rows:
        members = by_cat[c]
        if len(members) > 1:
            gs = sum(v for _, v in members)
            want = (gs - y) * PPM // (len(members) - 1)
        else:
            want = (ts - y) * PPM // (tn - 1)
        assert got[i] == want, (i, c)


def test_loo_is_leakage_free(spark):
    """Flipping ONE row's label must not move that row's own encoding
    through its own label — only through the other members' means.
    Concretely: a row's encoding never includes its own y, so two rows
    of the same category with different labels get DIFFERENT encodings
    (the plain mean would give them the same value)."""
    rows = [(1, "a", 1), (2, "a", 0), (3, "a", 0)]
    got = {
        r.id: r.te_ppm
        for r in target_encode_loo(
            _df(spark, rows), category_col="cat", target=F.col("y")
        ).collect()
    }
    assert got[1] == 0  # the other two rows are all 0
    assert got[2] == got[3] == PPM // 2  # one positive of two others


def test_loo_plan_no_fact_window_no_product(spark):
    df = _df(spark, [(i, f"c{i % 3}", i % 2) for i in range(30)])
    enc = target_encode_loo(df, category_col="cat", target=F.col("y"))
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "Window" not in plan  # stats come from a groupBy + join
    # the global prior is the sanctioned 1-row scalar broadcast
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_loo_null_category_and_singleton_input(spark):
    """ADVICE r7: NULL categories are a category of their own (the
    null-safe join must not drop them), and a 1-row input yields a
    NULL encoding instead of a divide-by-zero artifact."""
    rows = [(1, None, 1), (2, None, 0), (3, "a", 1)]
    got = {
        r.id: r.te_ppm
        for r in target_encode_loo(
            _df(spark, rows), category_col="cat", target=F.col("y")
        ).collect()
    }
    assert set(got) == {1, 2, 3}  # no silent row loss
    assert got[1] == 0 and got[2] == PPM  # LOO within the NULL group
    assert got[3] == PPM // 2  # singleton -> global prior over others
    one = target_encode_loo(
        _df(spark, [(9, "z", 1)]), category_col="cat", target=F.col("y")
    ).collect()
    assert len(one) == 1 and one[0].te_ppm is None
