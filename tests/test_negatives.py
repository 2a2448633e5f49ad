"""Deterministic negative sampling: positives excluded, draws
reproducible, per-user dedup, up-to-k contract, domain bounds."""

import pytest

from accounting_etl_spark.operators.negatives import sample_negatives


def _neg(spark, pos_rows, **kw):
    pos = spark.createDataFrame(pos_rows, ["u", "it"])
    kw.setdefault("n_items", 20)
    kw.setdefault("k", 4)
    return sample_negatives(pos, user_col="u", item_col="it", **kw)


def test_negatives_never_positive_and_in_domain(spark):
    pos_rows = [(1, i) for i in range(1, 11)] + [(2, 5)]
    out = _neg(spark, pos_rows).collect()
    pos = {(1, i) for i in range(1, 11)} | {(2, 5)}
    for r in out:
        assert (r.u, r.it) not in pos
        assert 1 <= r.it <= 20
        assert 1 <= r.rank <= 4


def test_deterministic_across_runs_and_partitionings(spark):
    pos_rows = [(u, it) for u in (1, 2, 3) for it in (1, 2)]
    a = sorted(map(tuple, _neg(spark, pos_rows).collect()))
    pos = spark.createDataFrame(pos_rows, ["u", "it"]).repartition(7)
    b = sorted(
        map(
            tuple,
            sample_negatives(
                pos, user_col="u", item_col="it", n_items=20, k=4
            ).collect(),
        )
    )
    assert a == b and len(a) == 12


def test_duplicate_draws_collapse_to_first_slot(spark):
    # tiny domain forces hash collisions across slots: each (u, item)
    # appears once, slots strictly increasing with rank order
    out = _neg(spark, [(1, 99)], n_items=3, k=3, oversample=4).collect()
    items = [r.it for r in out]
    assert len(items) == len(set(items))
    slots = [r.slot for r in sorted(out, key=lambda r: r.rank)]
    assert slots == sorted(slots)


def test_up_to_k_when_domain_exhausted(spark):
    # 4 items, 3 are positives: at most 1 negative can exist
    out = _neg(
        spark, [(1, 1), (1, 2), (1, 3)], n_items=4, k=5, oversample=10
    ).collect()
    assert [r.it for r in out] == [4]


def test_dataframe_domain_size(spark):
    n = spark.createDataFrame([(7,)], ["__n"]).selectExpr(
        "CAST(__n AS BIGINT) AS __n"
    )
    out = _neg(spark, [(1, 1)], n_items=n, k=3).collect()
    assert all(1 <= r.it <= 7 for r in out)


def test_validation(spark):
    with pytest.raises(ValueError):
        _neg(spark, [(1, 1)], k=0)
