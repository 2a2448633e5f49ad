"""Grouped prefix-sum (packing.prefix_sum group_cols) and
domain-mixture token budgeting (operators/mixture.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from accounting_etl_spark.operators.mixture import mixture_select
from accounting_etl_spark.operators.packing import prefix_sum


def _df(spark):
    rows = [
        # (id, dom, tokens) — two domains, interleaved ids
        (1, "a", 10),
        (2, "b", 100),
        (3, "a", 20),
        (4, "b", 200),
        (5, "a", 30),
        (6, "b", 300),
    ]
    return spark.createDataFrame(rows, "id long, dom string, n_tokens long")


def test_grouped_prefix_sum_restarts_per_group(spark):
    out = prefix_sum(
        _df(spark),
        order_col="id",
        value_col="n_tokens",
        group_cols=["dom"],
        num_partitions=4,
    )
    got = {r["id"]: r["cum"] for r in out.collect()}
    assert got == {1: 10, 3: 30, 5: 60, 2: 100, 4: 300, 6: 600}


def test_grouped_prefix_sum_matches_window_under_any_partitioning(spark):
    import random

    rows = [
        (i, f"d{i % 3}", random.Random(i).randint(1, 50)) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id long, dom string, n_tokens long")
    for n in (1, 3, 16):
        out = {
            (r["dom"], r["id"]): r["cum"]
            for r in prefix_sum(
                df,
                order_col="id",
                value_col="n_tokens",
                group_cols=["dom"],
                num_partitions=n,
            ).collect()
        }
        expect: dict[tuple[str, int], int] = {}
        acc: dict[str, int] = {}
        for i, d, t in sorted(rows):
            acc[d] = acc.get(d, 0) + t
            expect[(d, i)] = acc[d]
        assert out == expect, f"num_partitions={n}"


def test_mixture_select_budget_boundaries(spark):
    # corpus total = 660; a gets 50% (330): ids 1,3,5 sum 60 → all fit.
    # b gets 50%: 100+200=300 ≤ 330, +300 → 600 > 330 → id 6 dropped.
    sel = mixture_select(
        _df(spark),
        group_col="dom",
        order_col=["id"],
        weights={"a": (1, 2), "b": (1, 2)},
    )
    got = {r["id"]: r["keep"] for r in sel.collect()}
    assert got == {1: True, 3: True, 5: True, 2: True, 4: True, 6: False}


def test_mixture_default_weight_excludes_unlisted_domains(spark):
    sel = mixture_select(
        _df(spark),
        group_col="dom",
        order_col=["id"],
        weights={"a": (1, 1)},
    )
    got = {r["id"]: r["keep"] for r in sel.collect()}
    assert got[2] is False and got[4] is False and got[6] is False
    assert got[1] and got[3] and got[5]


def test_mixture_plan_has_no_global_data_window(spark):
    # the data-sized windows must be keyed by (dom, pid); only the
    # per-(group, partition) offsets table may window on pid alone
    sel = mixture_select(
        _df(spark),
        group_col="dom",
        order_col=[F.col("n_tokens").desc(), "id"],
        weights={"a": (1, 2), "b": (1, 2)},
    )
    plan = sel._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "__pid" in line or "dom" in line, line


def test_mixture_zero_weight_domain_drops_zero_token_head_rows(spark):
    # a zero-token row at the HEAD of an excluded domain satisfies
    # cum*den <= total*num as 0 <= 0 — the num==0 guard must still
    # drop it (ADVICE r4)
    df = spark.createDataFrame(
        [(1, "a", 0), (2, "a", 10), (3, "b", 5)], "id long, dom string, n_tokens long"
    )
    sel = mixture_select(
        df,
        group_col="dom",
        order_col=["id"],
        weights={"b": (1, 1)},  # 'a' falls to default (0, 1): excluded
    )
    got = {r["id"]: r["keep"] for r in sel.collect()}
    assert got[1] is False and got[2] is False
    assert got[3] is True
