"""Cohort retention and transition counts on a hand-built event
log (written as a documents-style parquet dir)."""

import datetime

import pytest


@pytest.fixture(scope="module")
def ev_dir(spark, tmp_path_factory):
    base = datetime.datetime(2024, 1, 1)
    day = datetime.timedelta(days=1)
    rows = []
    eid = 0

    def ev(user, d, typ):
        nonlocal eid
        eid += 1
        rows.append((eid, base + day * d, user, typ, 1.0, "{}"))

    # user 1: cohort day 0, returns days 1 and 3
    ev(1, 0, "view")
    ev(1, 1, "click")
    ev(1, 3, "view")
    # user 2: cohort day 0, never returns
    ev(2, 0, "view")
    # user 3: cohort day 2, returns day 3; two events one day
    ev(3, 2, "view")
    ev(3, 2, "click")
    ev(3, 3, "purchase")
    d = tmp_path_factory.mktemp("cohort_events")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(d / "events.parquet")
    )
    return str(d)


def test_cohort_matrix(spark, ev_dir):
    from accounting_etl_spark.queries.events import q_cohort_retention

    got = {
        r.grp: r.n for r in q_cohort_retention(spark, ev_dir).collect()
    }
    c0 = 19723  # 2024-01-01 as integer epoch day
    assert got == {
        f"{c0}|0": 2,  # users 1 and 2 on their cohort day
        f"{c0}|1": 1,  # user 1 returns
        f"{c0}|3": 1,
        f"{c0 + 2}|0": 1,  # user 3's cohort (one row despite 2 events)
        f"{c0 + 2}|1": 1,
    }


def test_transition_counts(spark, ev_dir):
    from accounting_etl_spark.queries.events import q_event_transitions

    got = {
        r.grp: r.n for r in q_event_transitions(spark, ev_dir).collect()
    }
    # user 1: view>click>view; user 2: none; user 3: view>click>purchase
    assert got == {
        "view>click": 2,
        "click>view": 1,
        "click>purchase": 1,
    }
