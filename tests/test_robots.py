"""robots.txt frontier filter (operators/robots.py)."""

from __future__ import annotations


# NOTE rule order matters: stdlib robotparser is FIRST-match-wins
# (RFC 9309 longest-match crawlers differ) — the Allow line must
# precede the broader Disallow to carve out the exception.
ROBOTS_A = """
User-agent: *
Allow: /private/ok
Disallow: /private/
Crawl-delay: 2

User-agent: specialbot
Disallow: /
"""


def test_robots_allowed_rules_and_delay(spark):
    from accounting_etl_spark.operators.robots import robots_allowed

    frontier = spark.createDataFrame(
        [
            ("http://a.test/public/page",),
            ("http://a.test/private/page",),
            ("http://a.test/private/ok/sub",),
            ("http://norules.test/x",),  # host absent from robots table
            ("http://empty.test/y",),  # empty robots body
        ],
        "curl string",
    )
    robots = spark.createDataFrame(
        [("a.test", ROBOTS_A), ("empty.test", "")],
        "host string, robots_txt string",
    )
    out = {
        r["curl"]: (r["allowed"], r["crawl_delay"])
        for r in robots_allowed(frontier, robots).collect()
    }
    assert out["http://a.test/public/page"] == (True, 2.0)
    assert out["http://a.test/private/page"][0] is False
    # Allow precedes Disallow in the fixture → first-match carves it out
    assert out["http://a.test/private/ok/sub"][0] is True
    assert out["http://norules.test/x"] == (True, None)
    assert out["http://empty.test/y"] == (True, None)


def test_robots_user_agent_groups(spark):
    from accounting_etl_spark.operators.robots import robots_allowed

    frontier = spark.createDataFrame(
        [("http://a.test/anything",)], "curl string"
    )
    robots = spark.createDataFrame(
        [("a.test", ROBOTS_A)], "host string, robots_txt string"
    )
    (row,) = robots_allowed(
        frontier, robots, user_agent="specialbot"
    ).collect()
    assert row["allowed"] is False  # the specialbot group bans all


def test_robots_malformed_is_permissive(spark):
    from accounting_etl_spark.operators.robots import robots_allowed

    frontier = spark.createDataFrame([("http://b.test/p",)], "curl string")
    robots = spark.createDataFrame(
        [("b.test", "\x00\x01 not robots at all \x02")],
        "host string, robots_txt string",
    )
    (row,) = robots_allowed(frontier, robots).collect()
    assert row["allowed"] in (True, False)  # never raises
