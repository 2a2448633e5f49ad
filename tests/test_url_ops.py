"""URL canonicalization / dedup (operators/url_ops.py): hand cases
for every normalization rule, the min-survivor dedup, and the
broadcast blocklist anti-join."""

from __future__ import annotations

from pyspark.sql import functions as F

from accounting_etl_spark.operators.url_ops import (
    canonical_url,
    filter_blocked_domains,
    url_dedup,
    url_domain,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["c"] for r in df.select(canonical_url(F.col("url")).alias("c")).collect()
    ]


def test_canonical_rules(spark):
    got = _canon(spark, [
        "HTTP://Example.COM:80/a/b/",          # case, default port, slash
        "https://example.com:443/x?b=2&a=1",   # default port, param sort
        "https://example.com/x?a=1&b=2",
        "https://example.com/p?utm_source=tw&a=1&fbclid=z",  # tracking
        "https://example.com/p#section",       # fragment
        "https://example.com",                 # empty path -> /
        "not a url",                           # untouched
    ])
    assert got[0] == "http://example.com/a/b"
    assert got[1] == "https://example.com/x?a=1&b=2"
    assert got[2] == got[1]
    assert got[3] == "https://example.com/p?a=1"
    assert got[4] == "https://example.com/p"
    assert got[5] == "https://example.com/"
    assert got[6] == "not a url"


def test_non_default_port_kept(spark):
    got = _canon(spark, [
        "http://example.com:8080/a",
        "https://example.com:80/a",  # 80 is NOT default for https
    ])
    assert got[0] == "http://example.com:8080/a"
    assert got[1] == "https://example.com:80/a"


def test_domain_key(spark):
    df = spark.createDataFrame(
        [("https://WWW.Example.com:443/x",), ("http://sub.site.org/y",)],
        "url string",
    )
    got = [r["d"] for r in df.select(url_domain(F.col("url")).alias("d")).collect()]
    assert got == ["example.com", "sub.site.org"]


def test_url_dedup_min_survivor(spark):
    rows = [
        (1, "https://example.com/x?b=2&a=1"),
        (2, "HTTPS://EXAMPLE.com:443/x?a=1&b=2&utm_medium=m"),
        (3, "https://example.com/other"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string")
    out = {r["doc_id"]: r for r in url_dedup(df).collect()}
    assert out[1]["canon_url"] == out[2]["canon_url"]
    assert not out[1]["is_dup"] and out[2]["is_dup"]
    assert out[2]["keep_id"] == 1
    assert not out[3]["is_dup"]


def test_blocklist_is_broadcast_anti_join(spark):
    docs = spark.createDataFrame(
        [
            (1, "https://spam.example/x"),
            (2, "https://www.good.org/y"),
            (3, "http://spam.example:8080/z"),
        ],
        "doc_id bigint, url string",
    )
    bl = spark.createDataFrame([("spam.example",)], "domain string")
    out = filter_blocked_domains(docs, bl)
    assert [r["doc_id"] for r in out.collect()] == [2]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_select_crawl_frontier(spark):
    from pyspark.sql import functions as F

    from accounting_etl_spark.operators.url_ops import (
        select_crawl_frontier,
    )

    outlinks = spark.createDataFrame(
        [
            # three refs to one hot page + tracking-param variant
            ("http://a.test/hot",),
            ("http://a.test/hot?utm_source=x",),
            ("http://a.test/hot#frag",),
            ("http://a.test/p1",),
            ("http://a.test/p2",),
            ("http://a.test/p3",),
            ("http://b.test/only",),
            ("http://a.test/already",),  # fetched → excluded
            ("/relative/skip",),  # not absolute → excluded
        ],
        "url string",
    )
    fetched = spark.createDataFrame(
        [("http://a.test/already?utm_medium=y",)], "url string"
    )
    ranks = spark.createDataFrame(
        [("a.test", 900), ("b.test", 100)], "node string, rank long"
    )
    out = select_crawl_frontier(
        outlinks, fetched, ranks, k_per_host=2
    ).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r)
    # host a: budget 2, hot page first (3 merged refs)
    a = sorted(by_host["a.test"], key=lambda r: r["slot"])
    assert len(a) == 2
    assert a[0]["curl"] == "http://a.test/hot" and a[0]["n_refs"] == 3
    assert a[0]["host_rank"] == 900
    # fetched variant excluded despite differing tracking params
    assert all(r["curl"] != "http://a.test/already" for r in out)
    # host b keeps its single candidate
    assert [r["curl"] for r in by_host["b.test"]] == ["http://b.test/only"]
