"""WARC source/sink + HTML extraction + integer PageRank units."""

from __future__ import annotations

import gzip
import os

import pytest

from accounting_etl_spark.operators.html_extract import (
    extract_html,
    extract_text,
)
from accounting_etl_spark.sources.warc import (
    iter_warc_records,
    read_warc,
    warc_record_bytes,
    write_warc,
    write_warc_files,
)

HTML = (
    "<html><head><title>Doc 7</title><style>p{color:red}</style></head>"
    "<body><nav><a href='/home'>Home</a> <a href='/a'>About</a></nav>"
    "<h1>web-3</h1><p>alpha beta gamma &amp; delta</p>"
    "<ul><li><a href='http://ex.org/7/0'>l0</a></li>"
    "<li><a href='/rel'>l1</a></li></ul>"
    "<script>var x = '<p>not text</p>';</script>"
    "<footer>&copy; 2026</footer></body></html>"
)


# ------------------------------------------------------------- pure python


def test_extract_text_boilerplate_and_entities():
    r = extract_text(HTML, base_url="http://site.test/doc/7")
    assert r["title"] == "Doc 7"
    # nav, footer, style, script and the link-dense <li>s are gone
    assert r["text"] == "web-3\nalpha beta gamma & delta"
    assert r["n_blocks"] == 2
    # every link harvested + resolved; content links exclude nav
    assert r["links"] == [
        "http://site.test/home",
        "http://site.test/a",
        "http://ex.org/7/0",
        "http://site.test/rel",
    ]
    assert r["content_links"] == ["http://ex.org/7/0", "http://site.test/rel"]


def test_extract_text_malformed_never_raises():
    for bad in ["<p>unclosed", "<<<>>>", "", "<a href=>x</a>", "<p>&#xZZ;</p>"]:
        r = extract_text(bad)
        assert isinstance(r["text"], str)


def test_link_density_rule_integer_math():
    # a block that is 100% link text drops; mixed block below 1/2 stays
    html = "<p><a href='u'>all link</a></p><p>word word <a href='v'>x</a></p>"
    r = extract_text(html)
    assert r["text"] == "word word x"
    assert r["links"] == ["u", "v"]


def test_warc_record_roundtrip_gzip_members():
    recs = [
        warc_record_bytes(
            record_id=f"doc-{i}",
            target_uri=f"http://s/{i}",
            payload=f"payload {i}".encode(),
        )
        for i in range(5)
    ]
    blob = b"".join(gzip.compress(r) for r in recs)
    out = list(iter_warc_records(blob))
    assert [o["record_id"] for o in out] == [
        f"<urn:uuid:doc-{i}>" for i in range(5)
    ]
    assert all(o["http_status"] == 200 for o in out)
    assert out[3]["payload"] == b"payload 3"
    assert out[0]["content_type"].startswith("text/html")


def test_warc_request_records_filtered_and_malformed_skipped():
    good = warc_record_bytes(record_id="g", payload=b"ok")
    req = warc_record_bytes(record_id="r", warc_type="request", payload=b"GET /")
    broken = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: zzz\r\n\r\njunk"
    blob = req + broken + good
    out = list(iter_warc_records(blob, record_types=("response",)))
    assert [o["record_id"] for o in out] == ["<urn:uuid:g>"]
    # no filter: request comes through too, broken still skipped
    assert len(list(iter_warc_records(blob))) == 2


# ------------------------------------------------------------------ spark


def test_write_read_warc_distributed(spark, tmp_path):
    df = spark.range(20).selectExpr(
        "id AS doc_id",
        "concat('http://h', CAST(id % 3 AS STRING), '.test/p/', id) AS url",
        "concat('<html><body><p>doc ', id, ' text</p></body></html>') AS html",
    ).repartition(4)
    man = write_warc_files(df, str(tmp_path / "w"), compress=True).collect()
    assert sum(r["n_records"] for r in man) == 20
    assert all(os.path.exists(r["file"]) for r in man)

    back = read_warc(spark, str(tmp_path / "w"))
    rows = back.collect()
    assert len(rows) == 20
    got = {r["record_id"]: r for r in rows}
    assert got["<urn:uuid:doc-7>"]["target_uri"].endswith("/p/7")
    assert (
        bytes(got["<urn:uuid:doc-7>"]["payload"])
        == b"<html><body><p>doc 7 text</p></body></html>"
    )
    assert all(r["http_status"] == 200 for r in rows)


def test_extract_html_spark_pass(spark):
    df = spark.createDataFrame(
        [(1, HTML), (2, "<html><body><p>plain</p></body></html>")],
        "doc_id bigint, html string",
    )
    out = extract_html(df, "html").orderBy("doc_id").collect()
    assert out[0]["text"] == "web-3\nalpha beta gamma & delta"
    assert out[0]["links"][0] == "/home"  # no base col → unresolved
    assert out[1]["text"] == "plain"
    assert out[1]["links"] == []
    assert "html" not in {f.name for f in extract_html(df, "html").schema}


def test_extract_html_plan_is_map_side(spark):
    df = spark.createDataFrame([(1, "<p>x</p>")], "doc_id bigint, html string")
    plan = extract_html(df, "html")._sc is not None and extract_html(
        df, "html"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# --------------------------------------------------------------- pagerank


def _py_pagerank(edges, iters=6, scale=10**12, num=85, den=100):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    out = {}
    for u, _ in edges:
        out[u] = out.get(u, 0) + 1
    n = len(nodes)
    r = {v: scale // n for v in nodes}
    tele = (scale * (den - num)) // (den * n)
    for _ in range(iters):
        nxt = {v: tele for v in nodes}
        for u, v in edges:
            nxt[v] += (r[u] * num) // (den * out[u])
        r = nxt
    return r


def test_pagerank_int_matches_python_reference(spark):
    from accounting_etl_spark.operators.graph import pagerank_int

    edges = [
        (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (4, 1), (5, 4), (2, 5),
        (6, 3),  # 7 appears only as a sink via (3, 7)
        (3, 7),
    ]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        r["node"]: (r["rank"], r["outdeg"])
        for r in pagerank_int(df).collect()
    }
    ref = _py_pagerank(edges)
    assert {k: v[0] for k, v in got.items()} == ref
    assert got[7][1] == 0  # sink: no out-edges
    # authority ordering: 3 has the most in-links
    assert max(ref, key=ref.get) == 3


def test_pagerank_int_duplicate_edges_and_total_mass(spark):
    from accounting_etl_spark.operators.graph import pagerank_int

    # duplicates collapse (distinct) — same result as the unique set
    dup = [(1, 2)] * 5 + [(2, 1)] * 3
    df = spark.createDataFrame(dup, "src bigint, dst bigint")
    got = {r["node"]: r["rank"] for r in pagerank_int(df).collect()}
    assert got == _py_pagerank([(1, 2), (2, 1)])
    # symmetric 2-cycle: mass stays balanced and bounded by scale
    assert got[1] == got[2]
    assert sum(got.values()) <= 10**12


# ------------------------------------------------- crawl pipeline e2e


def test_wet_conversion_roundtrip(spark, tmp_path):
    from accounting_etl_spark.sources.warc import write_wet_files

    df = spark.createDataFrame(
        [(i, f"http://h{i % 2}.test/{i}", f"extracted text {i}")
         for i in range(6)],
        "doc_id bigint, url string, text string",
    ).repartition(2)
    man = write_wet_files(df, str(tmp_path / "wet")).collect()
    assert sum(r["n_records"] for r in man) == 6
    back = read_warc(
        spark, str(tmp_path / "wet"), record_types=("conversion",)
    ).collect()
    assert len(back) == 6
    got = {r["record_id"]: r for r in back}
    rec = got["<urn:uuid:conv-3>"]
    assert bytes(rec["payload"]) == b"extracted text 3"
    assert rec["content_type"] == "text/plain"
    assert rec["warc_type"] == "conversion"
    # response-only read sees none of them
    assert (
        read_warc(spark, str(tmp_path / "wet")).count() == 0
    )


def test_crawl_pipeline_warc_to_pagerank(spark, tmp_path):
    """The full crawl stage wired together: templated pages → WARC →
    distributed scan → HTML extraction → WET text + host outlink
    graph → integer PageRank. The heavily-linked host must rank
    first."""
    from pyspark.sql import functions as F

    from accounting_etl_spark.operators.graph import pagerank_int
    from accounting_etl_spark.operators.url_ops import url_domain
    from accounting_etl_spark.sources.warc import (
        write_warc_files,
        write_wet_files,
    )

    # 12 pages on 4 hosts; every page links to hub.test plus one peer
    rows = []
    for i in range(12):
        host = f"site{i % 3}.test"
        peer = f"site{(i + 1) % 3}.test"
        html = (
            f"<html><head><title>p{i}</title></head><body>"
            f"<p>page {i} body text with words</p>"
            f"<p>see <a href='http://hub.test/'>hub</a> and "
            f"<a href='http://{peer}/x'>peer</a></p>"
            "</body></html>"
        )
        rows.append((i, f"http://{host}/p/{i}", html))
    pages = spark.createDataFrame(
        rows, "doc_id bigint, url string, html string"
    ).repartition(3)
    write_warc_files(pages, str(tmp_path / "crawl")).collect()

    recs = read_warc(spark, str(tmp_path / "crawl")).select(
        F.regexp_extract("record_id", r"doc-(\d+)", 1)
        .cast("bigint")
        .alias("doc_id"),
        "target_uri",
        F.col("payload").cast("string").alias("html"),
    )
    ex = extract_html(recs, html_col="html", base_col="target_uri")

    # WET output of the extracted text
    wet = write_wet_files(
        ex.withColumnRenamed("target_uri", "url"),
        str(tmp_path / "wet"),
    ).collect()
    assert sum(r["n_records"] for r in wet) == 12

    # host graph: page host → content-link host
    edges = (
        ex.select(
            url_domain(F.col("target_uri")).alias("src"),
            F.explode("content_links").alias("link"),
        )
        .select("src", url_domain(F.col("link")).alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )
    pr = {
        r["node"]: r["rank"]
        for r in pagerank_int(edges, iters=8).collect()
    }
    assert set(pr) == {"site0.test", "site1.test", "site2.test", "hub.test"}
    assert max(pr, key=pr.get) == "hub.test"  # every page links the hub


# ------------------------------------------- foreign-layout robustness


def test_foreign_warc_layout_wget_style():
    """A wget/IA-style archive: warcinfo first, request+response pairs
    interleaved, LF-only header terminators on one record, mixed
    header casing, uuid-style record ids — none written by this
    repo's writer."""
    info = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"WARC-Record-ID: <urn:uuid:aaaa-bbbb>\r\n"
        b"WARC-Date: 2026-02-01T00:00:00Z\r\n"
        b"Content-Type: application/warc-fields\r\n"
        b"Content-Length: 18\r\n\r\n"
        b"software: wget/1.0\r\n\r\n"
    )
    req = (
        b"WARC/1.0\r\n"
        b"warc-type: request\r\n"
        b"WARC-RECORD-ID: <urn:uuid:cccc-dddd>\r\n"
        b"WARC-Target-URI: http://f.test/page\r\n"
        b"Content-Type: application/http; msgtype=request\r\n"
        b"Content-Length: 35\r\n\r\n"
        b"GET /page HTTP/1.1\r\nHost: f.test\r\n\r\n"
    )
    body = b"<html><body><p>foreign page</p></body></html>"
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"content-type: text/html; charset=UTF-8\r\n"
        + b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
    )
    resp = (
        b"WARC/1.0\n"  # LF-only header block: tolerated
        b"WARC-Type: response\n"
        b"WARC-Record-ID: <urn:uuid:eeee-ffff>\n"
        b"WARC-Target-URI: http://f.test/page\n"
        b"Content-Length: " + str(len(http)).encode() + b"\n\n" + http
    )
    blob = info + req + resp
    out = list(iter_warc_records(blob, record_types=("response",)))
    assert len(out) == 1
    r = out[0]
    assert r["record_id"] == "<urn:uuid:eeee-ffff>"
    assert r["http_status"] == 200
    assert r["content_type"].lower().startswith("text/html")
    assert r["payload"] == body
    # unfiltered: all three parse, types preserved through case folding
    types = [x["warc_type"].lower() for x in iter_warc_records(blob)]
    assert types == ["warcinfo", "request", "response"]
