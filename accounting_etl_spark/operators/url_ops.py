"""URL canonicalization and URL-keyed dedup (SURVEY §2.11 dedup
family): web-crawl pipelines dedup by canonical URL before any
content pass — it is the cheapest dedup key there is, and crawl
frontiers disagree on scheme case, default ports, tracking params,
fragments, and trailing slashes for the same resource.

Everything here is native Spark column expressions (regexp parse +
array ops on the query string) — JVM-side, codegen-friendly, no UDF:

- scheme/host lowercased; ``:80``/``:443`` default ports stripped;
- fragment dropped;
- tracking params removed (``utm_*``, ``fbclid``, ``gclid``,
  ``ref``), remaining params sorted for order-insensitivity;
- trailing slash normalized off non-root paths;
- ``www.`` prefix dropped for host grouping.

``url_dedup`` then applies the standard min-survivor window on the
canonical key — one shuffle, the same shape as exact content dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TRACKING = r"^(utm_[a-z]+|fbclid|gclid|ref)="

_URL_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"


def canonical_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL column."""
    scheme = F.lower(F.regexp_extract(url, _URL_RE, 1))
    hostport = F.lower(F.regexp_extract(url, _URL_RE, 2))
    # strip default ports per scheme
    host = F.when(
        ((scheme == "http") & hostport.endswith(":80"))
        | ((scheme == "https") & hostport.endswith(":443")),
        F.regexp_replace(hostport, r":\d+$", ""),
    ).otherwise(hostport)
    path = F.regexp_extract(url, _URL_RE, 3)
    path = F.when(path == "", F.lit("/")).otherwise(
        F.regexp_replace(path, r"(.)/$", r"$1")
    )
    query = F.regexp_extract(url, _URL_RE, 4)  # includes leading '?'
    params = F.filter(
        F.split(F.regexp_replace(query, r"^\?", ""), "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING),
    )
    qnorm = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.concat_ws("&", F.sort_array(params))),
    ).otherwise(F.lit(""))
    return F.when(
        scheme == "", url  # not an absolute URL: leave untouched
    ).otherwise(F.concat(scheme, F.lit("://"), host, path, qnorm))


def url_domain(url: Column) -> Column:
    """Registrable-host grouping key: lowercased host, port and
    ``www.`` prefix stripped."""
    host = F.lower(F.regexp_extract(url, _URL_RE, 2))
    return F.regexp_replace(
        F.regexp_replace(host, r":\d+$", ""), r"^www\.", ""
    )


def url_dedup(
    df: DataFrame, *, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Min-survivor dedup on the canonical URL: adds ``canon_url``,
    ``keep_id``, ``is_dup``. One shuffle on the canonical key."""
    w = Window.partitionBy("canon_url")
    return (
        df.withColumn("canon_url", canonical_url(F.col(url_col)))
        .withColumn("keep_id", F.min(id_col).over(w))
        .withColumn("is_dup", F.col(id_col) != F.col("keep_id"))
    )


def filter_blocked_domains(
    df: DataFrame, blocklist: DataFrame, *, url_col: str = "url"
) -> DataFrame:
    """Drop rows whose domain is on the blocklist (column ``domain``)
    via a broadcast anti-join — blocklists are small dims."""
    return df.withColumn("__dom", url_domain(F.col(url_col))).join(
        F.broadcast(blocklist.select(F.col("domain").alias("__dom"))),
        "__dom",
        "left_anti",
    ).drop("__dom")


def select_crawl_frontier(
    outlinks: DataFrame,
    fetched: DataFrame,
    host_ranks: DataFrame,
    *,
    url_col: str = "url",
    k_per_host: int = 10,
) -> DataFrame:
    """Next-crawl frontier: harvested outlinks, canonicalized, minus
    everything already fetched, budgeted per host by authority.

    The politeness-constrained frontier selection every crawler runs:
    a per-HOST budget (crawl capacity is per-host, not global) filled
    in (host rank desc, canonical url) order so high-authority hosts
    crawl deeper but no host exceeds ``k_per_host``.

    Inputs: ``outlinks`` (the ``content_links`` harvest of
    ``operators/html_extract.py``), ``fetched`` (urls already
    archived — the WARC manifest's target set), ``host_ranks``
    (node, rank) from ``operators/graph.py::pagerank_int`` over the
    host graph.

    Scale notes: one canonical-key dedup shuffle + one left-anti
    against fetched (equi-join on the canonical key, AQE-sizable) +
    an equi-join to the rank table + a per-host window whose
    partitions are host-sized (never global). No broadcast hints —
    every side here is corpus-scaled.
    """
    cand = (
        outlinks.select(canonical_url(F.col(url_col)).alias("curl"))
        .where(F.col("curl").rlike("^https?://"))
        .groupBy("curl")
        .agg(F.count(F.lit(1)).alias("n_refs"))
    )
    seen = fetched.select(
        canonical_url(F.col(url_col)).alias("curl")
    ).distinct()
    fresh = cand.join(seen, "curl", "left_anti").withColumn(
        "host", url_domain(F.col("curl"))
    )
    ranked = fresh.join(
        host_ranks.select(
            F.col("node").alias("host"), F.col("rank").alias("host_rank")
        ),
        "host",
        "left",
    ).fillna({"host_rank": 0})
    w = Window.partitionBy("host").orderBy(
        F.col("n_refs").desc(), F.col("curl")
    )
    return (
        ranked.withColumn("slot", F.row_number().over(w))
        .where(F.col("slot") <= k_per_host)
        .select("host", "host_rank", "curl", "n_refs", "slot")
    )
