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
