"""robots.txt compliance filter for the crawl frontier — stdlib
``urllib.robotparser``.

The last gate before a frontier URL is fetched: host-level
robots.txt rules (User-agent groups, Allow/Disallow, Crawl-delay)
applied to every candidate. Match semantics are the stdlib
robotparser's FIRST-match-wins per group — RFC 9309 longest-match
crawlers resolve Allow/Disallow overlaps differently; sites relying
on that ordering get the stricter stdlib reading here. Parsing is inherently
Python (robotparser), so this is an Arrow ``mapInPandas`` pass with a
per-batch parser cache — one parse per distinct host per batch, not
per row. The rules table is corpus-shaped (one row per host), so it
is JOINED to the frontier on the host key (one equi-join, AQE-sized),
never broadcast by hint.

Missing or unparseable robots.txt ⇒ allowed (the crawler convention:
absence of rules is consent; a 5xx-fetch policy is the fetcher's
concern, not this operator's).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .url_ops import url_domain


def robots_allowed(
    frontier: DataFrame,
    robots: DataFrame,
    *,
    url_col: str = "curl",
    host_col: str = "host",
    robots_host_col: str = "host",
    robots_txt_col: str = "robots_txt",
    user_agent: str = "*",
) -> DataFrame:
    """Frontier rows annotated with ``allowed`` (boolean) and
    ``crawl_delay`` (double seconds, null when unset).

    ``robots``: one row per host with the fetched robots.txt body
    (null/empty body ⇒ everything allowed)."""
    import pandas as pd

    if host_col not in frontier.columns:
        frontier = frontier.withColumn(host_col, url_domain(F.col(url_col)))
    joined = frontier.join(
        robots.select(
            F.col(robots_host_col).alias(host_col),
            F.col(robots_txt_col).alias("__robots"),
        ),
        host_col,
        "left",
    )
    keep = [c for c in joined.columns if c != "__robots"]
    fields = ", ".join(
        f"{c} {joined.schema[c].dataType.simpleString()}" for c in keep
    )
    schema = f"{fields}, allowed boolean, crawl_delay double"

    def run(batches):
        from urllib.robotparser import RobotFileParser

        cache: dict[str, RobotFileParser | None] = {}

        def parser_for(host, txt):
            if host not in cache:
                if txt is None or not str(txt).strip():
                    cache[host] = None  # no rules: allow
                else:
                    p = RobotFileParser()
                    try:
                        p.parse(str(txt).splitlines())
                    except Exception:
                        cache[host] = None
                        return None
                    cache[host] = p
            return cache[host]

        for pdf in batches:
            allowed = []
            delays = []
            for host, txt, url in zip(
                pdf[host_col], pdf["__robots"], pdf[url_col]
            ):
                p = parser_for(host, txt)
                if p is None:
                    allowed.append(True)
                    delays.append(None)
                else:
                    allowed.append(bool(p.can_fetch(user_agent, str(url))))
                    d = p.crawl_delay(user_agent)
                    delays.append(float(d) if d is not None else None)
            res = pdf[keep].copy()
            res["allowed"] = pd.Series(allowed, dtype="bool")
            res["crawl_delay"] = pd.Series(delays, dtype="float64")
            yield res

    return joined.mapInPandas(run, schema)
