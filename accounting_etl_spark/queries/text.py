"""Text-analysis & dedup surface over ``documents`` (SURVEY §2.11).

LLM-data-pipeline operators: exact dedup, n-gram Jaccard near-dup,
fingerprinting, token statistics, language-ID heuristic, quality
scoring. All array-native Catalyst expressions — no Python UDFs in
any of these paths.

Cross-engine notes: md5 returns identical hex in both engines;
DuckDB ``regexp_replace`` needs the 'g' flag to match Spark's
replace-all; shingle Jaccard uses integer counts so the ratio is one
deterministic double division.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.checkpointing import stable_checkpoint
from ..functions.spread import spread
from ..functions.text import (
    chunk_starts,
    hashed_grams,
    normalize_text,
    token_hashes,
    word_shingles,
)
from ..sources.tables import load_table
from . import Q
from . import signatures as _sig_queries


def _norm_text() -> Column:
    return normalize_text(F.col("text"))


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash, reported per document (SURVEY
    §2.11; absorbed the fingerprint entry — driver cap).

    ``md5(normalized_text)`` computed map-side; one shuffle on the
    128-bit key (the window over content_hash hash-partitions exactly
    like the groupBy form). The survivor is the minimum doc_id
    (deterministic, unlike first-wins); ``fingerprint`` is the compact
    16-hex prefix id. At 100 TB this is the canonical single-pass
    dedup with a per-row keep/drop verdict.

    ``winnow_fp`` adds the rolling-hash fingerprint set (winnowing,
    Schleimer et al.): 3-gram hashes, sliding-window-of-4 minima,
    deduplicated. The gram hash is the md5 hex prefix — fixed-width
    hex orders lexicographically exactly like the number it encodes,
    so window minima are bit-identical across engines with no integer
    hash conversion.
    """
    # small-file scans arrive single-partition and the gram hashing is
    # CPU-bound; spread() no-ops when the scan is already wide
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    w = Window.partitionBy("content_hash")
    toks = F.split(F.trim(F.col("text")), " ")
    grams = word_shingles(toks, 3)
    ghash = F.transform(grams, lambda g: F.substring(F.md5(g), 1, 16))
    # bind the gram-hash array as a projected column FIRST: the window
    # minima reference it once per position, and an inlined expression
    # would re-hash every gram per window (measured 17s -> 2s at
    # sf0.01 from this binding alone)
    base = docs.select(
        "doc_id",
        "source",
        F.md5(_norm_text()).alias("content_hash"),
        ghash.alias("__gh"),
    )
    n_g = F.size("__gh")
    win = 4
    minima = F.when(
        n_g >= win,
        F.transform(
            F.sequence(F.lit(1), n_g - win + 1),
            lambda i: F.array_min(F.slice(F.col("__gh"), i, win)),
        ),
    ).otherwise(F.array(F.array_min("__gh")))
    winnow = F.when(
        n_g >= 1, F.concat_ws("|", F.sort_array(F.array_distinct(minima)))
    ).otherwise(F.lit(""))
    return (
        base.select(
            "doc_id",
            "source",
            "content_hash",
            winnow.alias("winnow_fp"),
        )
        .select(
            "doc_id",
            "source",
            "content_hash",
            F.substring("content_hash", 1, 16).alias("fingerprint"),
            "winnow_fp",
            F.min("doc_id").over(w).alias("keep_id"),
            F.count(F.lit(1)).over(w).alias("n_copies"),
        )
        .withColumn("is_dup", F.col("doc_id") != F.col("keep_id"))
    )


_CORPUS_MOD = 10
_CORPUS_CUT = 8  # doc_id % 10 < 8 → corpus; >= 8 → incoming batch


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'incr' variant: incremental exact dedup of a new batch against a
    stored corpus hash index (operators/incremental.py). The
    ``doc_id % 10`` split stands in for corpus vs incoming batch; the
    batch joins the ``(content_hash, keep_id)`` index — shuffle on the
    hash only, the corpus text is never rescanned. Corpus survivor
    wins over a smaller batch id (the corpus copy is already
    published); batch-only content dedups batch-locally."""
    from ..operators.incremental import dedup_against_index, exact_hash_index

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    corpus = docs.filter(F.col("doc_id") % _CORPUS_MOD < _CORPUS_CUT)
    batch = docs.filter(F.col("doc_id") % _CORPUS_MOD >= _CORPUS_CUT)
    verdict = dedup_against_index(batch, exact_hash_index(corpus))
    return verdict.select(
        F.lit("incr").alias("variant"),
        "doc_id",
        "source",
        "content_hash",
        F.substring("content_hash", 1, 16).alias("fingerprint"),
        F.lit(None).cast("string").alias("winnow_fp"),
        "keep_id",
        F.lit(None).cast("bigint").alias("n_copies"),
        "is_dup",
    )


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'url' variant: canonical-URL dedup (operators/url_ops.py) — the
    cheapest dedup key a web-crawl pipeline has. Six deterministic URL
    shapes are synthesized per doc_id (scheme/host case, default and
    non-default ports, tracking params + fragment, unsorted params,
    trailing slash, non-URL passthrough); shapes 0/1/5 of the same
    resource must collapse to ONE canonical form. The oracle states
    the EXPECTED canonical per shape independently (no regex
    re-implementation), so the driver checks the operator's semantics,
    not a shared expression. content_hash carries the canonical URL,
    fingerprint the registrable domain."""
    from pyspark.sql import Window

    from ..operators.url_ops import url_dedup, url_domain

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    k = (F.col("doc_id") % 17).cast("string")
    shape = F.col("doc_id") % 6
    base = F.concat(F.lit("example"), k, F.lit(".com"))
    url = (
        F.when(
            shape == 0,
            F.concat(
                F.lit("HTTP://EXAMPLE"), k, F.lit(".COM:80/path/"), k,
                F.lit("/?utm_campaign=x&fbclid=abc&z=9&a=1#top"),
            ),
        )
        .when(
            shape == 1,
            F.concat(F.lit("http://"), base, F.lit("/path/"), k, F.lit("?a=1&z=9")),
        )
        .when(
            shape == 2,
            F.concat(F.lit("HTTPS://"), base, F.lit(":443/Sec/"), k),
        )
        .when(
            shape == 3,
            F.concat(F.lit("not a url "), F.col("doc_id").cast("string")),
        )
        .when(
            shape == 4,
            F.concat(F.lit("http://"), base, F.lit(":8080/path/"), k),
        )
        .otherwise(
            F.concat(F.lit("http://"), base, F.lit("/path/"), k, F.lit("/?z=9&a=1")),
        )
    )
    d = url_dedup(docs.withColumn("url", url), url_col="url", id_col="doc_id")
    w = Window.partitionBy("canon_url")
    return d.select(
        F.lit("url").alias("variant"),
        "doc_id",
        "source",
        F.col("canon_url").alias("content_hash"),
        url_domain(F.col("url")).alias("fingerprint"),
        F.lit(None).cast("string").alias("winnow_fp"),
        "keep_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_copies"),
        "is_dup",
    )


_URL_DEDUP_SQL = """
WITH u AS (
  SELECT doc_id, source, CAST(doc_id % 17 AS VARCHAR) AS k,
         doc_id % 6 AS shape
  FROM documents
), c AS (
  SELECT doc_id, source,
         CASE
           WHEN shape IN (0, 1, 5)
             THEN 'http://example' || k || '.com/path/' || k || '?a=1&z=9'
           WHEN shape = 2 THEN 'https://example' || k || '.com/Sec/' || k
           WHEN shape = 3 THEN 'not a url ' || CAST(doc_id AS VARCHAR)
           ELSE 'http://example' || k || '.com:8080/path/' || k
         END AS content_hash,
         CASE WHEN shape = 3 THEN ''
              ELSE 'example' || k || '.com' END AS fingerprint
  FROM u
)
SELECT 'url' AS variant, doc_id, source, content_hash, fingerprint,
       CAST(NULL AS VARCHAR) AS winnow_fp,
       min(doc_id) OVER (PARTITION BY content_hash) AS keep_id,
       CAST(count(*) OVER (PARTITION BY content_hash) AS BIGINT) AS n_copies,
       doc_id != min(doc_id) OVER (PARTITION BY content_hash) AS is_dup
FROM c
"""


_FRONTIER_K_PER_HOST = 2
# doc_id % 25 == 0 → url already fetched. 25 (not 5): each canonical
# class is an arithmetic progression of doc_ids with step 102, and
# 102 ≡ 2 (mod 5) sweeps every residue — % 5 would mark ~every class
# fetched and leave a 1-row frontier; % 25 keeps ~80% of classes
# live so the per-host budget window actually selects.
_FRONTIER_FETCH_MOD = 25


def q_crawl_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'frontier' variant: politeness-budgeted crawl-frontier
    selection (operators/url_ops.py::select_crawl_frontier) — the
    same six synthesized URL shapes as the 'url' variant stand in for
    harvested outlinks; docs with ``doc_id % {m} == 0`` are the
    already-fetched set; host authority is a deterministic synthetic
    rank (``(k*7) % 13`` per host k). Canonicalize → anti-join
    fetched → per-host top-{k} by (n_refs desc, url). Column mapping:
    doc_id = the slot within the host's budget, source/fingerprint =
    host, content_hash = the canonical url, keep_id = host_rank,
    n_copies = n_refs. The oracle restates the expected canonical
    forms independently (the 'url' contract) and replays the
    selection in SQL."""
    from ..operators.url_ops import select_crawl_frontier

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    k = (F.col("doc_id") % 17).cast("string")
    shape = F.col("doc_id") % 6
    base = F.concat(F.lit("example"), k, F.lit(".com"))
    url = (
        F.when(
            shape == 0,
            F.concat(
                F.lit("HTTP://EXAMPLE"), k, F.lit(".COM:80/path/"), k,
                F.lit("/?utm_campaign=x&fbclid=abc&z=9&a=1#top"),
            ),
        )
        .when(
            shape == 1,
            F.concat(F.lit("http://"), base, F.lit("/path/"), k, F.lit("?a=1&z=9")),
        )
        .when(
            shape == 2,
            F.concat(F.lit("HTTPS://"), base, F.lit(":443/Sec/"), k),
        )
        .when(
            shape == 3,
            F.concat(F.lit("not a url "), F.col("doc_id").cast("string")),
        )
        .when(
            shape == 4,
            F.concat(F.lit("http://"), base, F.lit(":8080/path/"), k),
        )
        .otherwise(
            F.concat(F.lit("http://"), base, F.lit("/path/"), k, F.lit("/?z=9&a=1")),
        )
    )
    outlinks = docs.select(url.alias("url"))
    fetched = docs.where(
        F.col("doc_id") % _FRONTIER_FETCH_MOD == 0
    ).select(url.alias("url"))
    host_ranks = (
        docs.select((F.col("doc_id") % 17).alias("__k"))
        .distinct()
        .select(
            F.concat(
                F.lit("example"), F.col("__k").cast("string"), F.lit(".com")
            ).alias("node"),
            ((F.col("__k") * 7) % 13).cast("bigint").alias("rank"),
        )
    )
    sel = select_crawl_frontier(
        outlinks,
        fetched,
        host_ranks,
        url_col="url",
        k_per_host=_FRONTIER_K_PER_HOST,
    )
    return sel.select(
        F.lit("frontier").alias("variant"),
        F.col("slot").cast("bigint").alias("doc_id"),
        F.col("host").alias("source"),
        F.col("curl").alias("content_hash"),
        F.col("host").alias("fingerprint"),
        F.lit(None).cast("string").alias("winnow_fp"),
        F.col("host_rank").cast("bigint").alias("keep_id"),
        F.col("n_refs").cast("bigint").alias("n_copies"),
        F.lit(False).alias("is_dup"),
    )


q_crawl_frontier.__doc__ = q_crawl_frontier.__doc__.format(
    m=_FRONTIER_FETCH_MOD, k=_FRONTIER_K_PER_HOST
)


def q_dedup_exact_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup + incremental-batch dedup in one union-tagged entry
    (driver cap). variant 'full': q_dedup_exact over every document.
    variant 'incr': q_dedup_incremental — batch docs only, winnow_fp/
    n_copies NULL. variant 'url': q_url_dedup — canonical-URL dedup
    over synthesized URL shapes, expected-value oracle. variant
    'frontier': q_crawl_frontier — budgeted next-crawl selection over
    the same URL corpus."""
    full = q_dedup_exact(spark, sf_dir).select(
        F.lit("full").alias("variant"),
        "doc_id",
        "source",
        "content_hash",
        "fingerprint",
        "winnow_fp",
        "keep_id",
        F.col("n_copies").cast("bigint").alias("n_copies"),
        "is_dup",
    )
    return (
        full.unionByName(q_dedup_incremental(spark, sf_dir))
        .unionByName(q_url_dedup(spark, sf_dir))
        .unionByName(q_crawl_frontier(spark, sf_dir))
    )


_DEDUP_EXACT_SQL = """
WITH h AS (
  SELECT doc_id, source,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS content_hash,
         string_split(trim(text), ' ') AS t
  FROM documents
), g AS (
  SELECT doc_id, source, content_hash,
         CASE WHEN len(t) >= 3
              THEN list_transform(
                     list_transform(range(1, len(t) - 1),
                                    i -> array_to_string(t[i:i+2], ' ')),
                     s -> substring(md5(s), 1, 16))
              ELSE CAST([] AS VARCHAR[]) END AS gh
  FROM h
), m AS (
  SELECT doc_id, source, content_hash, len(gh) AS n_g,
         CASE WHEN len(gh) >= 4
              THEN list_transform(range(1, len(gh) - 2),
                                  i -> list_min(gh[i:i+3]))
              WHEN len(gh) >= 1 THEN [list_min(gh)]
              ELSE CAST([] AS VARCHAR[]) END AS minima
  FROM g
)
SELECT doc_id, source, content_hash,
       substring(content_hash, 1, 16) AS fingerprint,
       CASE WHEN n_g >= 1
            THEN array_to_string(list_sort(list_distinct(minima)), '|')
            ELSE '' END AS winnow_fp,
       min(doc_id) OVER (PARTITION BY content_hash) AS keep_id,
       count(*) OVER (PARTITION BY content_hash) AS n_copies,
       doc_id != min(doc_id) OVER (PARTITION BY content_hash) AS is_dup
FROM m
"""

_DEDUP_INCR_SQL = f"""
WITH hh AS (
  SELECT doc_id, source,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS content_hash
  FROM documents
), ci AS (
  SELECT content_hash, min(doc_id) AS corpus_keep
  FROM hh WHERE doc_id % {_CORPUS_MOD} < {_CORPUS_CUT}
  GROUP BY content_hash
), b AS (
  SELECT * FROM hh WHERE doc_id % {_CORPUS_MOD} >= {_CORPUS_CUT}
)
SELECT 'incr' AS variant, b.doc_id, b.source, b.content_hash,
       substring(b.content_hash, 1, 16) AS fingerprint,
       CAST(NULL AS VARCHAR) AS winnow_fp,
       COALESCE(ci.corpus_keep,
                min(b.doc_id) OVER (PARTITION BY b.content_hash)) AS keep_id,
       CAST(NULL AS BIGINT) AS n_copies,
       b.doc_id != COALESCE(ci.corpus_keep,
                min(b.doc_id) OVER (PARTITION BY b.content_hash)) AS is_dup
FROM b LEFT JOIN ci USING (content_hash)
"""

_FRONTIER_SQL = f"""
WITH fu AS (
  SELECT doc_id, CAST(doc_id % 17 AS VARCHAR) AS k, doc_id % 6 AS shape
  FROM documents
), fc AS (
  SELECT doc_id,
         CASE
           WHEN shape IN (0, 1, 5)
             THEN 'http://example' || k || '.com/path/' || k || '?a=1&z=9'
           WHEN shape = 2 THEN 'https://example' || k || '.com/Sec/' || k
           WHEN shape = 3 THEN NULL
           ELSE 'http://example' || k || '.com:8080/path/' || k
         END AS curl,
         'example' || k || '.com' AS host
  FROM fu
), cand AS (
  SELECT curl, host, count(*) AS n_refs
  FROM fc WHERE curl IS NOT NULL GROUP BY 1, 2
), seen AS (
  SELECT DISTINCT curl FROM fc
  WHERE curl IS NOT NULL AND doc_id % {_FRONTIER_FETCH_MOD} = 0
), fresh AS (
  SELECT * FROM cand c
  WHERE NOT EXISTS (SELECT 1 FROM seen s WHERE s.curl = c.curl)
), hr AS (
  SELECT DISTINCT 'example' || CAST(doc_id % 17 AS VARCHAR) || '.com' AS host,
         ((doc_id % 17) * 7) % 13 AS hrank
  FROM documents
), sel AS (
  SELECT f.host, COALESCE(hr.hrank, 0) AS host_rank, f.curl, f.n_refs,
         row_number() OVER (PARTITION BY f.host
             ORDER BY f.n_refs DESC, f.curl) AS slot
  FROM fresh f LEFT JOIN hr ON hr.host = f.host
)
SELECT 'frontier' AS variant, CAST(slot AS BIGINT) AS doc_id,
       host AS source, curl AS content_hash, host AS fingerprint,
       CAST(NULL AS VARCHAR) AS winnow_fp,
       CAST(host_rank AS BIGINT) AS keep_id,
       CAST(n_refs AS BIGINT) AS n_copies, FALSE AS is_dup
FROM sel WHERE slot <= {_FRONTIER_K_PER_HOST}
"""

_DEDUP_EXACT_MERGED_SQL = f"""
SELECT 'full' AS variant, * FROM ({_DEDUP_EXACT_SQL})
UNION ALL
SELECT * FROM ({_DEDUP_INCR_SQL})
UNION ALL
SELECT * FROM ({_URL_DEDUP_SQL})
UNION ALL
SELECT * FROM ({_FRONTIER_SQL})
"""


def q_text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + language-ID + quality scoring in one per-doc
    pass (absorbed the token_stats and lang_quality entries — driver
    cap; one scan instead of two).

    Token columns use the BPE-ish ``[A-Za-z0-9]+`` regex; the
    language/quality columns use whitespace tokens (``ws_`` prefix).
    Stopword-ratio heuristic: share of {'the','a'} tokens; the
    quality score mixes length and uniqueness. All exact integer
    ratios so the doubles hash-match cross-engine.

    The redaction battery synthesizes per-doc PII (an email and a
    phone fragment derived from doc_id — same pattern as the
    scalar battery's printf-money parse), then counts and masks it:
    detection via ``regexp_extract_all`` length, masking via chained
    replace-all — the pipeline a pre-training corpus scrubber runs.

    Sentiment (SURVEY §2.11): weighted-lexicon scoring. The lexicon is
    tiny, so it inlines as a per-token CASE — the degenerate form of
    the broadcast lexicon join (zero shuffle, map-only); a large
    lexicon would broadcast-join the exploded tokens instead. Integer
    weight sum / integer token count → one exact double division.

    Repetition signals (Gopher-style quality filters, Rae et al.):
    ``top_2gram_frac`` = chars covered by the most frequent word
    2-gram / n_chars (ties break to the lexicographically greatest
    gram — struct max, identical ordering in both engines);
    ``dup_5gram_frac`` = fraction of 5-grams that are repeats. The
    gram arrays and the count-struct max are bound as projected
    columns first (the dedup_exact 17s→2s lesson) so codegen
    evaluates each once per row.

    Gopher/C4 rule battery (Rae et al. 2021 App. A; Raffel et al.
    2020 §2.2): the corpus has no line structure, so a deterministic
    lined page is synthesized from (doc_id, whitespace tokens) — the
    same engine-portable trick as the PII battery — and the real
    rules run over it: terminal-punctuation / bullet-start /
    ellipsis-end line fractions, C4's "keep lines with ≥5 words
    ending in punctuation", alphabetic-word fraction, #/ellipsis
    symbol ratio, the 8-word stop list, mean-word-length and
    word-count bounds. Every threshold compares in integer math
    (``10*n_sym <= n_ws``, never ``float <= 0.1``) so the
    ``gopher_pass`` / ``c4_clean`` verdicts are bit-portable.
    """
    # small-file scans arrive single-partition and the per-doc battery
    # is CPU-bound; spread() no-ops when the scan is already wide
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = F.regexp_extract_all(F.col("text"), F.lit("[A-Za-z0-9]+"), 0)
    tok_lens = F.transform(toks, lambda t: F.length(t))
    sum_len = F.aggregate(tok_lens, F.lit(0), lambda acc, x: acc + x)
    ws = F.split(F.trim(F.col("text")), " ")
    n_ws = F.size(ws)
    stops = F.size(F.filter(ws, lambda t: t.isin("the", "a")))
    en_ratio = stops.cast("double") / n_ws
    ws_uniq = F.size(F.array_distinct(ws)).cast("double") / n_ws
    # __g5 only feeds a duplicate-count → the 64-bit hashed-gram
    # scheme (functions/text.py); __g2 keeps gram TEXT because
    # top_2gram surfaces it. The top-2-gram itself is a sorted-run
    # fold — O(n log n) per doc instead of the O(n²)
    # filter-scan-per-distinct-gram form (quadratic in document
    # length: fatal on book-length docs at 100 TB). Tie-break matches
    # the oracle's struct-max: highest count, then largest gram.
    docs = docs.select(
        "*",
        word_shingles(ws, 2).alias("__g2"),
        hashed_grams(token_hashes(ws), 5).alias("__g5"),
    )
    sorted2 = F.array_sort("__g2")
    acc0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("bigint").alias("run"),
        F.lit(0).cast("bigint").alias("cnt"),
        F.lit("").alias("gram"),
    )
    def _run_step(acc: Column, g: Column) -> Column:
        run = F.when(g == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1).cast("bigint")
        )
        better = (run > acc["cnt"]) | (
            (run == acc["cnt"]) & (g > acc["gram"])
        )
        return F.struct(
            g.alias("prev"),
            run.alias("run"),
            F.when(better, run).otherwise(acc["cnt"]).alias("cnt"),
            F.when(better, g).otherwise(acc["gram"]).alias("gram"),
        )
    docs = docs.select(
        "*",
        F.aggregate(
            sorted2,
            acc0,
            _run_step,
            lambda acc: F.struct(
                acc["cnt"].alias("cnt"), acc["gram"].alias("gram")
            ),
        ).alias("__top2"),
    )
    # --- Gopher/C4 line battery (Rae et al. 2021 App. A; Raffel et al.
    # C4 §2.2). The corpus has no line structure, so — the PII-battery
    # pattern — a deterministic lined page is synthesized from
    # (doc_id, ws): lines of doc_id%7+5 words, suffix/bullet decoration
    # cycling on (doc_id + line_idx). Both engines build the identical
    # page, then the REAL line/word rules run over it. Every rule
    # threshold compares in integer math (10*n_sym <= n_ws, not
    # float <= 0.1) so the booleans are bit-portable.
    k_words = F.col("doc_id") % 7 + 5
    n_lines_c = F.floor((n_ws + k_words - 1) / k_words).cast("int")
    lines_col = F.transform(
        F.sequence(F.lit(0), n_lines_c - 1),
        lambda i: F.concat(
            F.when((F.col("doc_id") + i) % 4 == 1, F.lit("- ")).otherwise(
                F.lit("")
            ),
            F.array_join(F.slice(ws, i * k_words + 1, k_words), " "),
            F.when((F.col("doc_id") + i) % 5 == 0, F.lit("."))
            .when((F.col("doc_id") + i) % 5 == 1, F.lit("..."))
            .when((F.col("doc_id") + i) % 5 == 3, F.lit("!"))
            .otherwise(F.lit("")),
        ),
    )
    # projection-bound (the dedup_exact 17s→2s lesson): the line array
    # and its counts evaluate once per row, not once per consumer
    docs = docs.select(
        "*",
        lines_col.alias("__lines"),
        F.size(
            F.filter(ws, lambda t: t.rlike("[A-Za-z]"))
        ).cast("bigint").alias("__n_alpha"),
        (
            F.regexp_count(F.col("text"), F.lit("#"))
            + F.regexp_count(F.col("text"), F.lit(r"\.\.\."))
        ).cast("bigint").alias("__n_sym"),
        F.size(
            F.filter(
                F.array(*[F.lit(s) for s in _GOPHER_STOPS]),
                lambda s: F.array_contains(
                    F.transform(ws, F.lower), s
                ),
            )
        ).cast("bigint").alias("__n_stops"),
    )
    nl = F.size("__lines").cast("bigint")
    n_punct = F.size(
        F.filter("__lines", lambda l: l.rlike("[.!?]$"))
    ).cast("bigint")
    n_bullet = F.size(
        F.filter("__lines", lambda l: l.startswith("- "))
    ).cast("bigint")
    n_ellipsis = F.size(
        F.filter("__lines", lambda l: l.endswith("..."))
    ).cast("bigint")
    n_c4_kept = F.size(
        F.filter(
            "__lines",
            lambda l: l.rlike("[.!?]$")
            & (
                F.size(
                    F.regexp_extract_all(l, F.lit("[A-Za-z0-9]+"), 0)
                )
                >= 5
            ),
        )
    ).cast("bigint")
    n_tok = F.size(toks).cast("bigint")
    _rules = [
        n_tok.between(50, 100_000),
        (sum_len >= 3 * n_tok) & (sum_len <= 10 * n_tok),
        10 * F.col("__n_sym") <= n_ws,
        10 * n_bullet <= nl,
        10 * n_ellipsis <= 3 * nl,
        5 * F.col("__n_alpha") >= 4 * n_ws,
        F.col("__n_stops") >= 2,
    ]
    gopher_pass = _rules[0]
    for _r in _rules[1:]:
        gopher_pass = gopher_pass & _r
    n_violations = sum(
        (F.when(r, 0).otherwise(1) for r in _rules), F.lit(0)
    ).cast("bigint")
    c4_clean = (
        ~F.lower(F.col("text")).contains("lorem ipsum")
        & ~F.col("text").contains("{")
        & (n_c4_kept >= 1)
    )
    n2, n5 = F.size("__g2"), F.size("__g5")
    return docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
        (sum_len.cast("double") / F.size(toks)).alias("avg_token_len"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias(
            "uniq_ratio"
        ),
        en_ratio.alias("en_ratio"),
        F.when(en_ratio >= 0.08, F.lit("en")).otherwise(F.lit("other")).alias(
            "pred_lang"
        ),
        ws_uniq.alias("ws_uniq_ratio"),
        (
            F.least(F.col("n_chars").cast("double") / 400, F.lit(1.0)) * 0.5
            + ws_uniq * 0.5
        ).alias("quality_score"),
        F.size(
            F.regexp_extract_all(_pii_text(), F.lit(_EMAIL_RE), 0)
        ).cast("bigint").alias("n_emails"),
        F.size(
            F.regexp_extract_all(_pii_text(), F.lit(_PHONE_RE), 0)
        ).cast("bigint").alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(_pii_text(), _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ).alias("pii_redacted"),
        F.size(chunk_starts(ws, size=64, step=48)).cast("bigint").alias(
            "n_chunks"
        ),
        _sent_sum(ws).alias("sent_sum"),
        _sent_matches(ws).alias("n_sent_tokens"),
        (_sent_sum(ws).cast("double") / n_ws).alias("sentiment"),
        F.when(_sent_sum(ws) > 0, F.lit("pos"))
        .when(_sent_sum(ws) < 0, F.lit("neg"))
        .otherwise(F.lit("neutral"))
        .alias("sent_label"),
        F.when(n2 > 0, F.col("__top2")["gram"]).alias("top_2gram"),
        F.when(
            (n2 > 0) & (F.col("n_chars") > 0),
            (
                F.col("__top2")["cnt"] * F.length(F.col("__top2")["gram"])
            ).cast("double")
            / F.col("n_chars"),
        )
        .otherwise(F.lit(0.0))
        .alias("top_2gram_frac"),
        F.when(
            n5 > 0,
            (n5 - F.size(F.array_distinct("__g5"))).cast("double") / n5,
        )
        .otherwise(F.lit(0.0))
        .alias("dup_5gram_frac"),
        nl.alias("n_lines"),
        (n_punct.cast("double") / nl).alias("frac_line_punct"),
        (n_bullet.cast("double") / nl).alias("frac_line_bullet"),
        (n_ellipsis.cast("double") / nl).alias("frac_line_ellipsis"),
        n_c4_kept.alias("n_c4_kept_lines"),
        (F.col("__n_alpha").cast("double") / n_ws).alias("alpha_word_frac"),
        (F.col("__n_sym").cast("double") / n_ws).alias("symbol_word_ratio"),
        F.col("__n_stops").alias("n_gopher_stops"),
        n_violations.alias("n_gopher_violations"),
        gopher_pass.alias("gopher_pass"),
        c4_clean.alias("c4_clean"),
    )


# Gopher rule-7 stop list (Rae et al. 2021 Appendix A: "contains at
# least two of the following English words")
_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


# weighted sentiment lexicon (SURVEY §2.11) — inlined as a CASE chain.
# 'fast'/'slow' appear throughout the driver's synthetic corpus, so
# the label distribution is non-degenerate at every SF.
_SENT_LEXICON = {
    "excellent": 2, "outstanding": 2,
    "good": 1, "great": 1, "strong": 1, "gain": 1, "profit": 1, "fast": 1,
    "bad": -1, "weak": -1, "loss": -1, "late": -1, "slow": -1,
    "terrible": -2, "fraud": -2,
}


def _sent_weight(tok: Column) -> Column:
    expr: Column = F.lit(0)
    for word, wt in _SENT_LEXICON.items():
        expr = F.when(F.lower(tok) == word, F.lit(wt)).otherwise(expr)
    return expr


def _sent_sum(ws: Column) -> Column:
    return F.aggregate(
        ws, F.lit(0).cast("bigint"), lambda acc, t: acc + _sent_weight(t)
    )


def _sent_matches(ws: Column) -> Column:
    return F.size(F.filter(ws, lambda t: _sent_weight(t) != 0)).cast("bigint")


# RE2-compatible (no backrefs/lookaround) so Java regex and DuckDB
# agree byte-for-byte
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\b555-\d{4}\b"


def _pii_text() -> Column:
    return F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )


_SENT_CASE = (
    "CASE "
    + " ".join(
        f"WHEN lower(x) = '{w}' THEN {wt}" for w, wt in _SENT_LEXICON.items()
    )
    + " ELSE 0 END"
)

_TEXT_METRICS_SQL = f"""
WITH t AS (
  SELECT doc_id, lang, n_chars,
         regexp_extract_all(text, '[A-Za-z0-9]+') AS toks,
         string_split(trim(text), ' ') AS ws,
         list_transform(range(1, len(string_split(trim(text), ' '))),
           i -> array_to_string(string_split(trim(text), ' ')[i:i+1], ' ')
         ) AS g2,
         list_transform(range(1, len(string_split(trim(text), ' ')) - 3),
           i -> array_to_string(string_split(trim(text), ' ')[i:i+4], ' ')
         ) AS g5,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or 555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS pii,
         list_transform(
           range(0, (len(string_split(trim(text), ' ')) + doc_id % 7 + 4)
                    // (doc_id % 7 + 5)),
           i -> (CASE WHEN (doc_id + i) % 4 = 1 THEN '- ' ELSE '' END)
             || array_to_string(list_slice(string_split(trim(text), ' '),
                  i * (doc_id % 7 + 5) + 1, (i + 1) * (doc_id % 7 + 5)), ' ')
             || (CASE (doc_id + i) % 5 WHEN 0 THEN '.' WHEN 1 THEN '...'
                 WHEN 3 THEN '!' ELSE '' END)
         ) AS lines,
         len(regexp_extract_all(text, '#'))
           + len(regexp_extract_all(text, '\\.\\.\\.')) AS n_sym,
         contains(lower(text), 'lorem ipsum') AS has_lorem,
         contains(text, '{{') AS has_brace
  FROM documents
), s AS (
  SELECT doc_id, lang, n_chars, toks, pii, g2, g5,
         len(ws) AS n_ws,
         len(list_filter(ws, x -> x IN ('the', 'a'))) AS stops,
         len(list_distinct(ws)) AS ws_uniq,
         list_max(list_transform(list_distinct(g2),
           g -> {{'cnt': len(list_filter(g2, x -> x = g)), 'gram': g}}
         )) AS top2,
         CAST(list_sum(list_transform(ws, x -> {_SENT_CASE})) AS BIGINT) AS sent_sum,
         CAST(len(list_filter(ws, x -> ({_SENT_CASE}) != 0)) AS BIGINT) AS n_sent_tokens,
         len(lines) AS n_lines,
         len(list_filter(lines, l -> regexp_matches(l, '[.!?]$'))) AS n_punct,
         len(list_filter(lines, l -> starts_with(l, '- '))) AS n_bullet,
         len(list_filter(lines, l -> ends_with(l, '...'))) AS n_ellipsis,
         len(list_filter(lines, l -> regexp_matches(l, '[.!?]$')
             AND len(regexp_extract_all(l, '[A-Za-z0-9]+')) >= 5)) AS n_c4_kept,
         len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha,
         n_sym, has_lorem, has_brace,
         len(list_filter(['the','be','to','of','and','that','have','with'],
             g -> list_contains(list_transform(ws, x -> lower(x)), g))) AS n_stops,
         CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS sum_len
  FROM t
)
SELECT doc_id, lang, n_chars,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
  CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks) AS avg_token_len,
  CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS uniq_ratio,
  CAST(stops AS DOUBLE) / n_ws AS en_ratio,
  CASE WHEN CAST(stops AS DOUBLE) / n_ws >= 0.08 THEN 'en' ELSE 'other' END AS pred_lang,
  CAST(ws_uniq AS DOUBLE) / n_ws AS ws_uniq_ratio,
  least(CAST(n_chars AS DOUBLE) / 400, 1.0) * 0.5
    + (CAST(ws_uniq AS DOUBLE) / n_ws) * 0.5 AS quality_score,
  CAST(len(regexp_extract_all(pii, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(pii, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
  regexp_replace(regexp_replace(pii, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                 '{_PHONE_RE}', '<PHONE>', 'g') AS pii_redacted,
  CAST(len(list_distinct(list_append(
        range(1, greatest(n_ws - 64, 0) + 2, 48),
        greatest(n_ws - 64, 0) + 1))) AS BIGINT) AS n_chunks,
  sent_sum,
  n_sent_tokens,
  CAST(sent_sum AS DOUBLE) / n_ws AS sentiment,
  CASE WHEN sent_sum > 0 THEN 'pos' WHEN sent_sum < 0 THEN 'neg'
       ELSE 'neutral' END AS sent_label,
  CASE WHEN len(g2) > 0 THEN struct_extract(top2, 'gram') END AS top_2gram,
  CASE WHEN len(g2) > 0 AND n_chars > 0
       THEN CAST(struct_extract(top2, 'cnt')
                 * length(struct_extract(top2, 'gram')) AS DOUBLE) / n_chars
       ELSE 0.0 END AS top_2gram_frac,
  CASE WHEN len(g5) > 0
       THEN CAST(len(g5) - len(list_distinct(g5)) AS DOUBLE) / len(g5)
       ELSE 0.0 END AS dup_5gram_frac,
  CAST(n_lines AS BIGINT) AS n_lines,
  CAST(n_punct AS DOUBLE) / n_lines AS frac_line_punct,
  CAST(n_bullet AS DOUBLE) / n_lines AS frac_line_bullet,
  CAST(n_ellipsis AS DOUBLE) / n_lines AS frac_line_ellipsis,
  CAST(n_c4_kept AS BIGINT) AS n_c4_kept_lines,
  CAST(n_alpha AS DOUBLE) / n_ws AS alpha_word_frac,
  CAST(n_sym AS DOUBLE) / n_ws AS symbol_word_ratio,
  CAST(n_stops AS BIGINT) AS n_gopher_stops,
  CAST((CASE WHEN len(toks) BETWEEN 50 AND 100000 THEN 0 ELSE 1 END)
   + (CASE WHEN sum_len >= 3 * len(toks) AND sum_len <= 10 * len(toks)
      THEN 0 ELSE 1 END)
   + (CASE WHEN 10 * n_sym <= n_ws THEN 0 ELSE 1 END)
   + (CASE WHEN 10 * n_bullet <= n_lines THEN 0 ELSE 1 END)
   + (CASE WHEN 10 * n_ellipsis <= 3 * n_lines THEN 0 ELSE 1 END)
   + (CASE WHEN 5 * n_alpha >= 4 * n_ws THEN 0 ELSE 1 END)
   + (CASE WHEN n_stops >= 2 THEN 0 ELSE 1 END) AS BIGINT)
   AS n_gopher_violations,
  (len(toks) BETWEEN 50 AND 100000
   AND sum_len >= 3 * len(toks) AND sum_len <= 10 * len(toks)
   AND 10 * n_sym <= n_ws
   AND 10 * n_bullet <= n_lines
   AND 10 * n_ellipsis <= 3 * n_lines
   AND 5 * n_alpha >= 4 * n_ws
   AND n_stops >= 2) AS gopher_pass,
  (NOT has_lorem AND NOT has_brace AND n_c4_kept >= 1) AS c4_clean
FROM s
"""

_JACCARD_THRESHOLD = 0.2
_MAX_SHINGLE_DF = 100  # stop-shingle cutoff — the 100 TB skew guard
# broadcast the |docs|-sized shingle-count side only when the corpus is
# measurably below this (2M docs x ~16B ≈ 32MB broadcast); above it the
# enrichment joins shuffle and postings are checkpointed instead
_BROADCAST_DOC_LIMIT = 2_000_000


def _jaccard_pairs(postings: DataFrame) -> DataFrame:
    """Pair intersection counts from a shingle posting-list table."""
    from ..functions.pairs import ordered_id_pairs

    return (
        postings.select(
            F.explode(ordered_id_pairs("ids", "doc_a", "doc_b")).alias("p")
        )
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )


def _pair_profile(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Shared candidate-pair profile for the shingle-overlap family:
    one row per unordered doc pair sharing >= 1 live shingle, with
    ``(doc_a, doc_b, inter, na, nb)`` — intersection size and both
    docs' distinct-shingle counts. Jaccard (resemblance) and
    containment scores are both pure arithmetic over these three
    integers, so the expensive shingle self-join runs once for the
    whole family.
    """
    if docs is None:
        # small-file scans arrive as ONE partition — spread the
        # CPU-heavy shingling across cores before exploding (no-op
        # once the scan is already many partitions)
        docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = F.split(F.trim(F.col("text")), " ")
    # shingle keys via the hashed-gram scheme (functions/text.py
    # hashed_grams): 64-bit keys from a materialized token-hash
    # array, checkpointed before the explode (InferFiltersFromGenerate
    # would otherwise re-evaluate the whole tree under the Generate).
    # Every downstream stage needs shingle EQUALITY only, and the
    # oracle computes intersection/union counts on raw shingle text —
    # count-shaped outputs are insensitive to the key representation.
    th = docs.select("doc_id", token_hashes(toks).alias("__th"))
    gs = stable_checkpoint(
        th.select("doc_id", hashed_grams(F.col("__th"), 3).alias("__gs"))
    )
    sh = gs.select("doc_id", F.explode("__gs").alias("sh"))
    # One groupBy on the shingle replaces the per-doc distinct, the
    # df-filter join AND the shingle self-join: per shingle, a sorted
    # SET posting list (collect_set dedups within-doc repeats) → local
    # pair generation (df*(df-1)/2 pairs, bounded by the stop-shingle
    # cutoff) → one groupBy on the pair. Two shuffles total instead of
    # five, and no join of two exploded sides.
    postings = (
        sh.groupBy("sh")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .filter(F.size("ids") <= _MAX_SHINGLE_DF)
    )
    # counts is |docs|-sized — its cardinality grows with the corpus,
    # so the broadcast hint is GATED on a measured bound (a forced
    # hint never falls back and would OOM at 100 TB; but below the
    # bound, broadcasting keeps the much larger pairs side unshuffled
    # through both enrichment joins — 28s → 9s at sf1.0). The gate is
    # a parquet count-star (metadata-cheap). Above the bound: no
    # hints, and the postings subtree is checkpointed so the three
    # consumers (pairs, na, nb) share ONE shingle pass instead of
    # rebuilding it per branch (exchange reuse does not survive the
    # AQE re-planning of the two shuffle joins).
    small = docs.count() <= _BROADCAST_DOC_LIMIT
    if not small:

        postings = stable_checkpoint(postings)
    pairs = _jaccard_pairs(postings)
    # counts derived from the SAME postings subtree (not from sh) so
    # the aggregation exchange (or the checkpointed blocks) is shared
    # instead of re-scanning and re-shingling the corpus per branch
    counts = (
        postings.select(F.explode("ids").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_sh"))
    )
    hint = F.broadcast if small else (lambda d: d)
    na = counts.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    nb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return pairs.join(hint(na), "doc_a").join(hint(nb), "doc_b")


def q_near_dup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by exact word-3-shingle Jaccard.

    explode distinct shingles → stop-shingle removal (doc-frequency
    cutoff; the skew guard that keeps the self-join from exploding on
    hot shingles at scale) → shingle-key self-join (doc_a < doc_b) →
    intersection counts → Jaccard filter. This is the exact oracle
    baseline; the MinHash-LSH scale path is operators/dedup.py.
    """
    return (
        _pair_profile(spark, sf_dir)
        .withColumn("un", (F.col("na") + F.col("nb") - F.col("inter")).cast("bigint"))
        .withColumn("jaccard", F.col("inter").cast("double") / F.col("un"))
        .filter(F.col("jaccard") >= _JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "inter", "un", "jaccard")
    )


_CONTAIN_THRESHOLD = 0.9


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'contain' variant: shingle containment — ``inter /
    min(na, nb)`` (Broder's containment of the smaller document in
    the larger). Catches quote/excerpt/boilerplate-wrapper relations
    that resemblance misses: a 100-token doc pasted verbatim inside a
    10000-token doc has Jaccard ~0.01 but containment 1.0. Same
    profile subtree, pure arithmetic on (inter, na, nb)."""
    mn = F.least("na", "nb").cast("bigint")
    return (
        _pair_profile(spark, sf_dir)
        .withColumn("denom", mn)
        .withColumn("score", F.col("inter").cast("double") / F.col("denom"))
        .filter(F.col("score") >= _CONTAIN_THRESHOLD)
        .select("doc_a", "doc_b", "inter", "denom", "score")
    )


def q_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard + containment in one union-tagged entry (driver cap:
    the correctness gate records at most 50 registry entries).
    Both scores are computed in ONE pass over the shared pair
    profile: per candidate pair an array of (variant, denom, score)
    structs is filtered to the qualifying variants and exploded — the
    shingle self-join is never evaluated twice. variant 'jaccard':
    see q_near_dup_jaccard; variant 'contain': see
    q_containment_pairs.

    Shared-subframe discipline (r12, VERDICT r11 Next #3): the union's
    eight variants read the same corpus — the documents frame is
    loaded/spread/persisted ONCE (shingle profile + mhp + shp), and
    the synthetic signature table is checkpointed ONCE for the four
    signature variants (hbp, hbpc, hbaudit, admit) instead of each
    re-deriving the md5 signature expressions from a fresh scan."""
    from pyspark import StorageLevel

    shared_docs = spread(
        load_table(spark, sf_dir, "documents"), "doc_id"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    prof = _pair_profile(spark, sf_dir, docs=shared_docs)
    inter_d = F.col("inter").cast("double")
    un = (F.col("na") + F.col("nb") - F.col("inter")).cast("bigint")
    mn = F.least("na", "nb").cast("bigint")
    entries = F.array(
        F.struct(
            F.lit("jaccard").alias("variant"),
            un.alias("denom"),
            (inter_d / un).alias("score"),
            F.lit(_JACCARD_THRESHOLD).alias("thr"),
        ),
        F.struct(
            F.lit("contain").alias("variant"),
            mn.alias("denom"),
            (inter_d / mn).alias("score"),
            F.lit(_CONTAIN_THRESHOLD).alias("thr"),
        ),
    )
    qual = F.filter(entries, lambda s: s["score"] >= s["thr"])
    shingle = prof.select(
        "doc_a", "doc_b", "inter", F.explode(qual).alias("e")
    ).select(
        F.col("e.variant").alias("variant"),
        "doc_a",
        "doc_b",
        "inter",
        F.col("e.denom").alias("denom"),
        F.col("e.score").alias("score"),
    )
    # synthetic-signature twins of the Hamming-banded pairing plan
    # (queries/signatures.py) — the scale-critical perceptual-dedup
    # machinery hash-checked on SQL-derivable int64 signatures
    from .signatures import (
        q_admission_synth,
        q_hbp_chunked_synth,
        q_hbp_synth,
        q_hot_band_audit_synth,
        q_minhash_portable,
        q_simhash_portable,
        synthetic_signatures,
    )

    shared_sigs = stable_checkpoint(synthetic_signatures(spark, sf_dir))

    def _tag(name: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(name).alias("variant"),
            "doc_a",
            "doc_b",
            "inter",
            "denom",
            "score",
        )

    return (
        shingle.unionByName(
            _tag("hbp", q_hbp_synth(spark, sf_dir, sigs=shared_sigs))
        )
        .unionByName(
            _tag("hbpc", q_hbp_chunked_synth(spark, sf_dir, sigs=shared_sigs))
        )
        .unionByName(
            _tag(
                "hbaudit",
                q_hot_band_audit_synth(spark, sf_dir, sigs=shared_sigs),
            )
        )
        .unionByName(
            _tag("admit", q_admission_synth(spark, sf_dir, sigs=shared_sigs))
        )
        .unionByName(
            _tag("mhp", q_minhash_portable(spark, sf_dir, docs=shared_docs))
        )
        .unionByName(
            _tag("shp", q_simhash_portable(spark, sf_dir, docs=shared_docs))
        )
    )


_JACCARD_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents
), sh AS (
  SELECT DISTINCT doc_id, sh FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t) - 1),
                                 i -> array_to_string(t[i:i+2], ' '))) AS sh
    FROM toks WHERE len(t) >= 3)
), ok_sh AS (
  SELECT sh FROM sh GROUP BY sh HAVING count(*) <= {_MAX_SHINGLE_DF}
), shf AS (
  SELECT s.doc_id, s.sh FROM sh s JOIN ok_sh USING (sh)
), counts AS (
  SELECT doc_id, count(*) AS n_sh FROM shf GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM shf a JOIN shf b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, inter,
       CAST(na.n_sh + nb.n_sh - inter AS BIGINT) AS un,
       CAST(inter AS DOUBLE) / (na.n_sh + nb.n_sh - inter) AS jaccard
FROM pairs
JOIN counts na ON doc_a = na.doc_id
JOIN counts nb ON doc_b = nb.doc_id
WHERE CAST(inter AS DOUBLE) / (na.n_sh + nb.n_sh - inter) >= {_JACCARD_THRESHOLD}
"""


_PAIR_PROFILE_SQL = f"""
WITH ptoks AS (
  SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents
), psh AS (
  SELECT DISTINCT doc_id, sh FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t) - 1),
                                 i -> array_to_string(t[i:i+2], ' '))) AS sh
    FROM ptoks WHERE len(t) >= 3)
), pok_sh AS (
  SELECT sh FROM psh GROUP BY sh HAVING count(*) <= {_MAX_SHINGLE_DF}
), pshf AS (
  SELECT s.doc_id, s.sh FROM psh s JOIN pok_sh USING (sh)
), pcounts AS (
  SELECT doc_id, count(*) AS n_sh FROM pshf GROUP BY doc_id
), ppairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM pshf a JOIN pshf b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, inter, na.n_sh AS na, nb.n_sh AS nb
FROM ppairs
JOIN pcounts na ON doc_a = na.doc_id
JOIN pcounts nb ON doc_b = nb.doc_id
"""

def _near_dup_pairs_sql() -> str:
    from .signatures import (
        admission_synth_sql,
        hbp_synth_sql,
        hot_band_audit_sql,
        minhash_portable_sql,
        simhash_portable_sql,
    )

    return f"""
WITH prof AS ({_PAIR_PROFILE_SQL}
), hbtwin AS ({hbp_synth_sql()})
SELECT 'jaccard' AS variant, doc_a, doc_b, inter,
       CAST(na + nb - inter AS BIGINT) AS denom,
       CAST(inter AS DOUBLE) / (na + nb - inter) AS score
FROM prof
WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= {_JACCARD_THRESHOLD}
UNION ALL
SELECT 'contain' AS variant, doc_a, doc_b, inter,
       CAST(least(na, nb) AS BIGINT) AS denom,
       CAST(inter AS DOUBLE) / least(na, nb) AS score
FROM prof
WHERE CAST(inter AS DOUBLE) / least(na, nb) >= {_CONTAIN_THRESHOLD}
UNION ALL
SELECT 'hbp' AS variant, * FROM hbtwin
UNION ALL
-- chunked-expansion invariance: max_bucket must not change the pair
-- set, so 'hbpc' selects the SAME hoisted brute-force twin (one
-- named CTE, computed once per gate run — ADVICE r8)
SELECT 'hbpc' AS variant, * FROM hbtwin
UNION ALL
SELECT 'hbaudit' AS variant, * FROM ({hot_band_audit_sql()})
UNION ALL
SELECT 'admit' AS variant, * FROM ({admission_synth_sql()})
UNION ALL
SELECT 'mhp' AS variant, * FROM ({minhash_portable_sql()})
UNION ALL
SELECT 'shp' AS variant, * FROM ({simhash_portable_sql()})
"""


_NEAR_DUP_PAIRS_SQL = _near_dup_pairs_sql()


QUERIES: dict[str, Q] = {
    "dedup_exact": Q(
        q_dedup_exact_merged,
        _DEDUP_EXACT_MERGED_SQL,
        variants={
            "incr": q_dedup_incremental,
            "url": q_url_dedup,
            "frontier": q_crawl_frontier,
        },
    ),
    "text_metrics": Q(q_text_metrics, _TEXT_METRICS_SQL),
    "near_dup_jaccard": Q(
        q_near_dup_pairs,
        _NEAR_DUP_PAIRS_SQL,
        variants={
            "jaccard": q_near_dup_jaccard,
            "contain": q_containment_pairs,
            "hbp": _sig_queries.q_hbp_synth,
            "hbpc": _sig_queries.q_hbp_chunked_synth,
            "hbaudit": _sig_queries.q_hot_band_audit_synth,
            "admit": _sig_queries.q_admission_synth,
            "mhp": _sig_queries.q_minhash_portable,
            "shp": _sig_queries.q_simhash_portable,
        },
    ),
}


_TFIDF_TOP = 5


def _source_token_counts(docs: DataFrame) -> DataFrame:
    """(source, token, tf) — per-(source, token) whitespace-token
    occurrence counts. The shared base of the 'tfidf' score table and
    the 'drift' ppm distributions (r12, guide §2.4): both variants
    need exactly this aggregate, so the merged entry tokenizes the
    corpus once for the pair instead of once per variant."""
    tok = docs.select(
        "source", F.explode(F.split(F.trim(F.col("text")), " ")).alias("token")
    )
    return tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).alias("tf")
    )


def q_tfidf_terms(
    spark: SparkSession,
    sf_dir: str,
    docs: DataFrame | None = None,
    tf_src: DataFrame | None = None,
) -> DataFrame:
    """Top-5 characteristic terms per source by a rational tf-idf.

    idf is the exact ratio N/df (no log — libm rounding differs
    across engines; the ranking semantics are identical), score =
    tf*N/df as one integer product and one double division, so both
    engines produce bit-identical scores. ``tf_src`` lets the merged
    entry pass one checkpointed :func:`_source_token_counts` shared
    with the 'drift' variant.
    """
    if docs is None:
        docs = spread(
            load_table(spark, sf_dir, "documents"), "doc_id"
        )
    tf = tf_src if tf_src is not None else _source_token_counts(docs)
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    # one-row source count cross-joined lazily (mirrors the oracle's
    # CROSS JOIN n) — no eager .count() action while building the plan
    n_src = docs.agg(F.countDistinct("source").alias("__n_sources"))
    # df_ is vocabulary-sized (grows with the corpus) — the broadcast
    # hint is gated on the same measured doc-count bound as the
    # Jaccard enrichment joins: below it, broadcasting df_ keeps the
    # larger tf side unshuffled through the join; above it, no hint
    # (AQE may still convert) and tf is checkpointed so the corpus is
    # tokenized once, not once per branch (tf feeds both the join and
    # the df_ aggregate). n_src is a single row: always safe to hint.
    small = docs.count() <= _BROADCAST_DOC_LIMIT
    if not small and tf_src is None:
        tf = stable_checkpoint(tf)
        df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    hint = F.broadcast if small else (lambda d: d)
    scored = (
        tf.join(hint(df_), "token")
        .crossJoin(F.broadcast(n_src))
        .withColumn(
            "score",
            (F.col("tf") * F.col("__n_sources")).cast("double") / F.col("df"),
        )
    )
    from ..operators.topk import topk_per_group

    top = topk_per_group(
        scored, ["source"], [F.desc("score"), F.asc("token")], _TFIDF_TOP,
        rank_col="rank",
    )
    return top.select(
        "source", "token", F.col("rank").cast("bigint").alias("rank"), "score"
    )


_TFIDF_SQL = f"""
WITH tok AS (
  SELECT source, unnest(string_split(trim(text), ' ')) AS token FROM documents
), tf AS (
  SELECT source, token, count(*) AS tf FROM tok GROUP BY 1, 2
), df AS (
  SELECT token, count(*) AS df FROM tf GROUP BY 1
), n AS (
  SELECT count(DISTINCT source) AS n_sources FROM documents
), scored AS (
  SELECT tf.source, tf.token,
         CAST(tf.tf * n.n_sources AS DOUBLE) / df.df AS score
  FROM tf JOIN df USING (token) CROSS JOIN n
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY source
                               ORDER BY score DESC, token ASC) AS rank
  FROM scored
)
SELECT source, token, CAST(rank AS BIGINT) AS rank, score
FROM ranked WHERE rank <= {_TFIDF_TOP}
"""


# --- BM25 retrieval (Robertson & Spärck Jones; the Okapi ranking
# function every search stack ships). k1=1.2, b=0.75 — the standard
# constants — but carried as RATIONALS so the score is one exact
# integer-product ratio and both engines emit bit-identical doubles:
#
#   idf        = (N - df + ½)/(df + ½)        = (2N-2df+1)/(2df+1)
#   tf-part    = tf(k1+1)/(tf + k1(1-b+b·dl/avgdl))
#              = 22·tl·tf / (10·tl·tf + 3·tl + 9·dl·N)   [×10·tl]
#   score      = idf · tf-part   (one double division at the end)
#
# (avgdl = tl/N folds in exactly; no log-idf — libm rounding differs
# across engines and the ranking semantics are identical, the same
# trade the tf-idf entry makes.) Product bound: 22·tl·tf with tl the
# corpus token count and tf ≤ dl — overflows int64 only past ~4·10¹⁷
# token-occurrences, i.e. not at 100 TB of text.
_BM25_QUERIES: dict[str, list[str]] = {
    "q1": ["table", "scan", "fast"],
    "q2": ["join", "key", "hash"],
    "q3": ["window", "sort", "order"],
}
_BM25_TOP = 5


def _bm25_query_terms(spark: SparkSession) -> DataFrame:
    """Unique (query_id, term) rows of the fixed serving batch — the
    inverted-index parity contract (operators/inverted_index.py::
    query_inverted_index)."""
    return spark.createDataFrame(
        [
            (qid, t)
            for qid, terms in _BM25_QUERIES.items()
            for t in sorted(set(terms))
        ],
        "query_id string, term string",
    )


def _bm25_tf(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """(query_id, term, doc_id, dl, tf) — the per-(query, term, doc)
    term frequencies the whole BM25 family hangs off. The broadcast
    query-term join filters the corpus token stream map-side before
    the tf aggregation — the only corpus-sized shuffle (guide §2.3).
    Shared by the ranking (dfq + scored) and the 'releval' relevance
    labels, so the tokenize→join→aggregate subtree is built ONCE per
    entry (r12, guide §2.4 — before, 'bm25', 'hybrid' and 'releval'
    each re-derived it from raw text)."""
    ws = F.split(F.trim(F.col("text")), " ")
    toks = docs.select(
        "doc_id", F.size(ws).cast("bigint").alias("dl"),
        F.explode(ws).alias("token"),
    )
    qt = _bm25_query_terms(spark)
    return (
        toks.join(F.broadcast(qt), toks.token == qt.term)
        .groupBy("query_id", "term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def _bm25_ranked(
    spark: SparkSession,
    sf_dir: str,
    docs: DataFrame | None = None,
    tf: DataFrame | None = None,
) -> DataFrame:
    """Top-{k} (query_id, doc_id, rank, score) under exact-rational
    Okapi BM25 — shared by the 'bm25' and 'hybrid' variants.

    Scale shape: the query-term table is tiny and broadcast, so the
    corpus token stream filters map-side before the (query, term,
    doc) tf aggregation — the only corpus-sized shuffle.  df and the
    (N, tl) corpus stats are bounded aggregates (≤ n_query_terms rows
    and 1 row).  Per-doc term scores fold in ascending sorted order
    with an explicit 3-term unroll, so float addition order is pinned
    cross-engine.  The final ranking uses the two-phase top-k
    (operators/topk.py) — 3 query groups never funnel the corpus into
    3 window tasks. ``tf`` lets the merged entry pass one checkpointed
    :func:`_bm25_tf` shared with 'releval'."""
    from ..operators.topk import topk_per_group_staged

    if docs is None:
        docs = spread(
            load_table(spark, sf_dir, "documents"), "doc_id"
        )
    ws = F.split(F.trim(F.col("text")), " ")
    stats = docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(ws)).cast("bigint").alias("tl"),
    )
    if tf is None:
        # tf feeds two branches (dfq + scored): checkpoint so the
        # tokenize→join→aggregate subtree materializes once even when
        # this runs standalone (AQE re-planning breaks exchange reuse)
        tf = stable_checkpoint(_bm25_tf(spark, docs))
    dfq = tf.groupBy("query_id", "term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    n, tl, dfc, tfc, dl = (
        F.col("n_docs"), F.col("tl"), F.col("df"), F.col("tf"), F.col("dl")
    )
    term_score = (
        ((2 * n - 2 * dfc + 1) * 22 * tl * tfc).cast("double")
        / ((2 * dfc + 1) * (10 * tl * tfc + 3 * tl + 9 * dl * n))
    )
    scored = (
        tf.join(F.broadcast(dfq), ["query_id", "term"])
        .crossJoin(F.broadcast(stats))
        .select("query_id", "doc_id", term_score.alias("s"))
    )
    per_doc = (
        scored.groupBy("query_id", "doc_id")
        .agg(F.array_sort(F.collect_list("s")).alias("__ss"))
        .select(
            "query_id",
            "doc_id",
            (
                F.coalesce(F.try_element_at("__ss", F.lit(1)), F.lit(0.0))
                + F.coalesce(F.try_element_at("__ss", F.lit(2)), F.lit(0.0))
                + F.coalesce(F.try_element_at("__ss", F.lit(3)), F.lit(0.0))
            ).alias("score"),
        )
    )
    return topk_per_group_staged(
        per_doc,
        ["query_id"],
        [F.desc("score"), F.asc("doc_id")],
        _BM25_TOP,
        rank_col="rank",
    )


def q_bm25_topk(
    spark: SparkSession,
    sf_dir: str,
    docs: DataFrame | None = None,
    ranked: DataFrame | None = None,
) -> DataFrame:
    """'bm25' variant: see :func:`_bm25_ranked`. ``ranked`` lets the
    merged entry share ONE checkpointed ranking with 'hybrid' and
    'releval' instead of re-running the BM25 pipeline per variant."""
    if ranked is None:
        ranked = _bm25_ranked(spark, sf_dir, docs=docs)
    return ranked.select(
        F.lit("bm25").alias("variant"),
        F.col("query_id").alias("source"),
        F.col("doc_id").cast("string").alias("token"),
        F.col("rank").cast("bigint").alias("rank"),
        "score",
    )


def q_bm25_index_topk(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """'bm25_index' variant: the SAME retrieval served from a persisted
    inverted index (operators/inverted_index.py) — build into a fresh
    temp dir, then query through the bucket-pruned postings scan.  The
    driver hash pins that index-backed BM25 is bit-identical to the
    from-raw ranking (same oracle SQL, different variant tag)."""
    from ..operators.inverted_index import (
        build_inverted_index,
        query_inverted_index,
    )
    from ..session import scratch_dir

    # deterministic per-session state, overwritten each invocation
    # (mkdtemp here leaked one orphan dir per bench run — ADVICE r5);
    # the returned frame reads the index lazily, so the dir must
    # outlive this call
    path = scratch_dir(spark, "inv_index") + "/inv"
    if docs is None:
        docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    build_inverted_index(docs, path)
    top = query_inverted_index(spark, path, _BM25_QUERIES, k=_BM25_TOP)
    return top.select(
        F.lit("bm25_index").alias("variant"),
        F.col("query_id").alias("source"),
        F.col("doc_id").cast("string").alias("token"),
        F.col("rank").cast("bigint").alias("rank"),
        F.col("score").alias("score"),
    )


_REL_MIN_TERMS = 2
_PPM = 1_000_000


def q_retrieval_eval(
    spark: SparkSession,
    sf_dir: str,
    docs: DataFrame | None = None,
    ranked: DataFrame | None = None,
    tf: DataFrame | None = None,
) -> DataFrame:
    """'releval' variant: retrieval-quality evaluation of the BM25
    ranking — MRR, precision@k and recall@k in exact ppm integers
    (the eval harness a retrieval pipeline ships with).

    Relevance labels are deterministic and engine-portable: a doc is
    relevant to a query iff it contains >= _REL_MIN_TERMS of the
    query's distinct terms as whitespace tokens (derived from the same
    token/term join the ranking uses). Metrics are integer `div`
    arithmetic over the bit-exact top-_BM25_TOP ranking, so the driver
    hash pins the ENTIRE retrieval+eval path end to end.

    The labels now derive from :func:`_bm25_tf` (r12, guide §2.4): tf
    holds exactly one row per (query_id, term, doc_id) with the term
    present, so ``countDistinct(term)`` over it equals the old
    token⋈term re-join — one corpus pass for ranking AND labels
    instead of two. ``ranked``/``tf`` let the merged entry share its
    checkpointed frames across 'bm25', 'hybrid' and this variant."""
    if docs is None:
        docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    if tf is None:
        tf = stable_checkpoint(_bm25_tf(spark, docs))
    if ranked is None:
        ranked = _bm25_ranked(spark, sf_dir, docs=docs, tf=tf)
    qt = _bm25_query_terms(spark)
    rel = (
        tf.groupBy("query_id", "doc_id")
        .agg(F.countDistinct("term").alias("__nt"))
        .filter(F.col("__nt") >= _REL_MIN_TERMS)
        .select("query_id", "doc_id")
    )
    n_rel = rel.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rel")
    )
    j = ranked.join(
        rel.withColumn("__rel", F.lit(True)), ["query_id", "doc_id"], "left"
    )
    agg = j.groupBy("query_id").agg(
        F.min(F.when(F.col("__rel"), F.col("rank"))).alias("fr"),
        F.count(F.when(F.col("__rel"), F.lit(1)))
        .cast("bigint")
        .alias("hits"),
    )
    qids = qt.select("query_id").distinct()
    full = (
        qids.join(agg, "query_id", "left")
        .join(n_rel, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("hits", F.lit(0)).alias("hits"),
            F.coalesce("n_rel", F.lit(0)).alias("n_rel"),
            "fr",
        )
        .withColumn(
            "mrr_ppm",
            F.when(
                F.col("fr").isNotNull(), F.expr(f"{_PPM} div fr")
            ).otherwise(F.lit(0)).cast("bigint"),
        )
        .withColumn(
            "p_at_k_ppm",
            F.expr(f"({_PPM} * hits) div {_BM25_TOP}").cast("bigint"),
        )
        .withColumn(
            "recall_at_k_ppm",
            F.when(
                F.col("n_rel") > 0, F.expr(f"({_PPM} * hits) div n_rel")
            ).otherwise(F.lit(0)).cast("bigint"),
        )
    )
    metrics = full.select(
        "query_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(nm).alias("m"),
                        F.col(c).cast("double").alias("v"),
                    )
                    for nm, c in [
                        ("mrr_ppm", "mrr_ppm"),
                        ("p_at_k_ppm", "p_at_k_ppm"),
                        ("recall_at_k_ppm", "recall_at_k_ppm"),
                        ("n_rel", "n_rel"),
                    ]
                ]
            )
        ).alias("e"),
    )
    return metrics.select(
        F.lit("releval").alias("variant"),
        F.col("query_id").alias("source"),
        F.col("e.m").alias("token"),
        F.lit(None).cast("bigint").alias("rank"),
        F.col("e.v").alias("score"),
    )


def q_bm25_index_build(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Bench-only 'bm25_index_build' slot (VERDICT r6 #2 split): the
    persisted-index BUILD alone — wipe, tokenize, bucket, write —
    returning the one-row index meta so the timing covers exactly the
    build side. Not a driver entry; the parity proof stays the
    combined 'bm25_index' variant."""
    from ..operators.inverted_index import build_inverted_index
    from ..session import scratch_dir

    path = scratch_dir(spark, "inv_index") + "/inv"
    if docs is None:
        docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    build_inverted_index(docs, path)
    return spark.read.parquet(f"{path}/meta")


def q_bm25_index_serve(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Bench-only 'bm25_index_serve' slot: query the index the build
    twin left behind (building once if absent — the bench's best-of-N
    then times the pure serve path on later passes). Completion is
    gated on the ``_BUILT`` sentinel build_inverted_index writes LAST
    — meta alone is written first and can survive an interrupted
    build (ADVICE r7)."""
    from ..operators.inverted_index import (
        build_inverted_index,
        query_inverted_index,
    )
    from ..session import scratch_path

    path = scratch_path(spark, "inv_index") + "/inv"
    import os as _os

    if not _os.path.exists(f"{path}/_BUILT"):
        if docs is None:
            docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
        build_inverted_index(docs, path)
    top = query_inverted_index(spark, path, _BM25_QUERIES, k=_BM25_TOP)
    return top.select(
        F.lit("bm25_index").alias("variant"),
        F.col("query_id").alias("source"),
        F.col("doc_id").cast("string").alias("token"),
        F.col("rank").cast("bigint").alias("rank"),
        F.col("score").alias("score"),
    )


def q_hybrid_rerank(
    spark: SparkSession,
    sf_dir: str,
    docs: DataFrame | None = None,
    ranked: DataFrame | None = None,
) -> DataFrame:
    """'hybrid' variant: lexical-then-semantic retrieval — BM25
    candidates re-ranked by embedding cosine to the BM25 rank-1 doc
    (pseudo-relevance feedback: the top lexical hit stands in for the
    query's embedding, the shape of a production BM25→bi-encoder
    rerank stack where only the rerank model changes).

    Scale shape: the candidate set is ≤ queries×k rows, so the
    candidate/anchor pair table BROADCASTS against the exploded
    embedding stream — the corpus-sized side filters map-side, then a
    bounded (query, cand, anchor) dot aggregation.  Cosines use the
    exact decimal-dot contract (queries/similarity.py) so both
    engines emit bit-identical scores.  Candidates without an
    embedding row drop out (inner join), documented rerank semantics.
    """
    from ..operators.topk import topk_per_group

    # one corpus pass: the ranked result is ≤ queries×k rows —
    # checkpoint it so the candidate and anchor branches both read the
    # materialized list instead of re-running the BM25 pipeline; the
    # merged entry passes its shared (already checkpointed) ranking
    if ranked is None:
        ranked = stable_checkpoint(_bm25_ranked(spark, sf_dir, docs=docs))
    cands = ranked.select("query_id", "doc_id")
    anchors = ranked.filter(F.col("rank") == 1).select(
        "query_id", F.col("doc_id").alias("anchor_id")
    )
    pairs = cands.join(anchors, "query_id")
    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    el = emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "x")
    ).select("vec_id", "i", F.col("x").cast("decimal(18,9)").alias("xd"))
    norms = el.groupBy("vec_id").agg(
        F.sum(F.col("xd") * F.col("xd")).cast("double").alias("n2")
    )
    cand_el = el.join(
        F.broadcast(pairs), el.vec_id == pairs.doc_id
    ).select("query_id", "doc_id", "anchor_id", "i", F.col("xd").alias("xc"))
    dots = (
        el.alias("a")
        .join(
            F.broadcast(cand_el).alias("c"),
            (F.col("a.vec_id") == F.col("c.anchor_id"))
            & (F.col("a.i") == F.col("c.i")),
        )
        .groupBy("query_id", "doc_id", "anchor_id")
        .agg(F.sum(F.col("c.xc") * F.col("a.xd")).cast("double").alias("dot"))
    )
    scored = (
        dots.join(
            norms.select(
                F.col("vec_id").alias("doc_id"), F.col("n2").alias("c_n2")
            ),
            "doc_id",
        )
        .join(
            norms.select(
                F.col("vec_id").alias("anchor_id"), F.col("n2").alias("a_n2")
            ),
            "anchor_id",
        )
        .withColumn(
            "cosine",
            F.col("dot") / (F.sqrt("c_n2") * F.sqrt("a_n2")),
        )
    )
    top = topk_per_group(
        scored,
        ["query_id"],
        [F.desc("cosine"), F.asc("doc_id")],
        _BM25_TOP,
        rank_col="rank",
    )
    return top.select(
        F.lit("hybrid").alias("variant"),
        F.col("query_id").alias("source"),
        F.col("doc_id").cast("string").alias("token"),
        F.col("rank").cast("bigint").alias("rank"),
        F.col("cosine").alias("score"),
    )


_PMI_MIN_COUNT = 5
_PMI_TOP = 25
_PMI_SCALE = 10**9


def q_collocations(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """'pmi' variant: collocation mining by integer-scaled lift
    (operators/collocations.py) — top-{top} adjacent token pairs with
    support >= {mc}, rank-equivalent to PMI at fixed corpus; bigrams
    form map-side inside the token array (no positional self-join).
    Column mapping: source = left token, token = right token,
    rank = the support count c_xy, score = the scaled lift."""
    from ..operators.collocations import bigram_lift

    if docs is None:
        docs = spread(
            load_table(spark, sf_dir, "documents"), "doc_id"
        )
    lifted = bigram_lift(
        docs, min_count=_PMI_MIN_COUNT, scale=_PMI_SCALE
    )
    top = lifted.orderBy(
        F.col("lift").desc(), F.col("left").asc(), F.col("right").asc()
    ).limit(_PMI_TOP)
    return top.select(
        F.lit("pmi").alias("variant"),
        F.col("left").alias("source"),
        F.col("right").alias("token"),
        F.col("c_xy").cast("bigint").alias("rank"),
        F.col("lift").cast("double").alias("score"),
    )


def q_source_drift(
    spark: SparkSession,
    sf_dir: str,
    docs: DataFrame | None = None,
    tf_src: DataFrame | None = None,
) -> DataFrame:
    """'drift' variant: pairwise corpus drift between sources
    (operators/drift.py) — token distributions quantized to integer
    ppm, exact L1 distance over the dense shared-vocabulary grid
    (2e6 x total-variation, up to quantization). Column mapping:
    source/token = the slice pair, rank = tokens whose quantized
    share differs, score = the integer L1 ppm distance. ``tf_src``
    lets the merged entry pass one checkpointed
    :func:`_source_token_counts` shared with the 'tfidf' variant."""
    from ..operators.drift import l1_drift, token_ppm_from_counts

    if docs is None:
        docs = spread(
            load_table(spark, sf_dir, "documents"), "doc_id"
        )
    if tf_src is None:
        tf_src = _source_token_counts(docs)
    out = l1_drift(
        token_ppm_from_counts(tf_src, "source", "token", "tf"),
        "source",
        "token",
    )
    return out.select(
        F.lit("drift").alias("variant"),
        F.col("grp_a").alias("source"),
        F.col("grp_b").alias("token"),
        F.col("n_diff").cast("bigint").alias("rank"),
        F.col("l1_ppm").cast("double").alias("score"),
    )


_PMI_SQL = f"""
WITH pt AS (
  SELECT string_split(trim(text), ' ') AS t FROM documents
), puc AS (
  SELECT tok, count(*) AS c FROM (SELECT unnest(t) AS tok FROM pt)
  GROUP BY tok
), pbc AS (
  SELECT l, r, count(*) AS c_xy FROM (
    SELECT t[i] AS l, t[i + 1] AS r
    FROM (SELECT t, unnest(range(1, len(t))) AS i FROM pt
          WHERE len(t) >= 2))
  GROUP BY 1, 2 HAVING count(*) >= {_PMI_MIN_COUNT}
)
SELECT 'pmi' AS variant, l AS source, r AS token,
       CAST(c_xy AS BIGINT) AS rank,
       CAST((c_xy * CAST({_PMI_SCALE} AS BIGINT)) // (cx.c * cy.c)
            AS DOUBLE) AS score
FROM pbc JOIN puc cx ON cx.tok = l JOIN puc cy ON cy.tok = r
ORDER BY score DESC, l ASC, r ASC LIMIT {_PMI_TOP}
"""

_DRIFT_SQL = """
WITH dtok AS (
  SELECT source, unnest(string_split(trim(text), ' ')) AS token
  FROM documents
), dtf AS (
  SELECT source, token, count(*) AS c FROM dtok GROUP BY 1, 2
), dtot AS (
  SELECT source, count(*) AS n FROM dtok GROUP BY 1
), dppm AS (
  SELECT tf.source, tf.token, (tf.c * 1000000) // t.n AS q
  FROM dtf tf JOIN dtot t ON tf.source = t.source
), dgrid AS (
  SELECT g.source, v.token, coalesce(p.q, 0) AS q
  FROM (SELECT DISTINCT token FROM dppm) v
  CROSS JOIN (SELECT DISTINCT source FROM dppm) g
  LEFT JOIN dppm p ON p.source = g.source AND p.token = v.token
)
SELECT 'drift' AS variant, a.source AS source, b.source AS token,
       CAST(count(CASE WHEN a.q <> b.q THEN 1 END) AS BIGINT) AS rank,
       CAST(sum(abs(a.q - b.q)) AS DOUBLE) AS score
FROM dgrid a JOIN dgrid b ON a.token = b.token AND a.source < b.source
GROUP BY 1, 2, 3
"""


def q_tfidf_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-idf characteristic terms + BM25 retrieval + hybrid rerank +
    index-served BM25 in one union-tagged entry (driver cap). variant
    'tfidf': q_tfidf_terms — source/token literal. variant 'bm25':
    q_bm25_topk — source = query id, token = retrieved doc_id. variant
    'hybrid': q_hybrid_rerank — same grain, score = anchor cosine.
    variant 'bm25_index': q_bm25_index_topk — BM25 served from the
    persisted inverted index, must hash-match the from-raw scores (the
    generic-column union-tagging convention, README §union-tagging).
    variant 'pmi': q_collocations. variant 'drift': q_source_drift.
    variant 'releval': q_retrieval_eval — MRR/precision/recall of the
    BM25 ranking against deterministic term-containment labels.

    Shared-subframe discipline (VERDICT r5 + r11 Next #1): all seven
    variants tokenize the same documents frame — load and persist it
    ONCE for the union (no unpersist: the result is lazy and the
    cache is small + LRU-evictable). On top of that (r12, guide
    §2.4/§2.6) the entry checkpoints THREE shared subtrees so each is
    computed once, not once per consuming variant:

    - ``tf_bm25`` (:func:`_bm25_tf`) — consumed by the ranking's dfq +
      scored branches AND 'releval''s relevance labels;
    - ``ranked`` (:func:`_bm25_ranked`) — consumed by 'bm25',
      'hybrid' (candidates + anchors) and 'releval' (the eval join),
      which previously re-ran the full BM25 pipeline each;
    - ``tf_src`` (:func:`_source_token_counts`) — consumed by 'tfidf'
      (tf→df_ and the score join) and 'drift' (ppm distributions).
    """
    from pyspark import StorageLevel

    shared_docs = spread(
        load_table(spark, sf_dir, "documents"), "doc_id"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    tf_bm25 = stable_checkpoint(_bm25_tf(spark, shared_docs))
    ranked = stable_checkpoint(
        _bm25_ranked(spark, sf_dir, docs=shared_docs, tf=tf_bm25)
    )
    tf_src = stable_checkpoint(_source_token_counts(shared_docs))
    t = q_tfidf_terms(
        spark, sf_dir, docs=shared_docs, tf_src=tf_src
    ).select(
        F.lit("tfidf").alias("variant"), "source", "token", "rank", "score"
    )
    return (
        t.unionByName(
            q_bm25_topk(spark, sf_dir, docs=shared_docs, ranked=ranked)
        )
        .unionByName(
            q_hybrid_rerank(spark, sf_dir, docs=shared_docs, ranked=ranked)
        )
        .unionByName(q_bm25_index_topk(spark, sf_dir, docs=shared_docs))
        .unionByName(q_collocations(spark, sf_dir, docs=shared_docs))
        .unionByName(
            q_source_drift(spark, sf_dir, docs=shared_docs, tf_src=tf_src)
        )
        .unionByName(
            q_retrieval_eval(
                spark, sf_dir, docs=shared_docs, ranked=ranked, tf=tf_bm25
            )
        )
    )


_BM25_VALUES = ", ".join(
    f"('{qid}', '{t}')"
    for qid, terms in _BM25_QUERIES.items()
    for t in terms
)

_BM25_RANKED_SQL = f"""
WITH qt(query_id, term) AS (VALUES {_BM25_VALUES}),
d AS (
  SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents
), toks AS (
  SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl, unnest(ws) AS token FROM d
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(ws)) AS BIGINT) AS tl
  FROM d
), tf AS (
  SELECT query_id, term, doc_id, dl, CAST(count(*) AS BIGINT) AS tf
  FROM toks JOIN qt ON token = term
  GROUP BY 1, 2, 3, 4
), dfq AS (
  SELECT query_id, term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM tf GROUP BY 1, 2
), scored AS (
  SELECT tf.query_id, tf.doc_id,
         CAST((2*n_docs - 2*df + 1) * 22 * tl * tf.tf AS DOUBLE)
           / ((2*df + 1) * (10*tl*tf.tf + 3*tl + 9*tf.dl*n_docs)) AS s
  FROM tf JOIN dfq USING (query_id, term) CROSS JOIN stats
), per_doc AS (
  SELECT query_id, doc_id, list_sort(list(s)) AS ss
  FROM scored GROUP BY 1, 2
), summed AS (
  SELECT query_id, doc_id,
         coalesce(ss[1], 0) + coalesce(ss[2], 0) + coalesce(ss[3], 0) AS score
  FROM per_doc
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, doc_id ASC) AS rank
  FROM summed
)
SELECT query_id, doc_id, rank, score
FROM ranked WHERE rank <= {_BM25_TOP}
"""

_BM25_SQL = f"""
SELECT 'bm25' AS variant, query_id AS source,
       CAST(doc_id AS VARCHAR) AS token,
       CAST(rank AS BIGINT) AS rank, score
FROM ({_BM25_RANKED_SQL})
"""

_HYBRID_SQL = f"""
WITH bm AS (
  SELECT * FROM ({_BM25_RANKED_SQL})
), pairs AS (
  SELECT c.query_id, c.doc_id, a.doc_id AS anchor_id
  FROM bm c JOIN (SELECT query_id, doc_id FROM bm WHERE rank = 1) a
       USING (query_id)
), el0 AS (
  SELECT vec_id,
         unnest(range(1, len(embedding) + 1)) AS i,
         unnest(embedding) AS x0
  FROM embeddings
), el AS (
  -- FLOAT widens to DOUBLE before the decimal cast (DuckDB's direct
  -- FLOAT->DECIMAL path is not correctly rounded — cosine_topk note)
  SELECT vec_id, i, CAST(CAST(x0 AS DOUBLE) AS DECIMAL(18,9)) AS xd FROM el0
), norms AS (
  SELECT vec_id, CAST(CAST(SUM(xd * xd) AS VARCHAR) AS DOUBLE) AS n2
  FROM el GROUP BY vec_id
), dots AS (
  SELECT p.query_id, p.doc_id, p.anchor_id,
         CAST(CAST(SUM(c.xd * a.xd) AS VARCHAR) AS DOUBLE) AS dot
  FROM pairs p
  JOIN el c ON c.vec_id = p.doc_id
  JOIN el a ON a.vec_id = p.anchor_id AND a.i = c.i
  GROUP BY 1, 2, 3
), rescored AS (
  SELECT d.query_id, d.doc_id,
         dot / (sqrt(cn.n2) * sqrt(an.n2)) AS cosine,
         row_number() OVER (
           PARTITION BY d.query_id
           ORDER BY dot / (sqrt(cn.n2) * sqrt(an.n2)) DESC, d.doc_id ASC
         ) AS rank
  FROM dots d
  JOIN norms cn ON d.doc_id = cn.vec_id
  JOIN norms an ON d.anchor_id = an.vec_id
)
SELECT 'hybrid' AS variant, query_id AS source,
       CAST(doc_id AS VARCHAR) AS token,
       CAST(rank AS BIGINT) AS rank, cosine AS score
FROM rescored WHERE rank <= {_BM25_TOP}
"""

_TFIDF_MERGED_SQL = f"""
SELECT 'tfidf' AS variant, * FROM ({_TFIDF_SQL})
UNION ALL
SELECT * FROM ({_BM25_SQL})
UNION ALL
SELECT * FROM ({_HYBRID_SQL})
UNION ALL
SELECT 'bm25_index' AS variant, query_id AS source,
       CAST(doc_id AS VARCHAR) AS token,
       CAST(rank AS BIGINT) AS rank, score
FROM ({_BM25_RANKED_SQL})
UNION ALL
SELECT * FROM ({_PMI_SQL})
UNION ALL
SELECT * FROM ({_DRIFT_SQL})
"""

_RELEVAL_SQL = f"""
WITH bm AS (
  SELECT * FROM ({_BM25_RANKED_SQL})
), rqt(query_id, term) AS (VALUES {_BM25_VALUES}),
rtoks AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token
  FROM documents
), rrel AS (
  SELECT query_id, doc_id FROM (
    SELECT rqt.query_id, rtoks.doc_id,
           count(DISTINCT rqt.term) AS c
    FROM rtoks JOIN rqt ON token = term
    GROUP BY 1, 2
  ) WHERE c >= {_REL_MIN_TERMS}
), rnrel AS (
  SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel
  FROM rrel GROUP BY 1
), rj AS (
  SELECT bm.query_id, bm.rank,
         rrel.doc_id IS NOT NULL AS is_rel
  FROM bm LEFT JOIN rrel
    ON bm.query_id = rrel.query_id AND bm.doc_id = rrel.doc_id
), ragg AS (
  SELECT query_id,
         min(CASE WHEN is_rel THEN rank END) AS fr,
         CAST(count(CASE WHEN is_rel THEN 1 END) AS BIGINT) AS hits
  FROM rj GROUP BY 1
), rfull AS (
  SELECT q.query_id,
         coalesce(a.hits, 0) AS hits,
         coalesce(n.n_rel, 0) AS n_rel,
         a.fr
  FROM (SELECT DISTINCT query_id FROM rqt) q
  LEFT JOIN ragg a USING (query_id)
  LEFT JOIN rnrel n USING (query_id)
)
SELECT 'releval' AS variant, query_id AS source, m AS token,
       CAST(NULL AS BIGINT) AS rank, v AS score
FROM (
  SELECT query_id, 'mrr_ppm' AS m,
         CAST(CASE WHEN fr IS NULL THEN 0
                   ELSE {_PPM} // fr END AS DOUBLE) AS v FROM rfull
  UNION ALL
  SELECT query_id, 'p_at_k_ppm',
         CAST(({_PPM} * hits) // {_BM25_TOP} AS DOUBLE) FROM rfull
  UNION ALL
  SELECT query_id, 'recall_at_k_ppm',
         CAST(CASE WHEN n_rel = 0 THEN 0
                   ELSE ({_PPM} * hits) // n_rel END AS DOUBLE) FROM rfull
  UNION ALL
  SELECT query_id, 'n_rel', CAST(n_rel AS DOUBLE) FROM rfull
)
"""


QUERIES["tfidf_terms"] = Q(
    q_tfidf_merged,
    _TFIDF_MERGED_SQL + "\nUNION ALL\nSELECT * FROM (" + _RELEVAL_SQL + ")",
    variants={
        "tfidf": q_tfidf_terms,
        "bm25": q_bm25_topk,
        "hybrid": q_hybrid_rerank,
        "bm25_index": q_bm25_index_topk,
        # bench-only split of the combined bm25_index timing (VERDICT
        # r6 #2): build and serve move independently round-over-round
        "bm25_index_build": q_bm25_index_build,
        "bm25_index_serve": q_bm25_index_serve,
        "pmi": q_collocations,
        "drift": q_source_drift,
        "releval": q_retrieval_eval,
    },
)


def q_dedup_clusters(
    spark: SparkSession,
    sf_dir: str,
    pairs: DataFrame | None = None,
    labels: DataFrame | None = None,
) -> DataFrame:
    """Near-dup CLUSTERS from the exact-Jaccard pair edges: connected
    components via min-label propagation (operators/graph.py), sized,
    with the minimum doc_id as the deterministic survivor. This is
    the step a production dedup runs after candidate pairs — drop
    everything where is_survivor is false. ``pairs`` lets the merged
    entry share one materialized pair list across variants;
    ``labels`` additionally shares one already-computed (node, label)
    table so the iterative CC runs once per entry, not once per
    variant."""
    from ..operators.graph import connected_components

    if pairs is None:
        pairs = q_near_dup_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    if labels is None:
        labels = connected_components(pairs, src="doc_a", dst="doc_b")
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return labels.join(F.broadcast(sizes), "label").select(
        F.col("node").cast("bigint").alias("doc_id"),
        F.col("label").cast("bigint").alias("cluster_id"),
        F.col("cluster_size").cast("bigint").alias("cluster_size"),
        (F.col("node") == F.col("label")).alias("is_survivor"),
    )


_CLUSTERS_SQL = f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({_JACCARD_SQL})
), und AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b AS u, doc_a AS v FROM pairs
), reach(u, v) AS (
  SELECT u, v FROM und
  UNION
  SELECT r.u, d.v FROM reach r JOIN und d ON r.v = d.u
), lab AS (
  SELECT u AS node, LEAST(u, MIN(v)) AS label FROM reach GROUP BY u
)
SELECT CAST(node AS BIGINT) AS doc_id,
       CAST(label AS BIGINT) AS cluster_id,
       CAST(s.cnt AS BIGINT) AS cluster_size,
       node = label AS is_survivor
FROM lab
JOIN (SELECT label, count(*) AS cnt FROM lab GROUP BY label) s USING (label)
"""


_CURATION_MIN_QUALITY = 0.45
# benchmark set = every 97th document; 4-grams give a non-degenerate
# contamination rate on the synthetic corpus (8/500 docs at sf0.01,
# ~15% at sf0.1 — 7-grams match nothing, 3-grams flag a third)
_CURATION_EVAL_MOD = 97
_CURATION_NGRAM = 4


def q_curation_verdicts(
    spark: SparkSession, sf_dir: str, pairs: DataFrame | None = None
) -> DataFrame:
    """The composed corpus-curation plan (plans/curation.py):
    benchmark decontamination → quality gate → exact dedup → near-dup
    components, one keep/drop verdict with an auditable reason per
    document. The eval set is the ``doc_id % 97`` subset standing in
    for an external benchmark corpus; its gram set is broadcast
    (operators/decontam.py)."""
    from ..operators.decontam import eval_ngrams
    from ..plans.curation import curate_corpus

    docs = load_table(spark, sf_dir, "documents")
    if pairs is None:
        pairs = q_near_dup_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    ev = eval_ngrams(
        docs.filter(F.col("doc_id") % _CURATION_EVAL_MOD == 0),
        n=_CURATION_NGRAM,
    )
    return curate_corpus(
        docs,
        pairs,
        min_quality=_CURATION_MIN_QUALITY,
        eval_grams=ev,
        contam_ngram=_CURATION_NGRAM,
    )


_SPLIT_FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}


def q_cluster_split(
    spark: SparkSession,
    sf_dir: str,
    pairs: DataFrame | None = None,
    labels: DataFrame | None = None,
) -> DataFrame:
    """Leakage-free train/val/test split: the split key is the
    near-dup CLUSTER label (singletons key on their own doc_id), so
    every near-duplicate of a document lands in the same split and
    eval never scores a memorized training dupe — the step a benchmark
    -clean pipeline runs after dedup clustering. Assignment is the
    portable md5-cutoff scheme (functions/sampling.py split_assign):
    identical in any engine, no RNG. ``labels`` shares the merged
    entry's one CC run."""
    from ..functions.sampling import split_assign
    from ..operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    if labels is None:
        if pairs is None:
            pairs = q_near_dup_jaccard(spark, sf_dir).select(
                "doc_a", "doc_b"
            )
        labels = connected_components(pairs, src="doc_a", dst="doc_b")
    lab = labels.select(
        F.col("node").cast("bigint").alias("doc_id"),
        F.col("label").cast("bigint").alias("__label"),
    )
    keyed = docs.join(lab, "doc_id", "left").withColumn(
        "cluster_key", F.coalesce(F.col("__label"), F.col("doc_id"))
    )
    return keyed.select(
        "doc_id",
        "cluster_key",
        split_assign(F.col("cluster_key"), _SPLIT_FRACTIONS).alias("split"),
    )


def q_dedup_clusters_star(
    spark: SparkSession,
    sf_dir: str,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """'star' variant: the SAME cluster contract as 'clusters' but
    computed by large-star/small-star alternation
    (operators/graph.py connected_components_star) — ~log²-round
    convergence instead of diameter-bound label propagation, the
    variant to run when boilerplate chains make diameter the binding
    constraint at web scale. Labels are the component minimum on both
    algorithms, so the oracle is the identical recursive CTE — a
    cross-ALGORITHM equality check, not just cross-engine."""
    from ..operators.graph import connected_components_star

    if pairs is None:
        pairs = q_near_dup_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    labels = connected_components_star(pairs, src="doc_a", dst="doc_b")
    return q_dedup_clusters(spark, sf_dir, pairs, labels)


# entity resolution substrate: two records per part — the composite
# name and a deterministic one-char-deletion typo (last char of the
# p_name region), so the corpus has real duplicate-entity structure
# both engines can derive identically. max_dist 1 links exact dupes,
# the planted typos, and naturally-adjacent composites (brands one
# digit-edit apart) — transitively clustered either way.
_ENTITY_MAX_DIST = 1


def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'entity' variant: blocked entity resolution over a vendor-like
    record table (operators/entity_resolution.py) — the master-list-
    free counterpart of the two-tier lookup (reference matcher.py
    resolves against a vendor dim; this finds the entities when none
    exists). Three-pass token-group blocking: each key concatenates
    two of the three token groups (name / brand / type), so an edit
    inside one group always leaves some key intact — single-edit
    recall is structural, not probabilistic. Edges are threshold
    levenshtein; labels are CC minima; output one row per record."""
    from ..operators.entity_resolution import resolve_entities

    part = load_table(spark, sf_dir, "part")
    base = part.select(
        F.col("p_partkey").cast("bigint").alias("pk"),
        F.lower(
            F.concat_ws(" ", "p_name", "p_brand", "p_type")
        ).alias("nm"),
        F.length("p_name").alias("lp"),
    )
    recs = base.select(
        (F.col("pk") * 2).alias("id"), F.col("nm").alias("name")
    ).unionByName(
        base.select(
            (F.col("pk") * 2 + 1).alias("id"),
            F.expr(
                "concat(substring(nm, 1, lp - 1),"
                " substring(nm, lp + 1))"
            ).alias("name"),
        )
    )
    toks = F.split(F.col("name"), " ")
    name_part = F.concat_ws(" ", toks[0], toks[1])
    out = resolve_entities(
        recs,
        keys=[
            F.concat_ws(" ", name_part, toks[3]),  # name+type
            F.concat_ws(" ", name_part, toks[2]),  # name+brand
            F.concat_ws(" ", toks[2], toks[3]),  # brand+type
        ],
        max_dist=_ENTITY_MAX_DIST,
    )
    return out.select(
        F.col("id").cast("bigint").alias("doc_id"),
        F.col("entity_id").cast("bigint").alias("cluster_id"),
        F.col("cluster_size").cast("bigint").alias("cluster_size"),
        F.col("is_canonical").alias("keep"),
        F.col("name"),
    )


def q_dedup_clusters_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster labels + the composed curation verdict + the
    cluster-aware split in one union-tagged entry (driver cap: the
    correctness gate records at most 50 registry entries). variant
    'clusters' carries (cluster_id, cluster_size, keep=is_survivor);
    variant 'curation' carries (quality_score, keep, drop_reason) for
    EVERY document — the flagship LLM-pipeline composition,
    oracle-checked end to end; variant 'split' carries the
    leakage-free train/val/test assignment (cluster_id = split key,
    drop_reason = split name); variant 'star' recomputes the cluster
    contract via large-star/small-star CC (q_dedup_clusters_star) —
    same oracle CTE, cross-algorithm equality.

    All variants consume the same Jaccard pair list; the lazy
    checkpoint materializes the pair-generation plan once instead of
    once per variant (local blocks by default, reliable dir via
    ``SPARK_GRAFT_CHECKPOINT_DIR`` on a cluster — see
    functions/checkpointing.py).
    """

    from ..operators.graph import connected_components

    pairs = stable_checkpoint(
        q_near_dup_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    )
    # ONE iterative CC over the shared pair list; 'clusters' and
    # 'split' both consume these labels (the CC result is already
    # checkpointed per round, so reuse is a cheap re-read)
    labels = connected_components(pairs, src="doc_a", dst="doc_b")
    clusters = q_dedup_clusters(spark, sf_dir, pairs, labels).select(
        F.lit("clusters").alias("variant"),
        "doc_id",
        "cluster_id",
        "cluster_size",
        F.col("is_survivor").alias("keep"),
        F.lit(None).cast("double").alias("quality_score"),
        F.lit(None).cast("string").alias("drop_reason"),
    )
    cur = q_curation_verdicts(spark, sf_dir, pairs).select(
        F.lit("curation").alias("variant"),
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.lit(None).cast("bigint").alias("cluster_id"),
        F.lit(None).cast("bigint").alias("cluster_size"),
        "keep",
        F.col("quality_score").cast("double").alias("quality_score"),
        "drop_reason",
    )
    star = q_dedup_clusters_star(spark, sf_dir, pairs).select(
        F.lit("star").alias("variant"),
        "doc_id",
        "cluster_id",
        "cluster_size",
        F.col("is_survivor").alias("keep"),
        F.lit(None).cast("double").alias("quality_score"),
        F.lit(None).cast("string").alias("drop_reason"),
    )
    ent = q_entity_resolution(spark, sf_dir).select(
        F.lit("entity").alias("variant"),
        "doc_id",
        "cluster_id",
        "cluster_size",
        "keep",
        F.lit(None).cast("double").alias("quality_score"),
        F.col("name").alias("drop_reason"),
    )
    split = q_cluster_split(spark, sf_dir, pairs, labels).select(
        F.lit("split").alias("variant"),
        "doc_id",
        F.col("cluster_key").alias("cluster_id"),
        F.lit(None).cast("bigint").alias("cluster_size"),
        F.lit(None).cast("boolean").alias("keep"),
        F.lit(None).cast("double").alias("quality_score"),
        F.col("split").alias("drop_reason"),
    )
    return (
        clusters.unionByName(cur)
        .unionByName(split)
        .unionByName(star)
        .unionByName(ent)
    )


# quality score must be bit-identical to plans/curation.py: the same
# double ops in the same order (least(n/400,1)*0.5 + uniq*0.5); both
# engines compute IEEE binary64 with identical association.
_CURATION_SQL = f"""
WITH RECURSIVE scored AS (
  SELECT doc_id,
         least(CAST(n_chars AS DOUBLE) / 400, 1.0) * 0.5
         + CAST(len(list_distinct(string_split(trim(text), ' '))) AS DOUBLE)
           / CAST(len(string_split(trim(text), ' ')) AS DOUBLE) * 0.5
           AS quality_score,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS h
  FROM documents
), doc_grams AS (
  SELECT DISTINCT doc_id, substring(md5(gram), 1, 16) AS gh FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(1, len(ws) - {_CURATION_NGRAM - 2}),
             i -> array_to_string(ws[i:i + {_CURATION_NGRAM - 1}], ' ')
           )) AS gram
    FROM (SELECT doc_id, string_split(trim(text), ' ') AS ws
          FROM documents)
  )
), contam AS (
  SELECT DISTINCT g.doc_id FROM doc_grams g
  JOIN (SELECT DISTINCT gh FROM doc_grams
        WHERE doc_id % {_CURATION_EVAL_MOD} = 0) ev USING (gh)
), keepid AS (
  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY h) AS keep_id
  FROM scored WHERE quality_score >= {_CURATION_MIN_QUALITY}
    AND doc_id NOT IN (SELECT doc_id FROM contam)
), surv AS (
  SELECT doc_id FROM keepid WHERE doc_id = keep_id
), und AS (
  SELECT doc_a AS u, doc_b AS v FROM ({_JACCARD_SQL})
  WHERE doc_a IN (SELECT doc_id FROM surv)
    AND doc_b IN (SELECT doc_id FROM surv)
  UNION
  SELECT doc_b AS u, doc_a AS v FROM ({_JACCARD_SQL})
  WHERE doc_a IN (SELECT doc_id FROM surv)
    AND doc_b IN (SELECT doc_id FROM surv)
), reach(u, v) AS (
  SELECT u, v FROM und
  UNION
  SELECT r.u, d.v FROM reach r JOIN und d ON r.v = d.u
), lab AS (
  SELECT u AS node, LEAST(u, MIN(v)) AS label FROM reach GROUP BY u
), verdict AS (
  SELECT s.doc_id, s.quality_score,
         CASE WHEN s.doc_id IN (SELECT doc_id FROM contam)
                THEN 'contaminated'
              WHEN s.quality_score < {_CURATION_MIN_QUALITY}
                THEN 'low_quality'
              WHEN s.doc_id != k.keep_id THEN 'exact_dup'
              WHEN l.label IS NOT NULL AND s.doc_id != l.label
                THEN 'near_dup'
         END AS drop_reason
  FROM scored s
  LEFT JOIN keepid k ON s.doc_id = k.doc_id
  LEFT JOIN lab l ON s.doc_id = l.node
)
SELECT doc_id, quality_score, drop_reason,
       drop_reason IS NULL AS keep
FROM verdict
"""

def _split_sql() -> str:
    """The 'split' variant: cumulative md5-prefix cutoffs mirroring
    functions/sampling.py split_assign exactly (same '#'-joined salt
    key, same 8-hex prefix, cutoffs generated from the same dict)."""
    from ..functions.sampling import rate_cutoff_hex

    names = list(_SPLIT_FRACTIONS)
    cum = 0.0
    cases = ""
    for name in names[:-1]:
        cum += _SPLIT_FRACTIONS[name]
        cases += (
            f"WHEN h < '{rate_cutoff_hex(cum)}' THEN '{name}' "
        )
    return f"""
SELECT 'split' AS variant, doc_id, cluster_id,
       CAST(NULL AS BIGINT) AS cluster_size,
       CAST(NULL AS BOOLEAN) AS keep,
       CAST(NULL AS DOUBLE) AS quality_score,
       CASE {cases}ELSE '{names[-1]}' END AS drop_reason
FROM (
  SELECT doc_id, cluster_id,
         substring(md5('split' || '#' || CAST(cluster_id AS VARCHAR)),
                   1, 8) AS h
  FROM (
    SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
    FROM documents d
    LEFT JOIN ({_CLUSTERS_SQL}) c USING (doc_id)
  )
)
"""


# blocked entity resolution, mirrored: the SAME record derivation
# (composite name + deterministic deletion typo), the SAME three
# pass-tagged two-of-three token-group keys, threshold levenshtein
# edges, recursive-CTE components. Blocking is part of blocked-ER
# semantics, so the oracle blocks identically.
_ENTITY_SQL = f"""
WITH RECURSIVE ebase AS (
  SELECT p_partkey AS pk,
         lower(p_name || ' ' || p_brand || ' ' || p_type) AS nm,
         length(p_name) AS lp
  FROM part
), erec AS (
  SELECT pk * 2 AS id, nm FROM ebase
  UNION ALL
  SELECT pk * 2 + 1, substr(nm, 1, lp - 1) || substr(nm, lp + 1)
  FROM ebase
), ekey AS (
  SELECT id, nm,
         '0:' || split_part(nm, ' ', 1) || ' ' || split_part(nm, ' ', 2)
              || ' ' || split_part(nm, ' ', 4) AS blk
  FROM erec
  UNION ALL
  SELECT id, nm,
         '1:' || split_part(nm, ' ', 1) || ' ' || split_part(nm, ' ', 2)
              || ' ' || split_part(nm, ' ', 3)
  FROM erec
  UNION ALL
  SELECT id, nm,
         '2:' || split_part(nm, ' ', 3) || ' ' || split_part(nm, ' ', 4)
  FROM erec
), epair AS (
  SELECT DISTINCT a.id AS u, b.id AS v
  FROM ekey a JOIN ekey b ON a.blk = b.blk AND a.id < b.id
  WHERE abs(length(a.nm) - length(b.nm)) <= {_ENTITY_MAX_DIST}
    AND levenshtein(a.nm, b.nm) <= {_ENTITY_MAX_DIST}
), eund AS (
  SELECT u, v FROM epair
  UNION
  SELECT v AS u, u AS v FROM epair
), ereach(u, v) AS (
  SELECT u, v FROM eund
  UNION
  SELECT r.u, d.v FROM ereach r JOIN eund d ON r.v = d.u
), elab AS (
  SELECT u AS node, LEAST(u, MIN(v)) AS label FROM ereach GROUP BY u
), eall AS (
  SELECT e.id, e.nm, COALESCE(l.label, e.id) AS entity_id
  FROM erec e LEFT JOIN elab l ON e.id = l.node
), esz AS (
  SELECT entity_id, count(*) AS cnt FROM eall GROUP BY entity_id
)
SELECT CAST(id AS BIGINT) AS doc_id,
       CAST(entity_id AS BIGINT) AS cluster_id,
       CAST(cnt AS BIGINT) AS cluster_size,
       id = entity_id AS keep,
       nm
FROM eall JOIN esz USING (entity_id)
"""


_CLUSTERS_MERGED_SQL = f"""
SELECT 'clusters' AS variant, doc_id, cluster_id, cluster_size,
       is_survivor AS keep,
       CAST(NULL AS DOUBLE) AS quality_score,
       CAST(NULL AS VARCHAR) AS drop_reason
FROM ({_CLUSTERS_SQL})
UNION ALL
SELECT 'curation' AS variant, CAST(doc_id AS BIGINT) AS doc_id,
       CAST(NULL AS BIGINT) AS cluster_id,
       CAST(NULL AS BIGINT) AS cluster_size,
       keep, quality_score, drop_reason
FROM ({_CURATION_SQL})
UNION ALL
SELECT * FROM ({_split_sql()})
UNION ALL
SELECT 'star' AS variant, doc_id, cluster_id, cluster_size,
       is_survivor AS keep,
       CAST(NULL AS DOUBLE) AS quality_score,
       CAST(NULL AS VARCHAR) AS drop_reason
FROM ({_CLUSTERS_SQL})
UNION ALL
SELECT 'entity' AS variant, doc_id, cluster_id, cluster_size, keep,
       CAST(NULL AS DOUBLE) AS quality_score,
       nm AS drop_reason
FROM ({_ENTITY_SQL})
"""

QUERIES["dedup_clusters"] = Q(
    q_dedup_clusters_merged,
    _CLUSTERS_MERGED_SQL,
    variants={
        "clusters": q_dedup_clusters,
        "curation": q_curation_verdicts,
        "split": q_cluster_split,
        "star": q_dedup_clusters_star,
        "entity": q_entity_resolution,
    },
)
