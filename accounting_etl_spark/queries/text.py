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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import normalize_text, word_shingles
from ..sources.tables import load_table
from . import Q


def _norm_text() -> Column:
    return normalize_text(F.col("text"))


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash (SURVEY §2.11).

    ``md5(normalized_text)`` → one shuffle on the hash; the survivor
    is the minimum doc_id (deterministic, unlike first-wins). At
    100 TB this is the canonical single-pass dedup: hash computed
    map-side, group-by on the 128-bit key.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("content_hash", F.md5(_norm_text()))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


_DEDUP_EXACT_SQL = """
SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS content_hash,
       min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents
GROUP BY 1
"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: content hash prefix as a compact id."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "source",
        F.substring(F.md5(_norm_text()), 1, 16).alias("fingerprint"),
    )


_FINGERPRINT_SQL = """
SELECT doc_id, source,
       substring(md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')), 1, 16) AS fingerprint
FROM documents
"""


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting battery: counts, distinct, lengths (BPE-ish regex)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.col("text"), F.lit("[A-Za-z0-9]+"), 0)
    tok_lens = F.transform(toks, lambda t: F.length(t))
    sum_len = F.aggregate(tok_lens, F.lit(0), lambda acc, x: acc + x)
    return docs.select(
        "doc_id",
        "n_chars",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
        (sum_len.cast("double") / F.size(toks)).alias("avg_token_len"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias(
            "uniq_ratio"
        ),
    )


_TOKEN_SQL = """
WITH t AS (SELECT doc_id, n_chars, regexp_extract_all(text, '[A-Za-z0-9]+') AS toks
           FROM documents)
SELECT doc_id, n_chars,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
  CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks) AS avg_token_len,
  CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS uniq_ratio
FROM t
"""


def q_lang_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic + quality score (deterministic arithmetic).

    Stopword-ratio n-gram heuristic: share of {'the','a'} tokens; the
    quality score mixes length and uniqueness signals. Both are exact
    integer ratios so the doubles hash-match.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), " ")
    n = F.size(toks)
    stops = F.size(F.filter(toks, lambda t: t.isin("the", "a")))
    en_ratio = stops.cast("double") / n
    uniq = F.size(F.array_distinct(toks)).cast("double") / n
    return docs.select(
        "doc_id",
        "lang",
        en_ratio.alias("en_ratio"),
        F.when(en_ratio >= 0.08, F.lit("en")).otherwise(F.lit("other")).alias(
            "pred_lang"
        ),
        uniq.alias("uniq_ratio"),
        (
            F.least(F.col("n_chars").cast("double") / 400, F.lit(1.0)) * 0.5
            + uniq * 0.5
        ).alias("quality_score"),
    )


_LANG_SQL = """
WITH t AS (
  SELECT doc_id, lang, n_chars, string_split(trim(text), ' ') AS toks
  FROM documents
), s AS (
  SELECT doc_id, lang, n_chars, len(toks) AS n,
         len(list_filter(toks, x -> x IN ('the', 'a'))) AS stops,
         len(list_distinct(toks)) AS n_uniq
  FROM t
)
SELECT doc_id, lang,
  CAST(stops AS DOUBLE) / n AS en_ratio,
  CASE WHEN CAST(stops AS DOUBLE) / n >= 0.08 THEN 'en' ELSE 'other' END AS pred_lang,
  CAST(n_uniq AS DOUBLE) / n AS uniq_ratio,
  least(CAST(n_chars AS DOUBLE) / 400, 1.0) * 0.5
    + (CAST(n_uniq AS DOUBLE) / n) * 0.5 AS quality_score
FROM s
"""

_JACCARD_THRESHOLD = 0.2
_MAX_SHINGLE_DF = 100  # stop-shingle cutoff — the 100 TB skew guard




def q_near_dup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by exact word-3-shingle Jaccard.

    explode distinct shingles → stop-shingle removal (doc-frequency
    cutoff; the skew guard that keeps the self-join from exploding on
    hot shingles at scale) → shingle-key self-join (doc_a < doc_b) →
    intersection counts → Jaccard filter. This is the exact oracle
    baseline; the MinHash-LSH scale path is operators/dedup.py.
    """
    # small-file scans arrive as ONE partition — spread the CPU-heavy
    # shingling across cores before exploding (at 100 TB the scan is
    # already many partitions and this repartition is a no-op to keep)
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    toks = F.split(F.trim(F.col("text")), " ")
    sh = docs.select("doc_id", F.explode(word_shingles(toks)).alias("sh"))
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
    n = F.size("ids")
    pair_arr = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice("ids", i + 2, n - i - 1),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    pairs = (
        postings.select(F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    # counts derived from the SAME postings subtree (not from sh) so
    # Spark reuses the aggregation exchange instead of re-scanning and
    # re-shingling the corpus for a second branch
    counts = (
        postings.select(F.explode("ids").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_sh"))
    )
    # counts is |docs|-sized — broadcast both enrichment joins
    na = counts.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    nb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        pairs.join(F.broadcast(na), "doc_a")
        .join(F.broadcast(nb), "doc_b")
        .withColumn("un", (F.col("na") + F.col("nb") - F.col("inter")).cast("bigint"))
        .withColumn("jaccard", F.col("inter").cast("double") / F.col("un"))
        .filter(F.col("jaccard") >= _JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "inter", "un", "jaccard")
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


QUERIES: dict[str, Q] = {
    "dedup_exact": Q(q_dedup_exact, _DEDUP_EXACT_SQL),
    "fingerprint": Q(q_fingerprint, _FINGERPRINT_SQL),
    "token_stats": Q(q_token_stats, _TOKEN_SQL),
    "lang_quality": Q(q_lang_quality, _LANG_SQL),
    "near_dup_jaccard": Q(q_near_dup_jaccard, _JACCARD_SQL),
}


_TFIDF_TOP = 5


def q_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 characteristic terms per source by a rational tf-idf.

    idf is the exact ratio N/df (no log — libm rounding differs
    across engines; the ranking semantics are identical), score =
    tf*N/df as one integer product and one double division, so both
    engines produce bit-identical scores.
    """
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    tok = docs.select(
        "source", F.explode(F.split(F.trim(F.col("text")), " ")).alias("token")
    )
    tf = tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_sources = docs.select("source").distinct().count()
    scored = (
        tf.join(F.broadcast(df_), "token")
        .withColumn(
            "score", (F.col("tf") * F.lit(n_sources)).cast("double") / F.col("df")
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


QUERIES["tfidf_terms"] = Q(q_tfidf_terms, _TFIDF_SQL)
