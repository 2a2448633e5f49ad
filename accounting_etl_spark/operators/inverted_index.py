"""Persisted inverted index: build once, retrieve many, read only the
buckets your query terms hash into.

``queries/text.py::q_bm25_topk`` recomputes term frequencies, document
frequencies, and corpus statistics from raw text on every call — right
for a one-shot ranking job, wasteful for a serving- or eval-loop
workload that retrieves against the same corpus repeatedly.  This is
the lexical twin of ``operators/ann_index.py``: the index is plain
parquet,

- ``<path>/postings`` — one row per (term, doc): ``(term, doc_id, tf,
  dl)``, **partitioned by** ``bucket = pmod(xxhash64(term),
  n_buckets)`` so a query reads only the directories its terms hash
  into (``PartitionFilters``, plan-asserted in tests).  ``dl`` is
  denormalized onto the posting row — scoring needs no side join to a
  doc-stats table.
- ``<path>/stats`` — ONE ROW PER BUILD/APPEND INCREMENT ``(n_docs,
  tl)``; queries aggregate the increments, so appends never read (or
  rewrite) existing stats.
- ``<path>/meta`` — one row: ``n_buckets`` (the partitioner; appends
  and queries must hash with the build's value).

BM25 scoring is bit-identical to ``q_bm25_topk``'s exact-rational
form: each (query, term, doc) score is one integer-product ratio
evaluated with a single double division, and the per-doc fold sums the
term scores in ascending sorted order with an explicit unroll — so an
index-backed retrieval equals the from-raw ranking EXACTLY
(unit-asserted), and an append-then-query equals a fresh rebuild over
the union corpus.

Scale shape: the only corpus-sized work at build time is the tokenize
→ (term, doc) count aggregation and the partitioned write's shuffle
(both keyed on uniform xxhash64-derived terms).  A query touches
``q_terms/n_buckets`` of the postings bytes, computes df from the
pruned postings alone (a term's whole posting list lives in its
bucket), and every driver-side transfer is bounded by the query-term
count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .topk import topk_per_group_staged


def _bucket(term: Column, n_buckets: int) -> Column:
    return F.pmod(F.xxhash64(term), F.lit(n_buckets)).cast("int")


def _postings_rows(
    docs: DataFrame, *, id_col: str, text_col: str, n_buckets: int
) -> DataFrame:
    """(bucket, term, doc_id, tf, dl) — whitespace tokens, the corpus
    tokenization contract shared with q_bm25_topk."""
    ws = F.split(F.trim(F.col(text_col)), " ")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(ws).cast("bigint").alias("dl"),
        F.explode(ws).alias("term"),
    )
    return toks.groupBy("term", "doc_id", "dl").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    ).select(
        _bucket(F.col("term"), n_buckets).alias("bucket"),
        "term", "doc_id", "tf", "dl",
    )


def _stats_increment(
    docs: DataFrame, *, id_col: str, text_col: str
) -> DataFrame:
    ws = F.split(F.trim(F.col(text_col)), " ")
    return docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(ws)).cast("bigint").alias("tl"),
    )


def build_inverted_index(
    docs: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> None:
    """Materialize the inverted index for ``docs`` under ``path``.

    Writes a ``_BUILT`` sentinel LAST (after meta, postings and
    stats), so an interrupted or in-flight build never looks complete
    to readers that gate on it — meta alone is written first and
    would otherwise advertise a partial index (ADVICE r7; same
    convention as the persisted ANN index)."""
    import os as _os

    spark = docs.sparkSession
    sentinel = f"{path}/_BUILT"
    try:
        _os.remove(sentinel)  # a rebuild is incomplete until done
    except OSError:
        pass
    spark.createDataFrame(
        [(int(n_buckets),)], "n_buckets int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")
    # repartition ON the partition column before partitionBy: without
    # it every shuffle task writes a file into every bucket dir —
    # tasks x buckets small files (measured ~2k per build at sf0.1;
    # the classic small-file sin at cluster scale). One extra shuffle
    # buys one file per non-empty bucket.
    _postings_rows(
        docs, id_col=id_col, text_col=text_col, n_buckets=n_buckets
    ).repartition("bucket").write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(f"{path}/postings")
    _stats_increment(docs, id_col=id_col, text_col=text_col).coalesce(
        1
    ).write.mode("overwrite").parquet(f"{path}/stats")
    with open(sentinel, "w") as fh:
        fh.write("ok")


def append_to_inverted_index(
    new_docs: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Tokenize ``new_docs`` (doc ids must be new — exact dedup is the
    admission layer's job, streaming/dedup.py), hash with the SAVED
    ``n_buckets``, and append postings + one stats increment — no
    read of existing postings or stats."""
    spark = new_docs.sparkSession
    n_buckets = int(
        spark.read.parquet(f"{path}/meta").collect()[0]["n_buckets"]
    )
    _postings_rows(
        new_docs, id_col=id_col, text_col=text_col, n_buckets=n_buckets
    ).repartition("bucket").write.mode("append").partitionBy(
        "bucket"
    ).parquet(f"{path}/postings")
    _stats_increment(new_docs, id_col=id_col, text_col=text_col).coalesce(
        1
    ).write.mode("append").parquet(f"{path}/stats")


def query_inverted_index(
    spark: SparkSession,
    path: str,
    queries: dict[str, list[str]],
    *,
    k: int = 5,
) -> DataFrame:
    """Top-k BM25 retrieval against the saved index.

    ``queries`` maps query_id → term list (a bounded serving batch —
    it broadcasts and its bucket set drives partition pruning).
    Returns ``(query_id, doc_id, rank, score)`` with scores
    bit-identical to ``q_bm25_topk`` over the same corpus.

    Term lists are deduplicated on entry (the two engines of the
    parity contract diverge on duplicate query terms: the from-raw
    path would double-count tf through duplicate qt rows while this
    path would double-add the term score — unique terms is the
    contract, enforced identically at both qt construction sites).
    """
    queries = {qid: sorted(set(ts)) for qid, ts in queries.items()}
    n_buckets = int(
        spark.read.parquet(f"{path}/meta").collect()[0]["n_buckets"]
    )
    qt = spark.createDataFrame(
        [(qid, t) for qid, terms in queries.items() for t in terms],
        "query_id string, term string",
    )
    terms = sorted({t for ts in queries.values() for t in ts})
    # buckets computed through the SAME Spark hash the writer used —
    # a driver-known list (≤ n_query_terms) pushed into the scan as a
    # partition filter
    buckets = sorted(
        {
            r["b"]
            for r in spark.createDataFrame([(t,) for t in terms], "term string")
            .select(_bucket(F.col("term"), n_buckets).alias("b"))
            .collect()
        }
    )
    postings = (
        spark.read.parquet(f"{path}/postings")
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
    )
    stats = spark.read.parquet(f"{path}/stats").agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("tl").cast("bigint").alias("tl"),
    )
    tf = postings.join(F.broadcast(qt), "term").select(
        "query_id", "term", "doc_id", "dl", "tf"
    )
    dfq = tf.groupBy("query_id", "term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    n, tl, dfc, tfc, dl = (
        F.col("n_docs"), F.col("tl"), F.col("df"), F.col("tf"), F.col("dl")
    )
    # exact-rational Okapi BM25 (k1=1.2, b=0.75) — the q_bm25_topk
    # contract: one integer-product ratio, one double division
    term_score = (
        ((2 * n - 2 * dfc + 1) * 22 * tl * tfc).cast("double")
        / ((2 * dfc + 1) * (10 * tl * tfc + 3 * tl + 9 * dl * n))
    )
    scored = (
        tf.join(F.broadcast(dfq), ["query_id", "term"])
        .crossJoin(F.broadcast(stats))
        .select("query_id", "doc_id", term_score.alias("s"))
    )
    max_terms = max((len(ts) for ts in queries.values()), default=0)
    folded = F.lit(0.0)
    for i in range(1, max_terms + 1):
        folded = folded + F.coalesce(
            F.try_element_at("__ss", F.lit(i)), F.lit(0.0)
        )
    per_doc = (
        scored.groupBy("query_id", "doc_id")
        .agg(F.array_sort(F.collect_list("s")).alias("__ss"))
        .select("query_id", "doc_id", folded.alias("score"))
    )
    return topk_per_group_staged(
        per_doc,
        ["query_id"],
        [F.desc("score"), F.asc("doc_id")],
        k,
        rank_col="rank",
    )
