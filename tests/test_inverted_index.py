"""Persisted inverted index (operators/inverted_index.py): bit-exact
parity with the from-raw BM25 ranking, partition-pruned term scans,
incremental append ≡ rebuild."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

QUERIES = {
    "q1": ["table", "scan", "fast"],
    "q2": ["join", "key", "hash"],
    "q3": ["window", "sort", "order"],
}


def _docs(spark):
    from accounting_etl_spark.sources.tables import load_table

    return load_table(spark, SF_SMOKE, "documents")


def _build(spark, tmp_path, docs=None, **kw):
    from accounting_etl_spark.operators.inverted_index import (
        build_inverted_index,
    )

    path = str(tmp_path / "inv")
    build_inverted_index(
        docs if docs is not None else _docs(spark), path, **kw
    )
    return path


def _ranked(df):
    return {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score"])
        for r in df.collect()
    }


def test_query_matches_from_raw_bm25(spark, tmp_path):
    from accounting_etl_spark.operators.inverted_index import (
        query_inverted_index,
    )
    from accounting_etl_spark.queries.text import _bm25_ranked

    path = _build(spark, tmp_path)
    got = _ranked(query_inverted_index(spark, path, QUERIES, k=5))
    expect = _ranked(_bm25_ranked(spark, SF_SMOKE))
    # same rational term scores, same sorted fold → bit-identical
    assert got == expect and got


def test_duplicate_query_terms_dedupe_on_entry(spark, tmp_path):
    """ADVICE r5: duplicate terms in a query list made the two
    parity engines diverge (from-raw double-counted tf, the index
    path double-added the term score). Unique terms is the contract,
    enforced by dedup at entry — a duplicated list must rank
    identically to its deduped form."""
    from accounting_etl_spark.operators.inverted_index import (
        query_inverted_index,
    )

    path = _build(spark, tmp_path)
    dup = {"q1": ["table", "table", "scan", "fast", "scan"]}
    clean = {"q1": ["table", "scan", "fast"]}
    got = _ranked(query_inverted_index(spark, path, dup, k=5))
    expect = _ranked(query_inverted_index(spark, path, clean, k=5))
    assert got == expect and got


def test_term_scan_is_partition_pruned(spark, tmp_path):
    from accounting_etl_spark.operators.inverted_index import (
        query_inverted_index,
    )

    path = _build(spark, tmp_path)
    df = query_inverted_index(spark, path, {"q": ["table"]}, k=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    # the postings scans (the only partitioned inputs) must carry the
    # bucket filter — not read-all-prune-later
    assert re.search(r"PartitionFilters: \[[^\]]*bucket", plan)


def test_append_equals_rebuild(spark, tmp_path):
    from accounting_etl_spark.operators.inverted_index import (
        append_to_inverted_index,
        query_inverted_index,
    )

    docs = _docs(spark)
    first = docs.filter(F.col("doc_id") % 2 == 0)
    second = docs.filter(F.col("doc_id") % 2 == 1)
    path = _build(spark, tmp_path, docs=first)
    append_to_inverted_index(second, path)
    incremental = _ranked(query_inverted_index(spark, path, QUERIES, k=5))
    full = _ranked(
        query_inverted_index(
            spark, _build(spark, tmp_path / "full", docs=docs), QUERIES, k=5
        )
    )
    # df / N / tl are all recomputed from increments at query time, so
    # append-then-query must equal a fresh build over the union corpus
    assert incremental == full and incremental


def test_absent_terms_yield_empty(spark, tmp_path):
    from accounting_etl_spark.operators.inverted_index import (
        query_inverted_index,
    )

    path = _build(spark, tmp_path)
    out = query_inverted_index(
        spark, path, {"q": ["zzz_not_a_token_zzz"]}, k=3
    )
    assert out.count() == 0


def test_built_sentinel_written_last_and_reset(spark, tmp_path):
    """ADVICE r7: meta lands first, so meta alone must not advertise a
    complete index — _BUILT is written LAST and removed at the start
    of a rebuild, and the serve twin gates on it."""
    import os

    from accounting_etl_spark.operators.inverted_index import (
        build_inverted_index,
    )

    path = str(tmp_path / "inv")
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id bigint, text string"
    )
    build_inverted_index(docs, path)
    assert os.path.exists(f"{path}/_BUILT")
    # simulate an interrupted rebuild: the sentinel must disappear
    # before any data write; meta existing without _BUILT = incomplete
    os.remove(f"{path}/_BUILT")
    assert os.path.exists(f"{path}/meta")
    build_inverted_index(docs, path)
    assert os.path.exists(f"{path}/_BUILT")
