"""Incremental dedup against a stored corpus index
(operators/incremental.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from accounting_etl_spark.operators.incremental import (
    dedup_against_index,
    exact_hash_index,
    minhash_band_index,
    near_dup_against_index,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_corpus_survivor_wins(spark):
    """A batch doc whose content exists in the corpus keeps the CORPUS
    survivor id even when the batch id is smaller — the corpus copy is
    the one already published."""
    corpus = _docs(spark, [(100, "alpha beta"), (200, "alpha beta"), (300, "gamma")])
    batch = _docs(spark, [(5, "alpha beta"), (6, "delta"), (7, "delta"), (8, "  Alpha   Beta ")])
    out = {
        r.doc_id: r
        for r in dedup_against_index(batch, exact_hash_index(corpus)).collect()
    }
    # 5 duplicates corpus content (survivor = corpus min 100), as does
    # 8 after normalization (case + whitespace)
    assert out[5].exact_dup_corpus and out[5].keep_id == 100 and out[5].is_dup
    assert out[8].exact_dup_corpus and out[8].keep_id == 100 and out[8].is_dup
    # batch-only content dedups batch-locally: 6 survives, 7 drops
    assert not out[6].exact_dup_corpus and out[6].keep_id == 6 and not out[6].is_dup
    assert not out[7].exact_dup_corpus and out[7].keep_id == 6 and out[7].is_dup


def test_exact_index_is_one_row_per_content(spark):
    corpus = _docs(spark, [(1, "x y"), (2, "x y"), (3, "z")])
    idx = exact_hash_index(corpus).collect()
    assert len(idx) == 2
    assert {r.keep_id for r in idx} == {1, 3}


def _para(tag: str, n: int = 30, twist: int | None = None) -> str:
    words = [f"{tag}{i}" for i in range(n)]
    if twist is not None:
        words[twist] = "TWIST"
    return " ".join(words)


def test_near_dup_index_finds_cross_set_pairs(spark):
    corpus = _docs(spark, [(1, _para("a")), (2, _para("b"))])
    # 10 is a near-dup of corpus 1 (one word changed); 11 is unrelated
    batch = _docs(spark, [(10, _para("a", twist=15)), (11, _para("zz"))])
    idx = minhash_band_index(corpus)
    cand = {
        (r.batch_id, r.corpus_id)
        for r in near_dup_against_index(batch, idx).collect()
    }
    assert (10, 1) in cand
    assert all(b != 11 for b, _ in cand)


def test_near_dup_index_hot_bucket_cap(spark):
    """A degenerate bucket (many identical corpus docs) yields at most
    bands * max_bucket candidate links per batch doc, not the full
    bucket."""
    corpus = _docs(spark, [(i, _para("c")) for i in range(1, 41)])
    batch = _docs(spark, [(100, _para("c"))])
    idx = minhash_band_index(corpus)
    cand = near_dup_against_index(batch, idx, max_bucket=2).collect()
    assert 0 < len(cand) <= 4 * 2
    # the capped prefix is deterministic: smallest corpus ids survive
    assert min(r.corpus_id for r in cand) == 1


def test_incremental_plans_no_forced_broadcast_no_product(spark):
    """The corpus index side grows with the corpus: the batch join must
    carry no broadcast hint (AQE may still convert) and no cross
    product."""
    corpus = _docs(spark, [(i, _para(f"w{i}")) for i in range(1, 20)])
    batch = _docs(spark, [(100, _para("w1", twist=3))])

    exact = dedup_against_index(batch, exact_hash_index(corpus))
    opt = exact._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" not in opt
    plan = exact._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan

    near = near_dup_against_index(batch, minhash_band_index(corpus))
    opt = near._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" not in opt
    plan = near._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_exact_join_and_window_share_one_exchange(spark):
    """dedup_against_index shuffles once on content_hash: the left
    join's exchange is reused by the batch-local min window (no second
    hash exchange of the batch side)."""
    corpus = _docs(spark, [(i, _para(f"w{i}")) for i in range(1, 20)])
    batch = _docs(spark, [(100 + i, _para(f"w{i}", twist=1)) for i in range(5)])
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            dedup_against_index(batch, exact_hash_index(corpus))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    # batch side: one exchange feeding both the join and the window
    # (corpus side has its own for the index groupBy) — so at most 3
    # hashpartitioning exchanges total, not 4
    assert plan.count("Exchange hashpartitioning") <= 3, plan


def test_stream_dedup_against_index(spark, tmp_path):
    """Streaming admission filter: corpus content is rejected, novel
    content passes exactly once even when repeated in the stream."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from accounting_etl_spark.operators.incremental import exact_hash_index
    from accounting_etl_spark.streaming.dedup import (
        stream_dedup_against_index,
    )
    from accounting_etl_spark.streaming.windows import run_to_memory

    corpus = _docs(spark, [(1, "alpha beta"), (2, "gamma")])
    index = exact_hash_index(corpus).select("content_hash")

    src = tmp_path / "stream_src"
    src.mkdir()
    rows = [
        (10, "alpha beta"),   # in corpus -> rejected
        (11, "delta"),        # novel -> admitted
        (12, "delta"),        # stream repeat -> dropped
        (13, "  GAMMA "),     # corpus after normalization -> rejected
        (14, "epsilon"),      # novel -> admitted
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
        }
    )
    pq.write_table(tbl, str(src / "batch0.parquet"))

    stream = spark.readStream.schema("doc_id bigint, text string").parquet(
        str(src)
    )
    out = stream_dedup_against_index(stream, index)
    name = "stream_dedup_sink"
    q = run_to_memory(out, name)
    try:
        got = {r.doc_id for r in spark.sql(f"SELECT doc_id FROM {name}").collect()}
    finally:
        q.stop()
    # one admit per novel content: 11 or 12 (arrival order within a
    # micro-batch is not pinned), plus 14; never 10 or 13
    assert 14 in got and got & {11, 12} and len(got) == 2
    assert not (got & {10, 13})
