"""Incremental dedup against a stored corpus index
(operators/incremental.py)."""

from __future__ import annotations

import uuid

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


def _sig_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, dhash bigint")


def test_hamming_index_collapses_degenerate_mass(spark):
    """The signature index stores ONE row for 10³ blank images; batch
    hits against it are exact hamming-0 links to the rep."""
    from accounting_etl_spark.operators.incremental import (
        hamming_against_index,
        hamming_signature_index,
    )

    corpus = _sig_df(
        spark, [(i, 42) for i in range(1000)] + [(5000, 1 << 40)]
    )
    idx = hamming_signature_index(corpus)
    rows = {r.sig: r for r in idx.collect()}
    assert len(rows) == 2
    assert rows[42].rep_id == 0 and rows[42].n_members == 1000
    batch = _sig_df(spark, [(9001, 42), (9002, 42 ^ (1 << 20)), (9003, -1)])
    links = {
        (r.batch_id, r.corpus_rep): r.hamming
        for r in hamming_against_index(batch, idx).collect()
    }
    # 9001: exact blank-mass hit; 9002: 1 bit away from the blank rep;
    # 9003: unrelated, no link
    assert links == {(9001, 0): 0, (9002, 0): 1}


def test_hamming_index_equivalent_to_self_join_connectivity(spark):
    """Index links + within-batch pairs reach every (batch, corpus)
    pair the full self-join pairing finds within max_hamming."""
    import numpy as np

    from accounting_etl_spark.operators.image_hash import (
        hamming_banded_pairs,
    )
    from accounting_etl_spark.operators.incremental import (
        hamming_against_index,
        hamming_signature_index,
    )

    rng = np.random.default_rng(3)
    base = int(rng.integers(0, 1 << 62))
    corpus_rows = [(i, int(rng.integers(0, 1 << 62))) for i in range(30)]
    corpus_rows += [(100, base), (101, base ^ 1)]
    batch_rows = [(200, base ^ 2), (201, int(rng.integers(0, 1 << 62)))]
    corpus = _sig_df(spark, corpus_rows)
    batch = _sig_df(spark, batch_rows)
    links = {
        (r.batch_id, r.corpus_rep)
        for r in hamming_against_index(
            batch, hamming_signature_index(corpus)
        ).collect()
    }
    # full recompute over corpus+batch for reference
    full = {
        (r.id_a, r.id_b): r.hamming
        for r in hamming_banded_pairs(
            corpus.unionByName(batch)
        ).collect()
    }

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    sigs = dict(corpus_rows)
    for (bid, bh) in batch_rows:
        for (cid, ch) in corpus_rows:
            if ham(bh, ch) <= 3:
                # the index link lands on the signature's REP
                rep = min(i for i, h in corpus_rows if h == ch)
                assert (bid, rep) in links, (bid, cid)
    # no spurious links beyond max_hamming
    for bid, rep in links:
        bh = dict(batch_rows)[bid]
        assert ham(bh, sigs[rep]) <= 3


def test_hamming_index_hot_posting_cap(spark):
    """Hot (chunk, val) index postings keep only the max_posting
    min-rep prefix — deterministic recall trade, bounded join."""
    from accounting_etl_spark.operators.incremental import (
        hamming_against_index,
        hamming_signature_index,
    )

    # 40 distinct corpus sigs sharing chunk 0 == 0
    corpus = _sig_df(
        spark,
        [(i, (i + 1) << 16) for i in range(40)],
    )
    batch = _sig_df(spark, [(900, (39 + 1) << 16 ^ (1 << 20))])
    idx = hamming_signature_index(corpus)
    uncapped = hamming_against_index(batch, idx, max_posting=100)
    capped = hamming_against_index(batch, idx, max_posting=5)
    assert uncapped.count() >= 1
    # target sig (rep 39) sorts beyond the 5-entry min-rep prefix of
    # the shared chunk-0 band; its other chunks don't collide
    assert capped.count() == 0


def test_perceptual_admission_grows_index(spark, tmp_path):
    """Perceptual admission filter (streaming/dedup.py): within-batch
    identical-signature collapse, index rejection incl. near hits,
    grow-on-admit across batches."""
    from accounting_etl_spark.streaming.dedup import (
        perceptual_admission_batch,
    )

    path = str(tmp_path / "sig_index")
    # batch 1: 100 blank images (one signature), one distinct image
    b1 = _sig_df(
        spark, [(i, 42) for i in range(100)] + [(500, 1 << 40)]
    )
    a1 = {r.sig: r for r in perceptual_admission_batch(b1, path).collect()}
    assert set(a1) == {42, 1 << 40}
    assert a1[42].rep_id == 0 and a1[42].n_members == 100
    # batch 2: more blanks (exact hit), a 1-bit-off blank (near hit),
    # a fresh signature, and two batch-internal near sigs (greedy:
    # smaller rep admitted, larger dropped)
    b2 = _sig_df(
        spark,
        [(1000, 42), (1001, 42), (1002, 42 ^ (1 << 7)),
         (1003, 0x123456789ABCD), (1004, 0x123456789ABCD ^ 1)],
    )
    a2 = {r.sig for r in perceptual_admission_batch(b2, path).collect()}
    assert a2 == {0x123456789ABCD}
    # the index now carries exactly the admitted distinct signatures
    idx = {r.sig for r in spark.read.parquet(path).collect()}
    assert idx == {42, 1 << 40, 0x123456789ABCD}
    # batch 3: re-submitting an admitted signature is rejected
    b3 = _sig_df(spark, [(2000, 0x123456789ABCD)])
    assert perceptual_admission_batch(b3, path).count() == 0


def test_stream_perceptual_admission_two_epochs(spark, tmp_path):
    """foreachBatch wiring: two availableNow file-source epochs; the
    second epoch dedups against the first epoch's admissions."""
    import json as _json

    from accounting_etl_spark.streaming.dedup import (
        stream_perceptual_admission,
    )

    src = tmp_path / "src"
    src.mkdir()
    idx_path = str(tmp_path / "sig_index")
    ckpt = str(tmp_path / "ckpt")
    seen = []

    def run_epoch(rows):
        for r in rows:
            p = src / f"{uuid.uuid4().hex}.json"
            p.write_text("\n".join(_json.dumps(x) for x in r))
        stream = (
            spark.readStream.schema("doc_id long, dhash long")
            .json(str(src))
        )
        q = (
            stream_perceptual_admission(
                stream, idx_path,
                sink=lambda df, bid: seen.append(
                    {r.sig for r in df.collect()}
                ),
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_epoch([[{"doc_id": 1, "dhash": 42}, {"doc_id": 2, "dhash": 42},
                {"doc_id": 3, "dhash": 7 << 20}]])
    run_epoch([[{"doc_id": 10, "dhash": 42},           # exact dup
                {"doc_id": 11, "dhash": (7 << 20) ^ 2},  # near dup
                {"doc_id": 12, "dhash": 1 << 50}]])      # fresh
    assert seen[0] == {42, 7 << 20}
    assert seen[1] == {1 << 50}


def test_perceptual_admission_corrupt_index_raises(spark, tmp_path):
    """ADVICE r7: only a genuinely missing path means 'first batch' —
    a present-but-unreadable index must raise, never be overwritten
    (a transient read error would otherwise destroy the accumulated
    grow-only index and re-admit rejected duplicates)."""
    import pytest

    from accounting_etl_spark.streaming.dedup import (
        perceptual_admission_batch,
    )

    path = tmp_path / "sig_index"
    sub = path / "batch=b0"
    sub.mkdir(parents=True)
    (sub / "part-0000.parquet").write_bytes(b"not a parquet footer")
    with pytest.raises(Exception) as ei:
        perceptual_admission_batch(
            _sig_df(spark, [(1, 42)]), str(path), batch_id=1
        ).collect()
    assert "PATH_NOT_FOUND" not in str(ei.value)
    # the corrupt index was left alone — no overwrite happened
    assert (sub / "part-0000.parquet").read_bytes().startswith(b"not a")


def test_perceptual_admission_retry_is_idempotent(spark, tmp_path):
    """ADVICE r7: foreachBatch is at-least-once — replaying a batch
    with the same batch_id overwrites its own index subdir, keeping
    one row per distinct signature instead of double-appending."""
    from accounting_etl_spark.streaming.dedup import (
        perceptual_admission_batch,
    )

    path = str(tmp_path / "sig_index")
    b1 = _sig_df(spark, [(1, 42), (2, 42), (3, 7 << 20)])
    perceptual_admission_batch(b1, path, batch_id=0)
    # replay of the SAME micro-batch (retry after a sink failure)
    perceptual_admission_batch(b1, path, batch_id=0)
    rows = spark.read.parquet(path).collect()
    assert sorted(r.sig for r in rows) == [42, 7 << 20]
    assert {r.n_members for r in rows if r.sig == 42} == {2}
    # a successor batch lands beside it and is deduped against it
    b2 = _sig_df(spark, [(10, 42), (11, 1 << 50)])
    admitted = perceptual_admission_batch(b2, path, batch_id=1)
    assert {r.sig for r in admitted.collect()} == {1 << 50}
    assert spark.read.parquet(path).count() == 3
