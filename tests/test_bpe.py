"""Learned BPE tokenizer (operators/bpe.py): the Sennrich merge loop
on the classic example, determinism, open-vocabulary fallback, and
the Spark train→tokenize path on the fixture documents."""

from __future__ import annotations

from pyspark.sql import functions as F

from accounting_etl_spark.operators.bpe import (
    _END,
    bpe_tokenize,
    segment_word,
    train_bpe,
    word_freq_table,
)
from tests.conftest import SF_SMOKE


def test_classic_merge_order():
    # the textbook corpus: 'low'x5 'lower'x2 'newest'x6 'widest'x3
    freqs = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe(freqs, n_merges=4)
    # highest-count adjacent pair first: 'es' (6+3=9), then 'est' (9),
    # then 'est</w>' (9), then 'lo' (5+2=7)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", _END)
    assert merges[3] == ("l", "o")


def test_segment_applies_merges_in_rank_order():
    freqs = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    ranks = {p: i for i, p in enumerate(train_bpe(freqs, n_merges=10))}
    assert segment_word("lowest", ranks)[-1].endswith(_END)
    # trained subwords compose: 'newest' segments to few tokens,
    # an unseen word falls back toward characters
    seen = segment_word("newest", ranks)
    unseen = segment_word("zzqqxx", ranks)
    assert len(seen) <= 3
    assert len(unseen) >= 6  # no trained pairs apply


def test_training_is_deterministic_under_reordering():
    freqs = [("abc", 3), ("abd", 3), ("xyz", 2)]
    a = train_bpe(freqs, n_merges=5)
    b = train_bpe(list(reversed(freqs)), n_merges=5)
    assert a == b  # explicit (count, pair) tie-break


def test_stops_when_no_pair_repeats():
    merges = train_bpe([("ab", 1), ("cd", 1)], n_merges=50)
    assert merges == []  # every pair occurs once — nothing to learn


def test_spark_train_and_tokenize(spark):
    from accounting_etl_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    freqs = word_freq_table(docs, top_n=500)
    assert 0 < len(freqs) <= 500
    # count-desc, deterministic ordering
    counts = [c for _, c in freqs]
    assert counts == sorted(counts, reverse=True)

    merges = train_bpe(freqs, n_merges=50)
    assert len(merges) > 0
    out = bpe_tokenize(docs, merges)
    assert out.count() == docs.count()
    row = out.filter(F.col("n_bpe_tokens") > 0).first()
    assert row["n_bpe_tokens"] == len(row["bpe_tokens"])
    # BPE can only merge within words: token count is bounded below
    # by the word count and above by characters+1 per word
    joined = (
        docs.select("doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("nw"))
        .join(out, "doc_id")
        .select("nw", "n_bpe_tokens")
        .collect()
    )
    for r in joined:
        assert r["n_bpe_tokens"] >= r["nw"]


def test_tokenize_plan_is_map_side(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "c d")], "doc_id bigint, text string"
    )
    merges = [("a", _END)]
    plan = (
        bpe_tokenize(docs, merges)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
