"""Bigram-LM perplexity filter (operators/lm_filter.py): the count
plumbing and the add-one cross-entropy math pinned against a plain
Python/NumPy reference on a hand-built corpus."""

from __future__ import annotations

import math

from accounting_etl_spark.operators.lm_filter import (
    score_perplexity,
    train_bigram_lm,
)

_REF = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the rug"),
]
_TGT = [
    (10, "the cat sat"),  # all bigrams seen in the reference
    (11, "the zebra ran"),  # both bigrams unseen
    (12, "word"),  # no bigrams at all
]


def _reference_scores():
    """Independent model: counts + add-one logprobs in plain Python."""
    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    for _, text in _REF:
        toks = text.lower().split()
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    v = len(uni)
    out = {}
    for doc_id, text in _TGT:
        toks = text.lower().split()
        pairs = list(zip(toks, toks[1:]))
        if not pairs:
            out[doc_id] = (0, 0, None)
            continue
        lp = [
            math.log(
                (bi.get(p, 0) + 1) / (uni.get(p[0], 0) + v)
            )
            for p in pairs
        ]
        unseen = sum(1 for p in pairs if p not in bi)
        out[doc_id] = (len(pairs), unseen, -sum(lp) / len(pairs))
    return out


def test_counts_and_cross_entropy_match_reference(spark):
    ref = spark.createDataFrame(_REF, "doc_id bigint, text string")
    tgt = spark.createDataFrame(_TGT, "doc_id bigint, text string")
    lm = train_bigram_lm(ref)
    got = {
        r["doc_id"]: r for r in score_perplexity(lm, tgt).collect()
    }
    want = _reference_scores()
    for doc_id, (n_bg, n_unseen, ce) in want.items():
        r = got[doc_id]
        assert r["n_bigrams"] == n_bg
        assert r["n_unseen"] == n_unseen
        if ce is None:
            assert r["cross_entropy"] is None
        else:
            assert abs(r["cross_entropy"] - ce) < 1e-12
            assert abs(r["log2_ppl"] - ce / math.log(2)) < 1e-12


def test_model_is_two_count_tables(spark):
    ref = spark.createDataFrame(_REF, "doc_id bigint, text string")
    lm = train_bigram_lm(ref)
    uni = {r["w1"]: r["u_cnt"] for r in lm["uni"].collect()}
    assert uni["the"] == 4 and uni["sat"] == 2 and uni["cat"] == 1
    bi = {
        (r["w1"], r["w2"]): r["b_cnt"] for r in lm["bi"].collect()
    }
    assert bi[("sat", "on")] == 2 and bi[("the", "cat")] == 1
    assert lm["vocab"].collect()[0]["v"] == len(uni)


def test_rare_and_unseen_ordering(spark):
    # fluent text under the model must score lower perplexity than
    # out-of-domain text — the filtering property itself
    ref = spark.createDataFrame(_REF, "doc_id bigint, text string")
    tgt = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "purple monkey dishwasher")],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: r
        for r in score_perplexity(train_bigram_lm(ref), tgt).collect()
    }
    assert got[1]["log2_ppl"] < got[2]["log2_ppl"]
    assert got[2]["n_unseen"] == got[2]["n_bigrams"]
    assert got[1]["n_rare"] >= 0
