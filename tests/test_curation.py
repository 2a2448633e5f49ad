"""Corpus-curation composition invariants (plans/curation.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _setup(spark):
    from accounting_etl_spark.plans.curation import curate_corpus
    from accounting_etl_spark.queries.text import q_near_dup_jaccard

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    pairs = q_near_dup_jaccard(spark, SF_SMOKE).select("doc_a", "doc_b")
    verdicts = curate_corpus(docs, pairs, min_quality=0.45)
    return docs, pairs, verdicts.toPandas().set_index("doc_id")


def test_curation_invariants(spark):
    from accounting_etl_spark.functions.text import normalize_text

    docs, pairs, v = _setup(spark)
    assert len(v) == docs.count()  # every doc gets a verdict
    assert set(v[~v["keep"]]["drop_reason"]) <= {
        "low_quality", "exact_dup", "near_dup"
    }
    assert v[v["keep"]]["drop_reason"].isna().all()
    # quality gate: every kept doc clears the threshold
    assert (v[v["keep"]]["quality_score"] >= 0.45).all()
    # exact dedup: at most one kept doc per content hash
    hashes = (
        docs.select(
            "doc_id", F.md5(normalize_text(F.col("text"))).alias("h")
        )
        .toPandas()
        .set_index("doc_id")["h"]
    )
    kept = v[v["keep"]].index
    assert hashes.loc[kept].is_unique
    # near-dup: no two kept docs are directly paired
    kept_set = set(kept)
    for r in pairs.collect():
        assert not (
            r.doc_a in kept_set and r.doc_b in kept_set
        ), f"kept near-dup pair {(r.doc_a, r.doc_b)}"


def test_curation_deterministic(spark):
    _, _, v1 = _setup(spark)
    _, _, v2 = _setup(spark)
    assert v1.sort_index().equals(v2.sort_index())


def test_decontaminate_flags_gram_overlap(spark):
    """A doc sharing a 4-gram with the eval set is contaminated; a doc
    with no shared gram (or fewer than 4 tokens) is not."""
    from accounting_etl_spark.operators.decontam import (
        decontaminate,
        eval_ngrams,
    )

    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    docs = spark.createDataFrame(
        [
            (1, "he saw the quick brown fox run off"),  # shared 4-gram
            (2, "quick brown fox and other words entirely"),  # only 3
            (3, "fox quick the brown"),  # right words, wrong order
            (4, "quick brown fox"),  # < 4 tokens: no grams
        ],
        ["doc_id", "text"],
    )
    out = decontaminate(docs, eval_ngrams(ev, n=4), n=4)
    got = {r.doc_id: (r.n_contam_grams, r.is_contaminated)
           for r in out.collect()}
    assert got == {1: (1, True), 2: (0, False), 3: (0, False),
                   4: (0, False)}


def test_curation_contaminated_outranks_other_reasons(spark):
    """A contaminated doc reports 'contaminated' even when it is also
    low-quality or an exact dup, and contaminated docs never win a
    dedup survivorship slot."""
    from accounting_etl_spark.operators.decontam import eval_ngrams
    from accounting_etl_spark.plans.curation import curate_corpus

    long_tail = " ".join(f"w{i}" for i in range(80))
    dup = "alpha beta gamma delta " + long_tail
    docs = spark.createDataFrame(
        [
            # identical contaminated texts: doc 1 would be the exact-dup
            # survivor and doc 2 the exact_dup — both must report
            # 'contaminated' instead (stage order), and neither may
            # occupy a survivorship slot
            (1, dup, len(dup)),
            (2, dup, len(dup)),
            (3, "alpha alpha alpha alpha alpha", 29),  # clean, low quality
            (4, "unique clean words only here " + long_tail,
             30 + len(long_tail)),
        ],
        ["doc_id", "text", "n_chars"],
    )
    ev = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon")], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([], "doc_a bigint, doc_b bigint")
    v = {
        r.doc_id: r
        for r in curate_corpus(
            docs, pairs, min_quality=0.45,
            eval_grams=eval_ngrams(ev, n=4), contam_ngram=4,
        ).collect()
    }
    assert v[1].drop_reason == "contaminated"
    assert v[2].drop_reason == "contaminated"
    # doc 3 shares no 4-gram with the eval set (only 'alpha' repeats),
    # so it falls through to the quality gate
    assert v[3].drop_reason == "low_quality"
    assert v[4].keep and v[4].drop_reason is None


def test_cluster_split_is_leakage_free(spark):
    from accounting_etl_spark.queries.text import (
        q_cluster_split,
        q_near_dup_jaccard,
    )
    from tests.conftest import SF_SMOKE

    splits = {
        r["doc_id"]: (r["cluster_key"], r["split"])
        for r in q_cluster_split(spark, SF_SMOKE).collect()
    }
    pairs = q_near_dup_jaccard(spark, SF_SMOKE).collect()
    assert pairs, "fixture has no near-dup pairs"
    # every near-dup pair lands in the SAME split (same cluster key)
    for p in pairs:
        ka, sa = splits[p["doc_a"]]
        kb, sb = splits[p["doc_b"]]
        assert ka == kb and sa == sb, (p["doc_a"], p["doc_b"], sa, sb)
    # all three splits are populated and cover every document
    names = {s for _, s in splits.values()}
    assert names == {"train", "val", "test"}
    assert len(splits) == 500


def test_split_assign_fractions_and_determinism(spark):
    from pyspark.sql import functions as F

    from accounting_etl_spark.functions.sampling import split_assign

    df = spark.range(0, 20_000)
    out = df.select(
        "id", split_assign(F.col("id"), {"train": 0.8, "val": 0.1, "test": 0.1}).alias("s")
    )
    counts = {r["s"]: r["n"] for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["train"] / 20_000 - 0.8) < 0.02
    assert abs(counts["val"] / 20_000 - 0.1) < 0.01
    assert abs(counts["test"] / 20_000 - 0.1) < 0.01
    # deterministic across evaluations
    again = {r["id"]: r["s"] for r in out.collect()}
    assert {r["id"]: r["s"] for r in out.collect()} == again


def test_dataset_card_shares_and_totals(spark):
    from accounting_etl_spark.plans.curation import dataset_card

    docs = spark.createDataFrame(
        [
            (1, "a b c d", "s"),      # kept: 4 tokens
            (2, "a b", "s"),          # dropped low_quality: 2 tokens
            (3, "x y z w v u", "s"),  # kept: 6 tokens
        ],
        ["doc_id", "text", "source"],
    )
    verdicts = spark.createDataFrame(
        [
            (1, 0.9, True, None),
            (2, 0.1, False, "low_quality"),
            (3, 0.8, True, None),
        ],
        "doc_id long, quality_score double, keep boolean, "
        "drop_reason string",
    )
    card = {
        r.verdict: (r.n_docs, r.n_tokens, r.docs_ppm, r.tokens_ppm)
        for r in dataset_card(docs, verdicts).collect()
    }
    assert card == {
        "kept": (2, 10, (2 * 10**6) // 3, (10 * 10**6) // 12),
        "low_quality": (1, 2, 10**6 // 3, (2 * 10**6) // 12),
    }
    # shares are exact floors of the corpus totals
    assert sum(v[0] for v in card.values()) == 3
    assert sum(v[1] for v in card.values()) == 12
