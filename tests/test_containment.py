"""Containment scoring: an excerpt relation that resemblance misses,
one-pass variant explosion, agreement with the standalone variants."""

import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    # doc 2 is a verbatim 12-token excerpt of the 100-token doc 1:
    # containment(2 in 1) = 1.0, Jaccard ~ 0.10 (under the 0.2 gate)
    base = [f"tok{i:03d}" for i in range(100)]
    rows = [
        (1, " ".join(base), "web"),
        (2, " ".join(base[:12]), "web"),
        (3, " ".join(f"other{i}" for i in range(40)), "web"),
    ]
    d = tmp_path_factory.mktemp("containment")
    spark.createDataFrame(rows, ["doc_id", "text", "source"]).coalesce(
        1
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_containment_catches_excerpt_jaccard_misses(spark, docs_dir):
    from accounting_etl_spark.queries.text import (
        q_containment_pairs,
        q_near_dup_jaccard,
    )

    jac = q_near_dup_jaccard(spark, docs_dir).collect()
    assert [(r.doc_a, r.doc_b) for r in jac] == []
    con = q_containment_pairs(spark, docs_dir).collect()
    assert [(r.doc_a, r.doc_b, r.score) for r in con] == [(1, 2, 1.0)]
    # denom is the smaller doc's live-shingle count (12 tokens -> 10)
    assert con[0].denom == 10 and con[0].inter == 10


def test_merged_one_pass_matches_standalone_variants(spark):
    from accounting_etl_spark.queries.text import (
        q_containment_pairs,
        q_near_dup_jaccard,
        q_near_dup_pairs,
    )

    merged = q_near_dup_pairs(spark, SF_SMOKE).collect()
    got_j = {
        (r.doc_a, r.doc_b, r.denom, r.score)
        for r in merged
        if r.variant == "jaccard"
    }
    got_c = {
        (r.doc_a, r.doc_b, r.denom, r.score)
        for r in merged
        if r.variant == "contain"
    }
    want_j = {
        (r.doc_a, r.doc_b, r.un, r.jaccard)
        for r in q_near_dup_jaccard(spark, SF_SMOKE).collect()
    }
    want_c = {
        (r.doc_a, r.doc_b, r.denom, r.score)
        for r in q_containment_pairs(spark, SF_SMOKE).collect()
    }
    assert got_j == want_j
    assert got_c == want_c
    # the entry also unions the synthetic-signature variants
    # (queries/signatures.py) — the shingle-profile rows are exactly
    # the two standalone variants, nothing more
    n_shingle = sum(1 for r in merged if r.variant in ("jaccard", "contain"))
    assert n_shingle == len(got_j) + len(got_c)


def test_containment_at_least_jaccard_per_pair(spark):
    # containment denominator <= union denominator, so per shared
    # pair score_contain >= score_jaccard always holds
    from accounting_etl_spark.queries.text import q_near_dup_pairs

    merged = q_near_dup_pairs(spark, SF_SMOKE).collect()
    by_pair = {}
    for r in merged:
        by_pair.setdefault((r.doc_a, r.doc_b), {})[r.variant] = r.score
    for scores in by_pair.values():
        if {"jaccard", "contain"} <= scores.keys():
            assert scores["contain"] >= scores["jaccard"]
