"""Contrastive pair mining (operators/contrastive.py): band rules,
tie-breaks, and full-probe equality with a Spark-side brute force."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _emb(spark):
    from accounting_etl_spark.sources.tables import load_table

    return load_table(spark, SF_SMOKE, "embeddings").filter(
        F.col("vec_id") < 64
    )


def _collect(df):
    return {
        (r["anchor_id"], r["is_positive"]): (r["pair_id"], r["cosine"])
        for r in df.collect()
    }


def test_band_rules_on_fixture(spark):
    from accounting_etl_spark.operators.contrastive import (
        mine_contrastive_pairs,
    )

    # 2-d unit-ish vectors: 0 and 1 nearly parallel (pos), 2 orthogonal
    # to 0 (neg band), 3 at ~45° (between bands: mined as neither)
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.999, 0.01]),
            (2, [0.0, 1.0]),
            (3, [0.7, 0.7]),
        ],
        "vec_id bigint, embedding array<double>",
    )
    got = _collect(
        mine_contrastive_pairs(
            emb,
            pos_threshold=0.95,
            neg_threshold=0.2,
            n_cells=2,
            n_probe=2,  # = n_cells → exact
        )
    )
    # anchor 0: positive 1, hard negative 2 (cos 0.0 ≤ 0.2; vector 3
    # at cos≈0.707 is between the bands and must NOT appear)
    assert got[(0, True)][0] == 1
    assert got[(0, False)][0] == 2
    # anchor 3 (~45° to everyone): no candidate in either band
    assert (3, True) not in got and (3, False) not in got


def test_between_band_candidates_excluded(spark):
    from accounting_etl_spark.operators.contrastive import (
        mine_contrastive_pairs,
    )

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.7, 0.7]), (2, [0.0, 1.0])],
        "vec_id bigint, embedding array<double>",
    )
    got = _collect(
        mine_contrastive_pairs(
            emb,
            pos_threshold=0.95,
            neg_threshold=0.2,
            n_cells=2,
            n_probe=2,
        )
    )
    # anchor 0: no candidate reaches 0.95 → no positive row; hardest
    # negative is 2 (cos 0), not 1 (cos ~0.707, between bands)
    assert (0, True) not in got
    assert got[(0, False)][0] == 2


def test_full_probe_equals_brute_force(spark):
    from accounting_etl_spark.operators.contrastive import (
        mine_contrastive_pairs,
    )
    from accounting_etl_spark.operators.similarity import _cosine

    emb = _emb(spark)
    n_cells = 4
    got = _collect(
        mine_contrastive_pairs(
            emb,
            pos_threshold=0.35,
            neg_threshold=0.0,
            n_cells=n_cells,
            n_probe=n_cells,  # exact: every cell probed
        )
    )
    # Spark-side brute force with the SAME _cosine expression →
    # bit-identical doubles, same struct-max tie-break
    a = emb.select(
        F.col("vec_id").alias("a_id"),
        F.col("embedding").cast("array<double>").alias("a_emb"),
    )
    c = emb.select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").cast("array<double>").alias("c_emb"),
    )
    scored = (
        a.crossJoin(c)
        .filter(F.col("a_id") != F.col("c_id"))
        .select(
            "a_id", "c_id",
            _cosine(F.col("a_emb"), F.col("c_emb")).alias("cosine"),
        )
    )
    expect = {}
    for r in scored.collect():
        for flag, ok in (
            (True, r["cosine"] >= 0.35),
            (False, r["cosine"] <= 0.0),
        ):
            if not ok:
                continue
            key = (r["a_id"], flag)
            cur = expect.get(key)
            cand = (r["cosine"], -r["c_id"])
            if cur is None or cand > cur:
                expect[key] = cand
    expect = {k: (-v[1], v[0]) for k, v in expect.items()}
    assert got == expect and got


def test_threshold_validation(spark):
    from accounting_etl_spark.operators.contrastive import (
        mine_contrastive_pairs,
    )

    with pytest.raises(ValueError):
        mine_contrastive_pairs(
            _emb(spark), pos_threshold=0.2, neg_threshold=0.5
        )
