"""Contrastive pair mining — (anchor, positive, hard-negative)
triplets for embedding-model training.

Training a bi-encoder / contrastive embedding model needs, per anchor
document: a POSITIVE (a semantically-near neighbor, cosine ≥ τ⁺) and a
HARD NEGATIVE — the most-similar candidate that is still definitely
not a match (the highest cosine ≤ τ⁻; random negatives are too easy
and gradients vanish).  Mining these at corpus scale is a bounded
neighbor search, not an all-pairs scan:

- the corpus is assigned to IVF cells once (top-1 cell per vector,
  the ``operators/similarity.py`` lit_matrix fold — map-side, no
  shuffle);
- each anchor probes its ``n_probe`` nearest cells, so candidates are
  cell-join bounded exactly like ``ivf_topk`` — never corpus×corpus;
- per anchor, ONE aggregation picks both rows: argmax cosine in the
  ≥ τ⁺ band (positive) and argmax cosine in the ≤ τ⁻ band (hardest
  negative), ties to the lower candidate id — deterministic under any
  partitioning.

Recall caveat (inherent to IVF candidate generation, same as
SemDeDup): a positive living wholly outside the probed cells is
missed; raise ``n_probe`` to trade cost for recall — with ``n_probe
≥ n_cells`` the mining is exact (unit-asserted against brute force).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.litmatrix import lit_matrix
from .ann_index import _ranked_cells
from .similarity import _cosine, _kmeans_centroids, _sample_centroids


def mine_contrastive_pairs(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pos_threshold: float,
    neg_threshold: float,
    n_cells: int = 16,
    n_probe: int = 2,
    centroids: str = "sample",
) -> DataFrame:
    """Mine up to one positive and one hard negative per anchor.

    Returns ``(anchor_id, pair_id, cosine, is_positive)`` — a row is
    present only when the band has a candidate in the probed cells.
    ``pos_threshold`` (τ⁺) and ``neg_threshold`` (τ⁻) must satisfy
    τ⁻ ≤ τ⁺; candidates strictly between the bands are ambiguous and
    mined as neither.
    """
    if neg_threshold > pos_threshold:
        raise ValueError("neg_threshold must be <= pos_threshold")
    if centroids == "kmeans":
        mat = _kmeans_centroids(
            emb, id_col=id_col, vec_col=vec_col, n_cells=n_cells
        )
    elif centroids == "sample":
        mat = _sample_centroids(
            emb, id_col=id_col, vec_col=vec_col, n_cells=n_cells
        )
    else:
        raise ValueError(f"unknown centroids mode {centroids!r}")
    cents_lit = lit_matrix(mat)
    vec = F.col(vec_col).cast("array<double>")
    corpus = emb.select(
        F.col(id_col).alias("c_id"),
        vec.alias("c_emb"),
        _ranked_cells(vec, cents_lit)[0]["cell"].cast("int").alias("cell"),
    )
    probes = emb.select(
        F.col(id_col).alias("a_id"),
        vec.alias("a_emb"),
        F.explode(
            F.slice(_ranked_cells(vec, cents_lit), 1, n_probe)
        ).alias("pc"),
    ).select("a_id", "a_emb", F.col("pc.cell").cast("int").alias("cell"))
    scored = (
        probes.join(corpus, "cell")
        .filter(F.col("a_id") != F.col("c_id"))
        .select(
            "a_id",
            "c_id",
            _cosine(F.col("a_emb"), F.col("c_emb")).alias("cosine"),
        )
        # an anchor probing 2 cells meets a candidate once per shared
        # cell — collapse before the band argmax
        .dropDuplicates(["a_id", "c_id"])
    )
    # one aggregation, both bands: max over (cosine, -id) structs so
    # ties break to the lower candidate id, NULL when the band is empty
    def _band_best(cond):
        return F.max(
            F.when(
                cond,
                F.struct(
                    F.col("cosine").alias("cosine"),
                    (-F.col("c_id")).alias("neg_id"),
                ),
            )
        )

    best = scored.groupBy("a_id").agg(
        _band_best(F.col("cosine") >= pos_threshold).alias("pos"),
        _band_best(F.col("cosine") <= neg_threshold).alias("neg"),
    )
    pos = best.filter(F.col("pos").isNotNull()).select(
        F.col("a_id").alias("anchor_id"),
        (-F.col("pos.neg_id")).alias("pair_id"),
        F.col("pos.cosine").alias("cosine"),
        F.lit(True).alias("is_positive"),
    )
    neg = best.filter(F.col("neg").isNotNull()).select(
        F.col("a_id").alias("anchor_id"),
        (-F.col("neg.neg_id")).alias("pair_id"),
        F.col("neg.cosine").alias("cosine"),
        F.lit(False).alias("is_positive"),
    )
    return pos.unionByName(neg)
