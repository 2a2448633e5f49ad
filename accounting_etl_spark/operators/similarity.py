"""Approximate nearest neighbors: random-hyperplane LSH bucketing.

The brute-force cosine top-k (queries/similarity.py) is O(|Q|·|C|);
at 100 TB the corpus side must be pruned before any distance math.
Random-hyperplane LSH: sign(v·h) over ``n_planes`` fixed hyperplanes
gives a bucket id preserving angular locality (collision probability
1 - θ/π per plane); only same-bucket pairs get exact cosine, and
``n_tables`` independent plane sets union-ed recover recall lost to
unlucky cuts.

Plan shape: corpus → n_tables bucket ids (map-only; hyperplanes are
driver-generated literals, seeded — no rand() in the plan) → explode
→ equi-join with the bucketed query side on (table, bucket) → exact
cosine on candidates → top-k window. The join is an equi-join on a
small key — shuffle bounded by candidate count, never |Q|·|C|.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.litmatrix import lit_matrix
from .topk import topk_per_group

_SEED = 0x5EED


def _hyperplanes(dim: int, n_planes: int, n_tables: int) -> list[list[list[float]]]:
    rng = random.Random(_SEED)
    return [
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]
        for _ in range(n_tables)
    ]


def _sign_bits(vec: Column, all_planes: list[list[float]]) -> Column:
    """One transform over a nested literal plane matrix → array of
    sign bits. A single shared expression tree: building a separate
    fold per plane quadruples whole-stage-codegen size and dominated
    wall time at local scale."""
    # one parsed expression — F.lit(nested_list) costs a py4j round
    # trip per element (~1.5s of driver wall per plan build here)
    planes_lit = lit_matrix(all_planes)
    return F.transform(
        planes_lit,
        lambda p: F.when(
            F.aggregate(
                F.zip_with(vec, p, lambda x, h: x * h),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0")),
    )


def _cosine(a: Column, b: Column) -> Column:
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v
    )
    na = F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v
    )
    nb = F.aggregate(
        F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, v: s + v
    )
    return dot / (F.sqrt(na) * F.sqrt(nb))


def ann_topk(
    corpus: DataFrame,
    query_ids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 3,
    n_planes: int = 4,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k cosine neighbors for ``query_ids`` (a
    DataFrame with ``id_col``). Returns (q_id, nb_id, rank, cosine).
    """
    tables = _hyperplanes(dim, n_planes, n_tables)
    flat_planes = [p for planes in tables for p in planes]
    vec = F.col(vec_col).cast("array<double>")
    with_bits = corpus.select(
        F.col(id_col).alias("nb_id"),
        vec.alias("nb_emb"),
        _sign_bits(vec, flat_planes).alias("__bits"),
    )
    bucketed = with_bits.select(
        "nb_id",
        "nb_emb",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        F.concat_ws(
                            "",
                            F.slice("__bits", t * n_planes + 1, n_planes),
                        ).alias("bucket"),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select("nb_id", "nb_emb", "tb.tbl", "tb.bucket")

    # query side joins the RAW corpus (broadcast semi-filter to |Q|
    # rows) and buckets only those — deriving it from `bucketed` would
    # compile the full-corpus sign-bit pass twice (same fix as the IVF
    # probe side)
    q_vecs = corpus.select(
        F.col(id_col).alias("q_id"), vec.alias("q_emb")
    ).join(
        F.broadcast(query_ids.select(F.col(id_col).alias("q_id"))), "q_id"
    )
    q_side = q_vecs.select(
        "q_id",
        "q_emb",
        _sign_bits(F.col("q_emb"), flat_planes).alias("__qbits"),
    ).select(
        "q_id",
        "q_emb",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        F.concat_ws(
                            "",
                            F.slice("__qbits", t * n_planes + 1, n_planes),
                        ).alias("bucket"),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select("q_id", "q_emb", "tb.tbl", "tb.bucket")
    # dedup on the id pair, not on the wide embedding payload — the
    # shuffle hashes two longs instead of two 64-double arrays
    cands = (
        F.broadcast(q_side)
        .join(bucketed, ["tbl", "bucket"])
        .filter(F.col("q_id") != F.col("nb_id"))
        .select("q_id", "q_emb", "nb_id", "nb_emb")
        .dropDuplicates(["q_id", "nb_id"])
    )
    scored = cands.withColumn(
        "cosine", _cosine(F.col("q_emb"), F.col("nb_emb"))
    )
    top = topk_per_group(
        scored, ["q_id"], [F.desc("cosine"), F.asc("nb_id")], k, rank_col="rank"
    )
    return top.select(
        "q_id", "nb_id", F.col("rank").cast("bigint").alias("rank"), "cosine"
    )


def _kmeans_centroids(
    corpus: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    n_cells: int,
    sample_cap: int = 100_000,
) -> list[list[float]]:
    """Centroid matrix trained with MLlib KMeans on a bounded
    deterministic hash-sample of the corpus.

    The sample keeps ~``sample_cap`` rows regardless of corpus size
    (hash-modulus filter — no ``sample()`` RNG, reruns see the same
    rows), so the KMeans job's input is bounded at 100 TB. ``fit``
    runs k-means|| with a fixed seed; only the ≤ n_cells centers ever
    reach the driver.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    id_str = F.col(id_col).cast("string")
    n = corpus.count()
    denom = max(1, n // sample_cap)
    train = corpus
    if denom > 1:
        train = corpus.filter(
            F.pmod(F.xxhash64(id_str), F.lit(denom)) == 0
        )
    feats = train.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias(
            "features"
        )
    )
    model = KMeans(
        k=n_cells, seed=7, maxIter=5, featuresCol="features"
    ).fit(feats)
    return [[float(x) for x in c] for c in model.clusterCenters()]


def ivf_topk(
    corpus: DataFrame,
    query_ids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_cells: int = 16,
    n_probe: int = 2,
    centroids: str = "sample",
) -> DataFrame:
    """IVF-style ANN: coarse quantization into ``n_cells`` Voronoi
    cells around centroids, multi-probe on the query side, exact
    cosine rerank within probed cells.

    ``centroids="sample"`` (default, deterministic): each row hashes
    to one of ``n_cells`` seed cells (``pmod(xxhash64(id), n_cells)``)
    and a map-side-combining ``min_by`` picks one representative per
    cell, so the driver collects exactly ≤ n_cells (id, vector) rows —
    never a full column (the shuffle carries at most n_cells rows per
    input partition thanks to partial aggregation).
    ``centroids="kmeans"``: MLlib-trained centers on a bounded
    hash-sample (:func:`_kmeans_centroids`) — cells follow data
    density more faithfully (better recall at equal n_probe) at the
    cost of one training job; float-sum order in ``fit`` is not
    bit-pinned, so use it where recall matters more than replay
    determinism.

    Either way the centroids are inlined as literal arrays, so
    assignment is a map-only expression and the only shuffle is the
    (cell) equi-join. Compared to the hyperplane LSH above: IVF
    adapts to the data distribution at the cost of the centroid pass.
    """
    if centroids not in ("sample", "kmeans"):
        raise ValueError(f"unknown centroids mode {centroids!r}")
    if centroids == "kmeans":
        mat = _kmeans_centroids(
            corpus, id_col=id_col, vec_col=vec_col, n_cells=n_cells
        )
        return _ivf_with_centroids(
            corpus, query_ids, mat,
            id_col=id_col, vec_col=vec_col, k=k, n_probe=n_probe,
        )
    id_str = F.col(id_col).cast("string")
    reps = (
        corpus.select(
            F.pmod(F.xxhash64(id_str), F.lit(n_cells)).alias("__cell"),
            F.xxhash64(id_str, F.lit("centroid-rank")).alias("__rk"),
            F.col(id_col).alias("__id"),
            F.col(vec_col).cast("array<double>").alias("__vec"),
        )
        .groupBy("__cell")
        .agg(
            F.min_by(
                F.struct("__id", "__vec"), F.struct("__rk", "__id")
            ).alias("rep")
        )
    )
    cents = (
        reps.select(F.col("rep.__id").alias("id"), F.col("rep.__vec").alias("c"))
        .orderBy("id")
        .collect()
    )
    return _ivf_with_centroids(
        corpus,
        query_ids,
        [[float(x) for x in r["c"]] for r in cents],
        id_col=id_col,
        vec_col=vec_col,
        k=k,
        n_probe=n_probe,
    )


def _ivf_with_centroids(
    corpus: DataFrame,
    query_ids: DataFrame,
    centroid_matrix: list[list[float]],
    *,
    id_col: str,
    vec_col: str,
    k: int,
    n_probe: int,
) -> DataFrame:
    """Shared IVF body: assignment, multi-probe, exact cosine rerank,
    given an already-computed centroid matrix."""
    # ONE nested literal centroid matrix shared by a single transform:
    # emitting a separate F.aggregate subtree per cell (and using it on
    # both the assign and probe sides) bloats whole-stage codegen by
    # n_cells× — the same pattern already folded in _sign_bits and the
    # simhash bit-count (operators/dedup.py).
    cents_lit = lit_matrix(centroid_matrix)

    vec = F.col(vec_col).cast("array<double>")

    def ranked_cells(v):
        pairs = F.transform(
            cents_lit,
            lambda c, i: F.struct(
                F.aggregate(
                    F.zip_with(v, c, lambda x, y: x * y),
                    F.lit(0.0),
                    lambda s, p: s + p,
                ).alias("dot"),
                i.alias("cell"),
            ),
        )
        return F.sort_array(pairs, asc=False)

    assigned = corpus.select(
        F.col(id_col).alias("nb_id"),
        vec.alias("nb_emb"),
        ranked_cells(vec)[0]["cell"].alias("cell"),
    )
    # query side joins the RAW corpus (scan + broadcast semi-filter to
    # |Q| rows), not `assigned` — referencing assigned here would
    # compile the full-corpus centroid-assignment subtree twice
    q_probe = (
        corpus.select(F.col(id_col).alias("q_id"), vec.alias("q_emb"))
        .join(
            F.broadcast(query_ids.select(F.col(id_col).alias("q_id"))),
            "q_id",
        )
        .select(
            "q_id",
            "q_emb",
            F.explode(
                F.slice(ranked_cells(F.col("q_emb")), 1, n_probe)
            ).alias("pc"),
        )
        .select("q_id", "q_emb", F.col("pc.cell").alias("cell"))
    )
    cands = (
        F.broadcast(q_probe)
        .join(assigned, "cell")
        .filter(F.col("q_id") != F.col("nb_id"))
        .select("q_id", "q_emb", "nb_id", "nb_emb")
        .dropDuplicates(["q_id", "nb_id"])
    )
    scored = cands.withColumn(
        "cosine", _cosine(F.col("q_emb"), F.col("nb_emb"))
    )
    top = topk_per_group(
        scored, ["q_id"], [F.desc("cosine"), F.asc("nb_id")], k, rank_col="rank"
    )
    return top.select(
        "q_id", "nb_id", F.col("rank").cast("bigint").alias("rank"), "cosine"
    )
