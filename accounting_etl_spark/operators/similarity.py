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
    mat = _sample_centroids(
        corpus, id_col=id_col, vec_col=vec_col, n_cells=n_cells
    )
    return _ivf_with_centroids(
        corpus, query_ids, mat,
        id_col=id_col, vec_col=vec_col, k=k, n_probe=n_probe,
    )


def _sample_centroids(
    corpus: DataFrame, *, id_col: str, vec_col: str, n_cells: int
) -> list[list[float]]:
    """Deterministic seed centroids: each row hashes to one of
    ``n_cells`` cells and a map-side-combining ``min_by`` picks one
    representative per cell — the driver collects ≤ n_cells rows."""
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
    return [[float(x) for x in r["c"]] for r in cents]


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


# ---------------- IVF-PQ: product quantization over the IVF cells ----


def pq_codebooks(
    corpus: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    dim: int,
    m_sub: int,
    n_codes: int,
) -> list[list[list[float]]]:
    """Deterministic per-subspace codebooks: ``m_sub`` codebooks of
    ``n_codes`` sub-centroids each, picked the same way as the IVF
    seed centroids — each row's subvector hashes to one code slot and
    a map-side-combining ``min_by`` keeps one representative, so the
    driver collects exactly ≤ m_sub·n_codes short rows regardless of
    corpus size. Hash gaps (tiny corpora) are filled from slot 0 so
    the codebook is always rectangular.

    Subvectors are taken from the L2-NORMALIZED vector, matching the
    encode/ADC convention in :func:`ivf_pq_topk` (sum of subspace
    dots over normalized vectors = full cosine).
    """
    d_sub = dim // m_sub
    if d_sub * m_sub != dim:
        raise ValueError(f"m_sub={m_sub} must divide dim={dim}")
    id_str = F.col(id_col).cast("string")
    vec = F.col(vec_col).cast("array<double>")
    norm = F.sqrt(
        F.aggregate(vec, F.lit(0.0), lambda s, x: s + x * x)
    )
    nvec = F.transform(vec, lambda x: x / norm)
    # project the normalized vector before slicing so the norm
    # aggregate + divide transform evaluate once per row, not once
    # per subspace (see the projection-boundary note in ivf_pq_topk)
    pre = corpus.select(
        F.col(id_col).alias("__id"),
        F.xxhash64(id_str, F.lit("pq-rank")).alias("__rk"),
        nvec.alias("__nvec"),
    )
    subs = pre.select(
        "__id",
        "__rk",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("j"),
                    F.slice(F.col("__nvec"), j * d_sub + 1, d_sub).alias(
                        "sv"
                    ),
                )
                for j in range(m_sub)
            ])
        ).alias("s"),
    ).select(
        "__id", "__rk", F.col("s.j").alias("j"), F.col("s.sv").alias("sv")
    )
    reps = (
        subs.groupBy(
            "j",
            F.pmod(
                F.xxhash64(F.col("__id").cast("string"), F.col("j")),
                F.lit(n_codes),
            ).alias("code"),
        )
        .agg(
            F.min_by(F.col("sv"), F.struct("__rk", "__id")).alias("c")
        )
        .collect()
    )
    by_slot: dict[tuple[int, int], list[float]] = {
        (r["j"], r["code"]): [float(x) for x in r["c"]] for r in reps
    }
    books: list[list[list[float]]] = []
    for j in range(m_sub):
        fallback = next(
            (by_slot[(j, c)] for c in range(n_codes) if (j, c) in by_slot),
            [0.0] * d_sub,
        )
        books.append([
            by_slot.get((j, c), fallback) for c in range(n_codes)
        ])
    return books


def ivf_pq_topk(
    corpus: DataFrame,
    query_ids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_cells: int = 16,
    n_probe: int = 2,
    m_sub: int = 4,
    n_codes: int = 16,
    shortlist_factor: int = 16,
) -> DataFrame:
    """IVF-PQ ANN: coarse IVF routing + product-quantized candidate
    scoring + exact rerank of a small shortlist (Jégou et al. 2011,
    *Product Quantization for Nearest Neighbor Search*).

    The 100 TB shape this adds over plain IVF: the candidate join
    carries ``(nb_id, cell, codes)`` — ``m_sub`` bytes-ish of codes
    per corpus row, never the raw vectors — and scores candidates
    with an ADC lookup table (per query: dot of each query subvector
    with each sub-centroid, ``m_sub·n_codes`` doubles, broadcast with
    the probe rows). Raw corpus vectors are touched only by the
    shortlist rerank join (``|Q|·k·shortlist_factor`` rows). All
    stages are ordinary DataFrame ops: two broadcast joins + one
    window.

    Vectors are L2-normalized before encoding, so the sum of
    per-subspace dots approximates full cosine directly.
    """
    coarse = _sample_centroids(
        corpus, id_col=id_col, vec_col=vec_col, n_cells=n_cells
    )
    # dim comes free with the centroid collect — no separate first() job
    dim = len(coarse[0])
    d_sub = dim // m_sub
    books = pq_codebooks(
        corpus, id_col=id_col, vec_col=vec_col,
        dim=dim, m_sub=m_sub, n_codes=n_codes,
    )
    cents_lit = lit_matrix(coarse)
    book_lits = [lit_matrix(b) for b in books]

    vec = F.col(vec_col).cast("array<double>")
    norm = F.sqrt(F.aggregate(vec, F.lit(0.0), lambda s, x: s + x * x))
    nvec = F.transform(vec, lambda x: x / norm)

    def best_cell(v: Column) -> Column:
        pairs = F.transform(
            cents_lit,
            lambda c, i: F.struct(
                F.aggregate(
                    F.zip_with(v, c, lambda x, y: x * y),
                    F.lit(0.0), lambda s, p: s + p,
                ).alias("dot"),
                i.alias("cell"),
            ),
        )
        return F.sort_array(pairs, asc=False)

    def sub(v: Column, j: int) -> Column:
        return F.slice(v, j * d_sub + 1, d_sub)

    def code_for_sub(sv: Column, j: int) -> Column:
        # argmin squared L2 distance to the subspace codebook;
        # ``sv`` must be a materialized column (see below)
        dists = F.transform(
            book_lits[j],
            lambda c, i: F.struct(
                F.aggregate(
                    F.zip_with(sv, c, lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0), lambda s, p: s + p,
                ).alias("d"),
                i.alias("code"),
            ),
        )
        return F.sort_array(dists, asc=True)[0]["code"]

    # materialize the normalized vector, then the m_sub subvectors,
    # through projection boundaries: inlining ``nvec`` (which carries
    # the O(dim) norm aggregate + divide transform) into every one of
    # the m_sub·n_codes code-distance expressions bloats codegen and
    # re-evaluates the normalize per code — the same CollapseProject
    # hazard functions/text.py hashed_grams documents (the ≥3
    # references here keep the projections separate)
    pre = corpus.select(
        F.col(id_col).alias("nb_id"),
        vec.alias("__vec"),
        nvec.alias("__nvec"),
    ).select(
        "nb_id",
        "__vec",
        *[sub(F.col("__nvec"), j).alias(f"__sv{j}") for j in range(m_sub)],
    )
    assigned = pre.select(
        F.col("nb_id"),
        best_cell(F.col("__vec"))[0]["cell"].alias("cell"),
        F.array(
            *[code_for_sub(F.col(f"__sv{j}"), j) for j in range(m_sub)]
        ).alias("codes"),
    )
    # per-query ADC table: dot of each normalized query subvector with
    # every sub-centroid, flattened to m_sub*n_codes slots
    lut = F.flatten(
        F.array(*[
            F.transform(
                book_lits[j],
                lambda c: F.aggregate(
                    F.zip_with(sub(F.col("q_nvec"), j), c,
                               lambda x, y: x * y),
                    F.lit(0.0), lambda s, p: s + p,
                ),
            )
            for j in range(m_sub)
        ])
    )
    q_probe = (
        corpus.select(
            F.col(id_col).alias("q_id"),
            vec.alias("q_emb"),
            nvec.alias("q_nvec"),
        )
        .join(
            F.broadcast(query_ids.select(F.col(id_col).alias("q_id"))),
            "q_id",
        )
        .select(
            "q_id", "q_emb",
            lut.alias("__lut"),
            F.explode(
                F.slice(best_cell(F.col("q_nvec")), 1, n_probe)
            ).alias("pc"),
        )
        .select("q_id", "q_emb", "__lut", F.col("pc.cell").alias("cell"))
    )
    adc = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(m_sub - 1)),
            lambda c, j: F.element_at(
                F.col("__lut"), (j * n_codes + c + 1).cast("int")
            ),
        ),
        F.lit(0.0), lambda s, x: s + x,
    )
    cands = (
        F.broadcast(q_probe)
        .join(assigned, "cell")
        .filter(F.col("q_id") != F.col("nb_id"))
        .dropDuplicates(["q_id", "nb_id"])
        .withColumn("adc", adc)
    )
    shortlist = topk_per_group(
        cands.select("q_id", "q_emb", "nb_id", "adc"),
        ["q_id"], [F.desc("adc"), F.asc("nb_id")],
        k * shortlist_factor, rank_col="__adc_rank",
    )
    # exact rerank: only the shortlist touches raw corpus vectors
    nb_vecs = corpus.select(
        F.col(id_col).alias("nb_id"), vec.alias("nb_emb")
    )
    scored = (
        nb_vecs.join(
            F.broadcast(shortlist.select("q_id", "q_emb", "nb_id")), "nb_id"
        )
        .withColumn("cosine", _cosine(F.col("q_emb"), F.col("nb_emb")))
    )
    top = topk_per_group(
        scored, ["q_id"], [F.desc("cosine"), F.asc("nb_id")], k,
        rank_col="rank",
    )
    return top.select(
        "q_id", "nb_id", F.col("rank").cast("bigint").alias("rank"), "cosine"
    )


# ---------------- SemDeDup: semantic dedup over IVF cells ------------


def semantic_dedup(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    n_cells: int = 16,
    centroids="sample",
    max_cell: int = 256,
    n_assign: int = 1,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) at corpus scale: cluster the
    embedding space into IVF cells, generate candidate pairs ONLY
    within a cell, and drop every vector that has a lower-id
    same-cell neighbor with cosine ≥ ``threshold`` (deterministic
    min-id survivor — the same rule the oracle-checked bounded
    variant in queries/similarity.py pins exactly).

    Scale shape:

    - cell assignment is a map-only literal-matrix transform (one
      ``lit_matrix`` shared subtree — the IVF fold);
    - pair generation is the chunked posting-list expansion
      (functions/pairs.py ``explode_bucket_pairs``): a hot cell cuts
      into ``max_cell``-sized chunk-pair rows instead of one O(c²)
      array row, the ADVICE-r2 skew escape shared with minhash/simhash;
    - only candidate pairs rejoin the raw vectors (two equi-joins) for
      the exact-cosine verify — never an all-pairs cross of the corpus.

    ``n_cells`` should grow with the corpus (cells stay ~|corpus| /
    n_cells); ``centroids="kmeans"`` buys density-following cells at
    the cost of a bounded training job (see :func:`ivf_topk`).

    Returns one row per corpus vector: ``(id_col, cell, keep)``.
    Recall caveat (inherent to SemDeDup): with ``n_assign=1`` a
    near-dup pair split across two cells is not examined — the paper
    accepts this. ``n_assign=2`` assigns each vector to its top-2
    cells FOR CANDIDATE GENERATION ONLY (the reported ``cell`` and the
    survivor rule are unchanged), closing most cross-cell misses for
    ~n_assign× candidate cost (VERDICT r4). ``centroids`` may also be
    an explicit matrix (list of row-lists) for caller-controlled
    cells.
    """
    from ..functions.pairs import explode_bucket_pairs

    if isinstance(centroids, str):
        if centroids == "kmeans":
            mat = _kmeans_centroids(
                corpus, id_col=id_col, vec_col=vec_col, n_cells=n_cells
            )
        elif centroids == "sample":
            mat = _sample_centroids(
                corpus, id_col=id_col, vec_col=vec_col, n_cells=n_cells
            )
        else:
            raise ValueError(f"unknown centroids mode {centroids!r}")
    else:
        mat = [list(row) for row in centroids]
    if not 1 <= n_assign <= len(mat):
        raise ValueError(
            f"n_assign={n_assign} must be in [1, n_cells={len(mat)}]"
        )
    cents_lit = lit_matrix(mat)
    vec = F.col(vec_col).cast("array<double>")
    ranked_cells = F.sort_array(
        F.transform(
            cents_lit,
            lambda c, i: F.struct(
                F.aggregate(
                    F.zip_with(vec, c, lambda x, y: x * y),
                    F.lit(0.0),
                    lambda s, p: s + p,
                ).alias("dot"),
                i.alias("cell"),
            ),
        ),
        asc=False,
    )
    assigned = corpus.select(
        F.col(id_col).alias("__id"),
        vec.alias("__vec"),
        ranked_cells[0]["cell"].alias("cell"),
        F.transform(
            F.slice(ranked_cells, 1, n_assign), lambda s: s["cell"]
        ).alias("__cand_cells"),
    )
    # candidate generation over the top-n_assign cells per vector; the
    # reported cell and the survivor rule stay primary-cell/min-id
    members = assigned.select(
        "__id", F.explode("__cand_cells").alias("cell")
    ).groupBy("cell").agg(
        F.sort_array(F.collect_set("__id")).alias("ids")
    )
    cand = explode_bucket_pairs(
        members,
        "ids",
        lambda x, y: F.struct(x.alias("id_a"), y.alias("id_b")),
        max_cell,
    ).select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
    if n_assign > 1:
        # a pair sharing two assigned cells is generated twice —
        # dedup before the (more expensive) exact-cosine verify
        cand = cand.distinct()
    va = assigned.select(F.col("__id").alias("id_a"), F.col("__vec").alias("__va"))
    vb = assigned.select(F.col("__id").alias("id_b"), F.col("__vec").alias("__vb"))
    dropped = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .filter(_cosine(F.col("__va"), F.col("__vb")) >= threshold)
        .select(F.col("id_b").alias("__id"))
        .distinct()
        .withColumn("__dropped", F.lit(True))
    )
    return (
        assigned.join(dropped, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.col("cell").cast("int").alias("cell"),
            F.col("__dropped").isNull().alias("keep"),
        )
    )


# ---------------- Johnson–Lindenstrauss random projection ------------


def projection_matrix(dim: int, out_dim: int, seed: int = _SEED) -> list[list[float]]:
    """Deterministic sparse-sign JL matrix (Achlioptas 2003): entries
    ±√(3/out_dim) or 0 with probabilities 1/6, 1/6, 2/3 — the database-
    friendly construction (3× fewer multiplies than Gaussian, same
    distance-preservation guarantee; the √3 compensates the zeros so
    E[(Rx)_i²] = ‖x‖²/out_dim and expected norms are preserved)."""
    rng = random.Random((seed << 16) ^ out_dim ^ (dim << 1))
    s = (3.0 / out_dim) ** 0.5
    rows = []
    for _ in range(out_dim):
        row = []
        for _ in range(dim):
            r = rng.random()
            row.append(s if r < 1 / 6 else (-s if r < 1 / 3 else 0.0))
        rows.append(row)
    return rows


def random_projection(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    out_col: str = "projected",
    dim: int,
    out_dim: int,
    seed: int = _SEED,
) -> DataFrame:
    """Johnson–Lindenstrauss dimensionality reduction as a map-only
    literal-matrix transform.

    High-dim embeddings make every ANN stage pay O(dim) per candidate;
    projecting 128→32 dims cuts that 4× while approximately preserving
    pairwise distances (the JL lemma), which is why production ANN
    pipelines project before bucketing. The projection matrix is
    deterministic (seeded, engine-independent) and inlined as ONE
    ``lit_matrix`` expression — a single map-side pass, no shuffle, no
    UDF; the same shared-fold shape as the IVF centroid assignment.

    Compose with the ANN paths by projecting corpus and queries with
    the SAME (dim, out_dim, seed) and running LSH/IVF on ``out_col``.
    """
    mat = lit_matrix(projection_matrix(dim, out_dim, seed))
    vec = F.col(vec_col).cast("array<double>")
    return df.withColumn(
        out_col,
        F.transform(
            mat,
            lambda row: F.aggregate(
                F.zip_with(vec, row, lambda x, r: x * r),
                F.lit(0.0),
                lambda s, p: s + p,
            ),
        ),
    )
