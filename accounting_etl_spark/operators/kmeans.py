"""Quantized Lloyd k-means — bit-exact across engines.

Embedding-space clustering is the backbone of several curation
operators in this engine (SemDeDup cells, IVF coarse routing, domain
discovery). MLlib's KMeans is float-iterative and therefore not
reproducible across engines or even partitionings; this variant
quantizes vectors to BIGINT (floor(x·scale) + offset, the offset
making every component non-negative so integer division is floor on
every engine) and runs Lloyd rounds in pure integer arithmetic:

- distances: Σ (x_i − c_i)² over BIGINTs (exact; bounded by
  d·(2·scale)² ≪ 2^63);
- assignment: argmin with first-lowest-centroid tie-break
  (``array_position`` of the min — deterministic);
- update: componentwise integer mean (floor), empty clusters keep
  their previous centroid.

A DuckDB oracle unrolls the same rounds (`queries/analytics.py`
variant 'kmeans'), so the final assignment — counts, integer centroid
components, member-id sums — hash-matches bit-for-bit.

Scale posture: assignment is a map-side expression over k inlined
centroid literals (no join, no shuffle — the IVF-centroid pattern);
the per-round update is one posexplode + groupBy(cluster, pos) whose
result is k·d rows — the only driver transfer, bounded by the model
size exactly like the IVF centroid collect. Rounds are a fixed
hyperparameter, not data-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**6
OFFSET = 1 << 20  # > SCALE: shifts any |x| ≤ 1.04 embedding positive


def quantize_vectors(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "qv"
) -> DataFrame:
    """float array → BIGINT array: floor(double(x)·SCALE) + OFFSET.
    The float→double cast is exact and the single double multiply is
    correctly rounded, so every engine produces the same integers."""
    return df.withColumn(
        out_col,
        F.expr(
            f"transform({vec_col}, x -> "
            f"CAST(floor(CAST(x AS DOUBLE) * {SCALE}) AS BIGINT) + {OFFSET})"
        ),
    )


def _assign(df: DataFrame, cents: list[list[int]], qv_col: str) -> DataFrame:
    dists = "array(" + ", ".join(
        f"aggregate(zip_with({qv_col}, array("
        + ", ".join(f"{v}L" for v in c)
        + "), (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)"
        for c in cents
    ) + ")"
    return (
        df.withColumn("__d", F.expr(dists))
        .withColumn(
            "cluster",
            (F.expr("array_position(__d, array_min(__d))") - 1).cast("int"),
        )
        .drop("__d")
    )


def kmeans_quantized(
    df: DataFrame,
    id_col: str = "vec_id",
    qv_col: str = "qv",
    k: int = 4,
    iters: int = 3,
) -> DataFrame:
    """Run ``iters`` assignment rounds (with ``iters - 1`` centroid
    updates between them) and return the input rows with the final
    ``cluster`` column. Initial centroids = the quantized vectors of
    the ``k`` smallest ids (deterministic, no RNG).

    The input is ``stable_checkpoint``-ed once up front (r12, guide
    §2.4 loop-invariant hoisting): the quantize-transform scan is
    consumed by the init collect, every per-round assignment pass and
    every centroid-update aggregation — 1 + iters + (iters-1) ≈ 2·iters
    evaluations of the same subtree without lineage truncation; with
    it, one materialization and 2·iters cheap re-reads."""
    from ..functions.checkpointing import stable_checkpoint

    df = stable_checkpoint(df)
    init = (
        df.orderBy(id_col).limit(k).select(id_col, qv_col).collect()
    )  # bounded: k rows
    cents = [list(r[qv_col]) for r in sorted(init, key=lambda r: r[id_col])]
    if len(cents) < k:
        raise ValueError(f"need at least k={k} rows, got {len(cents)}")
    d = len(cents[0])
    for it in range(iters):
        assigned = _assign(df, cents, qv_col)
        if it == iters - 1:
            return assigned
        sums = (
            assigned.select("cluster", F.posexplode(qv_col))
            .groupBy("cluster", "pos")
            .agg(F.sum("col").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )  # bounded: k·d rows (model-sized, the IVF-centroid contract)
        acc: dict[int, list[int]] = {}
        cnt: dict[int, int] = {}
        for r in sums:
            acc.setdefault(r["cluster"], [0] * d)[r["pos"]] = r["s"]
            cnt[r["cluster"]] = r["n"]
        cents = [
            [acc[c][i] // cnt[c] for i in range(d)] if c in cnt else cents[c]
            for c in range(k)
        ]
    return _assign(df, cents, qv_col)  # iters == 0 guard (not reached)
