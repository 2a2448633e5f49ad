"""Streaming semantic admission — the embedding twin of
streaming/dedup.py, probing the persisted IVF index.

A continuously-ingesting multimodal pipeline admits a vector only if
nothing semantically equivalent is already in the corpus: each
micro-batch (1) drops its own internal near-duplicates with the batch
SemDeDup rule (operators/similarity.py semantic_dedup — min-id
survivor within IVF cells), (2) probes the PERSISTED index
(operators/ann_index.py) for each survivor's nearest indexed neighbor
and drops matches at/above the cosine threshold, then (3) appends the
admitted vectors to the index so later batches dedup against earlier
admissions — the same grow-only-index contract as the exact-hash
admission filter.

This runs under ``foreachBatch``: the probe needs the driver-known
probed-cell list (that is what buys partition pruning on the postings
scan), which a pure streaming transformation cannot produce. Each
batch is bounded by the trigger, so the per-batch driver work is the
≤ n_cells probe-list collect — nothing data-sized.

Admission order is arrival order (micro-batch boundaries are not
deterministic), so the verdict is "new vs everything admitted so
far", not the batch operator's global min-id survivor — the same
ordering caveat streaming/dedup.py documents.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def semantic_admission_batch(
    batch: DataFrame,
    index_path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    n_probe: int = 2,
    batch_n_cells: int = 8,
    append: bool = True,
) -> DataFrame:
    """One micro-batch of the admission filter (also usable in plain
    batch backfills). Returns the admitted rows; appends them to the
    index when ``append``.

    Ids must be globally unique across the stream and the index (the
    probe excludes only exact id self-matches).
    """
    from ..operators.ann_index import append_to_ivf_index, query_ivf_index
    from ..operators.similarity import semantic_dedup

    spark = batch.sparkSession
    # (1) within-batch SemDeDup: min-id survivor inside IVF cells
    keep = semantic_dedup(
        batch,
        id_col=id_col,
        vec_col=vec_col,
        threshold=threshold,
        n_cells=batch_n_cells,
    ).filter(F.col("keep"))
    survivors = batch.join(
        keep.select(F.col(id_col)), id_col, "left_semi"
    )
    # micro-batches re-use `survivors` on both the probe and the
    # admission sides — materialize once instead of re-running the
    # within-batch dedup per consumer
    survivors = survivors.localCheckpoint(eager=True)
    # (2) probe the persisted index: nearest indexed neighbor per row
    near = query_ivf_index(
        spark,
        index_path,
        survivors,
        id_col=id_col,
        vec_col=vec_col,
        k=1,
        n_probe=n_probe,
    )
    dup_ids = (
        near.filter(F.col("cosine") >= threshold)
        .select(F.col("q_id").alias(id_col))
        .distinct()
    )
    # materialize once: the index append below and the caller's sink
    # otherwise each re-run the probe join and within-batch dedup
    # (correct only because the postings read snapshots its file
    # listing before the append — ADVICE r4)
    admitted = survivors.join(dup_ids, id_col, "left_anti").localCheckpoint(
        eager=True
    )
    # (3) grow the index so later batches see these admissions
    if append:
        append_to_ivf_index(
            admitted.select(id_col, vec_col), index_path,
            id_col=id_col, vec_col=vec_col,
        )
    return admitted


def stream_semantic_admission(
    stream: DataFrame,
    index_path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    n_probe: int = 2,
    batch_n_cells: int = 8,
    sink: Callable[[DataFrame, int], None] | None = None,
):
    """``foreachBatch`` writer for the admission filter.

    ``sink(admitted_df, batch_id)`` receives each batch's admitted
    rows (after the index append); defaults to a no-op so the index
    itself is the output. Returns the ``DataStreamWriter`` — caller
    configures trigger/checkpoint and starts it.
    """

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        admitted = semantic_admission_batch(
            batch,
            index_path,
            id_col=id_col,
            vec_col=vec_col,
            threshold=threshold,
            n_probe=n_probe,
            batch_n_cells=batch_n_cells,
            append=True,
        )
        if sink is not None:
            sink(admitted, batch_id)

    return stream.writeStream.foreachBatch(process)
