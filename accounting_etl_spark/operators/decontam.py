"""Benchmark decontamination — n-gram overlap against an eval set.

The training-data-pipeline stage that removes corpus documents which
leak evaluation/benchmark content (the GPT-3 / Pile "13-gram overlap"
rule, scaled down to the synthetic corpus): a document is contaminated
when any of its word n-grams also occurs in the benchmark set.

Scale posture (100 TB corpus, MB-scale benchmark): the benchmark gram
set is tiny by construction — eval suites are thousands of documents,
not billions — so it is built once, deduplicated, and **broadcast**.
The corpus side explodes each document's *distinct* gram hashes
(map-side, no shuffle), hits the broadcast set with an inner join
(map-side, no shuffle), and aggregates hit counts per ``doc_id``
(partial aggregation; the only shuffle, and only over the hit subset,
which is far smaller than the corpus). Documents with zero hits never
reach the shuffle — the final left join restores them with a zero
count. No all-pairs stage, no driver data beyond the plan.

Grams travel as 64-bit hashed-gram keys (functions/text.py
hashed_grams: xxhash64 over slices of a per-token hash array), not
raw strings: fixed-width, never materializes the gram text, and the
broadcast table is 8 bytes per gram regardless of gram length. Both
sides use the same scheme, so overlap semantics are those of raw
token sequences; the DuckDB oracle joins on its own representation
and the contaminated-doc SET matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.checkpointing import stable_checkpoint
from ..functions.text import hashed_grams, token_hashes, tokens_ws


def _gram_sets(
    df: DataFrame, cols: list[str], text_col: str, n: int
) -> DataFrame:
    """One row per input doc: ``cols`` + the distinct 64-bit n-gram
    key set (functions/text.py hashed_grams — both sides of the
    overlap join use the same key scheme, so membership semantics are
    those of raw token sequences). Checkpointed so the explode above
    it never re-evaluates the tokenize→hash tree (see hashed_grams
    notes on InferFiltersFromGenerate)."""
    th = df.select(
        *cols, token_hashes(tokens_ws(F.col(text_col))).alias("__th")
    )
    return stable_checkpoint(
        th.select(
            *cols,
            F.array_distinct(hashed_grams(F.col("__th"), n)).alias("__gs"),
        )
    )


def eval_ngrams(
    eval_docs: DataFrame, *, n: int = 4, text_col: str = "text"
) -> DataFrame:
    """Distinct gram-hash set of the benchmark corpus: one ``gh``
    column, deduplicated — the small side every corpus shard joins
    against."""
    return (
        _gram_sets(eval_docs, [], text_col, n)
        .select(F.explode("__gs").alias("gh"))
        .distinct()
    )


# Broadcast the eval gram set only when measurably small: 8 bytes per
# 64-bit gram key → 4M grams ≈ 32 MB broadcast. Eval suites are
# usually far below this; a contamination sweep against a huge
# reference corpus (e.g. "remove anything that appears in Common
# Crawl snapshot X") is not, and a forced hint there is a 100 TB
# driver/executor OOM that never falls back the way an AQE choice
# does (the near_dup_jaccard lesson, queries/text.py).
_BROADCAST_GRAM_LIMIT = 4_000_000


def decontaminate(
    docs: DataFrame,
    eval_grams: DataFrame,
    *,
    n: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_limit: int | None = None,
) -> DataFrame:
    """Per-document contamination verdict against a benchmark gram set.

    ``eval_grams`` is the output of :func:`eval_ngrams` (or any
    one-column ``gh`` DataFrame). Returns
    ``(id_col, n_contam_grams, is_contaminated)`` with one row per
    input document.

    The eval side is checkpointed and COUNTED, and the broadcast hint
    applies only under the measured bound; above it the gram join
    shuffles, where the session's runtime bloom-filter injection
    (session.py) prunes the corpus-side explode by the selective eval
    side at the scan — the engine-native form of the hand-rolled
    bloom prefilter, without a row-at-a-time Python membership UDF.
    """
    if broadcast_limit is None:
        broadcast_limit = _BROADCAST_GRAM_LIMIT
    ids = docs.select(id_col)
    exploded = _gram_sets(docs, [id_col], text_col, n).select(
        id_col, F.explode("__gs").alias("gh")
    )
    # one materialization serves the count AND the join probe
    eval_grams = stable_checkpoint(eval_grams)
    small = eval_grams.count() <= broadcast_limit
    eval_side = F.broadcast(eval_grams) if small else eval_grams
    hits = (
        exploded.join(eval_side, "gh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contam_grams"))
    )
    return (
        ids.join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_contam_grams"), F.lit(0))
            .cast("bigint")
            .alias("n_contam_grams"),
        )
        .withColumn("is_contaminated", F.col("n_contam_grams") > 0)
    )
