"""Exact substring-span dedup signals (SURVEY §2.11 dedup family).

The technique behind "train-set substring dedup" (Lee et al. 2022,
*Deduplicating Training Data Makes Language Models Better*): find
long token spans (k-grams, k≈50 in the paper) that occur verbatim in
MORE THAN ONE document, and measure, per document, how much of its
text is covered by such cross-document spans. Documents with high
covered fractions are boilerplate/mirror copies that exact whole-doc
hashing misses and MinHash only catches above its similarity floor.

The paper builds a suffix array; the Spark-first restatement needs no
suffix structure at all, because the only question per k-gram is "does
it appear in ≥2 distinct docs" — a bounded aggregation, not a pair
expansion:

1. map-side: k-gram hashes with their token positions (posexplode);
2. one shuffle on the gram hash: duplicated iff ≥2 distinct docs,
   computed as ``min(doc_id) != max(doc_id)`` (two-phase partial agg
   with no distinct-set state; a hot boilerplate gram costs two
   counters, never a posting-list blowup — nothing is quadratic);
3. equi-join the duplicated-gram set back to the positions (shuffle
   on the same key, so AQE can reuse the exchange);
4. per-doc interval union: spans at positions p cover [p, p+k-1];
   overlapping spans must not double-count, so a window over
   positions merges intervals with a running-max end — the exact
   union length in one per-doc sort, no k× position explode.

Everything is integer math, so the per-doc numbers are bit-identical
across engines and partitionings (the DuckDB oracle runs the same
window recurrence).

At 100 TB: two shuffles keyed by the 64-bit gram hash (uniform —
xxhash64 output, no skew), one window partitioned by doc_id (per-doc
row count bounded by doc length / k). The k-gram set can optionally be
persisted as the corpus-side index for incremental batches, same
pattern as operators/incremental.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.checkpointing import stable_checkpoint
from ..functions.text import hashed_grams, token_hashes


# gram keys: the shared hashed-gram scheme (functions/text.py
# hashed_grams — xxhash64 over slices of a materialized token-hash
# array; 9.0s → 2.3s at sf1.0 vs string shingles for k=50). The
# DuckDB oracle groups on the raw gram text; the rollup is
# insensitive to the key representation.


def span_dup_metrics(
    docs: DataFrame,
    *,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document cross-doc span-duplication metrics.

    Returns one row per input document:

    - ``n_tokens``: whitespace token count,
    - ``n_grams``: k-gram count (``max(n_tokens - k + 1, 0)``),
    - ``n_dup_grams``: positions whose k-gram also occurs in ≥1 OTHER
      document (within-doc repeats alone do not count),
    - ``covered_tokens``: exact interval-union size of those spans,
    - ``coverage_frac``: covered_tokens / n_tokens (0.0 when empty).
    """
    toks = F.split(F.trim(F.col(text_col)), " ")
    hashed = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        token_hashes(toks).alias("__th"),
    )
    # Checkpointed at the one-row-per-doc stage, for two reasons:
    # (a) the gram subtree has two downstream consumers (dup-gram
    # aggregation and the join back) that would each re-evaluate it;
    # (b) Catalyst's InferFiltersFromGenerate puts a
    # ``size(__gh) > 0`` filter UNDER the posexplode with the whole
    # tokenize→hash→slice tree inlined into it — measured 4× the
    # query without the boundary. Against materialized arrays the
    # inferred filter is a length check.
    base = stable_checkpoint(
        hashed.select(
            "doc_id", "n_tokens",
            hashed_grams(F.col("__th"), k).alias("__gh"),
        )
    )
    # positions are 1-based (posexplode is 0-based; +1 matches the
    # oracle's range(1, ...) convention)
    pos = base.select(
        "doc_id", F.posexplode("__gh").alias("pos0", "gh")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "gh")
    # "≥2 distinct docs" ≡ min(doc_id) != max(doc_id): min/max partial
    # aggregates map-side combine (skew-safe on hot boilerplate grams)
    # and carry no distinct-set state
    dup_grams = (
        pos.groupBy("gh")
        .agg((F.min("doc_id") != F.max("doc_id")).alias("dup"))
        .filter(F.col("dup"))
        .select("gh")
    )
    hits = pos.join(dup_grams, "gh").select("doc_id", "pos")
    # interval union per doc: each hit covers [pos, pos+k-1]; the
    # running max end over earlier positions clips the overlap
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    end = F.col("pos") + F.lit(k - 1)
    prev_end = F.max(F.col("pos") + F.lit(k - 1)).over(w)
    contrib = F.greatest(
        F.lit(0).cast("bigint"),
        end - F.greatest(F.coalesce(prev_end, F.lit(0)), F.col("pos") - 1),
    )
    per_doc = (
        hits.select("doc_id", contrib.alias("c"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_dup_grams"),
            F.sum("c").alias("covered_tokens"),
        )
    )
    # n_grams is pure arithmetic on n_tokens — computing it as
    # size(__gh) would re-run the whole shingle+hash transform just to
    # count it (Catalyst does not fold size∘transform)
    stats = base.select(
        "doc_id",
        "n_tokens",
        F.greatest(
            F.col("n_tokens") - F.lit(k - 1),
            F.lit(0).cast("bigint"),
        ).alias("n_grams"),
    )
    return stats.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "n_grams",
        F.coalesce("n_dup_grams", F.lit(0)).cast("bigint").alias("n_dup_grams"),
        F.coalesce("covered_tokens", F.lit(0))
        .cast("bigint")
        .alias("covered_tokens"),
        F.when(
            F.col("n_tokens") > 0,
            F.coalesce("covered_tokens", F.lit(0)).cast("double")
            / F.col("n_tokens").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("coverage_frac"),
    )
