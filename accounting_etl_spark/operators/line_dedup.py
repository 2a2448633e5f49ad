"""Line-level corpus deduplication (RefinedWeb / CCNet style).

Web corpora carry boilerplate that repeats VERBATIM across many
documents — nav menus, cookie banners, "subscribe" footers — at the
LINE grain, below document-level dedup's radar.  RefinedWeb (Penedo
et al. 2023 §3.3) and CCNet (Wenzek et al. 2020 §2) both strip any
line whose normalized form appears in enough distinct documents.

Shape at 100 TB:

- docs explode to ``(doc_id, line_idx, line)`` map-side;
- the boilerplate table is ONE aggregation keyed on the 64-bit
  normalized-line hash (``count(distinct doc)`` — a bounded two-level
  agg, no pair expansion);
- boilerplate is by construction a SMALL set (lines repeated across
  ≥ ``min_docs`` documents), so the verdict join broadcasts it —
  gated on a measured count with a shuffled-join fallback, the same
  discipline as the Jaccard enrichment joins (queries/text.py);
- documents reassemble with one shuffle on ``doc_id``; the line order
  is restored by an ``array_sort`` over ``(line_idx, line)`` structs,
  so the result is deterministic under any partitioning.

Docs whose every line is boilerplate survive as empty-text rows (the
caller decides whether to drop them) — the per-doc aggregate runs over
ALL exploded lines, flagged, never anti-joined away.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ~16 bytes/row broadcast; 4M boilerplate lines ≈ 64 MB — the same
# order as the text.py gated broadcasts.
_BROADCAST_LINE_LIMIT = 4_000_000


def normalize_line(line: Column) -> Column:
    """CCNet-style line key: lowercase, trim, collapse internal
    whitespace — so spacing/caps variants of the same banner line
    count as one."""
    return F.regexp_replace(F.lower(F.trim(line)), r"\s+", " ")


def boilerplate_lines(
    exploded: DataFrame,
    *,
    doc_col: str = "doc_id",
    hash_col: str = "__lh",
    min_docs: int = 2,
) -> DataFrame:
    """Normalized-line hashes appearing in ≥ ``min_docs`` DISTINCT
    documents.  One shuffle on the line hash; ``countDistinct`` is a
    two-level partial agg (per-partition distinct first), never a
    per-line posting list."""
    return (
        exploded.groupBy(hash_col)
        .agg(F.countDistinct(doc_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def line_dedup(
    docs: DataFrame,
    lines_col: Column,
    *,
    doc_col: str = "doc_id",
    min_docs: int = 2,
    sep: str = "\n",
    broadcast_limit: int = _BROADCAST_LINE_LIMIT,
) -> DataFrame:
    """Strip corpus-repeated lines from every document.

    ``lines_col`` is an array<string> expression producing the
    document's lines (split on newline for real corpora; the test
    corpus synthesizes a lined page).  A normalized line occurring in
    ≥ ``min_docs`` distinct documents is removed from ALL documents
    (boilerplate has no "first owner" — RefinedWeb semantics).

    Returns one row per input document:
    ``(doc_col, n_lines, n_removed, n_kept, cleaned_text)`` with
    ``cleaned_text`` the kept lines re-joined in original order.
    """
    e = docs.select(
        F.col(doc_col), F.posexplode(lines_col).alias("line_idx", "line")
    ).withColumn("__lh", F.xxhash64(normalize_line(F.col("line"))))
    boiler = boilerplate_lines(
        e, doc_col=doc_col, hash_col="__lh", min_docs=min_docs
    ).select("__lh", F.lit(True).alias("__boiler"))
    # Boilerplate is the rare case; measure before hinting (the
    # Jaccard-gate pattern) so an adversarial corpus where *every*
    # line repeats cannot force an unbounded broadcast.
    if boiler.count() <= broadcast_limit:
        boiler = F.broadcast(boiler)
    flagged = e.join(boiler, "__lh", "left").withColumn(
        "__removed", F.coalesce(F.col("__boiler"), F.lit(False))
    )
    kept_struct = F.when(
        ~F.col("__removed"), F.struct("line_idx", "line")
    )
    return (
        flagged.groupBy(doc_col)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("__removed").cast("bigint")).alias("n_removed"),
            # collect_list drops the NULLs the when() leaves for
            # removed lines; array_sort on (line_idx, line) restores
            # document order deterministically under any partitioning
            F.array_sort(F.collect_list(kept_struct)).alias("__kept"),
        )
        .select(
            doc_col,
            "n_lines",
            "n_removed",
            (F.col("n_lines") - F.col("n_removed")).alias("n_kept"),
            F.array_join(
                F.transform(F.col("__kept"), lambda s: s["line"]), sep
            ).alias("cleaned_text"),
        )
    )
