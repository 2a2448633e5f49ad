"""Entity resolution — blocked record-linkage dedup of one table
against itself (vendors, authors, customer names), the master-list-
free counterpart of the two-tier lookup's dim matching (the
reference's lookup in ``database.py:83-126`` resolves rows AGAINST a
vendor dim; this operator
finds the entities when no dim exists yet).

Classic three-stage shape, each stage scale-bounded:

- **Multi-pass blocking**: every record emits one key per caller
  expression (pass-tagged so equal strings from different passes
  never collide); only records sharing a key are ever compared.
  With keys chosen so an edit within one key region leaves another
  key intact (e.g. key1 = first two tokens, key2 = last two), every
  single-edit pair shares >= 1 key — 100% recall for the edits the
  keys were designed around, and recall loss outside that is an
  explicit, documented property of the chosen keys (blocking IS part
  of blocked-ER semantics; the oracle mirrors the same keys).
- **Bounded pair generation**: per block, records collect into a
  sorted struct array and expand through the chunked pair explosion
  (``functions/pairs.py explode_bucket_pairs``) — a hot block (many
  records named identically) never materializes O(n^2) structs in
  one row.  A cheap length-difference prune runs before the edit
  distance (|len a - len b| > max_dist implies lev > max_dist), and
  the levenshtein itself is threshold-bounded (JVM early-exit band).
- **Clustering**: matched pairs are edges; the entity label is the
  component's minimum record id (``operators/graph.py``
  connected_components — label propagation, rounds bounded by
  component diameter).  Singletons keep their own id.

Output: (id, name, entity_id, cluster_size, is_canonical) — one row
per input record, is_canonical marks the minimum-id representative.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.checkpointing import stable_checkpoint
from ..functions.pairs import explode_bucket_pairs
from .graph import connected_components


def match_pairs(
    records: DataFrame,
    *,
    id_col: str = "id",
    name_col: str = "name",
    keys: Sequence[Column],
    max_dist: int = 1,
    max_block: int = 1000,
) -> DataFrame:
    """Candidate generation + verification: (id_a, id_b) with
    id_a < id_b and levenshtein(name_a, name_b) <= max_dist, over
    pairs sharing at least one pass-tagged blocking key.

    Each caller key is additionally sub-blocked by NAME LENGTH before
    any pair is materialized (profiled at sf0.1: the coarsest pass
    carried 81% of 1.14M candidate pairs from 150 fat blocks, all of
    which the post-pair length prune then discarded — pruning must
    happen before the quadratic stage, not after). Matching pairs have
    |len a − len b| <= max_dist, and two offset bucket schemes of
    width 2·max_dist (offsets 0 and max_dist) guarantee any such pair
    shares a bucket in at least one scheme: both boundary families are
    spaced 2d apart and interleave at distance d, so a length interval
    of span <= d cannot cross a boundary of both. Recall is therefore
    still structural — every pair the original blocking found within
    the distance threshold is found here — while a fat block splits
    into per-length-range sub-blocks and the pair stage goes from
    quadratic in the block to quadratic in the largest length slice.
    """
    if not keys:
        raise ValueError("at least one blocking key expression required")
    ln = F.length(F.col(name_col))
    if max_dist > 0:
        w = 2 * max_dist
        buckets = [F.floor(ln / w), F.floor((ln + max_dist) / w)]
    else:  # exact match ⇒ equal lengths: one exact-length scheme
        buckets = [ln]
    tagged = F.array(
        *[
            F.concat_ws(
                ":",
                F.lit(f"{i}.{j}"),
                b.cast("string"),
                k.cast("string"),
            )
            for i, k in enumerate(keys)
            for j, b in enumerate(buckets)
        ]
    )
    # key exprs reference the caller's column names — evaluate them
    # against the original frame, in the same projection
    blocked = records.select(
        F.col(id_col).cast("bigint").alias("__id"),
        F.col(name_col).alias("__nm"),
        F.explode(tagged).alias("__blk"),
    )
    # posting list per block, sorted by id so chunk expansion yields
    # ordered (a < b) pairs; structs carry the name so verification
    # needs no join back
    postings = (
        blocked.groupBy("__blk")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("__id", "__nm"))
            ).alias("recs")
        )
        .filter(F.size("recs") >= 2)
    )
    pairs = explode_bucket_pairs(
        postings,
        "recs",
        lambda x, y: F.struct(
            x["__id"].alias("id_a"),
            y["__id"].alias("id_b"),
            x["__nm"].alias("nm_a"),
            y["__nm"].alias("nm_b"),
        ),
        max_block,
    ).select("p.id_a", "p.id_b", "p.nm_a", "p.nm_b")
    return (
        pairs.filter(
            F.abs(F.length("nm_a") - F.length("nm_b")) <= max_dist
        )
        .filter(
            F.levenshtein("nm_a", "nm_b", max_dist).between(0, max_dist)
        )
        .select("id_a", "id_b")
        .distinct()
    )


def resolve_entities(
    records: DataFrame,
    *,
    id_col: str = "id",
    name_col: str = "name",
    keys: Sequence[Column],
    max_dist: int = 1,
    max_block: int = 1000,
    max_iter: int = 25,
) -> DataFrame:
    """Blocked entity resolution; see module docstring.

    Returns every input record labeled with its entity:
    (id, name, entity_id, cluster_size, is_canonical).
    """
    rec = records.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.col(name_col).alias("name"),
    )
    # exact-duplicate collapse: byte-identical names are distance-0
    # pairs by definition, so they are matched FOR FREE by folding
    # each identical-name group into its min-id representative before
    # any pairwise work. On duplicate-heavy corpora this is the
    # difference between pair volume quadratic in the duplication
    # depth and pair volume linear in the DISTINCT-name count — the
    # clustering is provably unchanged: edges between identical-name
    # records are implied by the shared representative, and the
    # rep-level CC label (min rep id) equals the min record id of the
    # merged cluster because each rep is already its group's minimum.
    #
    # The per-name record count rides the SAME aggregation (r12, guide
    # §2.3/§2.4): cluster sizes are then a name-level sum — the old
    # shape aggregated the record-level join output and joined it back,
    # evaluating the record⋈label join twice. reps is checkpointed
    # because three consumers read it (blocking input, the label
    # attach, the size sum); it is bounded by the DISTINCT-name count.
    reps = stable_checkpoint(
        rec.groupBy("name").agg(
            F.min("id").alias("rep"),
            F.count(F.lit(1)).cast("bigint").alias("__n_recs"),
        )
    )
    edges = match_pairs(
        reps.select(
            F.col("rep").alias(id_col), F.col("name").alias(name_col)
        ),
        id_col=id_col,
        name_col=name_col,
        keys=keys,
        max_dist=max_dist,
        max_block=max_block,
    )
    labels = connected_components(
        edges, src="id_a", dst="id_b", max_iter=max_iter
    )
    rep_label = reps.join(
        labels, reps["rep"] == labels["node"], "left"
    ).select(
        "name",
        "__n_recs",
        F.coalesce(F.col("label"), F.col("rep")).alias("entity_id"),
    )
    # cluster_size = records per entity = Σ per-name counts over the
    # entity's names — identical to counting the record-level rows,
    # computed on the bounded name table instead
    sizes = rep_label.groupBy("entity_id").agg(
        F.sum("__n_recs").cast("bigint").alias("cluster_size")
    )
    name_map = rep_label.select("name", "entity_id").join(
        sizes, "entity_id"
    )
    # ONE record-sized join pass attaches (entity_id, cluster_size)
    return rec.join(name_map, "name").select(
        "id",
        "name",
        "entity_id",
        "cluster_size",
        (F.col("id") == F.col("entity_id")).alias("is_canonical"),
    )
