"""Connected components over near-duplicate pair edges.

Candidate generators (exact Jaccard, MinHash-LSH, SimHash) emit PAIRS;
a production dedup needs CLUSTERS — one survivor per connected group
of near-duplicates. This is min-label propagation (the Pregel
formulation): every node starts labeled with itself; each round a
node takes the minimum label among itself and its neighbors; at
fixpoint the label is the component's minimum node id, a
deterministic canonical cluster id.

Scale notes:
- each round is one equi-join + one groupBy (shuffles on node id) —
  no all-pairs anything; rounds are bounded by the component
  diameter, and near-dup clusters are short-diameter in practice;
- ``stable_checkpoint`` truncates lineage per round (executor-side
  materialization locally, reliable-dir ``checkpoint`` when
  ``SPARK_GRAFT_CHECKPOINT_DIR`` is set on a cluster) — without it
  the plan doubles every iteration, the classic iterative-algorithm
  failure;
- the convergence probe is a scalar ``count`` per round (the one
  driver-visible value, same contract as any aggregate). For graphs
  with pathological diameters, the large-star/small-star variant
  (Kiveris et al., "Connected Components in MapReduce and Beyond")
  halves rounds; not needed for near-dup workloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.checkpointing import stable_checkpoint


def connected_components(
    edges: DataFrame,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    strict: bool = True,
) -> DataFrame:
    """Component label per node of the undirected graph in ``edges``.

    Returns (node, label) where label = min node id in the component.
    Nodes are exactly those appearing in an edge; callers union in
    isolated nodes themselves if they need them labeled.

    If ``max_iter`` rounds pass without reaching fixpoint the labels
    are NOT component ids — downstream dedup would silently keep
    multiple survivors per true cluster. ``strict=True`` (default)
    raises; ``strict=False`` warns and returns the truncated labels.
    """
    # one lazy executor-side materialization of the edge list: the
    # upstream pair generator (shingling, banding, ...) must run once,
    # not once per derived reference / iteration
    edges = stable_checkpoint(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    )
    nodes = (
        edges.select(F.col("u").alias("node"))
        .union(edges.select(F.col("v").alias("node")))
        .distinct()
    )
    adj = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    labels = nodes.select("node", F.col("node").alias("label"))
    changed = -1  # max_iter == 0: no round ran, nothing propagated
    for _ in range(max_iter):
        nbr = (
            adj.join(labels, adj["u"] == labels["node"])
            .select(F.col("v").alias("node"), "label")
        )
        new_labels = stable_checkpoint(
            labels.union(nbr).groupBy("node").agg(F.min("label").alias("label"))
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        msg = (
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing) — labels are NOT component "
            "ids; raise max_iter (rounds are bounded by component diameter)"
        )
        if strict:
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels
