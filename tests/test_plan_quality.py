"""Plan-quality regression guards (SURVEY §4, COVERAGE scale posture):
pushdown, pruning, broadcast selection, and JVM-only hot paths,
asserted on the physical plans so a refactor can't silently lose them.
"""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_flagship_pushdown_pruning_broadcast(spark):
    from accounting_etl_spark.queries.relational import q_flagship_revenue

    plan = _plan(q_flagship_revenue(spark, SF_SMOKE))
    # shipdate filter reaches the parquet scan
    assert "PushedFilters" in plan and "l_shipdate" in plan
    # column pruning: the lineitem scan must not read unused measures
    assert "l_tax" not in plan.split("PushedFilters")[0] or "l_tax" not in plan
    # all four dims broadcast at this size
    assert plan.count("BroadcastHashJoin") >= 4
    # no Python evaluation anywhere in the hot path
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_statement_parse_stays_in_jvm(spark):
    """After the one clustering UDF, the entire row parse is native —
    exactly one Arrow-Python boundary in the whole plan (U2 decomposed
    per SURVEY §2.10)."""
    from accounting_etl_spark.plans import fixtures as FX
    from accounting_etl_spark.plans.statement import extract_transactions

    plan = _plan(extract_transactions(FX.words_df(spark)))
    assert plan.count("FlatMapGroupsInPandas") == 1
    assert "BatchEvalPython" not in plan


def test_two_tier_lookup_broadcasts_dim(spark):
    from accounting_etl_spark.queries.relational import q_two_tier_lookup

    plan = _plan(q_two_tier_lookup(spark, SF_SMOKE))
    # tier 1 broadcast hash join + tier 2 broadcast nested loop
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" in plan
    # no sort-merge join: nothing shuffles the fact side for lookup
    assert "SortMergeJoin" not in plan


def test_dedup_exact_single_shuffle(spark):
    from accounting_etl_spark.queries.text import q_dedup_exact

    plan = _plan(q_dedup_exact(spark, SF_SMOKE))
    # the content-hash window is ONE exchange; the only other allowed
    # exchange is the deliberate small-file CPU-spread repartition
    # (a no-op at real scale)
    assert plan.count("Exchange hashpartitioning") <= 2


def test_minhash_plan_no_product_bounded_exchanges(spark):
    from accounting_etl_spark.queries.multimodal import q_near_dup_minhash

    plan = _plan(q_near_dup_minhash(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # posting-list pair generation: no join stage at all (the
    # hot-bucket skew escape is chunk-pair rows, the identical-
    # signature collapse is a window min over the CHECKPOINTED sig
    # table — join-free), and the shuffle count stays bounded
    # (collapse window per union branch + band agg + pair distinct)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 4
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_simhash_plan_single_signature_pass(spark):
    from accounting_etl_spark.queries.multimodal import q_near_dup_simhash

    plan = _plan(q_near_dup_simhash(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    # the signature fold runs ONCE: the (id, sig) projection is
    # checkpointed inside the shared banded pairing, so the visible
    # plan scans the checkpoint RDD, never re-scans documents for a
    # second side (a chunked self-join would; the hot-bucket skew
    # escape is join-free chunk-pair rows)
    assert plan.count("Scan parquet") <= 1
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 4


def test_ann_plans_bucketed_not_all_pairs(spark):
    from accounting_etl_spark.queries.similarity import q_ann_topk, q_ann_ivf

    for fn in (q_ann_topk, q_ann_ivf):
        df = fn(spark, SF_SMOKE)
        plan = _plan(df)
        assert "CartesianProduct" not in plan, fn.__name__
        assert "BroadcastNestedLoopJoin" not in plan, fn.__name__
        assert "BatchEvalPython" not in plan, fn.__name__
        # codegen-bloat guard: the centroid/hyperplane dot products must
        # ride ONE shared transform per side, not one aggregate subtree
        # per cell/plane (n_cells=16 would show ~35 aggregates unfolded)
        opt = df._jdf.queryExecution().optimizedPlan().toString()
        assert opt.count("aggregate(") <= 8, fn.__name__


def test_spread_gates_on_partition_count(spark):
    """spread() repartitions under-partitioned scans but must NOT pin
    an exchange (or a parallelism ceiling) into plans whose input is
    already wide — the 100 TB posture (VERDICT r2 'What's wrong' #2)."""
    from accounting_etl_spark.functions.spread import spread

    narrow = spark.range(0, 1000, 1, 1).withColumnRenamed("id", "k")
    out = spread(narrow, "k")
    assert out.rdd.getNumPartitions() == (
        spark.sparkContext.defaultParallelism
    )
    assert "Exchange hashpartitioning" in _plan(out)

    wide = spark.range(0, 1000, 1, 64).withColumnRenamed("id", "k")
    same = spread(wide, "k")
    assert same is wide  # no added exchange, native splits kept


def test_range_join_two_exchanges_no_distinct(spark):
    from accounting_etl_spark.queries.events import q_range_join_events

    plan = _plan(q_range_join_events(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    # equi-join on (key, bucket): at most one exchange per side (at
    # smoke scale AQE broadcasts instead: zero), and never a third
    # exchange for a trailing distinct (pairs are unique by construction)
    assert plan.count("Exchange hashpartitioning") <= 2


def test_decontam_broadcasts_eval_grams(spark):
    """The benchmark gram set joins the corpus side via broadcast —
    the corpus gram explode must never hash-shuffle for the join
    (only the per-doc hit aggregation shuffles)."""
    from pyspark.sql import functions as F

    from accounting_etl_spark.operators.decontam import (
        decontaminate,
        eval_ngrams,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    ev = eval_ngrams(docs.filter(F.col("doc_id") % 97 == 0), n=4)
    plan = _plan(decontaminate(docs, ev, n=4))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the gram-key join is broadcast (the doc_id join back may be any
    # strategy — it is doc-count-sized, not gram-sized)
    gram_joins = [
        ln for ln in plan.splitlines()
        if "Join" in ln and "[gh#" in ln
    ]
    assert gram_joins, "no gram-key join found in plan"
    assert all("BroadcastHashJoin" in ln for ln in gram_joins), gram_joins


def test_decontam_gate_degrades_to_shuffle_above_limit(spark):
    """Above the measured gram bound the eval side loses its broadcast
    hint (shuffled semi-equi join + the session's runtime bloom
    injection instead of an unbounded forced broadcast), and the
    verdicts are identical on both paths."""
    from pyspark.sql import functions as F

    from accounting_etl_spark.operators.decontam import (
        decontaminate,
        eval_ngrams,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    ev = eval_ngrams(docs.filter(F.col("doc_id") % 97 == 0), n=4)
    small = decontaminate(docs, ev, n=4)
    large = decontaminate(docs, ev, n=4, broadcast_limit=0)
    opt = large._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" not in opt, opt
    a = {r["doc_id"]: r["n_contam_grams"] for r in small.collect()}
    b = {r["doc_id"]: r["n_contam_grams"] for r in large.collect()}
    assert a == b and any(v > 0 for v in a.values())


def test_corpus_sized_broadcasts_gated_on_measured_cardinality(spark, monkeypatch):
    """Forced broadcast hints on sides whose cardinality grows with the
    corpus are 100 TB OOMs — a hint never falls back the way an
    AQE-chosen broadcast does (VERDICT r3 'What's wrong' #4). The
    Jaccard enrichment joins therefore gate the hint on a MEASURED doc
    count: hinted below _BROADCAST_DOC_LIMIT (keeps the much larger
    pairs side unshuffled), degrading to shuffle joins + checkpointed
    postings above it. tf-idf's vocab-sized df side carries no hint at
    all; its only hint is the one-row source-count cross join."""
    from accounting_etl_spark.queries import text as qt

    # below the limit: both enrichment joins hinted
    jac = qt.q_near_dup_jaccard(spark, SF_SMOKE)
    opt = jac._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("strategy=broadcast") == 2, opt
    tfidf = qt.q_tfidf_terms(spark, SF_SMOKE)
    opt = tfidf._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("strategy=broadcast") == 2, opt  # df_ + n_src

    # above the limit: no hints anywhere; postings checkpointed
    # (lineage truncated to a scanned RDD)
    monkeypatch.setattr(qt, "_BROADCAST_DOC_LIMIT", 0)
    jac = qt.q_near_dup_jaccard(spark, SF_SMOKE)
    opt = jac._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" not in opt, opt
    assert "LogicalRDD" in opt, opt

    tfidf = qt.q_tfidf_terms(spark, SF_SMOKE)
    opt = tfidf._jdf.queryExecution().optimizedPlan().toString()
    hints = [ln for ln in opt.splitlines() if "strategy=broadcast" in ln]
    # only the single-row countDistinct cross join survives above the
    # limit; tf is checkpointed (tokenize once)
    assert len(hints) == 1 and "Cross" in hints[0], hints
    assert "LogicalRDD" in opt, opt
