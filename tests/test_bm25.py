"""BM25 retrieval (queries/text.py q_bm25_topk) and the two-phase
top-k (operators/topk.py): hand-computed scores pin the exact-rational
Okapi formula the 'bm25' oracle variant then re-checks at corpus
scale."""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import functions as F

from accounting_etl_spark.operators.topk import (
    topk_per_group,
    topk_per_group_staged,
)


def _bm25(tf: int, df: int, dl: int, n_docs: int, tl: int) -> float:
    """Reference Okapi BM25 (k1=1.2, b=0.75) in exact rationals,
    mirroring the query's algebra: one float division at the end."""
    idf = Fraction(2 * n_docs - 2 * df + 1, 2 * df + 1)
    num = Fraction(22 * tl * tf)
    den = Fraction(10 * tl * tf + 3 * tl + 9 * dl * n_docs)
    r = idf * num / den
    # the query computes int(num_product)/int(den_product) in doubles
    return (2 * n_docs - 2 * df + 1) * 22 * tl * tf / (
        (2 * df + 1) * (10 * tl * tf + 3 * tl + 9 * dl * n_docs)
    ), r


def test_bm25_hand_computed(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    # 3 docs; query q1 = [table, scan, fast]. doc 0 is term-dense and
    # short -> must rank first; doc 2 has no query terms -> absent.
    texts = [
        "table scan table fast",
        "table row row row row row row row",
        "alpha beta alpha beta",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": [0, 1, 2],
                "text": texts,
                "lang": ["en"] * 3,
                "source": ["s0", "s1", "s2"],
                "n_chars": [len(t) for t in texts],
            }
        ),
        tmp_path / "documents.parquet",
    )
    from accounting_etl_spark.queries.text import q_bm25_topk

    rows = q_bm25_topk(spark, str(tmp_path)).collect()
    by_rank = {
        (r["source"], r["rank"]): (r["token"], r["score"]) for r in rows
    }
    n_docs, tl = 3, 4 + 8 + 4

    def score(doc_terms: dict[str, int], dl: int) -> float:
        # df per query term over this corpus: table in docs 0,1; scan
        # and fast in doc 0 only
        dfs = {"table": 2, "scan": 1, "fast": 1}
        parts = sorted(
            _bm25(tf, dfs[t], dl, n_docs, tl)[0]
            for t, tf in doc_terms.items()
        )
        tot = 0.0
        for p in parts:
            tot += p
        return tot

    exp0 = score({"table": 2, "scan": 1, "fast": 1}, 4)
    exp1 = score({"table": 1}, 8)
    assert by_rank[("q1", 1)][0] == "0"
    assert by_rank[("q1", 1)][1] == exp0  # bit-exact, not approx
    assert by_rank[("q1", 2)] == ("1", exp1)
    assert ("q1", 3) not in by_rank  # doc 2 matches nothing
    # q2/q3 terms absent from this corpus -> no rows for them
    assert not [k for k in by_rank if k[0] in ("q2", "q3")]


def test_staged_topk_matches_one_phase(spark):
    rows = [(i % 3, i, float((i * 37) % 101)) for i in range(300)]
    df = spark.createDataFrame(rows, "g int, id int, v double").repartition(8)
    order = [F.desc("v"), F.asc("id")]
    one = {
        (r["g"], r["rn"]): r["id"]
        for r in topk_per_group(df, ["g"], order, 7).collect()
    }
    two = {
        (r["g"], r["rn"]): r["id"]
        for r in topk_per_group_staged(df, ["g"], order, 7).collect()
    }
    assert one == two and len(one) == 21


def test_hybrid_rerank_flips_by_anchor_cosine(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    # BM25 order for q1: doc0 > doc1 > doc2 (term density). Embeddings
    # put doc2 parallel to the anchor doc0 and doc1 orthogonal, so the
    # hybrid rerank must flip docs 1 and 2.
    texts = [
        "table scan fast table scan fast",
        "table scan row row row row",
        "table row row row row row row row",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": [0, 1, 2],
                "text": texts,
                "lang": ["en"] * 3,
                "source": ["s"] * 3,
                "n_chars": [len(t) for t in texts],
            }
        ),
        tmp_path / "documents.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 1, 2], pa.int64()),
                "embedding": pa.array(
                    [[1.0, 0.0], [0.0, 1.0], [0.5, 0.0]],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([0, 0, 0], pa.int32()),
            }
        ),
        tmp_path / "embeddings.parquet",
    )
    from accounting_etl_spark.queries.text import (
        q_bm25_topk,
        q_hybrid_rerank,
    )

    bm = {
        r["rank"]: r["token"]
        for r in q_bm25_topk(spark, str(tmp_path)).collect()
        if r["source"] == "q1"
    }
    assert bm == {1: "0", 2: "1", 3: "2"}
    hy = {
        r["rank"]: (r["token"], r["score"])
        for r in q_hybrid_rerank(spark, str(tmp_path)).collect()
        if r["source"] == "q1"
    }
    assert hy[1][0] == "0"  # anchor stays first (cosine 1)
    assert hy[2][0] == "2" and abs(hy[2][1] - 1.0) < 1e-12  # parallel
    assert hy[3][0] == "1" and abs(hy[3][1]) < 1e-12  # orthogonal
