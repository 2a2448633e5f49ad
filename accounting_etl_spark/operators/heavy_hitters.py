"""Heavy hitters over unbounded-cardinality keys — Misra–Gries
candidates, exact verification.

``groupBy(key).count()`` already does map-side combining, but its
intermediate state is one counter PER DISTINCT KEY — at 100 TB of
free-text tokens or URLs that count table is itself corpus-sized. The
frequent-items sketch bounds the state: a Misra–Gries summary of
capacity m per Arrow batch (every item with true frequency > n/m is
GUARANTEED to survive — the classic deterministic bound), the
≤ batches·m surviving candidates union into a small table, and a
second exact pass counts ONLY the candidates (broadcast semi-join).
Output counts are exact; the sketch only bounds which keys can be
candidates, so the result is "every key with frequency above the
threshold, with its exact count" — no approximate counts leak out.

This is one of the few legitimate per-partition-imperative operators
(SURVEY §4): the summary needs bounded mutable state per batch, which
no built-in aggregate expresses without materializing all keys. The
pass is Arrow-batched ``mapInPandas``; batch boundaries only ever
ADD candidates (a union of MG summaries is a valid MG summary with
summed error), never lose one, so correctness is unaffected by how
Spark slices partitions into batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(
    df: DataFrame,
    *,
    key_col: str,
    capacity: int = 1024,
    min_count: int | None = None,
) -> DataFrame:
    """Exact counts for every key with frequency > n/capacity (and
    optionally ≥ ``min_count``), without a full-cardinality shuffle.

    Returns ``(key_col, count)``. The guarantee is one-sided: every
    sufficiently frequent key IS in the output; infrequent keys may
    appear too (their counts are still exact) unless filtered by
    ``min_count``.
    """
    from pyspark.sql.types import StructField, StructType

    key_field = df.schema[key_col]
    out_schema = StructType([StructField(key_col, key_field.dataType)])

    def mg_candidates(batches):
        for pdf in batches:
            counters: dict = {}
            for v in pdf[key_col]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < capacity:
                    counters[v] = 1
                else:
                    # decrement-all step, amortized via dict rebuild
                    counters = {
                        k: c - 1 for k, c in counters.items() if c > 1
                    }
            if counters:
                import pandas as pd

                yield pd.DataFrame({key_col: list(counters.keys())})

    cands = df.select(key_col).mapInPandas(
        mg_candidates, schema=out_schema
    ).distinct()
    exact = (
        df.join(F.broadcast(cands), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("count"))
    )
    if min_count is not None:
        exact = exact.filter(F.col("count") >= min_count)
    return exact
