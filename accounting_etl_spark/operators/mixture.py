"""Domain-mixture token budgeting — "this training run is 30% web,
20% code, …" as a dataflow operator.

Pretraining mixtures allocate the token budget across domains by
target weight (the tuned mixtures of DoReMi, Xie et al. 2023, and
the published Pile/LLaMA recipes), then take the best documents of
each domain until that domain's allocation is spent. This is the
per-group form of token-budget selection (operators/budget.py):

- each domain's allocation is an exact corpus fraction —
  ``keep while cum_g * den_g <= corpus_total * num_g`` — all 64-bit
  integer math, so the boundary document of every domain is
  bit-identical across engines (the repo's determinism conventions;
  no double rounding at any cutoff);
- the per-domain running sum is the GROUPED distributed prefix-sum
  (packing.prefix_sum with ``group_cols``): range partition leads
  with the domain, local cumsums window on (domain, pid), and the
  offsets table is one row per (domain, partition) — a huge domain
  never collapses into a single window task, which is exactly how a
  naive ``Window.partitionBy(domain)`` dies at 100 TB;
- the corpus total is a 1-row aggregate broadcast into the plan.

Weights need not sum to 1 (undersubscribed mixtures leave budget
unused; oversubscribed ones are each honored against the same corpus
total — callers pick the policy).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .packing import OrderCols, prefix_sum


def mixture_select(
    df: DataFrame,
    *,
    group_col: str,
    order_col: OrderCols,
    weights: dict[str, tuple[int, int]],
    size_col: str = "n_tokens",
    default_weight: tuple[int, int] = (0, 1),
    num_partitions: int | None = None,
) -> DataFrame:
    """Flag, per domain, the best-ranked prefix whose token total fits
    the domain's corpus-fraction allocation.

    ``weights`` maps ``group_col`` values to ``(num, den)`` exact
    fractions OF THE WHOLE CORPUS's tokens; unlisted domains get
    ``default_weight`` (default: excluded). Adds ``cum_tokens``
    (per-domain inclusive running total in ``order_col`` order) and
    ``keep``.
    """
    order = order_col if isinstance(order_col, (list, tuple)) else [order_col]
    out = prefix_sum(
        df,
        order_col=list(order),
        value_col=size_col,
        out_col="cum_tokens",
        num_partitions=num_partitions,
        group_cols=[group_col],
    )
    total = df.agg(F.sum(size_col).cast("bigint").alias("__corpus_tokens"))

    def _lookup(branch: int) -> Column:
        expr: Column = F.lit(default_weight[branch])
        for g, w in weights.items():
            expr = F.when(F.col(group_col) == g, F.lit(w[branch])).otherwise(
                expr
            )
        return expr.cast("bigint")

    return (
        out.crossJoin(F.broadcast(total))
        .withColumn(
            "keep",
            # num == 0 (excluded domain) is always-drop: without the
            # guard, zero-token head rows satisfy 0 <= 0 and leak
            # through the budget boundary (ADVICE r4)
            (_lookup(0) > 0)
            & (
                F.col("cum_tokens") * _lookup(1)
                <= F.col("__corpus_tokens") * _lookup(0)
            ),
        )
        .drop("__corpus_tokens")
    )
