"""Token-budget selection — "take the best documents until the token
budget is spent".

Training runs are provisioned in tokens, not documents: given a
quality ranking, a pipeline keeps the highest-ranked documents whose
cumulative token count fits the budget (an absolute token count, or a
fraction of the corpus total). The decision needs the same global
running sum as sequence packing, so this reuses the distributed
prefix-sum from :mod:`.packing` — range partition on the ranking, per
-partition cumsum, N-row offset broadcast — instead of the
single-task ``Window.orderBy`` a naive port would use (fatal at
100 TB; the DuckDB oracle uses exactly that window, which is fine on
one node).

Fractional budgets are decided in integer math (``cum * den <= total
* num``) so the boundary document is bit-identical across engines —
no double rounding at the cutoff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .packing import OrderCols, prefix_sum


def select_token_budget(
    df: DataFrame,
    *,
    order_col: OrderCols,
    size_col: str = "n_tokens",
    budget: int | None = None,
    budget_frac: tuple[int, int] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Flag the prefix of ``df`` (in ``order_col`` order) that fits a
    token budget.

    Exactly one of:

    - ``budget``: absolute token count — keep while the inclusive
      running total stays ≤ budget;
    - ``budget_frac``: ``(num, den)`` — keep while ``cum * den <=
      total * num`` (e.g. ``(1, 2)`` keeps the best half of the
      corpus **by tokens**, whatever the document count).

    Adds ``cum_tokens`` (inclusive running total) and ``keep``. The
    corpus total for the fractional mode is a 1-row aggregate
    broadcast into the plan — no driver action while building.
    """
    if (budget is None) == (budget_frac is None):
        raise ValueError("exactly one of budget / budget_frac required")
    out = prefix_sum(
        df,
        order_col=order_col,
        value_col=size_col,
        out_col="cum_tokens",
        num_partitions=num_partitions,
    )
    if budget is not None:
        return out.withColumn("keep", F.col("cum_tokens") <= F.lit(budget))
    num, den = budget_frac
    total = df.agg(F.sum(size_col).cast("bigint").alias("__total_tokens"))
    return (
        out.crossJoin(F.broadcast(total))
        .withColumn(
            "keep",
            F.col("cum_tokens") * F.lit(den)
            <= F.col("__total_tokens") * F.lit(num),
        )
        .drop("__total_tokens")
    )
