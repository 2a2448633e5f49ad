"""Chi-square independence testing — the experiment-analysis (A/B)
statistic, computed hash-portably.

Float statistics normally cannot hash-match across engines because
aggregation order perturbs the low bits. Here the contingency table
is built in ONE aggregate pass of conditional integer counts (the
operators/contracts.py folding pattern — the caller names the
category values, which pins the cell set at plan time), and the
statistic is then a SINGLE expression tree over those integers:
every float operation happens in one deterministic order on both
engines, so chi-square, dof and Cramér's V are bit-identical.

One shuffle total (the map-side-combining aggregate); cells are
caller-enumerated and small (a contingency table you cannot
enumerate is not a contingency table).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def contingency_counts(
    df: DataFrame,
    row_col: str,
    col_col: str,
    row_vals: Sequence,
    col_vals: Sequence,
) -> DataFrame:
    """One row holding every ``o_{i}_{j}`` observed count (conditional
    sums in a single aggregate pass). Values outside the enumerated
    categories are ignored."""
    if not row_vals or not col_vals:
        raise ValueError("category lists must be non-empty")
    aggs = []
    for i, rv in enumerate(row_vals):
        for j, cv in enumerate(col_vals):
            aggs.append(
                F.coalesce(
                    F.sum(
                        (
                            (F.col(row_col) == rv)
                            & (F.col(col_col) == cv)
                        ).cast("bigint")
                    ),
                    F.lit(0),
                ).alias(f"o_{i}_{j}")
            )
    return df.agg(*aggs)


def chi_square_independence(
    df: DataFrame,
    row_col: str,
    col_col: str,
    row_vals: Sequence,
    col_vals: Sequence,
) -> DataFrame:
    """One-row result: ``(n, chi2, dof, cramers_v)`` for the
    independence test of ``row_col`` vs ``col_col`` over the
    enumerated categories. Cells with an expected count of zero (an
    all-zero row or column) contribute nothing rather than dividing
    by zero."""
    counts = contingency_counts(df, row_col, col_col, row_vals, col_vals)
    k, m = len(row_vals), len(col_vals)
    o = [[F.col(f"o_{i}_{j}") for j in range(m)] for i in range(k)]

    def _sum(cols: list[Column]) -> Column:
        out = cols[0]
        for c in cols[1:]:
            out = out + c
        return out

    r = [_sum(o[i]) for i in range(k)]
    c = [_sum([o[i][j] for i in range(k)]) for j in range(m)]
    n = _sum(r)
    nd = n.cast("double")
    terms = []
    for i in range(k):
        for j in range(m):
            e = r[i].cast("double") * c[j].cast("double") / nd
            od = o[i][j].cast("double")
            terms.append(
                F.when(e > 0, (od - e) * (od - e) / e).otherwise(
                    F.lit(0.0)
                )
            )
    chi2 = _sum(terms)
    dof = (k - 1) * (m - 1)
    mindim = min(k - 1, m - 1)
    v = F.when(
        (n > 0) & (F.lit(mindim) > 0),
        F.sqrt(chi2 / (nd * F.lit(float(mindim)))),
    )
    return counts.select(
        n.cast("bigint").alias("n"),
        chi2.alias("chi2"),
        F.lit(dof).cast("bigint").alias("dof"),
        v.alias("cramers_v"),
    )
