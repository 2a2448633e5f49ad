"""Re-identification risk audit — k-anonymity and l-diversity over
quasi-identifier classes.

Before a dataset (or a training corpus with structured metadata) is
released, the standard privacy gate asks: does any combination of
quasi-identifiers (the columns an attacker can link externally —
region, segment, coarse income band) isolate fewer than ``k``
records, and does any such class expose fewer than ``l`` distinct
values of a sensitive attribute (Sweeney's k-anonymity; Machanavajjhala
et al.'s l-diversity)? Classes below either threshold are the rows a
suppression/generalization pass must fix.

Scale shape: ONE groupBy shuffle on the quasi-identifier key for the
class sizes and a two-phase distinct aggregate for the sensitive
cardinality (count_distinct's partial de-dup runs map-side). The
class table is bounded by the quasi-identifier domain product, never
by the corpus; no window over raw rows, no self-join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def k_anonymity_audit(
    df: DataFrame,
    quasi: Sequence[Column | str],
    *,
    k: int,
    sensitive: Column | str | None = None,
    l_threshold: int = 1,
) -> DataFrame:
    """Per-equivalence-class audit: one row per distinct
    quasi-identifier combination with ``class_size``,
    ``n_sensitive`` (distinct sensitive values; 0 when no sensitive
    column is given) and ``is_risky`` — true when the class is
    smaller than ``k`` or shows fewer than ``l_threshold`` distinct
    sensitive values."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if not quasi:
        raise ValueError("at least one quasi-identifier required")
    qcols = [
        (F.col(q) if isinstance(q, str) else q).alias(f"q{i}")
        for i, q in enumerate(quasi)
    ]
    aggs = [F.count(F.lit(1)).alias("class_size")]
    if sensitive is not None:
        s = F.col(sensitive) if isinstance(sensitive, str) else sensitive
        aggs.append(F.countDistinct(s).alias("n_sensitive"))
    classes = df.groupBy(*qcols).agg(*aggs)
    if sensitive is None:
        classes = classes.withColumn(
            "n_sensitive", F.lit(0).cast("bigint")
        )
    risky = F.col("class_size") < k
    if sensitive is not None and l_threshold > 1:
        risky = risky | (F.col("n_sensitive") < l_threshold)
    return classes.withColumn("is_risky", risky)
