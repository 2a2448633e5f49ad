"""Deterministic negative sampling — (user, unseen-item) pairs for
recommendation / contrastive training, with no RNG.

Training such models needs negatives the user did NOT interact with.
Random sampling is the standard recipe, but engine RNGs are neither
portable nor replay-stable; here the candidate for (user, slot) is a
hash — ``md5(salt|user|slot)`` parsed as an integer and reduced mod
the item-domain size — so any engine regenerates the exact same
draws (the functions/sampling.py md5 discipline, extended from
cutoffs to index draws).

Shape: slots explode MAP-SIDE per user (no join against a slot
table), duplicates within a user collapse to their first slot, one
anti join removes true positives, and a per-user window over the
surviving ≤ oversample*k rows picks the first k in slot order.
Oversampling covers the positives/duplicates that get removed; at
plausible positive densities ``oversample=3`` leaves the full k with
overwhelming probability, and the output contract is "UP TO k per
user" (callers needing exactly-k raise the oversample).

Item ids are assumed to be the contiguous ``1..n_items`` domain
(dimension-table surrogate keys); map sparse id spaces through a
dense index first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sample_negatives(
    positives: DataFrame,
    *,
    user_col: str,
    item_col: str,
    n_items: DataFrame | int,
    k: int,
    oversample: int = 3,
    salt: str = "neg",
) -> DataFrame:
    """Up to ``k`` deterministic negatives per user appearing in
    ``positives``. ``n_items`` is the item-domain size — an int, or a
    1-row DataFrame with column ``__n`` (kept declarative so the
    count never becomes a driver action here). Returns
    ``(user_col, item_col, slot, rank)`` with rank 1..k in slot
    order."""
    if k < 1 or oversample < 1:
        raise ValueError("k and oversample must be >= 1")
    m = k * oversample
    users = positives.select(user_col).distinct()
    cand = users.withColumn(
        "slot", F.explode(F.sequence(F.lit(0), F.lit(m - 1)))
    )
    if isinstance(n_items, int):
        cand = cand.withColumn("__n", F.lit(n_items).cast("bigint"))
    else:
        cand = cand.crossJoin(F.broadcast(n_items))
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|", F.lit(salt), F.col(user_col), F.col("slot")
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    cand = cand.withColumn(
        item_col, (F.pmod(h, F.col("__n")) + 1).cast("bigint")
    )
    # the same item can be drawn by two slots of one user: keep the
    # earliest slot so the final rank order is well defined
    cand = cand.groupBy(user_col, item_col).agg(
        F.min("slot").alias("slot")
    )
    neg = cand.join(
        positives.select(user_col, item_col).distinct(),
        [user_col, item_col],
        "left_anti",
    )
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(
        F.col("slot").asc(), F.col(item_col).asc()
    )
    return (
        neg.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(user_col, item_col, "slot", "rank")
    )
