"""Multi-touch attribution — distribute conversion value over the
touch events that preceded each conversion inside a lookback window.

The canonical marketing-analytics operator (first-touch, last-touch,
linear), and the same machinery labels cause-candidates for any
"what preceded this outcome" analysis (errors before a crash,
retrievals before a user rating — credit assignment for training
signals).

Shape, scale-first:

- candidate touches come from ONE equi-join on the user/entity key
  with the time predicate applied as a join residual — the shuffle
  key is the entity, and per-conversion fan-out is bounded by the
  lookback window (the contract: pick a lookback your event rate
  supports);
- per-conversion ranks (first/last/count) come from a window
  PARTITIONED BY the conversion id — partition size = touches of one
  conversion inside the lookback, never a user's full history;
- every model is computed in the SAME pass: rank-asc, rank-desc and
  count are three window aggregates over one sort, and the model
  rows are exploded from a per-touch struct array (no per-model
  re-join, no second shuffle).

Credit is exact integer arithmetic on a caller-quantized value
column (cents): first/last assign the full value; linear assigns
``value div k`` per touch with the remainder going to the LAST touch
(a total, deterministic rule — credits per conversion always sum to
the conversion value, on any engine).

Ties on touch time break by touch id — the output is a pure function
of the input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MODELS = ("first", "last", "linear")


def attribute_conversions(
    conversions: DataFrame,
    touches: DataFrame,
    *,
    on: str,
    conv_id: str,
    conv_time: str,
    value: str,
    touch_id: str,
    touch_time: str,
    lookback: int,
    models: tuple[str, ...] = MODELS,
) -> DataFrame:
    """Attribute each conversion's integer ``value`` to its touches.

    Times are integer (e.g. epoch micros); a touch qualifies when
    ``conv_time - lookback < touch_time <= conv_time``. Returns one
    row per (conversion, touch, model): ``(on, conv_id, conv_time,
    value, touch_id, touch_time, model, credit)``. Conversions with
    no qualifying touch emit nothing (unattributed — count them by
    anti-joining the output back if needed).
    """
    bad = set(models) - set(MODELS)
    if bad or not models:
        raise ValueError(f"models must be a non-empty subset of {MODELS}")
    c = conversions.select(
        F.col(on).alias("__on"),
        F.col(conv_id).alias("conv_id"),
        F.col(conv_time).cast("bigint").alias("conv_time"),
        F.col(value).cast("bigint").alias("value"),
    )
    t = touches.select(
        F.col(on).alias("__on"),
        F.col(touch_id).alias("touch_id"),
        F.col(touch_time).cast("bigint").alias("touch_time"),
    )
    cand = c.join(t, "__on").where(
        (F.col("touch_time") > F.col("conv_time") - F.lit(int(lookback)))
        & (F.col("touch_time") <= F.col("conv_time"))
    )
    w = Window.partitionBy("conv_id")
    asc = w.orderBy(F.col("touch_time").asc(), F.col("touch_id").asc())
    desc = w.orderBy(F.col("touch_time").desc(), F.col("touch_id").desc())
    ranked = cand.select(
        "__on",
        "conv_id",
        "conv_time",
        "value",
        "touch_id",
        "touch_time",
        F.row_number().over(asc).alias("__ra"),
        F.row_number().over(desc).alias("__rd"),
        F.count(F.lit(1)).over(w).alias("__k"),
    )
    entries = []
    if "first" in models:
        entries.append(
            F.when(
                F.col("__ra") == 1,
                F.struct(
                    F.lit("first").alias("model"),
                    F.col("value").alias("credit"),
                ),
            )
        )
    if "last" in models:
        entries.append(
            F.when(
                F.col("__rd") == 1,
                F.struct(
                    F.lit("last").alias("model"),
                    F.col("value").alias("credit"),
                ),
            )
        )
    if "linear" in models:
        # remainder goes to the LAST touch so credits sum exactly
        entries.append(
            F.struct(
                F.lit("linear").alias("model"),
                (
                    F.expr("value div __k")
                    + F.when(
                        F.col("__rd") == 1, F.expr("value % __k")
                    ).otherwise(F.lit(0))
                ).alias("credit"),
            )
        )
    arr = F.filter(F.array(*entries), lambda s: s.isNotNull())
    return ranked.select(
        F.col("__on").alias(on),
        "conv_id",
        "conv_time",
        "value",
        "touch_id",
        "touch_time",
        F.explode(arr).alias("__m"),
    ).select(
        on,
        "conv_id",
        "conv_time",
        "value",
        "touch_id",
        "touch_time",
        F.col("__m.model").alias("model"),
        F.col("__m.credit").cast("bigint").alias("credit"),
    )
