"""Event-stream surface, batch-verifiable forms (SURVEY §2.9 T4).

Tumbling/sliding windows, JSON extraction, and the as-of join over
the events table. The Structured Streaming twins (readStream +
watermark) live in streaming/windows.py; these batch forms are the
oracle-checked semantics.

Window starts are emitted as epoch-second bigints computed in exact
integer microsecond arithmetic — cross-engine timestamp formatting
never enters the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..sources.tables import load_table
from . import Q


def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling window counts/sums per event type."""
    events = load_table(spark, sf_dir, "events")
    win = F.window("ts", "10 minutes")
    return (
        events.groupBy(win.alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "event_type",
            "n",
            "total",
        )
    )


_TUMBLING_SQL = """
SELECT CAST(((epoch_ns(ts) // 1000) // 600000000) * 600 AS BIGINT) AS window_start_s,
       event_type, count(*) AS n,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total
FROM events
GROUP BY 1, 2
"""


def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute window sliding by 5 minutes (each event in 2 windows)."""
    events = load_table(spark, sf_dir, "events")
    win = F.window("ts", "10 minutes", "5 minutes")
    return (
        events.groupBy(win.alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "event_type",
            "n",
        )
    )


_SLIDING_SQL = """
SELECT CAST(((epoch_ns(ts) // 1000) // 300000000 - k) * 300 AS BIGINT) AS window_start_s,
       event_type, count(*) AS n
FROM events, (VALUES (0), (1)) t(k)
GROUP BY 1, 2
"""


def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over the props column + bucket aggregation."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.withColumn("k_bucket", (k % 10).cast("int"))
        .groupBy("k_bucket", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count("value")
            ).alias("avg_value"),
        )
    )


_JSON_SQL = """
SELECT CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS INTEGER) AS k_bucket,
       event_type, count(*) AS n,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / count(value) AS avg_value
FROM events
GROUP BY 1, 2
"""


def _asof_ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared event projection for every asof-entry variant: id, key,
    integer event time, type, and integer cents (superset of what
    each variant needs, so the merged entry can persist it ONCE)."""
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )


def _asof_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared order projection (entity key + integer time + payload)."""
    return load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("t_us"),
        "o_orderkey",
        "o_totalprice",
    )


def _asof_inputs(
    spark: SparkSession,
    sf_dir: str,
    ev: DataFrame | None = None,
    orders: DataFrame | None = None,
):
    events = (ev if ev is not None else _asof_ev(spark, sf_dir)).select(
        "event_id", "user_id", "t_us"
    )
    if orders is None:
        orders = _asof_orders(spark, sf_dir)
    return events, orders


def q_asof_join(
    spark: SparkSession, sf_dir: str,
    ev: DataFrame | None = None, orders: DataFrame | None = None,
) -> DataFrame:
    """Backward as-of join: latest order at/before each event, per user.

    Implemented with the union-sort/last-carry operator
    (operators/asof.py) — one shuffle, no range explosion.
    """
    events, orders = _asof_inputs(spark, sf_dir, ev, orders)
    joined = asof_join(
        events,
        orders,
        on="user_id",
        left_time="t_us",
        right_time="t_us",
        payload=["o_orderkey", "o_totalprice"],
        tiebreak=["o_orderkey"],
    )
    return joined.select("event_id", "user_id", "o_orderkey", "o_totalprice")


def q_asof_nearest(
    spark: SparkSession, sf_dir: str,
    ev: DataFrame | None = None, orders: DataFrame | None = None,
) -> DataFrame:
    """Nearest-in-time as-of join: the closest order in either
    direction per event (backward wins exact-distance ties)."""
    events, orders = _asof_inputs(spark, sf_dir, ev, orders)
    joined = asof_join(
        events,
        orders,
        on="user_id",
        left_time="t_us",
        right_time="t_us",
        payload=["o_orderkey", "o_totalprice"],
        tiebreak=["o_orderkey"],
        direction="nearest",
    )
    return joined.select("event_id", "user_id", "o_orderkey", "o_totalprice")


_ATTRIB_LOOKBACK_US = 120 * 60 * 1_000_000  # 2-hour touch window


def q_attribution(
    spark: SparkSession, sf_dir: str, ev: DataFrame | None = None
) -> DataFrame:
    """'attrib_{first,last,linear}' variants: multi-touch attribution
    (operators/attribution.py) over the event stream — purchases are
    conversions, every other event type is a touch, lookback 2h.
    All three models come from ONE candidate join + one ranked pass;
    credit is exact integer cents (linear remainder to the last
    touch), so the DuckDB window twin hash-matches. Column mapping
    into the asof entry: event_id = touch, conv_id = the purchase
    event, credit_cents = the model's credit; the order columns are
    NULL here (and conv_id/credit_cents are NULL on the asof rows)."""
    from ..operators.attribution import attribute_conversions

    if ev is None:
        ev = _asof_ev(spark, sf_dir)
    out = attribute_conversions(
        ev.where(F.col("event_type") == "purchase"),
        ev.where(F.col("event_type") != "purchase"),
        on="user_id",
        conv_id="event_id",
        conv_time="t_us",
        value="cents",
        touch_id="event_id",
        touch_time="t_us",
        lookback=_ATTRIB_LOOKBACK_US,
    )
    return out.select(
        F.concat(F.lit("attrib_"), F.col("model")).alias("variant"),
        F.col("touch_id").cast("bigint").alias("event_id"),
        F.col("user_id").cast("bigint").alias("user_id"),
        F.lit(None).cast("bigint").alias("o_orderkey"),
        F.lit(None).cast("double").alias("o_totalprice"),
        F.col("conv_id").cast("bigint").alias("conv_id"),
        F.col("credit").cast("bigint").alias("credit_cents"),
    )


def q_pit_features(
    spark: SparkSession, sf_dir: str,
    ev: DataFrame | None = None, orders: DataFrame | None = None,
) -> DataFrame:
    """'pit' variant: point-in-time feature join
    (operators/feature_store.py) — training-set assembly with no
    future leakage. Labels are the non-purchase events; two feature
    tables compose sequentially: (1) orders — the newest order at or
    before the label (payload o_orderkey/o_totalprice, asof_time
    audited), (2) the user's latest prior purchase event. Column
    mapping into the asof entry: conv_id = the prior purchase's
    event_id, credit_cents = label_time − order asof_time in µs (the
    feature STALENESS the `<prefix>asof_time` contract exists for;
    NULL when no order predates the label)."""
    from ..operators.feature_store import FeatureTable, point_in_time_join

    if ev is None:
        ev = _asof_ev(spark, sf_dir)
    labels = ev.where(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "t_us"
    )
    if orders is None:
        orders = _asof_orders(spark, sf_dir)
    orders = orders.select(
        "user_id",
        F.col("t_us").alias("ord_t"),
        "o_orderkey",
        "o_totalprice",
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("t_us").alias("p_t"),
        F.col("event_id").alias("pe"),
    )
    out = point_in_time_join(
        labels,
        [
            FeatureTable(
                orders,
                time_col="ord_t",
                payload=["o_orderkey", "o_totalprice"],
                prefix="ord_",
                tiebreak=["o_orderkey"],
            ),
            FeatureTable(
                purchases,
                time_col="p_t",
                payload=["pe"],
                prefix="p_",
                tiebreak=["pe"],
            ),
        ],
        on="user_id",
        label_time="t_us",
    )
    return out.select(
        F.lit("pit").alias("variant"),
        "event_id",
        "user_id",
        F.col("ord_o_orderkey").alias("o_orderkey"),
        F.col("ord_o_totalprice").alias("o_totalprice"),
        F.col("p_pe").cast("bigint").alias("conv_id"),
        (F.col("t_us") - F.col("ord_asof_time"))
        .cast("bigint")
        .alias("credit_cents"),
    )


def q_asof_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward + nearest as-of joins + multi-touch attribution +
    point-in-time feature join in one union-tagged entry (driver
    cap: the correctness gate records at most 50 entries).

    Shared-subframe discipline: all four variants project the same
    events/orders tables — built ONCE here and persisted for the
    union (the sf1 ratio of entry wall to variant sum was 3.4x before
    this; the frames are projections, small and LRU-evictable)."""
    from pyspark import StorageLevel

    ev = _asof_ev(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    orders = _asof_orders(spark, sf_dir).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    nulls = [
        F.lit(None).cast("bigint").alias("conv_id"),
        F.lit(None).cast("bigint").alias("credit_cents"),
    ]
    back = q_asof_join(spark, sf_dir, ev, orders).select(
        F.lit("backward").alias("variant"), "*", *nulls
    )
    near = q_asof_nearest(spark, sf_dir, ev, orders).select(
        F.lit("nearest").alias("variant"), "*", *nulls
    )
    return (
        back.unionByName(near)
        .unionByName(q_attribution(spark, sf_dir, ev))
        .unionByName(q_pit_features(spark, sf_dir, ev, orders))
    )


_ASOF_SQL = """
WITH cand AS (
  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e
  JOIN orders o ON o.o_custkey = e.user_id
               AND epoch_us(o.o_orderdate) <= (epoch_ns(e.ts) // 1000)
)
SELECT event_id, user_id, o_orderkey, o_totalprice FROM cand WHERE rn = 1
UNION ALL
SELECT e.event_id, e.user_id, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)
FROM events e
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = e.user_id AND epoch_us(o.o_orderdate) <= (epoch_ns(e.ts) // 1000)
)
"""


def q_rollup_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'rollup' variant: the continuous-rollup invariant as oracle
    rows.  Events are split into three artificial epochs
    (``event_id % 3`` — the micro-batch boundaries a stream would
    produce) and merged one at a time through
    :func:`streaming.rollup.merge_epoch` into a fresh state dir; the
    served result must equal the one-shot batch aggregate EXACTLY
    (decimal partials make the re-merge order-independent), which is
    what the DuckDB oracle computes.  Two grains from the SAME
    partials: the rollup grain (6-hour bucket × type — coarser than the\n    tumble10m variant on purpose: the rollup's job here is the merge\n    machinery, and the hourly grain keeps the per-epoch touched-bucket\n    fan small the way a watermarked stream would) and a coarser
    re-aggregation (type only, ``window_start_s`` NULL) — the serving
    path that never touches raw data."""
    from ..session import scratch_dir
    from ..streaming.rollup import merge_epoch, read_rollup, serve

    events = load_table(spark, sf_dir, "events").select(
        F.expr("(unix_micros(ts) div 21600000000) * 21600").alias(
            "window_start_s"
        ),
        "event_type",
        F.col("value").cast("decimal(18,2)").alias("v"),
        "event_id",
    )
    aggs = [("n", "count", "event_id"), ("total", "sum", "v")]
    # per-session path wiped on entry: a fresh manifest every run
    # (mkdtemp here leaked one orphan state dir per bench run —
    # ADVICE r5); the served frame reads the state lazily, so the
    # dir must outlive this call
    state_dir = scratch_dir(spark, "rollup_state")
    for epoch in range(3):
        merge_epoch(
            state_dir,
            events.filter(F.pmod("event_id", F.lit(3)) == epoch),
            bucket_col="window_start_s",
            keys=["event_type"],
            aggs=aggs,
            epoch_id=epoch,
        )
    rollup = read_rollup(spark, state_dir)
    fine = serve(rollup, ["window_start_s", "event_type"], aggs).select(
        F.col("window_start_s").cast("bigint").alias("window_start_s"),
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.col("total").cast("double").alias("total"),
    )
    coarse = serve(rollup, ["event_type"], aggs).select(
        F.lit(None).cast("bigint").alias("window_start_s"),
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.col("total").cast("double").alias("total"),
    )
    return fine.unionByName(coarse)


_ROLLUP_SQL = """
SELECT CAST(((epoch_ns(ts) // 1000) // 21600000000) * 21600 AS BIGINT) AS window_start_s,
       event_type, count(*) AS n,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total
FROM events GROUP BY 1, 2
UNION ALL
SELECT CAST(NULL AS BIGINT), event_type, count(*),
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
FROM events GROUP BY 2
"""


_ANOM_TOP = 10
_ANOM_Z_MILLI = 5000  # 5 MADs, in milli-units


def q_event_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'anomaly' variant: per-type robust outliers
    (operators/anomaly.py) — value quantized to integer cents, exact
    lower median + MAD over the distinct-value histogram (never a
    per-key row sort), flags at |dev| >= 5 MADs, top-{top} per type
    by (z, event_id) so the output is bounded and deterministic.
    window_start_s = the event's epoch second, n = the integer
    milli-z score, total = the raw value."""
    from ..operators.anomaly import robust_flags

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "ts",
        "event_type",
        "value",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    flags = robust_flags(
        ev, "event_type", "cents", z_milli_threshold=_ANOM_Z_MILLI
    )
    from pyspark.sql import Window

    # rank only the flagged subset (bounded), never the raw stream
    w = Window.partitionBy("event_type").orderBy(
        F.col("z_milli").desc(), F.col("event_id").asc()
    )
    top = flags.withColumn("__rn", F.row_number().over(w)).where(
        F.col("__rn") <= _ANOM_TOP
    )
    return top.select(
        F.lit("anomaly").alias("variant"),
        F.unix_timestamp("ts").cast("bigint").alias("window_start_s"),
        "event_type",
        F.col("z_milli").cast("bigint").alias("n"),
        F.col("value").cast("double").alias("total"),
    )


_ANOMALY_SQL = f"""
WITH av AS (
  SELECT event_id, ts, event_type, value,
         CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events
), ahist AS (
  SELECT event_type, cents, count(*) AS c FROM av GROUP BY 1, 2
), amed AS (
  SELECT event_type, min(cents) AS med FROM (
    SELECT event_type, cents,
           sum(c) OVER (PARTITION BY event_type ORDER BY cents
                        ROWS UNBOUNDED PRECEDING) AS cum,
           sum(c) OVER (PARTITION BY event_type) AS tot
    FROM ahist)
  WHERE cum >= (tot + 1) // 2 GROUP BY event_type
), adev AS (
  SELECT av.*, abs(cents - med) AS dev FROM av JOIN amed USING (event_type)
), adhist AS (
  SELECT event_type, dev, count(*) AS c FROM adev GROUP BY 1, 2
), amad AS (
  SELECT event_type, min(dev) AS mad FROM (
    SELECT event_type, dev,
           sum(c) OVER (PARTITION BY event_type ORDER BY dev
                        ROWS UNBOUNDED PRECEDING) AS cum,
           sum(c) OVER (PARTITION BY event_type) AS tot
    FROM adhist)
  WHERE cum >= (tot + 1) // 2 GROUP BY event_type
), ascored AS (
  SELECT adev.*, (dev * 1000) // greatest(mad, 1) AS z_milli
  FROM adev JOIN amad USING (event_type)
), aranked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
            ORDER BY z_milli DESC, event_id ASC) AS rn
  FROM ascored WHERE z_milli >= {_ANOM_Z_MILLI}
)
SELECT 'anomaly' AS variant,
       CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS window_start_s,
       event_type, CAST(z_milli AS BIGINT) AS n,
       CAST(value AS DOUBLE) AS total
FROM aranked WHERE rn <= {_ANOM_TOP}
"""


def q_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling + sliding time windows + incrementally-maintained
    rollup in one union-tagged entry (driver cap: the correctness gate
    records at most 50 registry entries). variant 'tumble10m' carries
    the decimal-exact value sum; 'slide10m5m' is counts-only (each
    event lands in 2 windows); 'rollup' replays the epoch-merge state
    machine and serves two grains from the partials. variant
    'anomaly': see q_event_anomalies."""
    tumble = q_tumbling_window(spark, sf_dir).select(
        F.lit("tumble10m").alias("variant"),
        F.col("window_start_s").cast("bigint").alias("window_start_s"),
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.col("total").cast("double").alias("total"),
    )
    slide = q_sliding_window(spark, sf_dir).select(
        F.lit("slide10m5m").alias("variant"),
        F.col("window_start_s").cast("bigint").alias("window_start_s"),
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.lit(None).cast("double").alias("total"),
    )
    roll = q_rollup_serve(spark, sf_dir).select(
        F.lit("rollup").alias("variant"), "*"
    )
    return (
        tumble.unionByName(slide)
        .unionByName(roll)
        .unionByName(q_event_anomalies(spark, sf_dir))
    )


_EVENT_WINDOWS_SQL = f"""
SELECT 'tumble10m' AS variant, CAST(window_start_s AS BIGINT) AS window_start_s,
       event_type, CAST(n AS BIGINT) AS n, CAST(total AS DOUBLE) AS total
FROM ({_TUMBLING_SQL})
UNION ALL
SELECT 'slide10m5m' AS variant, CAST(window_start_s AS BIGINT) AS window_start_s,
       event_type, CAST(n AS BIGINT) AS n, CAST(NULL AS DOUBLE) AS total
FROM ({_SLIDING_SQL})
UNION ALL
SELECT 'rollup' AS variant, window_start_s, event_type,
       CAST(n AS BIGINT) AS n, total
FROM ({_ROLLUP_SQL})
UNION ALL
SELECT * FROM ({_ANOMALY_SQL})
"""


_ASOF_NEAREST_SQL = """
WITH cand AS (
  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
         row_number() OVER (PARTITION BY e.event_id ORDER BY
            abs((epoch_ns(e.ts) // 1000) - epoch_us(o.o_orderdate)) ASC,
            (epoch_us(o.o_orderdate) <= (epoch_ns(e.ts) // 1000)) DESC,
            CASE WHEN epoch_us(o.o_orderdate) <= (epoch_ns(e.ts) // 1000)
                 THEN -o.o_orderkey ELSE o.o_orderkey END ASC) AS rn
  FROM events e
  JOIN orders o ON o.o_custkey = e.user_id
)
SELECT event_id, user_id, o_orderkey, o_totalprice FROM cand WHERE rn = 1
UNION ALL
SELECT e.event_id, e.user_id, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)
FROM events e
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = e.user_id)
"""

_ATTRIB_SQL = f"""
WITH aev AS (
  SELECT event_id, user_id, epoch_ns(ts) // 1000 AS t_us, event_type,
         CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events
), acand AS (
  SELECT c.user_id, c.event_id AS conv_id, c.cents,
         t.event_id AS touch_id,
         row_number() OVER (PARTITION BY c.event_id
             ORDER BY t.t_us ASC, t.event_id ASC) AS ra,
         row_number() OVER (PARTITION BY c.event_id
             ORDER BY t.t_us DESC, t.event_id DESC) AS rd,
         count(*) OVER (PARTITION BY c.event_id) AS k
  FROM aev c JOIN aev t
    ON c.event_type = 'purchase' AND t.event_type <> 'purchase'
   AND c.user_id = t.user_id
   AND t.t_us > c.t_us - {_ATTRIB_LOOKBACK_US} AND t.t_us <= c.t_us
)
SELECT 'attrib_first' AS variant, touch_id AS event_id, user_id,
       CAST(NULL AS BIGINT) AS o_orderkey,
       CAST(NULL AS DOUBLE) AS o_totalprice,
       conv_id, cents AS credit_cents
FROM acand WHERE ra = 1
UNION ALL
SELECT 'attrib_last', touch_id, user_id, CAST(NULL AS BIGINT),
       CAST(NULL AS DOUBLE), conv_id, cents
FROM acand WHERE rd = 1
UNION ALL
SELECT 'attrib_linear', touch_id, user_id, CAST(NULL AS BIGINT),
       CAST(NULL AS DOUBLE), conv_id,
       cents // k + CASE WHEN rd = 1 THEN cents % k ELSE 0 END
FROM acand
"""

_PIT_SQL = """
WITH lbl AS (
  SELECT event_id, user_id, epoch_ns(ts) // 1000 AS t_us
  FROM events WHERE event_type <> 'purchase'
), o1 AS (
  SELECT l.event_id, o.o_orderkey, o.o_totalprice,
         epoch_us(o.o_orderdate) AS ot,
         row_number() OVER (PARTITION BY l.event_id
             ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM lbl l JOIN orders o
    ON o.o_custkey = l.user_id AND epoch_us(o.o_orderdate) <= l.t_us
), p1 AS (
  SELECT l.event_id, p.event_id AS pe,
         row_number() OVER (PARTITION BY l.event_id
             ORDER BY (epoch_ns(p.ts) // 1000) DESC, p.event_id DESC) AS rn
  FROM lbl l JOIN events p
    ON p.user_id = l.user_id AND p.event_type = 'purchase'
   AND (epoch_ns(p.ts) // 1000) <= l.t_us
)
SELECT 'pit' AS variant, l.event_id, l.user_id,
       o1.o_orderkey, o1.o_totalprice,
       CAST(p1.pe AS BIGINT) AS conv_id,
       CAST(l.t_us - o1.ot AS BIGINT) AS credit_cents
FROM lbl l
LEFT JOIN (SELECT * FROM o1 WHERE rn = 1) o1 USING (event_id)
LEFT JOIN (SELECT * FROM p1 WHERE rn = 1) p1 USING (event_id)
"""

_ASOF_VARIANTS_SQL = f"""
SELECT 'backward' AS variant, event_id, user_id, o_orderkey, o_totalprice,
       CAST(NULL AS BIGINT) AS conv_id, CAST(NULL AS BIGINT) AS credit_cents
FROM ({_ASOF_SQL})
UNION ALL
SELECT 'nearest' AS variant, event_id, user_id, o_orderkey, o_totalprice,
       CAST(NULL AS BIGINT) AS conv_id, CAST(NULL AS BIGINT) AS credit_cents
FROM ({_ASOF_NEAREST_SQL})
UNION ALL
SELECT * FROM ({_ATTRIB_SQL})
UNION ALL
SELECT * FROM ({_PIT_SQL})
"""

QUERIES: dict[str, Q] = {
    "event_windows": Q(
        q_event_windows,
        _EVENT_WINDOWS_SQL,
        variants={
            "tumble10m": q_tumbling_window,
            "slide10m5m": q_sliding_window,
            "rollup": q_rollup_serve,
            "anomaly": q_event_anomalies,
        },
    ),
    "json_props": Q(q_json_props, _JSON_SQL),
    "asof_join": Q(
        q_asof_variants,
        _ASOF_VARIANTS_SQL,
        variants={
            "backward": q_asof_join,
            "nearest": q_asof_nearest,
            "attrib": q_attribution,
            "pit": q_pit_features,
        },
    ),
}


_COHORT_MAX_OFFSET = 7  # first-week retention


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'cohort' variant: retention matrix — users grouped by their
    FIRST-activity day (the cohort), counted on each of the next
    {d} days they return. Two aggregates and one user-keyed join,
    all integer-day arithmetic: grp = 'cohort_day|offset_day',
    n = returning users (the (user, day) grid is distinct by
    construction, so count(*) IS the distinct-user count)."""
    ud = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
        )
        .distinct()
    )
    cohort = ud.groupBy("user_id").agg(F.min("day").alias("c0"))
    return (
        ud.join(cohort, "user_id")
        .withColumn("offset", F.col("day") - F.col("c0"))
        .where(F.col("offset") <= _COHORT_MAX_OFFSET)
        .groupBy("c0", "offset")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(
            F.lit("cohort").alias("variant"),
            F.concat_ws("|", "c0", "offset").alias("grp"),
            "n",
        )
    )


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'transitions' variant: first-order Markov transition counts of
    the per-user event-type sequence (path/Sankey analysis) — one
    user-partitioned lag window + one aggregate. grp = 'prev>next'."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .where(F.col("prev").isNotNull())
        .groupBy("prev", "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(
            F.lit("transitions").alias("variant"),
            F.concat(F.col("prev"), F.lit(">"), F.col("event_type")).alias(
                "grp"
            ),
            "n",
        )
    )


_COHORT_SQL = f"""
SELECT 'cohort' AS variant, CAST(c0 AS VARCHAR) || '|' || CAST(
         day - c0 AS VARCHAR) AS grp,
       CAST(count(*) AS BIGINT) AS n
FROM (
  SELECT user_id, day, min(day) OVER (PARTITION BY user_id) AS c0
  FROM (SELECT DISTINCT user_id,
               (epoch_ns(ts) // 1000) // 86400000000 AS day
        FROM events)
)
WHERE day - c0 <= {_COHORT_MAX_OFFSET}
GROUP BY 1, 2
"""

_TRANSITIONS_SQL = """
SELECT 'transitions' AS variant, prev || '>' || event_type AS grp,
       CAST(count(*) AS BIGINT) AS n
FROM (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
)
WHERE prev IS NOT NULL
GROUP BY 1, 2
"""


def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel: users who viewed, then clicked within
    48h of their first view, then purchased within 48h of that click (strict event-time ordering + conversion windows, exact
    integer microseconds — unbounded funnels are degenerate on a
    dense stream). Each stage is one filtered aggregate joined to the
    previous stage's first-reach time — at scale all three joins
    share the user_id shuffle key. Returns (variant, grp, n) rows for
    the subquery_counts entry.
    """
    conv_us = 48 * 3600 * 1000000
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter((F.col("us") > F.col("t1")) & (F.col("us") <= F.col("t1") + conv_us))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter((F.col("us") > F.col("t2")) & (F.col("us") <= F.col("t2") + conv_us))
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )

    def step(df, name):
        return df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit("funnel").alias("variant"),
            F.lit(name).alias("grp"),
            F.col("n").cast("bigint").alias("n"),
        )

    return (
        step(s1, "1_view")
        .unionByName(step(s2, "2_click"))
        .unionByName(step(s3, "3_purchase"))
    )


_FUNNEL_SQL = """
WITH e AS (
  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us FROM events
), s1 AS (
  SELECT user_id, min(us) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1
), s2 AS (
  SELECT e.user_id, min(us) AS t2 FROM e JOIN s1 USING (user_id)
  WHERE event_type = 'click' AND us > t1 AND us <= t1 + 172800000000 GROUP BY 1
), s3 AS (
  SELECT e.user_id, min(us) AS t3 FROM e JOIN s2 USING (user_id)
  WHERE event_type = 'purchase' AND us > t2 AND us <= t2 + 172800000000 GROUP BY 1
)
SELECT 'funnel' AS variant, '1_view' AS grp, CAST(count(*) AS BIGINT) AS n FROM s1
UNION ALL
SELECT 'funnel' AS variant, '2_click' AS grp, CAST(count(*) AS BIGINT) AS n FROM s2
UNION ALL
SELECT 'funnel' AS variant, '3_purchase' AS grp, CAST(count(*) AS BIGINT) AS n FROM s3
"""


_RANGE_WINDOW_US = 30 * 60 * 1000000  # 30 minutes


def q_range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval self-join: event pairs from the same user within 30
    minutes (operators/range_join.py — bucketized, no nested loop)."""
    from ..operators.range_join import range_self_join

    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("t_us")
    )
    pairs = range_self_join(
        events,
        key="user_id",
        time_col="t_us",
        id_col="event_id",
        window=_RANGE_WINDOW_US,
    )
    return pairs.select(
        "user_id", "id_a", "id_b",
        F.expr("CAST(dt DIV 1000000 AS BIGINT)").alias("dt_s"),
    )


_RANGE_JOIN_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS t_us FROM events
)
SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
       (b.t_us - a.t_us) // 1000000 AS dt_s
FROM e a JOIN e b
  ON a.user_id = b.user_id
 AND a.event_id < b.event_id
 AND abs(b.t_us - a.t_us) <= {_RANGE_WINDOW_US}
"""


QUERIES["range_join_events"] = Q(q_range_join_events, _RANGE_JOIN_SQL)
