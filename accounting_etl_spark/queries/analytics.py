"""Analytic extensions: range frames, value windows, grouping sets,
unpivot, date-spine gap filling, exact percentiles.

These round out the W3/A-series batteries beyond what the reference
needed — standard OLAP surface a user of any engine expects, each
expressed portably enough to oracle-check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.checkpointing import stable_checkpoint
from ..functions.spread import spread
from ..sources.tables import load_table
from . import Q


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS: (status, priority), (status), ()."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS STRING) AS DOUBLE) AS total,
               count(*) AS n,
               CAST(grouping_id() AS INT) AS gid
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        """
    )


_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total,
       count(*) AS n,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS INTEGER) AS gid
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
"""


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long): lineitem measures as (measure, value)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(3, 'quantity', l_quantity, 'price', l_extendedprice, "
            "'discount', l_discount) AS (measure, value)"
        ),
    )


_UNPIVOT_SQL = """
SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
"""


def q_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling over a generated daily spine (time-series resample):
    events-per-day for January 2024 including zero-event days."""
    events = load_table(spark, sf_dir, "events")
    spine = spark.range(31).select(
        F.date_add(F.lit("2024-01-01").cast("date"), F.col("id").cast("int")).alias(
            "day"
        )
    )
    # UTC day from integer epoch — to_date(ts) would shift with the
    # session timezone, and the driver's session may not pin UTC
    daily = (
        events.withColumn(
            "day",
            F.expr(
                "date_from_unix_date(CAST(unix_micros(ts) DIV 86400000000 AS INT))"
            ),
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
        )
    )
    return (
        spine.join(daily, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.coalesce(F.col("total"), F.lit(0.0)).alias("total"),
        )
    )


def q_spine_interpolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'interp' variant: linear imputation over the daily spine
    (operators/interpolate.py) — daily value totals in integer cents
    observed only on every third day (dayofmonth % 3 == 1, a
    simulated sparse sensor), the gaps filled by exact integer
    weighted-average interpolation. n = the filled cents, total = the
    observed cents (NULL on interpolated rows) — both engines fill
    identical bits."""
    from ..operators.interpolate import linear_fill

    events = load_table(spark, sf_dir, "events")
    spine = spark.range(31).select(
        F.col("id").cast("int").alias("x"),
        F.date_add(
            F.lit("2024-01-01").cast("date"), F.col("id").cast("int")
        ).alias("day"),
    )
    daily = (
        events.withColumn(
            "day",
            F.expr(
                "date_from_unix_date(CAST(unix_micros(ts)"
                " DIV 86400000000 AS INT))"
            ),
        )
        .groupBy("day")
        .agg(
            (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("cents")
        )
    )
    sparse = (
        spine.join(daily, "day", "left")
        .withColumn(
            "obs",
            F.when(
                F.dayofmonth("day") % 3 == 1, F.col("cents")
            ).cast("bigint"),
        )
        .select("day", "x", "obs")
    )
    filled = linear_fill(sparse, [], "x", "obs", out="fill")
    return filled.select(
        F.lit("interp").alias("variant"),
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("fill").cast("bigint").alias("n"),
        F.col("obs").cast("double").alias("total"),
    )


def q_spine_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily resample + linear imputation in one
    union-tagged entry (driver cap). variant 'spine': q_date_spine.
    variant 'interp': q_spine_interpolated."""
    spine = q_date_spine(spark, sf_dir).select(
        F.lit("spine").alias("variant"),
        "day",
        F.col("n").cast("bigint").alias("n"),
        F.col("total").cast("double").alias("total"),
    )
    return spine.unionByName(q_spine_interpolated(spark, sf_dir))


_DATE_SPINE_SQL = """
WITH spine AS (
  SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-01-31',
                                     INTERVAL 1 DAY)) AS DATE) AS day
), daily AS (
  SELECT CAST(ts AS DATE) AS day, count(*) AS n,
         CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total
  FROM events GROUP BY 1
)
SELECT strftime(s.day, '%Y-%m-%d') AS day,
       COALESCE(d.n, 0) AS n, COALESCE(d.total, 0.0) AS total
FROM spine s LEFT JOIN daily d ON s.day = d.day
"""

_SPINE_INTERP_SQL = """
WITH ispine AS (
  SELECT CAST(x AS INT) AS x,
         CAST(DATE '2024-01-01' + INTERVAL (x) DAY AS DATE) AS day
  FROM range(31) t(x)
), idaily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
  FROM events GROUP BY 1
), isparse AS (
  SELECT s.day, s.x,
         CASE WHEN date_part('day', s.day) % 3 = 1 THEN d.cents END AS obs
  FROM ispine s LEFT JOIN idaily d USING (day)
), iends AS (
  SELECT day, x, obs,
    last_value(obs IGNORE NULLS) OVER fw AS py,
    last_value(CASE WHEN obs IS NOT NULL THEN x END IGNORE NULLS)
      OVER fw AS px,
    last_value(obs IGNORE NULLS) OVER bw AS ny,
    last_value(CASE WHEN obs IS NOT NULL THEN x END IGNORE NULLS)
      OVER bw AS nx
  FROM isparse
  WINDOW fw AS (ORDER BY x ASC ROWS UNBOUNDED PRECEDING),
         bw AS (ORDER BY x DESC ROWS UNBOUNDED PRECEDING)
)
SELECT 'interp' AS variant, strftime(day, '%Y-%m-%d') AS day,
       CAST(CASE WHEN obs IS NOT NULL THEN obs
                 WHEN py IS NOT NULL AND ny IS NOT NULL
                 THEN (py * (nx - x) + ny * (x - px)) // (nx - px)
            END AS BIGINT) AS n,
       CAST(obs AS DOUBLE) AS total
FROM iends
"""

_SPINE_MERGED_SQL = f"""
SELECT 'spine' AS variant, day, CAST(n AS BIGINT) AS n,
       CAST(total AS DOUBLE) AS total
FROM ({_DATE_SPINE_SQL})
UNION ALL
SELECT * FROM ({_SPINE_INTERP_SQL})
"""


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (median/p90) of order totals per priority.

    Exact linear-interpolation percentile — both engines implement the
    same formula over the sorted set, so doubles match bit-for-bit
    (the approximate sketches are engine-specific and live outside the
    oracle surface).
    """
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__orders_pct")
    return spark.sql(
        """
        SELECT o_orderpriority,
               percentile(o_totalprice, 0.5) AS median_price,
               percentile(o_totalprice, 0.9) AS p90_price,
               count(*) AS n
        FROM __orders_pct GROUP BY o_orderpriority
        """
    )


_PERCENTILES_SQL = """
SELECT o_orderpriority,
       quantile_cont(o_totalprice, 0.5) AS median_price,
       quantile_cont(o_totalprice, 0.9) AS p90_price,
       count(*) AS n
FROM orders GROUP BY o_orderpriority
"""


QUERIES: dict[str, Q] = {
    "unpivot_measures": Q(q_unpivot, _UNPIVOT_SQL),
    "date_spine": Q(
        q_spine_merged,
        _SPINE_MERGED_SQL,
        variants={"spine": q_date_spine, "interp": q_spine_interpolated},
    ),
}


_SKETCH_ACCURACY = 1000  # percentile_approx → rank error ε = n/1000
_HLL_RSD = 0.05  # approx_count_distinct default relative std dev


def _quantile_rank_profile(orders: DataFrame) -> DataFrame:
    """Per-priority sketch estimates + the exact rank profile of each
    estimate: (n, e50, e90, lt50, le50, lt90, le90) where lt/le count
    rows strictly below / at-or-below the estimate. The estimate table
    is a 5-row broadcast back onto orders, so the exact side is one
    extra map-side-combined aggregation — no sort, no collect; the
    shape survives 100 TB. Feeds both the rows-only verdict rows
    ('sketch') and the oracle-paired guarantee check ('qv')."""
    est = orders.groupBy("o_orderpriority").agg(
        F.percentile_approx(
            "o_totalprice", 0.5, _SKETCH_ACCURACY
        ).alias("e50"),
        F.percentile_approx(
            "o_totalprice", 0.9, _SKETCH_ACCURACY
        ).alias("e90"),
    )
    return (
        orders.select("o_orderpriority", "o_totalprice")
        .join(F.broadcast(est), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.first("e50").alias("e50"),
            F.first("e90").alias("e90"),
            F.sum(
                (F.col("o_totalprice") < F.col("e50")).cast("bigint")
            ).alias("lt50"),
            F.sum(
                (F.col("o_totalprice") <= F.col("e50")).cast("bigint")
            ).alias("le50"),
            F.sum(
                (F.col("o_totalprice") < F.col("e90")).cast("bigint")
            ).alias("lt90"),
            F.sum(
                (F.col("o_totalprice") <= F.col("e90")).cast("bigint")
            ).alias("le90"),
        )
    )


def _rank_window(permille: int):
    """Allowed-rank window for a GK estimate at quantile q =
    permille/1000 with ε = 1/_SKETCH_ACCURACY, in pure integer math
    (identical in Spark and DuckDB): lo = floor((q-ε)n)-1,
    hi = ceil((q+ε)n)+1 — the ±1 pads absorb rank-convention
    (ties/off-by-one) differences, never a real guarantee violation."""
    lo = F.expr(f"({permille - 1} * n) div 1000 - 1")
    hi = F.expr(f"({permille + 1} * n + 999) div 1000 + 1")
    return lo, hi


def _quantile_verdict(lt, le, permille: int):
    """1.0 when the estimate's feasible rank interval [lt+1, le]
    overlaps the allowed window — the deterministic Greenwald-Khanna
    guarantee, which percentile_approx must always satisfy."""
    lo, hi = _rank_window(permille)
    return (
        ((lt + F.lit(1) <= hi) & (le >= lo)).cast("double")
    )


def q_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'sketch' variant — VERDICT-CHECKED sketch rows (VERDICT r8
    Next #4): one row per (priority, sketch) in long form instead of
    raw estimates. grp suffix names the sketch; v3 is the verdict.

    - ``|cust`` (HLL): v1 = exact distinct custkeys, v2 = the
      approx_count_distinct estimate, v3 = 1.0 when the relative
      error is within 3×rsd (0.15 — a 3σ check; HLL's bound is
      probabilistic, so this row stays rows-only).
    - ``|p50`` / ``|p90`` (GK percentile_approx): v1 = the estimate's
      exact lower feasible rank (count below + 1), v2 = the estimate,
      v3 = 1.0 when the feasible rank interval overlaps the allowed
      window (q±ε)·n±1 — a DETERMINISTIC guarantee, which the
      oracle-paired stats_moments 'qv' variant additionally pins
      cross-engine.

    The estimate internals stay engine-specific (no oracle for this
    entry), but every row now carries its own exact-side audit;
    tests/test_sketches.py asserts all verdicts hold."""
    orders = load_table(spark, sf_dir, "orders")
    prof = _quantile_rank_profile(orders)
    cd = orders.groupBy("o_orderpriority").agg(
        # rsd passed explicitly so the 3σ verdict bound below and the
        # sketch configuration are single-sourced (ADVICE r9): the
        # engine default changing would otherwise silently skew v3
        F.approx_count_distinct("o_custkey", rsd=_HLL_RSD).alias("acd"),
        F.countDistinct("o_custkey").alias("xcd"),
    )
    j = prof.join(cd, "o_orderpriority")
    cust = j.select(
        F.lit("sketch").alias("variant"),
        F.concat(F.col("o_orderpriority"), F.lit("|cust")).alias("grp"),
        F.col("n").cast("bigint").alias("n"),
        F.col("xcd").cast("double").alias("v1"),
        F.col("acd").cast("double").alias("v2"),
        (
            F.abs(F.col("acd") - F.col("xcd"))
            <= F.lit(3 * _HLL_RSD) * F.col("xcd")
        ).cast("double").alias("v3"),
    )

    def qrow(permille: int, lt: str, le: str, label: str, est: str):
        return j.select(
            F.lit("sketch").alias("variant"),
            F.concat(F.col("o_orderpriority"), F.lit(label)).alias("grp"),
            F.col("n").cast("bigint").alias("n"),
            (F.col(lt) + F.lit(1)).cast("double").alias("v1"),
            F.col(est).cast("double").alias("v2"),
            _quantile_verdict(F.col(lt), F.col(le), permille).alias("v3"),
        )

    return cust.unionByName(
        qrow(500, "lt50", "le50", "|p50", "e50")
    ).unionByName(qrow(900, "lt90", "le90", "|p90", "e90"))


_BPE_TOP_WORDS = 300
_BPE_MERGES = 80


def q_bpe_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'bpe' variant: learned-BPE tokenization rollup
    (operators/bpe.py). The merge list is trained on the corpus word
    frequencies (distributed count, ≤ top-N rows to the driver), then
    applied map-side; per source: docs, total BPE segments, mean
    segments/doc, and fertility (BPE segments per whitespace token).
    Not SQL-expressible (the merge list is the product of an iterative
    greedy training loop), so rows-only by design; segment/fertility
    invariants are unit-tested in tests/test_bpe.py."""
    from ..operators.bpe import bpe_tokenize, train_bpe, word_freq_table

    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe(
        word_freq_table(docs, top_n=_BPE_TOP_WORDS), n_merges=_BPE_MERGES
    )
    toks = bpe_tokenize(docs, merges).join(
        docs.select(
            "doc_id",
            "source",
            F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("__ws"),
        ),
        "doc_id",
    )
    return toks.groupBy("source").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("n_bpe_tokens").alias("__seg"),
        F.sum("__ws").alias("__wsn"),
    ).select(
        F.lit("bpe").alias("variant"),
        F.col("source").alias("grp"),
        F.col("__n").cast("bigint").alias("n"),
        F.col("__seg").cast("double").alias("v1"),
        (F.col("__seg") / F.col("__n")).cast("double").alias("v2"),
        (F.col("__seg") / F.col("__wsn")).cast("double").alias("v3"),
    )


_QUALITY_TRAIN_MOD = 3  # doc_id % 3 == 0 rows train the classifier


def q_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'quality' variant: trainable quality classifier rollup
    (operators/quality_model.py). A deterministic heuristic labels the
    doc_id%3==0 slice (token-uniqueness ≥ 0.5 → positive), HashingTF +
    logistic regression fit on it (fixed-dim features, no vocab
    shuffle), the model scores the held-out slice map-side; per
    source: held-out docs, predicted-positive count, mean probability,
    positive fraction. Model training is not SQL-expressible, so
    rows-only by design; separation and plan (map-side scoring)
    invariants are unit-tested in tests/test_quality_model.py."""
    from ..operators.quality_model import (
        score_quality,
        train_quality_classifier,
    )

    docs = load_table(spark, sf_dir, "documents")
    uniq = F.size(F.array_distinct(F.split(F.trim(F.col("text")), " "))) / F.size(
        F.split(F.trim(F.col("text")), " ")
    )
    train = docs.filter(F.col("doc_id") % _QUALITY_TRAIN_MOD == 0).withColumn(
        "label", (uniq >= 0.5).cast("double")
    )
    model = train_quality_classifier(train)
    held = docs.filter(F.col("doc_id") % _QUALITY_TRAIN_MOD != 0)
    scored = score_quality(model, held)
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("__n"),
        F.count(F.when(F.col("quality_prob") > 0.5, 1)).alias("__pos"),
        F.avg("quality_prob").alias("__mp"),
    ).select(
        F.lit("quality").alias("variant"),
        F.col("source").alias("grp"),
        F.col("__n").cast("bigint").alias("n"),
        F.col("__pos").cast("double").alias("v1"),
        F.col("__mp").cast("double").alias("v2"),
        (F.col("__pos") / F.col("__n")).cast("double").alias("v3"),
    )


def q_compression_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'comp' variant: zlib compression-ratio signal rollup
    (operators/quality_model.py compression_ratio) — one Arrow map
    pass, no shuffle until the rollup; per source: docs, mean ratio,
    min ratio, share of template-like docs (ratio < 0.4). zlib is not
    SQL-expressible, so rows-only by design; the no-Exchange plan is
    unit-asserted."""
    from ..operators.quality_model import compression_ratio

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    rated = compression_ratio(docs)
    return rated.groupBy("source").agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg("compression_ratio").alias("__mean"),
        F.min("compression_ratio").alias("__min"),
        F.count(F.when(F.col("compression_ratio") < 0.4, 1)).alias("__tpl"),
    ).select(
        F.lit("comp").alias("variant"),
        F.col("source").alias("grp"),
        F.col("__n").cast("bigint").alias("n"),
        F.col("__mean").cast("double").alias("v1"),
        F.col("__min").cast("double").alias("v2"),
        (F.col("__tpl") / F.col("__n")).cast("double").alias("v3"),
    )


_SHARD_TOKENS = 5_000


def q_shard_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'shard' variant: training-shard assignment audit
    (sinks/training_export.py assign_shards) — xxhash64 pseudo-shuffle
    order + distributed prefix-sum shard bounds; per shard: docs,
    token sum, max doc tokens, fill fraction. xxhash64 has no DuckDB
    twin, so rows-only by design; bound and determinism invariants are
    unit-tested in tests/test_training_export.py."""
    from ..sinks.training_export import assign_shards

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), " ")).cast("bigint").alias(
            "n_tokens"
        ),
    )
    sharded = assign_shards(docs, shard_tokens=_SHARD_TOKENS)
    return sharded.groupBy("shard").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("n_tokens").alias("__tok"),
        F.max("n_tokens").alias("__mx"),
    ).select(
        F.lit("shard").alias("variant"),
        F.col("shard").cast("string").alias("grp"),
        F.col("__n").cast("bigint").alias("n"),
        F.col("__tok").cast("double").alias("v1"),
        F.col("__mx").cast("double").alias("v2"),
        (F.col("__tok") / F.lit(_SHARD_TOKENS)).cast("double").alias("v3"),
    )


_LAYOUT_FILES = 4


def q_layout_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'layout' variant: layout-maintenance audit (operators/layout.py).
    Compacts the documents table with byte-derived file sizing, then
    range-clusters it on doc_id and reads the WRITTEN files back: one
    row per output file with its row count and doc_id min/max — the
    disjoint ranges parquet footer-skipping depends on. Filesystem
    side effects aren't SQL-expressible, so rows-only by design;
    footer-level disjointness is unit-asserted in
    tests/test_layout.py. The collect is bounded by the file count
    (``_LAYOUT_FILES``)."""
    import shutil
    import tempfile

    from ..operators.layout import compact, write_clustered

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", "text"
    )
    d = tempfile.mkdtemp(prefix="layout_rollup_")
    try:
        n_compact = compact(docs, f"{d}/compacted", target_bytes=1 << 20)
        write_clustered(
            docs.select("doc_id", "n_chars"),
            f"{d}/clustered",
            cluster_cols=["doc_id"],
            num_files=_LAYOUT_FILES,
        )
        per_file = (
            spark.read.parquet(f"{d}/clustered")
            .groupBy(F.input_file_name().alias("__f"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.min("doc_id").alias("lo"),
                F.max("doc_id").alias("hi"),
            )
            .collect()
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
    rows = [
        ("layout", str(rank), r["n"], float(r["lo"]), float(r["hi"]),
         float(n_compact))
        for rank, r in enumerate(sorted(per_file, key=lambda r: r["lo"]))
    ]
    return spark.createDataFrame(
        rows, "variant string, grp string, n bigint, v1 double, "
        "v2 double, v3 double"
    )


def q_sketches_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only union-tagged entry (driver cap): engine-specific or
    non-SQL-expressible rollups, one schema
    (variant, grp, n, v1, v2, v3). variant 'sketch': HLL/KLL
    approximates. variant 'bpe': learned-BPE segment rollup. variant
    'quality': trained-classifier score rollup. variant 'comp': zlib
    compression-ratio rollup. variant 'shard': training-shard
    assignment audit. variant 'layout': compaction + range-clustered
    write audit. Each operator's exact semantics are unit-tested;
    this entry gives them driver exposure (rows + stable schema)."""
    return (
        q_approx_sketches(spark, sf_dir)
        .unionByName(q_bpe_rollup(spark, sf_dir))
        .unionByName(q_quality_rollup(spark, sf_dir))
        .unionByName(q_compression_rollup(spark, sf_dir))
        .unionByName(q_shard_rollup(spark, sf_dir))
        .unionByName(q_layout_rollup(spark, sf_dir))
    )


QUERIES["approx_sketches"] = Q(
    q_sketches_merged,
    None,
    variants={
        "sketch": q_approx_sketches,
        "bpe": q_bpe_rollup,
        "quality": q_quality_rollup,
        "comp": q_compression_rollup,
        "shard": q_shard_rollup,
        "layout": q_layout_rollup,
    },
)


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals (integer bucket math)."""
    orders = load_table(spark, sf_dir, "orders")
    # explicit floor: CAST(double AS BIGINT) truncates in Spark but
    # rounds half-even in DuckDB
    bucket = F.expr("CAST(CAST(FLOOR(o_totalprice) AS BIGINT) DIV 25000 AS INT)")
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .withColumn("bucket_start", (F.col("bucket") * 25000).cast("bigint"))
    )


_HISTOGRAM_SQL = """
SELECT CAST(CAST(FLOOR(o_totalprice) AS BIGINT) // 25000 AS INTEGER) AS bucket,
       count(*) AS n, min(o_totalprice) AS lo, max(o_totalprice) AS hi,
       CAST(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) // 25000 AS INTEGER) * 25000 AS BIGINT) AS bucket_start
FROM orders GROUP BY 1
"""


def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic second moments: variance/stddev/covariance/
    correlation per returnflag, assembled from EXACT decimal power
    sums with one identical double formula on both engines — the
    built-in corr()/stddev() stream doubles in engine-specific order
    and can never hash-match across engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(12,2)")
    y = F.col("l_extendedprice").cast("decimal(12,2)")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n = F.col("n").cast("double")
    var_x = (F.col("sxx") - F.col("sx") * F.col("sx") / n) / (n - 1)
    var_y = (F.col("syy") - F.col("sy") * F.col("sy") / n) / (n - 1)
    cov = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / (n - 1)
    return agg.select(
        "l_returnflag",
        "n",
        var_x.alias("var_qty"),
        F.sqrt(var_x).alias("std_qty"),
        cov.alias("cov_qty_price"),
        (cov / (F.sqrt(var_x) * F.sqrt(var_y))).alias("corr_qty_price"),
    )


def q_contract_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'contracts' variant: declarative data-contract audit
    (operators/contracts.py) — the table-scale generalization of the
    reference's cell-level code/dropdown validation. Row rules fold
    into ONE aggregate pass per table; uniqueness is one groupBy;
    FK orphans are anti joins. Output one row per check:
    grp = check name, n = rows checked, v1 = violations,
    v2 = floor(violations per million) — all integers, hash-exact."""
    from ..operators.contracts import (
        audit_fk,
        audit_rules,
        audit_union,
        audit_unique,
    )

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    events = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    report = audit_union(
        [
            audit_rules(
                li,
                [
                    (
                        "lineitem.quantity_range",
                        ~F.col("l_quantity").between(1, 50),
                    ),
                    (
                        "lineitem.discount_range",
                        (F.col("l_discount") < 0)
                        | (F.col("l_discount") > 0.1),
                    ),
                    (
                        "lineitem.price_positive",
                        F.col("l_extendedprice") <= 0,
                    ),
                    (
                        "lineitem.returnflag_domain",
                        ~F.col("l_returnflag").isin("R", "A", "N"),
                    ),
                    (
                        "lineitem.discount_escalated",
                        F.col("l_discount") > 0.05,
                    ),
                ],
            ),
            audit_rules(
                orders,
                [
                    (
                        "orders.totalprice_positive",
                        F.col("o_totalprice") <= 0,
                    ),
                    (
                        "orders.priority_domain",
                        ~F.col("o_orderpriority").isin(
                            "1-URGENT",
                            "2-HIGH",
                            "3-MEDIUM",
                            "4-NOT SPECIFIED",
                            "5-LOW",
                        ),
                    ),
                    ("orders.date_not_null", F.col("o_orderdate").isNull()),
                ],
            ),
            audit_rules(
                docs,
                [
                    (
                        "documents.text_nonblank",
                        F.length(F.trim(F.col("text"))) == 0,
                    )
                ],
            ),
            audit_unique(
                li, ["l_orderkey", "l_linenumber"], "lineitem.pk_unique"
            ),
            audit_unique(orders, ["o_orderkey"], "orders.pk_unique"),
            audit_fk(
                li, "l_orderkey", orders, "o_orderkey", "lineitem.fk_orders"
            ),
            audit_fk(
                orders,
                "o_custkey",
                customer,
                "c_custkey",
                "orders.fk_customer",
            ),
            audit_fk(
                events, "user_id", customer, "c_custkey", "events.fk_customer"
            ),
        ]
    )
    return report.select(
        F.lit("contracts").alias("variant"),
        F.col("check").alias("grp"),
        F.col("checked").cast("bigint").alias("n"),
        F.col("violations").cast("double").alias("v1"),
        F.expr("(violations * 1000000) div checked")
        .cast("double")
        .alias("v2"),
        F.lit(None).cast("double").alias("v3"),
        F.lit(None).cast("double").alias("v4"),
    )


_CONTRACTS_SQL = """
SELECT 'contracts' AS variant, chk AS grp, CAST(checked AS BIGINT) AS n,
       CAST(violations AS DOUBLE) AS v1,
       CAST((violations * 1000000) // checked AS DOUBLE) AS v2,
       CAST(NULL AS DOUBLE) AS v3, CAST(NULL AS DOUBLE) AS v4
FROM (
  SELECT 'lineitem.quantity_range' AS chk,
         count(CASE WHEN NOT (l_quantity BETWEEN 1 AND 50) THEN 1 END)
           AS violations,
         count(*) AS checked FROM lineitem
  UNION ALL
  SELECT 'lineitem.discount_range',
         count(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 END),
         count(*) FROM lineitem
  UNION ALL
  SELECT 'lineitem.price_positive',
         count(CASE WHEN l_extendedprice <= 0 THEN 1 END),
         count(*) FROM lineitem
  UNION ALL
  SELECT 'lineitem.returnflag_domain',
         count(CASE WHEN l_returnflag NOT IN ('R', 'A', 'N') THEN 1 END),
         count(*) FROM lineitem
  UNION ALL
  SELECT 'lineitem.discount_escalated',
         count(CASE WHEN l_discount > 0.05 THEN 1 END),
         count(*) FROM lineitem
  UNION ALL
  SELECT 'orders.totalprice_positive',
         count(CASE WHEN o_totalprice <= 0 THEN 1 END),
         count(*) FROM orders
  UNION ALL
  SELECT 'orders.priority_domain',
         count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH',
               '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW') THEN 1 END),
         count(*) FROM orders
  UNION ALL
  SELECT 'orders.date_not_null',
         count(CASE WHEN o_orderdate IS NULL THEN 1 END),
         count(*) FROM orders
  UNION ALL
  SELECT 'documents.text_nonblank',
         count(CASE WHEN length(trim(text)) = 0 THEN 1 END),
         count(*) FROM documents
  UNION ALL
  SELECT 'lineitem.pk_unique',
         coalesce(sum(CASE WHEN nn > 1 THEN nn - 1 ELSE 0 END), 0),
         coalesce(sum(nn), 0)
  FROM (SELECT count(*) AS nn FROM lineitem
        GROUP BY l_orderkey, l_linenumber)
  UNION ALL
  SELECT 'orders.pk_unique',
         coalesce(sum(CASE WHEN nn > 1 THEN nn - 1 ELSE 0 END), 0),
         coalesce(sum(nn), 0)
  FROM (SELECT count(*) AS nn FROM orders GROUP BY o_orderkey)
  UNION ALL
  SELECT 'lineitem.fk_orders',
         count(CASE WHEN NOT EXISTS (SELECT 1 FROM orders
               WHERE o_orderkey = l_orderkey) THEN 1 END),
         count(*)
  FROM lineitem WHERE l_orderkey IS NOT NULL
  UNION ALL
  SELECT 'orders.fk_customer',
         count(CASE WHEN NOT EXISTS (SELECT 1 FROM customer
               WHERE c_custkey = o_custkey) THEN 1 END),
         count(*)
  FROM orders WHERE o_custkey IS NOT NULL
  UNION ALL
  SELECT 'events.fk_customer',
         count(CASE WHEN NOT EXISTS (SELECT 1 FROM customer
               WHERE c_custkey = user_id) THEN 1 END),
         count(*)
  FROM events WHERE user_id IS NOT NULL
)
"""


_CHI2_ROWS = ("click", "error", "purchase", "signup", "view")
_CHI2_COLS = (0, 1)  # user-id parity cohorts


def q_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'chi2' variant: chi-square independence test
    (operators/stats_tests.py) of event type vs an A/B cohort
    (user-id parity) — the contingency table is one aggregate pass of
    conditional counts, the statistic one pinned expression tree over
    those integers, so the float result is bit-identical across
    engines. grp = the tested pair, n = total, v1 = chi2, v2 = dof,
    v3 = Cramér's V."""
    from ..operators.stats_tests import chi_square_independence

    ev = load_table(spark, sf_dir, "events").withColumn(
        "cohort", (F.col("user_id") % 2).cast("int")
    )
    out = chi_square_independence(
        ev, "event_type", "cohort", _CHI2_ROWS, _CHI2_COLS
    )
    return out.select(
        F.lit("chi2").alias("variant"),
        F.lit("event_type x user_parity").alias("grp"),
        F.col("n").cast("bigint").alias("n"),
        F.col("chi2").cast("double").alias("v1"),
        F.col("dof").cast("double").alias("v2"),
        F.col("cramers_v").cast("double").alias("v3"),
        F.lit(None).cast("double").alias("v4"),
    )


def _chi2_sql() -> str:
    """DuckDB twin generated from the SAME cell layout and fold order
    as operators/stats_tests.py — identical float operation order is
    what makes the statistic hash-exact."""
    k, m = len(_CHI2_ROWS), len(_CHI2_COLS)
    cells = ",\n         ".join(
        "coalesce(sum(CASE WHEN event_type = '%s' AND cohort = %d "
        "THEN 1 END), 0) AS o_%d_%d" % (rv, cv, i, j)
        for i, rv in enumerate(_CHI2_ROWS)
        for j, cv in enumerate(_CHI2_COLS)
    )
    r = [
        " + ".join(f"o_{i}_{j}" for j in range(m)) for i in range(k)
    ]
    c = [
        " + ".join(f"o_{i}_{j}" for i in range(k)) for j in range(m)
    ]
    rdefs = ", ".join(f"{expr} AS r_{i}" for i, expr in enumerate(r))
    cdefs = ", ".join(f"{expr} AS c_{j}" for j, expr in enumerate(c))
    ndef = " + ".join(f"r_{i}" for i in range(k))
    terms = []
    for i in range(k):
        for j in range(m):
            e = (
                f"(CAST(r_{i} AS DOUBLE) * CAST(c_{j} AS DOUBLE)"
                " / CAST(n AS DOUBLE))"
            )
            o = f"CAST(o_{i}_{j} AS DOUBLE)"
            terms.append(
                f"CASE WHEN {e} > 0 THEN ({o} - {e}) * ({o} - {e})"
                f" / {e} ELSE 0.0 END"
            )
    chi2 = " + ".join(terms)
    mindim = min(k - 1, m - 1)
    return f"""
WITH xev AS (
  SELECT event_type, CAST(user_id % 2 AS INT) AS cohort FROM events
), xcells AS (
  SELECT {cells}
  FROM xev
), xtot AS (
  SELECT *, {rdefs}, {cdefs} FROM xcells
), xn AS (
  SELECT *, {ndef} AS n FROM xtot
)
SELECT 'chi2' AS variant, 'event_type x user_parity' AS grp,
       CAST(n AS BIGINT) AS n,
       CAST({chi2} AS DOUBLE) AS v1,
       CAST({(k - 1) * (m - 1)} AS DOUBLE) AS v2,
       CASE WHEN n > 0 AND {mindim} > 0
            THEN sqrt(({chi2}) / (CAST(n AS DOUBLE) * {float(mindim)}))
       END AS v3,
       CAST(NULL AS DOUBLE) AS v4
FROM xn
"""


_KANON_K = 5
_KANON_L = 2


def q_kanon_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'kanon' variant: k-anonymity / l-diversity release audit
    (operators/privacy.py) over customers — quasi-identifiers
    (nation, market segment, 1000-unit balance band), sensitive
    attribute ``c_custkey % 7`` (a synthetic category standing in for
    plan tier). One row per equivalence class: n = class size,
    v1 = k threshold, v2 = distinct sensitive values, v3 = risky
    (class smaller than k={k} or fewer than l={l} sensitive values).
    Class table bounded by the quasi-identifier domain, not the
    corpus."""
    from ..operators.privacy import k_anonymity_audit

    cust = load_table(spark, sf_dir, "customer")
    audit = k_anonymity_audit(
        cust,
        [
            F.col("c_nationkey").cast("bigint"),
            F.col("c_mktsegment"),
            F.floor(F.col("c_acctbal") / 1000).cast("bigint"),
        ],
        k=_KANON_K,
        sensitive=F.pmod(F.col("c_custkey"), F.lit(7)),
        l_threshold=_KANON_L,
    )
    return audit.select(
        F.lit("kanon").alias("variant"),
        F.concat_ws("|", "q0", "q1", "q2").alias("grp"),
        F.col("class_size").cast("bigint").alias("n"),
        F.lit(float(_KANON_K)).alias("v1"),
        F.col("n_sensitive").cast("double").alias("v2"),
        F.col("is_risky").cast("double").alias("v3"),
        F.lit(None).cast("double").alias("v4"),
    )


q_kanon_stats.__doc__ = q_kanon_stats.__doc__.format(
    k=_KANON_K, l=_KANON_L
)


def q_moments_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact second moments + data-contract audit in one union-tagged
    entry (driver cap: the correctness gate records at most 50
    registry entries). variant 'moments': see q_stats_moments
    (grp = returnflag, v1..v4 = var/std/cov/corr). variant
    'contracts': see q_contract_audit. variant 'chi2': see
    q_chi_square. variant 'kanon': see q_kanon_stats. variant
    'teloo': see q_target_encode."""
    mom = q_stats_moments(spark, sf_dir).select(
        F.lit("moments").alias("variant"),
        F.col("l_returnflag").alias("grp"),
        F.col("n").cast("bigint").alias("n"),
        F.col("var_qty").cast("double").alias("v1"),
        F.col("std_qty").cast("double").alias("v2"),
        F.col("cov_qty_price").cast("double").alias("v3"),
        F.col("corr_qty_price").cast("double").alias("v4"),
    )
    return (
        mom.unionByName(q_contract_audit(spark, sf_dir))
        .unionByName(q_chi_square(spark, sf_dir))
        .unionByName(q_kanon_stats(spark, sf_dir))
        .unionByName(q_target_encode(spark, sf_dir))
        .unionByName(q_quantile_guarantee(spark, sf_dir))
        .unionByName(q_kmv_distinct(spark, sf_dir))
    )


_MOMENTS_SQL = """
WITH s AS (
  SELECT l_returnflag, count(*) AS n,
    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sx,
    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sy,
    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sxx,
    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS syy,
    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
  (sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1) AS var_qty,
  sqrt((sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)) AS std_qty,
  (sxy - sx * sy / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1) AS cov_qty_price,
  ((sxy - sx * sy / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1))
    / (sqrt((sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1))
       * sqrt((syy - sy * sy / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1))) AS corr_qty_price
FROM s
"""


_SAMPLE_RATES = {0: 0.2, 1: 0.4, 2: 0.6, 3: 0.8}


def q_sample_stats(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Deterministic stratified sampling audit over documents: the
    per-source-bucket keep quota a training-data pipeline applies.
    Hash-based (functions/sampling.py) — reproducible across engines,
    reruns, and partitionings, unlike df.sample()'s RNG. Reports per
    stratum: rows kept (n), target rate (v1), total rows (v2),
    achieved rate (v3 — exact integer division)."""
    from ..functions.sampling import stratified_keep

    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    stratum = F.pmod(
        F.regexp_extract("source", r"(\d+)", 1).cast("int"), F.lit(4)
    )
    keep = stratified_keep(stratum, F.col("doc_id"), _SAMPLE_RATES)
    return (
        docs.select(stratum.alias("stratum"), keep.alias("keep"))
        .groupBy("stratum")
        .agg(
            F.count(F.when(F.col("keep"), 1)).alias("n_kept"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .select(
            F.lit("sample").alias("variant"),
            F.col("stratum").cast("string").alias("grp"),
            F.col("n_kept").cast("bigint").alias("n"),
            F.element_at(
                F.array(*[F.lit(v) for v in _SAMPLE_RATES.values()]),
                F.col("stratum").cast("int") + 1,
            ).alias("v1"),
            F.col("n_total").cast("double").alias("v2"),
            (F.col("n_kept").cast("double") / F.col("n_total")).alias("v3"),
        )
    )


_PACK_SEQ_LEN = 512


def q_pack_stats(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Per-sequence packing audit: documents concatenated in doc_id
    order and cut into 512-token training sequences via the
    distributed prefix-sum (operators/packing.py — no single-task
    global window). Reports per sequence: docs starting there (n),
    their token total (v1), how many cross the cut (v2), fill ratio
    vs seq_len (v3). The rollup is oracle-checked against DuckDB's
    window cumsum, so the two-phase scan's exact cumulative totals
    are what the hash pins."""
    from ..operators.packing import pack_sequences

    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), " "))
        .cast("bigint")
        .alias("n_tokens"),
    )
    packed = pack_sequences(sized, seq_len=_PACK_SEQ_LEN)
    return (
        packed.groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("tok"),
            F.count(F.when(F.col("spans_boundary"), 1)).alias("n_span"),
        )
        .select(
            F.lit("pack").alias("variant"),
            F.col("seq_id").cast("string").alias("grp"),
            F.col("n_docs").cast("bigint").alias("n"),
            F.col("tok").cast("double").alias("v1"),
            F.col("n_span").cast("double").alias("v2"),
            (F.col("tok").cast("double") / _PACK_SEQ_LEN).alias("v3"),
        )
    )


_BUDGET_FRAC = (1, 2)


def q_budget_stats(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Token-budget selection audit: keep the highest-quality half of
    the corpus BY TOKENS (operators/budget.py — the distributed
    prefix-sum again, ordered by quality DESC; no single-task global
    window), then roll up per source: docs kept (n), tokens kept
    (v1), docs total (v2), kept fraction (v3). The per-source keep
    counts pin the exact cumulative totals and the integer-math
    budget boundary against DuckDB's window cumsum.

    Quality is the curation score (plans/curation.py) — the same
    double ops in the same order, bit-identical across engines."""
    from ..operators.budget import select_token_budget

    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    ws = F.split(F.trim(F.col("text")), " ")
    uniq = F.size(F.array_distinct(ws)).cast("double") / F.size(ws)
    quality = (
        F.least(F.col("n_chars").cast("double") / 400, F.lit(1.0)) * 0.5
        + uniq * 0.5
    )
    sized = docs.select(
        "doc_id",
        "source",
        quality.alias("q"),
        F.size(ws).cast("bigint").alias("n_tokens"),
    )
    sel = select_token_budget(
        sized,
        order_col=[F.col("q").desc(), F.col("doc_id")],
        size_col="n_tokens",
        budget_frac=_BUDGET_FRAC,
    )
    return (
        sel.groupBy("source")
        .agg(
            F.count(F.when(F.col("keep"), 1)).alias("n_kept"),
            F.sum(F.when(F.col("keep"), F.col("n_tokens"))).alias("tok_kept"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .select(
            F.lit("budget").alias("variant"),
            F.col("source").alias("grp"),
            F.col("n_kept").cast("bigint").alias("n"),
            F.col("tok_kept").cast("double").alias("v1"),
            F.col("n_total").cast("double").alias("v2"),
            (F.col("n_kept").cast("double") / F.col("n_total")).alias("v3"),
        )
    )


_SPAN_K = 5  # fixture-scale span length; Lee et al. use 50 tokens


def q_span_stats(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Substring-span dedup audit (operators/span_dedup.py — the
    Lee et al. exact-substring technique as bounded aggregations, no
    suffix array, no pair expansion). Per source: docs with ≥1
    cross-doc duplicated k-token span (n), total duplicated span
    positions (v1), interval-union covered tokens (v2), corpus
    covered-token fraction (v3). All-integer interval math, so the
    rollup pins the per-doc window recurrence against DuckDB's."""
    from ..operators.span_dedup import span_dup_metrics

    if docs is None:
        docs = spread(
            load_table(spark, sf_dir, "documents"), "doc_id"
        )
    m = span_dup_metrics(docs, k=_SPAN_K)
    return (
        m.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.when(F.col("n_dup_grams") > 0, 1)).alias("n_dup_docs"),
            F.sum("n_dup_grams").alias("dup_grams"),
            F.sum("covered_tokens").alias("covered"),
            F.sum("n_tokens").alias("tok"),
        )
        .select(
            F.lit("span").alias("variant"),
            F.col("source").alias("grp"),
            F.col("n_dup_docs").cast("bigint").alias("n"),
            F.col("dup_grams").cast("double").alias("v1"),
            F.col("covered").cast("double").alias("v2"),
            (F.col("covered").cast("double") / F.col("tok").cast("double"))
            .alias("v3"),
        )
    )


def q_lm_stats(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Bigram-LM rarity audit (operators/lm_filter.py — the
    CCNet/KenLM perplexity-filter signal as two count tables + two
    equi-joins). Model trained on the even-doc_id half, the odd half
    scored against it. Per source: docs scored (n), bigrams scored
    (v1), unseen-in-reference bigrams (v2), rare fraction (v3). The
    rollup pins the all-integer join/count plumbing; the float
    cross-entropy itself is unit-checked against NumPy (double sums
    are float-order-dependent, same policy as trained centroids)."""
    from ..operators.lm_filter import score_perplexity, train_bigram_lm

    if docs is None:
        docs = spread(
            load_table(spark, sf_dir, "documents"), "doc_id"
        )
    lm = train_bigram_lm(docs.filter(F.col("doc_id") % 2 == 0))
    scored = score_perplexity(
        lm, docs.filter(F.col("doc_id") % 2 == 1)
    )
    return (
        scored.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bigrams").alias("bg"),
            F.sum("n_unseen").alias("unseen"),
            F.sum("n_rare").alias("rare"),
        )
        .select(
            F.lit("lm").alias("variant"),
            F.col("source").alias("grp"),
            F.col("n_docs").cast("bigint").alias("n"),
            F.col("bg").cast("double").alias("v1"),
            F.col("unseen").cast("double").alias("v2"),
            (F.col("rare").cast("double") / F.col("bg").cast("double"))
            .alias("v3"),
        )
    )


_MIX_WEIGHTS: dict[int, tuple[int, int]] = {
    0: (3, 10),
    1: (3, 10),
    2: (1, 10),
    3: (1, 10),
}


def q_mix_stats(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Domain-mixture token budgeting audit (operators/mixture.py —
    per-domain corpus-fraction allocations via the GROUPED distributed
    prefix-sum; DoReMi-style recipe weights). Strata 0/1 get 30% of
    corpus tokens each, 2/3 get 10% each, best-quality first within
    each domain. Per domain: docs kept (n), tokens kept (v1), domain
    tokens total (v2), achieved corpus fraction (v3). Integer cutoff
    math and the grouped cumsum pin bit-identically against DuckDB's
    per-domain window."""
    from ..operators.mixture import mixture_select

    if docs is None:
        docs = spread(
            load_table(spark, sf_dir, "documents"), "doc_id"
        )
    stratum = F.pmod(
        F.regexp_extract("source", r"(\d+)", 1).cast("int"), F.lit(4)
    )
    ws = F.split(F.trim(F.col("text")), " ")
    uniq = F.size(F.array_distinct(ws)).cast("double") / F.size(ws)
    quality = (
        F.least(F.col("n_chars").cast("double") / 400, F.lit(1.0)) * 0.5
        + uniq * 0.5
    )
    sized = docs.select(
        "doc_id",
        stratum.alias("dom"),
        quality.alias("q"),
        F.size(ws).cast("bigint").alias("n_tokens"),
    )
    sel = mixture_select(
        sized,
        group_col="dom",
        order_col=[F.col("q").desc(), F.col("doc_id")],
        weights=_MIX_WEIGHTS,
    )
    total = sized.agg(
        F.sum("n_tokens").cast("bigint").alias("__corpus_tokens")
    )
    return (
        sel.groupBy("dom")
        .agg(
            F.count(F.when(F.col("keep"), 1)).alias("n_kept"),
            F.sum(F.when(F.col("keep"), F.col("n_tokens"))).alias(
                "tok_kept"
            ),
            F.sum("n_tokens").alias("tok_total"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            F.lit("mix").alias("variant"),
            F.col("dom").cast("string").alias("grp"),
            F.col("n_kept").cast("bigint").alias("n"),
            F.coalesce(F.col("tok_kept"), F.lit(0))
            .cast("double")
            .alias("v1"),
            F.col("tok_total").cast("double").alias("v2"),
            (
                F.coalesce(F.col("tok_kept"), F.lit(0)).cast("double")
                / F.col("__corpus_tokens").cast("double")
            ).alias("v3"),
        )
    )


def q_dsir_stats(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """DSIR importance-resampling audit (operators/dsir.py — the
    Xie et al. 2023 hashed-n-gram importance estimator with exact
    integer ratios). The stratum-0 sources are the target slice; every
    other document is scored ``Σ c_w·ratio(w)`` in pure bigint and the
    top-importance half BY TOKENS is kept via the distributed
    prefix-sum. Per source: docs kept (n), importance kept (v1), docs
    total (v2), kept fraction (v3) — counts, integer scores, and the
    budget boundary all pin bit-identically against DuckDB."""
    from ..operators.dsir import dsir_select

    if docs is None:
        docs = spread(
            load_table(spark, sf_dir, "documents"), "doc_id"
        )
    stratum = F.pmod(
        F.regexp_extract("source", r"(\d+)", 1).cast("int"), F.lit(4)
    )
    sel = dsir_select(
        docs.select("doc_id", "source", "text"),
        tokens_col=F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
        is_target=stratum == F.lit(0),
    )
    return (
        sel.groupBy("source")
        .agg(
            F.count(F.when(F.col("keep"), 1)).alias("n_kept"),
            F.sum(F.when(F.col("keep"), F.col("importance"))).alias(
                "imp_kept"
            ),
            F.count(F.lit(1)).alias("n_total"),
        )
        .select(
            F.lit("dsir").alias("variant"),
            F.col("source").alias("grp"),
            F.col("n_kept").cast("bigint").alias("n"),
            F.coalesce(F.col("imp_kept"), F.lit(0))
            .cast("double")
            .alias("v1"),
            F.col("n_total").cast("double").alias("v2"),
            (F.col("n_kept").cast("double") / F.col("n_total")).alias("v3"),
        )
    )


_HH_CAPACITY = 512
_HH_DEN = 200  # report tokens with count * _HH_DEN >= total


def q_hh_stats(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """'hh' variant: heavy hitters over the document token stream
    (operators/heavy_hitters.py) — bounded-state frequent-items
    sketch + exact verification, reported as every token with
    frequency ≥ total/_HH_DEN. The sketch capacity (512) strictly
    exceeds _HH_DEN, so the one-sided guarantee makes the output
    EXACTLY the over-threshold set — deterministic and
    oracle-matchable by a plain GROUP BY/HAVING. The threshold join
    is a 1-row broadcast (same shape as the scalar distributions
    elsewhere in this entry)."""
    from ..operators.heavy_hitters import heavy_hitters

    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok")
    )
    counts = heavy_hitters(toks, key_col="tok", capacity=_HH_CAPACITY)
    total = toks.groupBy().agg(F.count(F.lit(1)).alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("count") * _HH_DEN >= F.col("__total"))
        .select(
            F.lit("hh").alias("variant"),
            F.col("tok").alias("grp"),
            F.col("count").cast("bigint").alias("n"),
            F.col("count").cast("double").alias("v1"),
            F.col("__total").cast("double").alias("v2"),
            (
                F.col("count").cast("double")
                / F.col("__total").cast("double")
            ).alias("v3"),
        )
    )


_HH_SQL = f"""
WITH toks AS (
  SELECT unnest(string_split(trim(text), ' ')) AS tok FROM documents
), tot AS (SELECT count(*) AS total FROM toks)
SELECT 'hh' AS variant, tok AS grp, CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) AS DOUBLE) AS v1,
       CAST(max(total) AS DOUBLE) AS v2,
       CAST(count(*) AS DOUBLE) / CAST(max(total) AS DOUBLE) AS v3
FROM toks, tot
GROUP BY tok
HAVING count(*) * {_HH_DEN} >= max(total)
"""


_WARC_PARTS = 8


def q_warc_stats(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """'warc' variant: the crawl-ingestion round-trip audit.

    Documents are templated into HTML (pure JVM ``concat`` — nav +
    h1=source + escaped body + per-doc link list + footer), archived
    as real WARC/1.0 gzip-member files (``sources/warc.py``), scanned
    back through the distributed ``binaryFile`` parse, and main-text
    extracted (``operators/html_extract.py``). The rollup groups on
    the EXTRACTED first text line (the <h1>, i.e. ``source``) so the
    grouping key itself proves extraction: n = docs per source,
    v1 = Σ extracted-text length (must equal the templated
    ``len(source)+1+len(trim(text))``), v2 = Σ content outlinks (the
    templated ``1 + doc_id % 4`` — nav/footer links must NOT count),
    v3 = docs whose <title> round-tripped. The oracle computes the
    same sums straight from ``documents``: any parser, boilerplate,
    or entity-handling drift hash-mismatches. Filesystem side effects
    follow the 'layout' variant pattern — bounded collect (≤ distinct
    sources) and the temp dir is removed before returning."""
    import shutil
    import tempfile

    from ..operators.html_extract import extract_html
    from ..sources.warc import read_warc, write_warc_files

    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    esc = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), "&", "&amp;"), "<", "&lt;"
        ),
        ">",
        "&gt;",
    )
    links_html = F.expr(
        "array_join(transform(sequence(0L, doc_id % 4), i -> concat("
        "'<li><a href=\"http://ex.org/', CAST(doc_id AS STRING), '/', "
        "CAST(i AS STRING), '\">ref ', CAST(i AS STRING), '</a></li>')), '')"
    )
    did = F.col("doc_id").cast("string")
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit("http://h"),
            F.pmod("doc_id", F.lit(7)).cast("string"),
            F.lit(".example/d/"),
            did,
        ).alias("url"),
        F.concat(
            F.lit("<html><head><title>Doc "),
            did,
            F.lit("</title></head><body>"),
            F.lit('<nav><a href="/home">Home</a> <a href="/about">About</a>'
                  "</nav><h1>"),
            F.col("source"),
            F.lit("</h1><p>"),
            esc,
            F.lit("</p><ul>"),
            links_html,
            F.lit("</ul><footer>&copy; 2026 synthetic</footer>"
                  "</body></html>"),
        ).alias("html"),
    ).repartition(
        max(_WARC_PARTS, spark.sparkContext.defaultParallelism)
    )  # one archive per core: the scan parallelism IS the file count

    d = tempfile.mkdtemp(prefix="warc_stats_")
    try:
        write_warc_files(pages, d).collect()  # manifest only (≤ parts rows)
        recs = read_warc(spark, d).select(
            F.regexp_extract("record_id", r"doc-(\d+)", 1)
            .cast("bigint")
            .alias("doc_id"),
            "target_uri",
            F.col("payload").cast("string").alias("html"),
        )
        ex = extract_html(recs, html_col="html", base_col="target_uri")
        roll = (
            ex.select(
                F.expr("split(text, '\n')[0]").alias("grp"),
                F.length("text").alias("__tlen"),
                F.size("content_links").alias("__nl"),
                (
                    F.col("title")
                    == F.concat(F.lit("Doc "), F.col("doc_id").cast("string"))
                )
                .cast("int")
                .alias("__tok"),
            )
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("__tlen").alias("v1"),
                F.sum("__nl").alias("v2"),
                F.sum("__tok").alias("v3"),
            )
            .collect()
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
    rows = [
        ("warc", r["grp"], r["n"], float(r["v1"]), float(r["v2"]),
         float(r["v3"]))
        for r in roll
    ]
    return spark.createDataFrame(
        rows,
        "variant string, grp string, n bigint, v1 double, v2 double, "
        "v3 double",
    )


_WARC_SQL = """
SELECT 'warc' AS variant, source AS grp, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(length(source) + CASE WHEN length(trim(text)) > 0
                 THEN 1 + length(trim(text)) ELSE 0 END) AS DOUBLE) AS v1,
       CAST(sum(1 + doc_id % 4) AS DOUBLE) AS v2,
       CAST(count(*) AS DOUBLE) AS v3
FROM documents GROUP BY source
"""


_PR_ITERS = 6
_PR_SCALE = 10**12
_PR_DAMP = (85, 100)
_PR_DST_OFFSET = 1_000_000


def q_pagerank_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'pagerank' variant: quantized fixed-point PageRank
    (operators/graph.py::pagerank_int) over the supplier→customer
    trade graph (who supplies whom, via lineitem×orders) — the same
    authority recurrence a web-curation pipeline runs over the host
    outlink graph from operators/html_extract.py. Every rank is a
    scaled BIGINT and the recurrence is integer multiply/floor-divide
    only, so the DuckDB unrolled-CTE oracle reproduces the exact bits
    across all {iters} rounds. n = the scaled rank itself (hash-exact
    integer), v1 = rank/scale (one int/int double division —
    bit-portable), v2 = outdeg, v3 = iteration count."""
    from ..operators.graph import pagerank_int

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    edges = li.join(
        orders, li["l_orderkey"] == orders["o_orderkey"]
    ).select(
        F.col("l_suppkey").cast("bigint").alias("src"),
        (F.col("o_custkey") + F.lit(_PR_DST_OFFSET))
        .cast("bigint")
        .alias("dst"),
    )
    pr = pagerank_int(
        edges, iters=_PR_ITERS, scale=_PR_SCALE, damping=_PR_DAMP
    )
    return pr.select(
        F.lit("pagerank").alias("variant"),
        F.col("node").cast("string").alias("grp"),
        F.col("rank").cast("bigint").alias("n"),
        (F.col("rank") / F.lit(_PR_SCALE)).alias("v1"),
        F.col("outdeg").cast("double").alias("v2"),
        F.lit(float(_PR_ITERS)).alias("v3"),
    )


def _pagerank_sql() -> str:
    num, den = _PR_DAMP
    parts = [
        f"""
WITH e AS (
  SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
         CAST(o_custkey + {_PR_DST_OFFSET} AS BIGINT) AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), nodes AS (
  SELECT DISTINCT node
  FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
), od AS (
  SELECT src AS node, count(*) AS outdeg FROM e GROUP BY src
), nn AS (SELECT count(*) AS n FROM nodes
), r0 AS (
  SELECT node, (SELECT {_PR_SCALE} // n FROM nn) AS rank FROM nodes
)"""
    ]
    prev = "r0"
    for k in range(1, _PR_ITERS + 1):
        parts.append(
            f""", r{k} AS (
  SELECT nd.node,
         (SELECT ({_PR_SCALE} * {den - num}) // ({den} * n) FROM nn)
         + COALESCE(s.c, 0) AS rank
  FROM nodes nd LEFT JOIN (
    SELECT e.dst AS node,
           SUM((r.rank * {num}) // ({den} * od.outdeg)) AS c
    FROM e JOIN {prev} r ON r.node = e.src JOIN od ON od.node = e.src
    GROUP BY e.dst
  ) s ON s.node = nd.node
)"""
        )
        prev = f"r{k}"
    parts.append(
        f"""
SELECT 'pagerank' AS variant, CAST(r.node AS VARCHAR) AS grp,
       CAST(r.rank AS BIGINT) AS n,
       CAST(r.rank AS DOUBLE) / {_PR_SCALE} AS v1,
       CAST(COALESCE(od.outdeg, 0) AS DOUBLE) AS v2,
       CAST({_PR_ITERS} AS DOUBLE) AS v3
FROM {prev} r LEFT JOIN od ON od.node = r.node
"""
    )
    return "".join(parts)


_TRI_TOP = 25
_TRI_CC_SCALE = 2_000_000  # folds the 2 of 2*tri/(deg*(deg-1)): v1 = 1e6*cc


def _urgent_part_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part co-occurrence graph of URGENT orders: two parts are
    adjacent when some '1-URGENT' order contains both (src < dst,
    duplicates collapsed downstream by the graph operators)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    urgent = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    lk = li.join(
        urgent, li["l_orderkey"] == urgent["o_orderkey"]
    ).select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
    return (
        lk.alias("a")
        .join(
            lk.alias("b"),
            (F.col("a.ok") == F.col("b.ok"))
            & (F.col("a.pk") < F.col("b.pk")),
        )
        .select(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
    )


_KCORE_K = 13
_KCORE_ITERS = 4  # fixpoint at sf0.01 is reached in round 4
_KCORE_TOP = 25


def q_kcore_stats(
    spark: SparkSession, sf_dir: str, edges: DataFrame | None = None
) -> DataFrame:
    """'kcore' variant: k-core peeling (operators/graph.py::k_core)
    over the URGENT part co-occurrence graph — the degree-mass
    robustness signal next to 'tri' and 'pagerank' (link farms have
    hollow cores). Runs EXACTLY {iters} peeling rounds so the DuckDB
    unrolled-CTE twin reproduces the state bit-for-bit (at sf0.01
    the fixpoint lands inside the unroll). grp = part id (top-{top}
    survivors by induced degree, id tie-break), n = induced degree,
    v1 = k, v2 = rounds, v3 = total survivors."""
    from ..operators.graph import k_core

    if edges is None:
        edges = _urgent_part_edges(spark, sf_dir)
    surv = stable_checkpoint(
        k_core(edges, _KCORE_K, iters=_KCORE_ITERS)
    )
    total = surv.agg(F.count(F.lit(1)).alias("__tot"))
    top = surv.orderBy(F.col("deg").desc(), F.col("node").asc()).limit(
        _KCORE_TOP
    )
    return top.crossJoin(F.broadcast(total)).select(
        F.lit("kcore").alias("variant"),
        F.col("node").cast("string").alias("grp"),
        F.col("deg").cast("bigint").alias("n"),
        F.lit(float(_KCORE_K)).alias("v1"),
        F.lit(float(_KCORE_ITERS)).alias("v2"),
        F.col("__tot").cast("double").alias("v3"),
    )


def _kcore_sql() -> str:
    head = f"""
WITH kli AS (
  SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey AND o_orderpriority = '1-URGENT'
), ke AS (
  SELECT DISTINCT a.pk AS a, b.pk AS b
  FROM kli a JOIN kli b ON a.ok = b.ok AND a.pk < b.pk
), ku0 AS (
  SELECT a AS u, b AS v FROM ke UNION ALL SELECT b, a FROM ke
)"""
    parts = [head]
    prev = "ku0"
    for r in range(1, _KCORE_ITERS + 1):
        parts.append(
            f""", kk{r} AS (
  SELECT u FROM (SELECT u, count(*) AS c FROM {prev} GROUP BY u)
  WHERE c >= {_KCORE_K}
), ku{r} AS (
  SELECT c.u, c.v FROM {prev} c
  JOIN kk{r} x ON x.u = c.u JOIN kk{r} y ON y.u = c.v
)"""
        )
        prev = f"ku{r}"
    parts.append(
        f""", kdeg AS (
  SELECT u AS node, count(*) AS deg FROM {prev} GROUP BY u
)
SELECT 'kcore' AS variant, CAST(node AS VARCHAR) AS grp,
       CAST(deg AS BIGINT) AS n,
       CAST({_KCORE_K} AS DOUBLE) AS v1,
       CAST({_KCORE_ITERS} AS DOUBLE) AS v2,
       CAST((SELECT count(*) FROM kdeg) AS DOUBLE) AS v3
FROM kdeg
ORDER BY deg DESC, node ASC LIMIT {_KCORE_TOP}
"""
    )
    return "".join(parts)


def q_triangle_stats(
    spark: SparkSession, sf_dir: str, edges: DataFrame | None = None
) -> DataFrame:
    """'tri' variant: exact degree-oriented triangle counting
    (operators/graph.py::triangle_listing) over the part
    co-occurrence graph of URGENT orders — two parts are adjacent
    when some '1-URGENT' order contains both. Triangle density is
    the organic-vs-link-farm curation signal on a host graph and a
    motif feature for graph-side training data; the orientation
    bounds wedge volume at O(m^1.5) however skewed the degrees.
    All-integer outputs (counts, degrees, floor-scaled clustering
    coefficient), so the DuckDB twin hash-matches exactly.
    grp = part id (top-{top} by triangle count, id tie-break),
    n = per-node triangles, v1 = floor(1e6 * 2*tri/(deg*(deg-1))),
    v2 = degree, v3 = corpus total triangles (per-node sum / 3)."""
    from ..operators.graph import triangle_counts

    if edges is None:
        edges = _urgent_part_edges(spark, sf_dir)
    # node-sized result consumed twice (top-K + global total):
    # checkpoint so the wedge-close joins run once
    counts = stable_checkpoint(triangle_counts(edges))
    # one global scalar (total triangles), distributed to the top-K
    # rows via a broadcast 1-row cross join — never a global window
    total = counts.agg(F.expr("sum(tri) div 3").alias("__tot"))
    top = counts.orderBy(F.col("tri").desc(), F.col("node").asc()).limit(
        _TRI_TOP
    )
    return top.crossJoin(F.broadcast(total)).select(
        F.lit("tri").alias("variant"),
        F.col("node").cast("string").alias("grp"),
        F.col("tri").cast("bigint").alias("n"),
        F.when(
            F.col("deg") >= 2,
            F.expr(f"({_TRI_CC_SCALE} * tri) div (deg * (deg - 1))"),
        )
        .otherwise(F.lit(0))
        .cast("double")
        .alias("v1"),
        F.col("deg").cast("double").alias("v2"),
        F.col("__tot").cast("double").alias("v3"),
    )


_TRI_SQL = f"""
WITH tli AS (
  SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey AND o_orderpriority = '1-URGENT'
), te AS (
  SELECT DISTINCT a.pk AS a, b.pk AS b
  FROM tli a JOIN tli b ON a.ok = b.ok AND a.pk < b.pk
), tdeg AS (
  SELECT node, count(*) AS deg
  FROM (SELECT a AS node FROM te UNION ALL SELECT b FROM te) GROUP BY node
), tor AS (
  SELECT CASE WHEN lf THEN a ELSE b END AS s,
         CASE WHEN lf THEN b ELSE a END AS d,
         CASE WHEN lf THEN db ELSE da END AS dd
  FROM (SELECT te.a, te.b, da.deg AS da, db.deg AS db,
               (da.deg < db.deg OR (da.deg = db.deg AND te.a < te.b)) AS lf
        FROM te JOIN tdeg da ON da.node = te.a
                JOIN tdeg db ON db.node = te.b)
), ttri AS (
  SELECT o1.s AS u, o1.d AS x, o2.d AS y
  FROM tor o1 JOIN tor o2 ON o1.s = o2.s
       AND (o1.dd < o2.dd OR (o1.dd = o2.dd AND o1.d < o2.d))
  JOIN tor oc ON oc.s = o1.d AND oc.d = o2.d
), tpn AS (
  SELECT node, deg, coalesce(tri, 0) AS tri
  FROM tdeg LEFT JOIN (
    SELECT node, count(*) AS tri FROM (
      SELECT u AS node FROM ttri UNION ALL SELECT x FROM ttri
      UNION ALL SELECT y FROM ttri) GROUP BY node) tc USING (node)
)
SELECT 'tri' AS variant, CAST(node AS VARCHAR) AS grp,
       CAST(tri AS BIGINT) AS n,
       CAST(CASE WHEN deg >= 2
                 THEN ({_TRI_CC_SCALE} * tri) // (deg * (deg - 1))
                 ELSE 0 END AS DOUBLE) AS v1,
       CAST(deg AS DOUBLE) AS v2,
       CAST((SELECT sum(tri) // 3 FROM tpn) AS DOUBLE) AS v3
FROM tpn
ORDER BY tri DESC, node ASC LIMIT {_TRI_TOP}
"""


_KM_K = 4
_KM_ITERS = 3
_KM_DIM = 64  # embeddings fixture dimension (schema-pinned)


def q_kmeans_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'kmeans' variant: quantized Lloyd k-means
    (operators/kmeans.py) over the embeddings table — {_KM_ITERS}
    assignment rounds in pure integer math, so the DuckDB unrolled
    oracle reproduces the final clustering bit-for-bit (counts,
    integer centroid components, member-id sums). grp = cluster id;
    n = members; v1/v2 = de-offset integer means of the first two
    components; v3 = Σ vec_id."""
    from ..operators.kmeans import OFFSET, kmeans_quantized, quantize_vectors

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    assigned = kmeans_quantized(
        quantize_vectors(emb), "vec_id", "qv", k=_KM_K, iters=_KM_ITERS
    )
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.element_at("qv", 1)).alias("__s0"),
            F.sum(F.element_at("qv", 2)).alias("__s1"),
            F.sum("vec_id").alias("__ids"),
        )
        .select(
            F.lit("kmeans").alias("variant"),
            F.col("cluster").cast("string").alias("grp"),
            F.col("__n").cast("bigint").alias("n"),
            (F.expr("__s0 div __n") - F.lit(OFFSET)).cast("double").alias("v1"),
            (F.expr("__s1 div __n") - F.lit(OFFSET)).cast("double").alias("v2"),
            F.col("__ids").cast("double").alias("v3"),
        )
    )


def _kmeans_sql() -> str:
    from ..operators.kmeans import OFFSET, SCALE

    parts = [
        f"""
WITH q AS (
  SELECT vec_id, list_transform(embedding, x ->
    CAST(floor(CAST(x AS DOUBLE) * {SCALE}) AS BIGINT) + {OFFSET}) AS qv
  FROM embeddings
), c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, qv
  FROM q ORDER BY vec_id LIMIT {_KM_K}
)"""
    ]
    for j in range(_KM_ITERS):
        prev_c = f"c{j}"
        parts.append(
            f""", a{j} AS (
  SELECT v.vec_id, v.qv, (
     SELECT c.cid FROM {prev_c} c
     ORDER BY list_sum(list_transform(list_zip(v.qv, c.qv),
              p -> (p[1] - p[2]) * (p[1] - p[2]))), c.cid
     LIMIT 1) AS cluster
  FROM q v
)"""
        )
        if j < _KM_ITERS - 1:
            parts.append(
                f""", c{j + 1} AS (
  SELECT cid, list(m ORDER BY i) AS qv FROM (
    SELECT a.cluster AS cid, t.i, SUM(a.qv[t.i]) // COUNT(*) AS m
    FROM a{j} a, range(1, {_KM_DIM + 1}) t(i)
    GROUP BY a.cluster, t.i
  ) GROUP BY cid
  UNION ALL
  SELECT c.cid, c.qv FROM {prev_c} c
  WHERE c.cid NOT IN (SELECT DISTINCT cluster FROM a{j})
)"""
            )
    parts.append(
        f"""
SELECT 'kmeans' AS variant, CAST(cluster AS VARCHAR) AS grp,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(qv[1]) // COUNT(*) - {OFFSET} AS DOUBLE) AS v1,
       CAST(SUM(qv[2]) // COUNT(*) - {OFFSET} AS DOUBLE) AS v2,
       CAST(SUM(vec_id) AS DOUBLE) AS v3
FROM a{_KM_ITERS - 1} GROUP BY cluster
"""
    )
    return "".join(parts)


_LINE_MIN_DOCS = 2


def q_line_stats(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """'line' variant: line-level corpus dedup
    (operators/line_dedup.py — RefinedWeb §3.3 / CCNet boilerplate
    stripping).  The corpus has no line structure, so — the
    text_metrics pattern — a deterministic lined page is synthesized
    from (doc_id, ws tokens): a "subscribe" header cycling on
    doc_id % 3, content lines of doc_id % 5 + 4 words, a per-source
    "copyright" footer.  Both engines build the identical page; the
    REAL rule runs over it: any normalized line appearing in ≥
    {min_docs} distinct documents is stripped from every document.
    grp packs doc_id with the md5 prefix of the cleaned text, so the
    hash check pins the exact reassembled document, not just counts.
    """
    from ..operators.line_dedup import line_dedup

    if docs is None:
        docs = spread(
            load_table(spark, sf_dir, "documents"), "doc_id"
        )
    ws = F.split(F.trim(F.col("text")), " ")
    k = F.col("doc_id") % 5 + 4
    n_content = F.floor((F.size(ws) + k - 1) / k).cast("int")
    content = F.transform(
        F.sequence(F.lit(0), n_content - 1),
        lambda i: F.array_join(F.slice(ws, i * k + 1, k), " "),
    )
    header = F.concat(
        F.lit("subscribe to the newsletter edition "),
        (F.col("doc_id") % 3).cast("string"),
    )
    footer = F.concat(F.lit("copyright "), F.col("source"))
    lines = F.concat(F.array(header), content, F.array(footer))
    out = line_dedup(docs, lines, min_docs=_LINE_MIN_DOCS)
    return out.select(
        F.lit("line").alias("variant"),
        F.concat(
            F.col("doc_id").cast("string"),
            F.lit(":"),
            F.substring(F.md5("cleaned_text"), 1, 16),
        ).alias("grp"),
        F.col("n_lines").cast("bigint").alias("n"),
        F.col("n_removed").cast("double").alias("v1"),
        F.col("n_kept").cast("double").alias("v2"),
        (F.col("n_removed") / F.col("n_lines")).cast("double").alias("v3"),
    )


_LINE_SQL = f"""
WITH d AS (
  SELECT doc_id, source, string_split(trim(text), ' ') AS ws,
         doc_id % 5 + 4 AS k
  FROM documents
), pages AS (
  SELECT doc_id,
    list_concat(
      list_concat(
        ['subscribe to the newsletter edition ' || CAST(doc_id % 3 AS VARCHAR)],
        list_transform(range(0, (len(ws) + k - 1) // k),
          i -> array_to_string(list_slice(ws, i * k + 1, (i + 1) * k), ' '))),
      ['copyright ' || source]) AS lines
  FROM d
), e AS (
  SELECT doc_id,
         unnest(range(1, len(lines) + 1)) AS line_idx,
         unnest(lines) AS line
  FROM pages
), ne AS (
  SELECT doc_id, line_idx, line,
         regexp_replace(lower(trim(line)), '\\s+', ' ', 'g') AS nline
  FROM e
), boiler AS (
  SELECT nline FROM ne GROUP BY nline
  HAVING count(DISTINCT doc_id) >= {_LINE_MIN_DOCS}
), flagged AS (
  SELECT ne.doc_id, ne.line_idx, ne.line,
         (b.nline IS NOT NULL) AS removed
  FROM ne LEFT JOIN boiler b USING (nline)
), per_doc AS (
  SELECT doc_id,
         count(*) AS n_lines,
         count(CASE WHEN removed THEN 1 END) AS n_removed,
         coalesce(string_agg(CASE WHEN NOT removed THEN line END,
                             chr(10) ORDER BY line_idx), '') AS cleaned
  FROM flagged GROUP BY doc_id
)
SELECT 'line' AS variant,
       CAST(doc_id AS VARCHAR) || ':' || substring(md5(cleaned), 1, 16) AS grp,
       CAST(n_lines AS BIGINT) AS n,
       CAST(n_removed AS DOUBLE) AS v1,
       CAST(n_lines - n_removed AS DOUBLE) AS v2,
       CAST(n_removed AS DOUBLE) / n_lines AS v3
FROM per_doc
"""


def q_dist_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles + fixed-width histogram + stratified-sample
    audit + sequence-packing audit + token-budget audit +
    substring-span dedup audit in one union-tagged entry (driver cap:
    the correctness gate records at most 50 registry entries).
    variant 'pct': grp = order priority, v1/v2 = exact median/p90.
    variant 'hist': grp = bucket id, v1/v2 = lo/hi, v3 = bucket
    start. variant 'sample': see q_sample_stats. variant 'pack': see
    q_pack_stats. variant 'budget': see q_budget_stats. variant
    'span': see q_span_stats. variant 'lm': see q_lm_stats. variant
    'dsir': see q_dsir_stats. variant 'mix': see q_mix_stats.
    variant 'hh': see q_hh_stats. variant 'warc': see q_warc_stats.
    variant 'pagerank': see q_pagerank_stats. variant 'kmeans': see
    q_kmeans_stats. variant 'line': see q_line_stats. variant
    'tri': see q_triangle_stats. variant 'kcore': see q_kcore_stats.

    Shared-subframe discipline (VERDICT r5): the 16-way union used to
    re-scan and re-derive documents once per variant and re-run the
    urgent-basket pair join twice (tri + kcore) — at sf1 the merged
    entry cost ~2x the sum of its individually-timed variants. The
    documents frame and the co-occurrence edge list are built ONCE
    here and persisted (MEMORY_AND_DISK; both are small — docs is the
    raw table, edges is key-pruned) for every variant to share. No
    unpersist: the returned frame is lazy, the driver collects after
    return; the cache is bounded and LRU-evictable."""
    from pyspark import StorageLevel

    shared_docs = spread(
        load_table(spark, sf_dir, "documents"), "doc_id"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    shared_edges = _urgent_part_edges(spark, sf_dir).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    pct = q_percentiles(spark, sf_dir).select(
        F.lit("pct").alias("variant"),
        F.col("o_orderpriority").alias("grp"),
        F.col("n").cast("bigint").alias("n"),
        F.col("median_price").cast("double").alias("v1"),
        F.col("p90_price").cast("double").alias("v2"),
        F.lit(None).cast("double").alias("v3"),
    )
    hist = q_histogram(spark, sf_dir).select(
        F.lit("hist").alias("variant"),
        F.col("bucket").cast("string").alias("grp"),
        F.col("n").cast("bigint").alias("n"),
        F.col("lo").cast("double").alias("v1"),
        F.col("hi").cast("double").alias("v2"),
        F.col("bucket_start").cast("double").alias("v3"),
    )
    return (
        pct.unionByName(hist)
        .unionByName(q_sample_stats(spark, sf_dir, docs=shared_docs))
        .unionByName(q_pack_stats(spark, sf_dir, docs=shared_docs))
        .unionByName(q_budget_stats(spark, sf_dir, docs=shared_docs))
        .unionByName(q_span_stats(spark, sf_dir, docs=shared_docs))
        .unionByName(q_lm_stats(spark, sf_dir, docs=shared_docs))
        .unionByName(q_dsir_stats(spark, sf_dir, docs=shared_docs))
        .unionByName(q_mix_stats(spark, sf_dir, docs=shared_docs))
        .unionByName(q_hh_stats(spark, sf_dir, docs=shared_docs))
        .unionByName(q_warc_stats(spark, sf_dir, docs=shared_docs))
        .unionByName(q_pagerank_stats(spark, sf_dir))
        .unionByName(q_kmeans_stats(spark, sf_dir))
        .unionByName(q_line_stats(spark, sf_dir, docs=shared_docs))
        .unionByName(q_triangle_stats(spark, sf_dir, edges=shared_edges))
        .unionByName(q_kcore_stats(spark, sf_dir, edges=shared_edges))
    )


def _dist_stats_sql() -> str:
    from ..functions.sampling import rate_cutoff_hex

    cutoff = " ".join(
        f"WHEN {k} THEN '{rate_cutoff_hex(r)}'"
        for k, r in _SAMPLE_RATES.items()
    )
    rate = " ".join(
        f"WHEN {k} THEN CAST({r} AS DOUBLE)" for k, r in _SAMPLE_RATES.items()
    )
    return f"""
SELECT 'pct' AS variant, o_orderpriority AS grp, CAST(n AS BIGINT) AS n,
       CAST(median_price AS DOUBLE) AS v1, CAST(p90_price AS DOUBLE) AS v2,
       CAST(NULL AS DOUBLE) AS v3
FROM ({_PERCENTILES_SQL})
UNION ALL
SELECT 'hist' AS variant, CAST(bucket AS VARCHAR) AS grp, CAST(n AS BIGINT) AS n,
       CAST(lo AS DOUBLE) AS v1, CAST(hi AS DOUBLE) AS v2,
       CAST(bucket_start AS DOUBLE) AS v3
FROM ({_HISTOGRAM_SQL})
UNION ALL
SELECT 'sample' AS variant, CAST(stratum AS VARCHAR) AS grp,
       CAST(n_kept AS BIGINT) AS n,
       CASE stratum {rate} END AS v1,
       CAST(n_total AS DOUBLE) AS v2,
       CAST(n_kept AS DOUBLE) / n_total AS v3
FROM (
  SELECT stratum,
         count(CASE WHEN h < (CASE stratum {cutoff} END) THEN 1 END) AS n_kept,
         count(*) AS n_total
  FROM (
    SELECT stratum,
           substring(md5(CAST(stratum AS VARCHAR) || '#'
                         || CAST(doc_id AS VARCHAR)), 1, 8) AS h
    FROM (
      SELECT CAST(CAST(regexp_extract(source, '(\\d+)', 1) AS INTEGER) % 4
                  AS INTEGER) AS stratum, doc_id
      FROM documents
    )
  ) GROUP BY stratum
)
UNION ALL
SELECT 'pack' AS variant, CAST(seq_id AS VARCHAR) AS grp,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(n_tokens) AS DOUBLE) AS v1,
       CAST(count(CASE WHEN spans THEN 1 END) AS DOUBLE) AS v2,
       CAST(sum(n_tokens) AS DOUBLE) / {_PACK_SEQ_LEN} AS v3
FROM (
  SELECT n_tokens,
         (cum - n_tokens) // {_PACK_SEQ_LEN} AS seq_id,
         ((cum - n_tokens) // {_PACK_SEQ_LEN})
           != (CASE WHEN n_tokens > 0 THEN (cum - 1)
                    ELSE (cum - n_tokens) END // {_PACK_SEQ_LEN}) AS spans
  FROM (
    SELECT n_tokens,
           SUM(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM (
      SELECT doc_id,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
      FROM documents
    )
  )
) GROUP BY seq_id
UNION ALL
SELECT 'budget' AS variant, source AS grp,
       CAST(count(CASE WHEN keep THEN 1 END) AS BIGINT) AS n,
       CAST(sum(CASE WHEN keep THEN n_tokens END) AS DOUBLE) AS v1,
       CAST(count(*) AS DOUBLE) AS v2,
       CAST(count(CASE WHEN keep THEN 1 END) AS DOUBLE) / count(*) AS v3
FROM (
  SELECT source, n_tokens,
         (SUM(n_tokens) OVER (ORDER BY q DESC, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
           * {_BUDGET_FRAC[1]}
           <= (SUM(n_tokens) OVER ()) * {_BUDGET_FRAC[0]} AS keep
  FROM (
    SELECT doc_id, source,
           least(CAST(n_chars AS DOUBLE) / 400, 1.0) * 0.5
           + CAST(len(list_distinct(string_split(trim(text), ' '))) AS DOUBLE)
             / CAST(len(string_split(trim(text), ' ')) AS DOUBLE) * 0.5 AS q,
           CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
    FROM documents
  )
)
GROUP BY source
UNION ALL
SELECT * FROM ({{span_sql}})
UNION ALL
SELECT * FROM ({{lm_sql}})
UNION ALL
SELECT * FROM ({{dsir_sql}})
UNION ALL
SELECT * FROM ({{mix_sql}})
UNION ALL
SELECT * FROM ({{hh_sql}})
UNION ALL
SELECT * FROM ({{warc_sql}})
UNION ALL
SELECT * FROM ({{pagerank_sql}})
UNION ALL
SELECT * FROM ({{kmeans_sql}})
UNION ALL
SELECT * FROM ({{line_sql}})
UNION ALL
SELECT * FROM ({{tri_sql}})
UNION ALL
SELECT * FROM ({{kcore_sql}})
"""


# k-gram spans: position i covers tokens [i, i+k-1]; the window
# running-max end is the same interval-union recurrence as
# operators/span_dedup.py — all-integer, hash-identical. The oracle
# groups on the RAW gram text (Spark shuffles xxhash64 keys — an
# internal choice the rollup is insensitive to).
_SPAN_SQL = f"""
WITH t AS (
  SELECT doc_id, source, string_split(trim(text), ' ') AS t FROM documents
), g AS (
  SELECT doc_id, source, CAST(len(t) AS BIGINT) AS n_tokens,
         list_transform(range(1, len(t) - {_SPAN_K - 2}),
           i -> {{'pos': i,
                  'gh': array_to_string(t[i:i+{_SPAN_K - 1}], ' ')}}) AS gs
  FROM t
), p AS (
  SELECT doc_id, struct_extract(u, 'pos') AS pos,
         struct_extract(u, 'gh') AS gh
  FROM (SELECT doc_id, unnest(gs) AS u FROM g)
), dup AS (
  SELECT gh FROM p GROUP BY gh HAVING count(DISTINCT doc_id) >= 2
), iv AS (
  SELECT doc_id,
         greatest(0, pos + {_SPAN_K - 1}
           - greatest(coalesce(max(pos + {_SPAN_K - 1}) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0),
             pos - 1)) AS c
  FROM p JOIN dup USING (gh)
), per_doc AS (
  SELECT doc_id, count(*) AS n_dup_grams, sum(c) AS covered
  FROM iv GROUP BY doc_id
)
SELECT 'span' AS variant, source AS grp,
  CAST(count(CASE WHEN coalesce(n_dup_grams, 0) > 0 THEN 1 END) AS BIGINT) AS n,
  CAST(sum(coalesce(n_dup_grams, 0)) AS DOUBLE) AS v1,
  CAST(sum(coalesce(covered, 0)) AS DOUBLE) AS v2,
  CAST(sum(coalesce(covered, 0)) AS DOUBLE) / CAST(sum(n_tokens) AS DOUBLE) AS v3
FROM g LEFT JOIN per_doc USING (doc_id)
GROUP BY source
"""


# bigram LM rarity: model = counts over the even-doc_id half; the odd
# half left-joins it — identical add-one plumbing, all-integer rollup
_LM_SQL = """
WITH tk AS (
  SELECT doc_id, source,
         string_split_regex(lower(trim(text)), '\\s+') AS t
  FROM documents
), bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)),
           i -> {'w1': t[i], 'w2': t[i + 1]})) AS g
  FROM tk
), ref_uni AS (
  SELECT w1, count(*) AS u_cnt FROM (
    SELECT unnest(t) AS w1 FROM tk WHERE doc_id % 2 = 0
  ) GROUP BY w1
), ref_bi AS (
  SELECT struct_extract(g, 'w1') AS w1, struct_extract(g, 'w2') AS w2,
         count(*) AS b_cnt
  FROM bg WHERE doc_id % 2 = 0 GROUP BY 1, 2
), pairs AS (
  SELECT doc_id, struct_extract(g, 'w1') AS w1,
         struct_extract(g, 'w2') AS w2
  FROM bg WHERE doc_id % 2 = 1
), per_doc AS (
  SELECT doc_id, count(*) AS n_bigrams,
         count(CASE WHEN coalesce(b_cnt, 0) = 0 THEN 1 END) AS n_unseen,
         count(CASE WHEN coalesce(b_cnt, 0) <= 1 THEN 1 END) AS n_rare
  FROM pairs
  LEFT JOIN ref_bi USING (w1, w2)
  GROUP BY doc_id
)
SELECT 'lm' AS variant, source AS grp,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(coalesce(n_bigrams, 0)) AS DOUBLE) AS v1,
  CAST(sum(coalesce(n_unseen, 0)) AS DOUBLE) AS v2,
  CAST(sum(coalesce(n_rare, 0)) AS DOUBLE)
    / CAST(sum(coalesce(n_bigrams, 0)) AS DOUBLE) AS v3
FROM (SELECT doc_id, source FROM tk WHERE doc_id % 2 = 1) d
LEFT JOIN per_doc USING (doc_id)
GROUP BY source
"""


# DSIR importance resampling: the oracle groups on the RAW word text
# (Spark joins on xxhash64 keys — an internal choice the bigint score
# is insensitive to); the quantized ratio and budget boundary are the
# identical 64-bit integer expressions on both sides.
_DSIR_SQL = """
WITH tk AS (
  SELECT doc_id, source,
         CAST(CAST(regexp_extract(source, '(\\d+)', 1) AS INTEGER) % 4
              AS INTEGER) = 0 AS is_t,
         string_split_regex(lower(trim(text)), '\\s+') AS t
  FROM documents
), w AS (
  SELECT doc_id, is_t, unnest(t) AS word FROM tk
), ratio AS (
  SELECT word,
         ((count(CASE WHEN is_t THEN 1 END) + 1) * 1000000)
           // (count(CASE WHEN NOT is_t THEN 1 END) + 1) AS ratio
  FROM w GROUP BY word
), per_doc AS (
  SELECT doc_id, sum(c * ratio) AS importance FROM (
    SELECT doc_id, word, count(*) AS c
    FROM w WHERE NOT is_t GROUP BY doc_id, word
  ) JOIN ratio USING (word) GROUP BY doc_id
), pool AS (
  SELECT d.doc_id, d.source, CAST(len(t) AS BIGINT) AS n_tokens,
         coalesce(importance, 0) AS importance
  FROM tk d LEFT JOIN per_doc USING (doc_id) WHERE NOT is_t
), sel AS (
  SELECT source, importance,
         (SUM(n_tokens) OVER (ORDER BY importance DESC, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 2
           <= (SUM(n_tokens) OVER ()) * 1 AS keep
  FROM pool
)
SELECT 'dsir' AS variant, source AS grp,
  CAST(count(CASE WHEN keep THEN 1 END) AS BIGINT) AS n,
  CAST(coalesce(sum(CASE WHEN keep THEN importance END), 0) AS DOUBLE) AS v1,
  CAST(count(*) AS DOUBLE) AS v2,
  CAST(count(CASE WHEN keep THEN 1 END) AS DOUBLE) / count(*) AS v3
FROM sel GROUP BY source
"""


# domain mixture: the oracle's per-domain window cumsum mirrors the
# grouped distributed prefix-sum; the CASE weight tables are generated
# from the same _MIX_WEIGHTS dict so the two sides cannot drift
def _mix_sql() -> str:
    num = " ".join(
        f"WHEN {g} THEN {w[0]}" for g, w in _MIX_WEIGHTS.items()
    )
    den = " ".join(
        f"WHEN {g} THEN {w[1]}" for g, w in _MIX_WEIGHTS.items()
    )
    return f"""
WITH base AS (
  SELECT doc_id,
         CAST(CAST(regexp_extract(source, '(\\d+)', 1) AS INTEGER) % 4
              AS INTEGER) AS dom,
         least(CAST(n_chars AS DOUBLE) / 400, 1.0) * 0.5
         + CAST(len(list_distinct(string_split(trim(text), ' '))) AS DOUBLE)
           / CAST(len(string_split(trim(text), ' ')) AS DOUBLE) * 0.5 AS q,
         CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
  FROM documents
), sel AS (
  SELECT dom, n_tokens,
         (CASE dom {num} ELSE 0 END) > 0
           AND (SUM(n_tokens) OVER (PARTITION BY dom ORDER BY q DESC, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
           * (CASE dom {den} ELSE 1 END)
           <= (SUM(n_tokens) OVER ()) * (CASE dom {num} ELSE 0 END) AS keep
  FROM base
)
SELECT 'mix' AS variant, CAST(dom AS VARCHAR) AS grp,
  CAST(count(CASE WHEN keep THEN 1 END) AS BIGINT) AS n,
  CAST(coalesce(sum(CASE WHEN keep THEN n_tokens END), 0) AS DOUBLE) AS v1,
  CAST(sum(n_tokens) AS DOUBLE) AS v2,
  CAST(coalesce(sum(CASE WHEN keep THEN n_tokens END), 0) AS DOUBLE)
    / (SELECT CAST(sum(n_tokens) AS DOUBLE) FROM base) AS v3
FROM sel GROUP BY dom
"""


_DIST_STATS_SQL = (
    _dist_stats_sql()
    .replace("{span_sql}", _SPAN_SQL)
    .replace("{lm_sql}", _LM_SQL)
    .replace("{dsir_sql}", _DSIR_SQL)
    .replace("{mix_sql}", _mix_sql())
    .replace("{hh_sql}", _HH_SQL)
    .replace("{warc_sql}", _WARC_SQL)
    .replace("{pagerank_sql}", _pagerank_sql())
    .replace("{kmeans_sql}", _kmeans_sql())
    .replace("{line_sql}", _LINE_SQL)
    .replace("{tri_sql}", _TRI_SQL)
    .replace("{kcore_sql}", _kcore_sql())
)


def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation (operators/salting.py) on the
    3-value returnflag key — the aggregation-skew mitigation AQE does
    not re-plan. The oracle is the PLAIN one-phase GROUP BY: salting
    must be value-identical under any partitioning, which is exactly
    what the decimal sum guarantees (order-independent re-merge)."""
    from ..operators.salting import salted_agg

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("decimal(12,2)").alias("qty"),
        "l_extendedprice",
    )
    out = salted_agg(
        li,
        ["l_returnflag"],
        [
            ("sum_qty", "sum", "qty"),
            ("n", "count", "l_extendedprice"),
            ("min_price", "min", "l_extendedprice"),
            ("max_price", "max", "l_extendedprice"),
        ],
    )
    return out.select(
        "l_returnflag",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("n").cast("bigint").alias("n"),
        "min_price",
        "max_price",
    )


_FANOUT_TOP = 10


def q_fanout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'fanout' variant: the pre-flight join diagnostic
    (operators/skew.py) on events x orders over the user key — exact
    per-key output cardinalities of the equi-join WITHOUT running it
    (two count aggregates + one key-distinct-sized join). grp = the
    top-{top} keys by fanout (key tie-break), n = per-key fanout,
    v1/v2 = side counts, v3 = the join's total output cardinality."""
    from ..operators.skew import join_fanout_profile

    prof = stable_checkpoint(
        join_fanout_profile(
            load_table(spark, sf_dir, "events"),
            load_table(spark, sf_dir, "orders"),
            "user_id",
            "o_custkey",
        )
    )
    total = prof.agg(F.sum("fanout").alias("__tot"))
    top = prof.orderBy(F.col("fanout").desc(), F.col("key").asc()).limit(
        _FANOUT_TOP
    )
    return top.crossJoin(F.broadcast(total)).select(
        F.lit("fanout").alias("variant"),
        F.col("key").cast("string").alias("grp"),
        F.col("fanout").cast("bigint").alias("n"),
        F.col("n_left").cast("double").alias("v1"),
        F.col("n_right").cast("double").alias("v2"),
        F.col("__tot").cast("double").alias("v3"),
    )


def q_salted_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted aggregation + the join-fanout skew profile in
    one union-tagged entry (driver cap). variant 'salted':
    grp = returnflag, n = count, v1 = decimal-exact quantity sum,
    v2/v3 = min/max price. variant 'fanout': see q_fanout_stats."""
    salted = q_salted_agg(spark, sf_dir).select(
        F.lit("salted").alias("variant"),
        F.col("l_returnflag").alias("grp"),
        F.col("n").cast("bigint").alias("n"),
        F.col("sum_qty").cast("double").alias("v1"),
        F.col("min_price").cast("double").alias("v2"),
        F.col("max_price").cast("double").alias("v3"),
    )
    return salted.unionByName(q_fanout_stats(spark, sf_dir))


_SALTED_SQL = """
SELECT l_returnflag,
  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
  count(l_extendedprice) AS n,
  min(l_extendedprice) AS min_price,
  max(l_extendedprice) AS max_price
FROM lineitem GROUP BY l_returnflag
"""

_SALTED_MERGED_SQL = f"""
SELECT 'salted' AS variant, l_returnflag AS grp, CAST(n AS BIGINT) AS n,
       CAST(sum_qty AS DOUBLE) AS v1, CAST(min_price AS DOUBLE) AS v2,
       CAST(max_price AS DOUBLE) AS v3
FROM ({_SALTED_SQL})
UNION ALL
SELECT * FROM (
SELECT 'fanout' AS variant, CAST(key AS VARCHAR) AS grp,
       CAST(fanout AS BIGINT) AS n, CAST(n_left AS DOUBLE) AS v1,
       CAST(n_right AS DOUBLE) AS v2,
       CAST((SELECT sum(fanout) FROM (
         SELECT cl.n_left * cr.n_right AS fanout
         FROM (SELECT user_id AS key, count(*) AS n_left FROM events
               WHERE user_id IS NOT NULL GROUP BY 1) cl
         JOIN (SELECT o_custkey AS key, count(*) AS n_right FROM orders
               WHERE o_custkey IS NOT NULL GROUP BY 1) cr USING (key)
       )) AS DOUBLE) AS v3
FROM (
  SELECT cl.key, cl.n_left, cr.n_right, cl.n_left * cr.n_right AS fanout
  FROM (SELECT user_id AS key, count(*) AS n_left FROM events
        WHERE user_id IS NOT NULL GROUP BY 1) cl
  JOIN (SELECT o_custkey AS key, count(*) AS n_right FROM orders
        WHERE o_custkey IS NOT NULL GROUP BY 1) cr USING (key)
)
ORDER BY n DESC, grp ASC LIMIT {_FANOUT_TOP}
)
"""


QUERIES["dist_stats"] = Q(
    q_dist_stats,
    _DIST_STATS_SQL,
    variants={
        "pack": q_pack_stats,
        "budget": q_budget_stats,
        "span": q_span_stats,
        "lm": q_lm_stats,
        "dsir": q_dsir_stats,
        "mix": q_mix_stats,
        "hh": q_hh_stats,
        "warc": q_warc_stats,
        "pagerank": q_pagerank_stats,
        "kmeans": q_kmeans_stats,
        "line": q_line_stats,
        "tri": q_triangle_stats,
        "kcore": q_kcore_stats,
    },
)
_KANON_SQL = f"""
WITH kc AS (
  SELECT CAST(c_nationkey AS BIGINT) AS q0, c_mktsegment AS q1,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS q2,
         c_custkey % 7 AS sens
  FROM customer
), kcls AS (
  SELECT q0, q1, q2, count(*) AS class_size,
         count(DISTINCT sens) AS n_sensitive
  FROM kc GROUP BY 1, 2, 3
)
SELECT 'kanon' AS variant,
       CAST(q0 AS VARCHAR) || '|' || q1 || '|' || CAST(q2 AS VARCHAR) AS grp,
       CAST(class_size AS BIGINT) AS n,
       CAST({_KANON_K} AS DOUBLE) AS v1,
       CAST(n_sensitive AS DOUBLE) AS v2,
       CAST(CASE WHEN class_size < {_KANON_K}
                   OR n_sensitive < {_KANON_L}
                 THEN 1 ELSE 0 END AS DOUBLE) AS v3,
       CAST(NULL AS DOUBLE) AS v4
FROM kcls
"""

def q_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'teloo' variant: leakage-free leave-one-out target encoding
    (operators/encoding.py) over orders — category o_orderpriority,
    target 'order is fulfilled' (o_orderstatus = 'F'). The audit rows
    are per-category: n rows, v1 = floor-mean encoded ppm, v2/v3 =
    min/max encoded ppm, v4 = distinct encoding count — all exact
    integer math, so the encodings themselves are hash-verified
    through the aggregate (any per-row drift moves min/max/distinct)."""
    from ..operators.encoding import target_encode_loo

    orders = load_table(spark, sf_dir, "orders")
    enc = target_encode_loo(
        orders,
        category_col="o_orderpriority",
        target=(F.col("o_orderstatus") == "F").cast("int"),
    )
    return enc.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("sum(te_ppm) div count(*)").alias("__mean"),
        F.min("te_ppm").alias("__min"),
        F.max("te_ppm").alias("__max"),
        F.countDistinct("te_ppm").alias("__nd"),
    ).select(
        F.lit("teloo").alias("variant"),
        F.col("o_orderpriority").alias("grp"),
        F.col("n").cast("bigint").alias("n"),
        F.col("__mean").cast("double").alias("v1"),
        F.col("__min").cast("double").alias("v2"),
        F.col("__max").cast("double").alias("v3"),
        F.col("__nd").cast("double").alias("v4"),
    )


_TELOO_SQL = """
WITH t AS (
  SELECT o_orderpriority,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
), s AS (
  SELECT o_orderpriority, SUM(y) AS gs, COUNT(*) AS gn
  FROM t GROUP BY o_orderpriority
), g AS (
  SELECT SUM(y) AS ts, COUNT(*) AS tn FROM t
), e AS (
  SELECT t.o_orderpriority,
         CASE WHEN s.gn > 1
              THEN ((s.gs - t.y) * 1000000) // (s.gn - 1)
              ELSE ((g.ts - t.y) * 1000000) // (g.tn - 1) END AS te
  FROM t JOIN s USING (o_orderpriority) CROSS JOIN g
)
SELECT 'teloo' AS variant, o_orderpriority AS grp,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(te) // COUNT(*) AS DOUBLE) AS v1,
       CAST(MIN(te) AS DOUBLE) AS v2,
       CAST(MAX(te) AS DOUBLE) AS v3,
       CAST(COUNT(DISTINCT te) AS DOUBLE) AS v4
FROM e GROUP BY o_orderpriority
"""


def q_quantile_guarantee(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'qv' variant — the GK sketch guarantee as an ORACLE-PAIRED
    verdict (VERDICT r8 Next #4): per (o_orderpriority, quantile),
    emit only engine-portable values — n, the allowed rank window
    (pure integer math from n), and the verdict that Spark's
    percentile_approx estimate's feasible rank falls inside it. The
    estimate itself never appears in the output, so DuckDB's twin
    computes the identical rows with the verdict as the literal 1 the
    deterministic Greenwald-Khanna bound promises — if Spark's sketch
    ever violated its guarantee, the verdict flips to 0 and the
    value-hash catches it. grp = priority|p50 / priority|p90; v1/v2 =
    allowed rank window lo/hi, v3 = verdict, v4 = NULL."""
    orders = load_table(spark, sf_dir, "orders")
    j = _quantile_rank_profile(orders)

    def row(permille: int, lt: str, le: str, label: str):
        lo, hi = _rank_window(permille)
        return j.select(
            F.lit("qv").alias("variant"),
            F.concat(F.col("o_orderpriority"), F.lit(label)).alias("grp"),
            F.col("n").cast("bigint").alias("n"),
            lo.cast("double").alias("v1"),
            hi.cast("double").alias("v2"),
            _quantile_verdict(F.col(lt), F.col(le), permille).alias("v3"),
            F.lit(None).cast("double").alias("v4"),
        )

    return row(500, "lt50", "le50", "|p50").unionByName(
        row(900, "lt90", "le90", "|p90")
    )


_QV_SQL = """
WITH qvn AS (
  SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY 1
), qvq AS (
  SELECT o_orderpriority, n, 500 AS pm FROM qvn
  UNION ALL
  SELECT o_orderpriority, n, 900 AS pm FROM qvn
)
SELECT 'qv' AS variant,
       o_orderpriority || '|p' || CAST(pm // 10 AS VARCHAR) AS grp,
       CAST(n AS BIGINT) AS n,
       CAST(((pm - 1) * n) // 1000 - 1 AS DOUBLE) AS v1,
       CAST(((pm + 1) * n + 999) // 1000 + 1 AS DOUBLE) AS v2,
       CAST(1 AS DOUBLE) AS v3,
       CAST(NULL AS DOUBLE) AS v4
FROM qvq
"""


_KMV_K = 32
_KMV_DOMAIN = float(1 << 60)  # hex15_int hashes are uniform in [0, 2^60)


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'kmv' variant — a PORTABLE bottom-k (KMV) distinct sketch whose
    estimate itself hash-matches DuckDB (VERDICT r9 Next #3: HLL's
    estimates are engine-internal and could only ever be
    verdict-checked; KMV on md5-nibble keys is bit-portable the way
    'qv' made the GK guarantee portable).

    Per o_orderpriority over customer keys: hash each distinct key
    with hex15_int (uniform in [0, 2^60)), keep the k = {k} smallest
    distinct hashes (topk_per_group_staged — the per-partition prune
    keeps the window task from funneling the corpus), and estimate
    distinct = (k-1)·2^60 / h_(k). Every step is integer math plus
    one int64→double cast and one IEEE multiply/divide — both engines
    round identically, so the ESTIMATE value is in the hash, not just
    a bound verdict. Groups with ≤ k distinct hashes fall back to the
    exact count (the sketch is exact below its capacity).

    grp = priority|cust; n = exact distinct-hash count; v1 = h_(k);
    v2 = the KMV estimate; v3 = signed relative error (portable:
    derived from v2 and n); v4 = NULL.
    """
    from ..functions.text import hex15_int
    from ..operators.topk import topk_per_group_staged

    orders = load_table(spark, sf_dir, "orders")
    hashes = orders.select(
        "o_orderpriority",
        hex15_int(F.col("o_custkey").cast("string")).alias("h"),
    ).distinct()
    exact = hashes.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("m")
    )
    bottom = topk_per_group_staged(
        hashes, ["o_orderpriority"], [F.asc("h")], _KMV_K
    )
    kth = bottom.groupBy("o_orderpriority").agg(F.max("h").alias("hk"))
    j = exact.join(kth, "o_orderpriority")
    est = F.when(
        F.col("m") <= F.lit(_KMV_K), F.col("m").cast("double")
    ).otherwise(
        F.lit(float(_KMV_K - 1))
        * F.lit(_KMV_DOMAIN)
        / F.col("hk").cast("double")
    )
    return j.select(
        F.lit("kmv").alias("variant"),
        F.concat(F.col("o_orderpriority"), F.lit("|cust")).alias("grp"),
        F.col("m").cast("bigint").alias("n"),
        F.col("hk").cast("double").alias("v1"),
        est.alias("v2"),
        ((est - F.col("m").cast("double")) / F.col("m").cast("double")).alias(
            "v3"
        ),
        F.lit(None).cast("double").alias("v4"),
    )


q_kmv_distinct.__doc__ = q_kmv_distinct.__doc__.format(k=_KMV_K)

_KMV_SQL = f"""
WITH kmvh AS (
  SELECT DISTINCT o_orderpriority,
         CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM orders
), kmvm AS (
  SELECT o_orderpriority, count(*) AS m FROM kmvh GROUP BY 1
), kmvk AS (
  SELECT o_orderpriority, max(h) AS hk FROM (
    SELECT o_orderpriority, h,
           row_number() OVER (PARTITION BY o_orderpriority
                              ORDER BY h ASC) AS rn
    FROM kmvh
  ) WHERE rn <= {_KMV_K} GROUP BY 1
), kmve AS (
  SELECT o_orderpriority, m, hk,
         CASE WHEN m <= {_KMV_K} THEN CAST(m AS DOUBLE)
              ELSE {float(_KMV_K - 1)!r} * {_KMV_DOMAIN!r}
                   / CAST(hk AS DOUBLE) END AS est
  FROM kmvm JOIN kmvk USING (o_orderpriority)
)
SELECT 'kmv' AS variant, o_orderpriority || '|cust' AS grp,
       CAST(m AS BIGINT) AS n,
       CAST(hk AS DOUBLE) AS v1,
       est AS v2,
       (est - CAST(m AS DOUBLE)) / CAST(m AS DOUBLE) AS v3,
       CAST(NULL AS DOUBLE) AS v4
FROM kmve
"""


_MOMENTS_MERGED_SQL = f"""
SELECT 'moments' AS variant, l_returnflag AS grp, CAST(n AS BIGINT) AS n,
       CAST(var_qty AS DOUBLE) AS v1, CAST(std_qty AS DOUBLE) AS v2,
       CAST(cov_qty_price AS DOUBLE) AS v3,
       CAST(corr_qty_price AS DOUBLE) AS v4
FROM ({_MOMENTS_SQL})
UNION ALL
SELECT * FROM ({_CONTRACTS_SQL})
UNION ALL
SELECT * FROM ({_chi2_sql()})
UNION ALL
SELECT * FROM ({_KANON_SQL})
UNION ALL
SELECT * FROM ({_TELOO_SQL})
UNION ALL
SELECT * FROM ({_QV_SQL})
UNION ALL
SELECT * FROM ({_KMV_SQL})
"""

QUERIES["stats_moments"] = Q(
    q_moments_merged,
    _MOMENTS_MERGED_SQL,
    variants={
        "moments": q_stats_moments,
        "contracts": q_contract_audit,
        "chi2": q_chi_square,
        "kanon": q_kanon_stats,
        "teloo": q_target_encode,
        "qv": q_quantile_guarantee,
        "kmv": q_kmv_distinct,
    },
)
QUERIES["salted_agg"] = Q(
    q_salted_merged,
    _SALTED_MERGED_SQL,
    variants={"salted": q_salted_agg, "fanout": q_fanout_stats},
)
