"""Relational core: scans, filters, joins, aggregations, set ops.

Covers SURVEY.md §2.3 (projections/filters), §2.4 (joins, incl. the
two-tier lookup join J1 — reference database.py:83-126), §2.5
(aggregations), §2.7 (sorts/limits/set ops). All expressed as lazy
DataFrame plans; Catalyst handles pushdown, pruning, and join
selection. Small dims (region/nation) are broadcast explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.detsum import dmean, dsum
from ..operators.lookup_join import two_tier_lookup_join
from ..sources.tables import load_table
from . import Q

# Exact-decimal casts for 2-decimal-valued measure columns (see
# functions/detsum.py for why money never sums in double). Lazy:
# Columns can only be built with an active SparkContext.
def _E():
    return F.col("l_extendedprice").cast("decimal(12,2)")


def _D1():
    return (F.lit(1) - F.col("l_discount")).cast("decimal(6,4)")


def _T1():
    return (F.lit(1) + F.col("l_tax")).cast("decimal(6,4)")


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (wide agg battery, SURVEY §2.5)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-12-31 00:00:00").cast("timestamp")
    )
    qty = F.col("l_quantity").cast("decimal(12,2)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).cast("double").alias("sum_qty"),
        F.sum(_E()).cast("double").alias("sum_base_price"),
        F.sum(_E() * _D1()).cast("double").alias("sum_disc_price"),
        F.sum(_E() * _D1() * _T1()).cast("double").alias("sum_charge"),
        dmean("l_quantity", "decimal(12,2)").alias("avg_qty"),
        dmean("l_extendedprice", "decimal(12,2)").alias("avg_price"),
        dmean("l_discount", "decimal(6,4)").alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(6,4))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(6,4)) * CAST(1 + l_tax AS DECIMAL(6,4))) AS VARCHAR) AS DOUBLE) AS sum_charge,
  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) / count(l_quantity) AS avg_qty,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) / count(l_extendedprice) AS avg_price,
  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(6,4))) AS VARCHAR) AS DOUBLE) / count(l_discount) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-31 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_flagship_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: 5-way star join + filtered revenue rollup (SURVEY §7 M0).

    lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region, shipdate-filtered,
    revenue by region name × order priority. nation/region broadcast;
    customer join goes through AQE (broadcastable at small SF, shuffle
    hash at 100 TB).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "o_orderpriority")
        .agg(
            F.sum(_E() * _D1()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_FLAGSHIP_SQL = """
SELECT r_name, o_orderpriority,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(6,4))) AS VARCHAR) AS DOUBLE) AS revenue,
  count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY r_name, o_orderpriority
"""


def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k with deterministic tie-break (SURVEY §2.7 O1-O4)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
        )
    )


_TOP_ORDERS_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice,
       strftime(o_orderdate, '%Y-%m-%d') AS o_date
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
"""


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI (EXISTS): customers having orders, per segment."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-tagged semi + anti join battery (one registry slot).

    The driver's correctness gate records at most 50 registry entries,
    so same-schema variants share an entry: variant 'has_orders' is
    the LEFT SEMI cohort per segment, 'no_orders_1995' the LEFT ANTI
    cohort per nation.
    """
    semi = q_semi_join(spark, sf_dir).select(
        F.lit("has_orders").alias("variant"),
        F.col("c_mktsegment").alias("grp"),
        F.col("n_customers").cast("bigint").alias("n_customers"),
    )
    anti = q_anti_join(spark, sf_dir).select(
        F.lit("no_orders_1995").alias("variant"),
        F.col("n_name").alias("grp"),
        F.col("n_customers").cast("bigint").alias("n_customers"),
    )
    return semi.unionByName(anti)


_SEMI_SQL = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI (NOT EXISTS): customers without orders, per nation."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    recent = orders.filter(F.year("o_orderdate") == 1995)
    return (
        customer.join(recent, customer.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


_ANTI_SQL = """
SELECT n_name, count(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND year(o_orderdate) = 1995)
GROUP BY n_name
"""

_SEMI_ANTI_SQL = f"""
SELECT 'has_orders' AS variant, c_mktsegment AS grp,
       CAST(n_customers AS BIGINT) AS n_customers
FROM ({_SEMI_SQL})
UNION ALL
SELECT 'no_orders_1995' AS variant, n_name AS grp,
       CAST(n_customers AS BIGINT) AS n_customers
FROM ({_ANTI_SQL})
"""


def q_outer_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join + per-customer aggregate with null handling."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum("o_totalprice", "decimal(18,2)"), F.lit(0.0)).alias(
                "spend"
            ),
        )
    )


_OUTER_SQL = """
SELECT c_custkey, c_name,
       count(o_orderkey) AS n_orders,
       COALESCE(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE), 0.0) AS spend
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
"""


def q_ivm_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'ivm' variant: counting-algorithm incremental view maintenance
    (operators/ivm.py). The customer x orders inner-join view starts
    from partial table states (orders with key % 7 != 0, customers
    with key % 13 != 0), then one signed delta batch inserts the held
    back rows AND deletes the orders with key % 11 == 3 — the
    maintained bag, served as the per-customer aggregate, must equal
    the DIRECT join of the final table states, which is exactly what
    the oracle computes. The hash match IS the proof that the delta
    path reproduces recomputation."""
    from ..operators.ivm import (
        MULT,
        apply_delta,
        as_bag,
        bag_union,
        join_view_delta,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("c_custkey"),
        "o_totalprice",
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    a_old = orders.where(F.col("o_orderkey") % 7 != 0)
    b_old = customer.where(F.col("c_custkey") % 13 != 0)
    da = bag_union(
        as_bag(orders.where(F.col("o_orderkey") % 7 == 0)),
        as_bag(a_old.where(F.col("o_orderkey") % 11 == 3), -1),
    )
    db = as_bag(customer.where(F.col("c_custkey") % 13 == 0))
    view_old = as_bag(a_old.join(b_old, "c_custkey"))
    delta = join_view_delta(
        as_bag(a_old), da, as_bag(b_old), db, on="c_custkey"
    )
    view_new = apply_delta(view_old, delta)
    return view_new.groupBy("c_custkey", "c_name").agg(
        F.sum(MULT).cast("bigint").alias("n_orders"),
        F.sum(
            F.col("o_totalprice").cast("decimal(18,2)") * F.col(MULT)
        )
        .cast("double")
        .alias("spend"),
    ).select(
        F.lit("ivm").alias("variant"),
        "c_custkey",
        "c_name",
        "n_orders",
        "spend",
    )


def q_outer_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer aggregate + the incrementally-maintained inner-join
    view in one union-tagged entry (driver cap). variant 'outer':
    q_outer_join_agg. variant 'ivm': q_ivm_join."""
    outer = q_outer_join_agg(spark, sf_dir).select(
        F.lit("outer").alias("variant"),
        "c_custkey",
        "c_name",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.col("spend").cast("double").alias("spend"),
    )
    return outer.unionByName(q_ivm_join(spark, sf_dir))


_OUTER_MERGED_SQL = f"""
SELECT 'outer' AS variant, c_custkey, c_name,
       CAST(n_orders AS BIGINT) AS n_orders, CAST(spend AS DOUBLE) AS spend
FROM ({_OUTER_SQL})
UNION ALL
SELECT 'ivm' AS variant, c_custkey, c_name,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
            AS DOUBLE) AS spend
FROM customer JOIN orders ON c_custkey = o_custkey
WHERE (o_orderkey % 7 = 0) OR (o_orderkey % 11 <> 3)
GROUP BY 1, 2, 3
"""


def q_two_tier_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 two-tier vendor lookup (reference database.py:83-126).

    Tier 1: exact equi-join on the lookup key. Tier 2 (misses only):
    case-insensitive containment — the *stored* key contains the fact
    key (reference database.py:110-114) — with a deterministic
    first-match pick (row_number ordered by dim key; the reference's
    ``fetchone`` is non-deterministic, SURVEY §4 defect list).

    The dim is derived from ``part``: exact entries are plain p_names
    (p_partkey % 5 = 0); fuzzy-only entries are 'ACME ' || p_name
    (p_partkey % 7 = 0), which contain the fact p_name as a substring.

    Tier 3 extends the reference: rows that miss BOTH tiers also get a
    nearest-dim *suggestion* by levenshtein distance (deterministic
    tie-break on the vendor string), tagged tier=3 alongside their
    tier=0 miss row — the J1 family in one driver-checked entry.
    """
    part = load_table(spark, sf_dir, "part")
    exact = (
        part.filter(F.col("p_partkey") % 5 == 0)
        .select(F.col("p_name").alias("vendor"), F.col("p_partkey").alias("ref"))
    )
    fuzzy = (
        part.filter(F.col("p_partkey") % 7 == 0)
        .select(
            F.concat(F.lit("ACME "), F.col("p_name")).alias("vendor"),
            F.col("p_partkey").alias("ref"),
        )
    )
    dim = (
        exact.unionByName(fuzzy)
        .groupBy("vendor")
        .agg(F.min("ref").cast("bigint").alias("dim_ref"))
    )
    fact = part.select("p_partkey", "p_name")
    base = two_tier_lookup_join(
        fact,
        dim,
        fact_id="p_partkey",
        fact_key="p_name",
        dim_key="vendor",
        dim_cols=["dim_ref"],
    )
    misses = base.filter(F.col("tier") == 0).select("p_partkey", "p_name")
    scored = misses.join(F.broadcast(dim.select("vendor"))).withColumn(
        "dist", F.levenshtein("p_name", "vendor")
    )
    from ..operators.topk import topk_per_group

    suggest = topk_per_group(
        scored, ["p_partkey"], [F.asc("dist"), F.asc("vendor")], 1
    ).select(
        "p_partkey",
        "p_name",
        "vendor",
        F.lit(None).cast("bigint").alias("dim_ref"),
        F.lit(3).alias("tier"),
        F.col("dist").cast("bigint").alias("dist"),
    )
    return base.withColumn("dist", F.lit(None).cast("bigint")).unionByName(
        suggest
    )


_TWO_TIER_SQL = """
WITH dim AS (
  SELECT vendor, CAST(min(ref) AS BIGINT) AS dim_ref FROM (
    SELECT p_name AS vendor, p_partkey AS ref FROM part WHERE p_partkey % 5 = 0
    UNION ALL
    SELECT 'ACME ' || p_name AS vendor, p_partkey AS ref FROM part WHERE p_partkey % 7 = 0
  ) GROUP BY vendor
), t1 AS (
  SELECT p.p_partkey, p.p_name, d.vendor, d.dim_ref
  FROM part p LEFT JOIN dim d ON p.p_name = d.vendor
), miss AS (
  SELECT p_partkey, p_name FROM t1 WHERE vendor IS NULL
), t2 AS (
  SELECT m.p_partkey, m.p_name, d.vendor, d.dim_ref,
         row_number() OVER (PARTITION BY m.p_partkey ORDER BY d.vendor) AS rn
  FROM miss m JOIN dim d ON lower(d.vendor) LIKE '%' || lower(m.p_name) || '%'
), hard_miss AS (
  SELECT m.p_partkey, m.p_name
  FROM miss m WHERE NOT EXISTS (SELECT 1 FROM t2 WHERE t2.p_partkey = m.p_partkey)
), sugg AS (
  SELECT h.p_partkey, h.p_name, d.vendor,
         levenshtein(h.p_name, d.vendor) AS dist,
         row_number() OVER (PARTITION BY h.p_partkey
                            ORDER BY levenshtein(h.p_name, d.vendor), d.vendor) AS rn
  FROM hard_miss h CROSS JOIN dim d
)
SELECT p_partkey, p_name, vendor, dim_ref, 1 AS tier, CAST(NULL AS BIGINT) AS dist
FROM t1 WHERE vendor IS NOT NULL
UNION ALL
SELECT p_partkey, p_name, vendor, dim_ref, 2 AS tier, CAST(NULL AS BIGINT) AS dist
FROM t2 WHERE rn = 1
UNION ALL
SELECT p_partkey, p_name, CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), 0 AS tier,
       CAST(NULL AS BIGINT) AS dist
FROM hard_miss
UNION ALL
SELECT p_partkey, p_name, vendor, CAST(NULL AS BIGINT), 3 AS tier,
       CAST(dist AS BIGINT) AS dist
FROM sugg WHERE rn = 1
"""


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over region → nation with grouping id (SURVEY §2.5)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            dsum("c_acctbal", "decimal(18,2)").alias("acctbal"),
            F.count(F.lit(1)).alias("n_customers"),
            F.grouping_id().cast("int").alias("gid"),
        )
    )


_ROLLUP_SQL = """
SELECT r_name, n_name,
  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS acctbal,
  count(*) AS n_customers,
  CAST(GROUPING(r_name, n_name) AS INTEGER) AS gid
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over returnflag × linestatus with grouping id."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_items"),
        F.grouping_id().cast("int").alias("gid"),
    )


_CUBE_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
  count(*) AS n_items,
  CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_grouping_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP + CUBE + GROUPING SETS in one union-tagged entry.

    Same grouping-id semantics across three shapes (driver cap: the
    correctness gate records at most 50 entries, so the grouping
    family shares one). d1/d2 are the two grouping dimensions of each
    variant; measure is its decimal-exact aggregate in double.
    """
    from .analytics import q_grouping_sets

    def tag(df, variant, d1, d2, measure, n):
        return df.select(
            F.lit(variant).alias("variant"),
            F.col(d1).cast("string").alias("d1"),
            F.col(d2).cast("string").alias("d2"),
            F.col(measure).cast("double").alias("measure"),
            F.col(n).cast("bigint").alias("n"),
            F.col("gid").cast("int").alias("gid"),
        )

    return (
        tag(q_rollup(spark, sf_dir), "rollup_region_nation",
            "r_name", "n_name", "acctbal", "n_customers")
        .unionByName(
            tag(q_cube(spark, sf_dir), "cube_flag_status",
                "l_returnflag", "l_linestatus", "sum_qty", "n_items")
        )
        .unionByName(
            tag(q_grouping_sets(spark, sf_dir), "gsets_status_priority",
                "o_orderstatus", "o_orderpriority", "total", "n")
        )
    )


def _grouping_multi_sql() -> str:
    from .analytics import _GROUPING_SETS_SQL

    return f"""
SELECT 'rollup_region_nation' AS variant, r_name AS d1, n_name AS d2,
       CAST(acctbal AS DOUBLE) AS measure, CAST(n_customers AS BIGINT) AS n, gid
FROM ({_ROLLUP_SQL})
UNION ALL
SELECT 'cube_flag_status' AS variant, l_returnflag AS d1, l_linestatus AS d2,
       CAST(sum_qty AS DOUBLE) AS measure, CAST(n_items AS BIGINT) AS n, gid
FROM ({_CUBE_SQL})
UNION ALL
SELECT 'gsets_status_priority' AS variant, o_orderstatus AS d1, o_orderpriority AS d2,
       CAST(total AS DOUBLE) AS measure, CAST(n AS BIGINT) AS n, gid
FROM ({_GROUPING_SETS_SQL})
"""


def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT aggregates per order priority."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.countDistinct("o_orderstatus").alias("n_status"),
        F.sum_distinct(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_distinct_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


_DISTINCT_SQL = """
SELECT o_orderpriority,
  count(DISTINCT o_custkey) AS n_cust,
  count(DISTINCT o_orderstatus) AS n_status,
  CAST(CAST(SUM(DISTINCT CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_distinct_price,
  count(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
"""


def q_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable pivot (conditional aggregation) by linestatus."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(12,2)")
    return li.groupBy("l_returnflag").agg(
        F.coalesce(F.sum(F.when(F.col("l_linestatus") == "O", qty)).cast("double"), F.lit(0.0)).alias("qty_open"),
        F.coalesce(F.sum(F.when(F.col("l_linestatus") == "F", qty)).cast("double"), F.lit(0.0)).alias("qty_fulfilled"),
        F.count(F.when(F.col("l_linestatus") == "O", 1)).alias("n_open"),
        F.count(F.when(F.col("l_linestatus") == "F", 1)).alias("n_fulfilled"),
    )


_PIVOT_SQL = """
SELECT l_returnflag,
  COALESCE(CAST(CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS VARCHAR) AS DOUBLE), 0.0) AS qty_open,
  COALESCE(CAST(CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS VARCHAR) AS DOUBLE), 0.0) AS qty_fulfilled,
  count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS n_open,
  count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS n_fulfilled
FROM lineitem
GROUP BY l_returnflag
"""


def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION cohort counts (SURVEY §2.7)."""
    orders = load_table(spark, sf_dir, "orders")
    y95 = orders.filter(F.year("o_orderdate") == 1995).select("o_custkey").distinct()
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    both = y95.intersect(y96).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("both").alias("cohort"), "n"
    )
    only95 = y95.exceptAll(y96).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("only_1995").alias("cohort"), "n"
    )
    either = y95.union(y96).distinct().agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("either").alias("cohort"), "n"
    )
    return both.unionByName(only95).unionByName(either)


_SETOPS_SQL = """
WITH y95 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
     y96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
SELECT 'both' AS cohort, count(*) AS n FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96)
UNION ALL
SELECT 'only_1995' AS cohort, count(*) AS n FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96)
UNION ALL
SELECT 'either' AS cohort, count(*) AS n FROM (SELECT * FROM y95 UNION SELECT * FROM y96)
"""


def q_filter_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate battery (SURVEY §2.3 P-series analogs over part).

    rlike / contains / like / length / upper / in-list / between, all
    pushed into the parquet scan where Catalyst can.
    """
    part = load_table(spark, sf_dir, "part")
    return part.filter(
        F.col("p_name").rlike("^(small|red|blue)\\b")
        & F.col("p_type").isin("ECONOMY", "SMALL", "STANDARD")
        & (F.col("p_size").between(5, 45))
        & ~F.upper(F.col("p_name")).contains("GEAR")
        & (F.length("p_name") >= 3)
    ).select(
        "p_partkey",
        "p_name",
        "p_brand",
        "p_type",
        "p_size",
        F.upper(F.col("p_name")).alias("name_upper"),
        F.concat_ws(" - ", F.col("p_brand"), F.col("p_name")).alias("brand_name"),
    )


_FILTER_SQL = """
SELECT p_partkey, p_name, p_brand, p_type, p_size,
       upper(p_name) AS name_upper,
       p_brand || ' - ' || p_name AS brand_name
FROM part
WHERE regexp_matches(p_name, '^(small|red|blue)\\b')
  AND p_type IN ('ECONOMY', 'SMALL', 'STANDARD')
  AND p_size BETWEEN 5 AND 45
  AND NOT contains(upper(p_name), 'GEAR')
  AND length(p_name) >= 3
"""


def q_scalar_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function battery (SURVEY §2.8): string/math/date funcs.

    Includes the reference's money normalization P14 (strip $/, then
    cast — pdf_parser.py:385-395) and credit sign-flip P15
    (pdf_parser.py:375-377) over a printf-built amount string.
    """
    orders = load_table(spark, sf_dir, "orders")
    amount_str = F.concat(F.lit("$"), F.format_string("%.2f", F.col("o_totalprice")))
    is_credit = F.col("o_orderkey") % 3 == 0
    parsed = F.regexp_replace(amount_str, "[$,]", "").cast("decimal(18,2)")
    return orders.select(
        "o_orderkey",
        amount_str.alias("amount_str"),
        F.when(is_credit, (-parsed).cast("double"))
        .otherwise(parsed.cast("double"))
        .alias("amount_signed"),
        is_credit.alias("is_credit"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.lower("o_orderstatus").alias("status_lower"),
        F.trim(F.concat(F.lit("  "), F.col("o_orderstatus"), F.lit("  "))).alias("status_trim"),
        F.split(F.col("o_orderpriority"), "-").getItem(0).alias("prio_num"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.datediff(
            F.lit("2002-01-01 00:00:00").cast("timestamp"), F.col("o_orderdate")
        ).cast("int").alias("days_to_2002"),
        F.least(F.col("o_totalprice"), F.lit(100000.0)).alias("capped_price"),
        F.abs(F.col("o_totalprice") - F.lit(50000.0)).alias("dist_from_50k"),
        # temporal-part battery (absorbed date_parts entry — driver cap).
        # Cross-engine weekday alignment: Spark ``weekday`` is Monday=0,
        # DuckDB ``isodow`` is Monday=1 — emitted as ISO (Monday=1) on both.
        F.quarter("o_orderdate").cast("int").alias("order_quarter"),
        F.dayofmonth("o_orderdate").cast("int").alias("dom"),
        F.dayofyear("o_orderdate").cast("int").alias("doy"),
        (F.weekday("o_orderdate") + 1).cast("int").alias("isodow"),
        F.last_day("o_orderdate").cast("string").alias("month_end"),
        F.trunc("o_orderdate", "quarter").cast("string").alias("quarter_start"),
        # null-semantics battery: NULLIF / null-safe equality /
        # COALESCE chain — NULLs synthesized since the table has none
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_nullif"),
        F.col("o_orderstatus")
        .eqNullSafe(F.nullif(F.col("o_orderstatus"), F.lit("O")))
        .alias("ns_eq"),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("O")),
            F.nullif(F.col("o_orderstatus"), F.lit("F")),
            F.lit("both_null"),
        ).alias("first_nonnull"),
        # ANSI-safe casts: malformed input yields NULL, never an error
        F.expr("TRY_CAST(o_orderpriority AS INT)").alias("bad_int"),
        F.expr("TRY_CAST(split_part(o_orderpriority, '-', 1) AS INT)").alias(
            "prio_int"
        ),
    )


_SCALAR_SQL = """
SELECT o_orderkey,
  '$' || printf('%.2f', o_totalprice) AS amount_str,
  CASE WHEN o_orderkey % 3 = 0
       THEN CAST(-CAST(regexp_replace('$' || printf('%.2f', o_totalprice), '[$,]', '', 'g') AS DECIMAL(18,2)) AS DOUBLE)
       ELSE CAST( CAST(regexp_replace('$' || printf('%.2f', o_totalprice), '[$,]', '', 'g') AS DECIMAL(18,2)) AS DOUBLE)
  END AS amount_signed,
  o_orderkey % 3 = 0 AS is_credit,
  substring(o_orderpriority, 1, 1) AS prio_code,
  lower(o_orderstatus) AS status_lower,
  trim('  ' || o_orderstatus || '  ') AS status_trim,
  split_part(o_orderpriority, '-', 1) AS prio_num,
  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
  CAST(year(o_orderdate) AS INTEGER) AS order_year,
  CAST(month(o_orderdate) AS INTEGER) AS order_month,
  CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS INTEGER) AS days_to_2002,
  least(o_totalprice, 100000.0) AS capped_price,
  abs(o_totalprice - 50000.0) AS dist_from_50k,
  CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
  CAST(day(o_orderdate) AS INTEGER) AS dom,
  CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
  CAST(isodow(o_orderdate) AS INTEGER) AS isodow,
  strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
  strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS quarter_start,
  NULLIF(o_orderstatus, 'O') AS status_nullif,
  o_orderstatus IS NOT DISTINCT FROM NULLIF(o_orderstatus, 'O') AS ns_eq,
  COALESCE(NULLIF(o_orderstatus, 'O'), NULLIF(o_orderstatus, 'F'),
           'both_null') AS first_nonnull,
  TRY_CAST(o_orderpriority AS INTEGER) AS bad_int,
  TRY_CAST(split_part(o_orderpriority, '-', 1) AS INTEGER) AS prio_int
FROM orders
"""


def _build_queries() -> dict[str, Q]:
    return {
        "pricing_summary": Q(q_pricing_summary, _PRICING_SQL),
        "flagship_revenue": Q(q_flagship_revenue, _FLAGSHIP_SQL),
        "top_orders": Q(q_top_orders, _TOP_ORDERS_SQL),
        "semi_anti_join": Q(q_semi_anti_join, _SEMI_ANTI_SQL),
        "outer_join_agg": Q(
            q_outer_merged,
            _OUTER_MERGED_SQL,
            variants={"outer": q_outer_join_agg, "ivm": q_ivm_join},
        ),
        "two_tier_lookup": Q(q_two_tier_lookup, _TWO_TIER_SQL),
        "grouping_multi": Q(q_grouping_multi, _grouping_multi_sql()),
        "distinct_agg": Q(q_distinct_agg, _DISTINCT_SQL),
        "pivot_wide": Q(q_pivot_wide, _PIVOT_SQL),
        "setops": Q(q_setops, _SETOPS_SQL),
        "filter_battery": Q(q_filter_battery, _FILTER_SQL),
        "scalar_battery": Q(q_scalar_battery, _SCALAR_SQL),
    }


QUERIES: dict[str, Q] = _build_queries()


def q_string_battery2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string battery: pad/repeat/translate/reverse/strpos/
    left/right + levenshtein (portable across both engines)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.lpad("p_brand", 12, "*").alias("brand_lpad"),
        F.rpad("p_type", 10, ".").alias("type_rpad"),
        F.repeat(F.lit("ab"), 3).alias("rep"),
        F.translate("p_name", "aeiou", "AEIOU").alias("vowels_up"),
        F.reverse("p_name").alias("name_rev"),
        F.instr("p_name", "e").cast("bigint").alias("first_e"),
        F.substring("p_name", 1, 4).alias("left4"),
        F.col("p_name").substr(F.length("p_name") - 2, F.lit(3)).alias("right3"),
        F.levenshtein(F.col("p_name"), F.col("p_brand")).alias("lev_to_brand"),
        # capture-group extraction (absorbed regex_groups entry — driver cap)
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("int").alias("brand_num"),
        F.regexp_extract("p_name", r"^(\w+)\s+(\w+)$", 1).alias("adjective"),
        F.regexp_extract("p_name", r"^(\w+)\s+(\w+)$", 2).alias("noun"),
        F.regexp_extract("p_type", r"^([A-Z]+)", 1).alias("type_head"),
    )


_STRING2_SQL = """
SELECT p_partkey,
  lpad(p_brand, 12, '*') AS brand_lpad,
  rpad(p_type, 10, '.') AS type_rpad,
  repeat('ab', 3) AS rep,
  translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
  reverse(p_name) AS name_rev,
  CAST(strpos(p_name, 'e') AS BIGINT) AS first_e,
  substring(p_name, 1, 4) AS left4,
  substring(p_name, length(p_name) - 2, 3) AS right3,
  levenshtein(p_name, p_brand) AS lev_to_brand,
  CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS INTEGER) AS brand_num,
  regexp_extract(p_name, '^(\\w+)\\s+(\\w+)$', 1) AS adjective,
  regexp_extract(p_name, '^(\\w+)\\s+(\\w+)$', 2) AS noun,
  regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head
FROM part
"""


QUERIES["string_battery2"] = Q(q_string_battery2, _STRING2_SQL)
