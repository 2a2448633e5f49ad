"""TPC-H-shaped deep analytics over the driver star schema: correlated
subqueries, EXISTS/NOT-IN, nation-pair volume, market share, customer
distribution, HAVING-gated joins. These exercise Catalyst's subquery
decorrelation and multi-join planning the way a warehouse workload
would; each maps to the classic query it's shaped after.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table, register_views
from . import Q

_REV = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(6,4))"
)


def q_top_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2-shaped correlated scalar subquery: customers holding their
    nation's maximum balance (decorrelated by Catalyst into a join)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c1.c_nationkey, c1.c_custkey, c1.c_name, c1.c_acctbal
        FROM customer c1
        WHERE c1.c_acctbal = (SELECT max(c2.c_acctbal) FROM customer c2
                              WHERE c2.c_nationkey = c1.c_nationkey)
        """
    )


_TOP_CUST_SQL = """
SELECT c1.c_nationkey, c1.c_custkey, c1.c_name, c1.c_acctbal
FROM customer c1
WHERE c1.c_acctbal = (SELECT max(c2.c_acctbal) FROM customer c2
                      WHERE c2.c_nationkey = c1.c_nationkey)
"""


def q_late_shipment_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-shaped EXISTS: orders with any line shipped > 90 days after
    the order date, counted per priority."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n_late
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 90 DAYS)
        GROUP BY o_orderpriority
        """
    )


_LATE_SQL = """
SELECT o_orderpriority, count(*) AS n_late
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
"""


def q_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7-shaped nation-pair trade volume: supplier nation × customer
    nation × ship year (6-way join, two roles for nation)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n_cust = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(6,4)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n_cust), customer.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(n_supp), supplier.s_nationkey == F.col("sn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(F.sum(rev).cast("double").alias("volume"),
             F.count(F.lit(1)).alias("n_items"))
    )


_VOLUME_SQL = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS ship_year,
       CAST(CAST(SUM({_REV}) AS VARCHAR) AS DOUBLE) AS volume,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE sn.n_name != cn.n_name
GROUP BY 1, 2, 3
"""


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8-shaped market share: one region's fraction of yearly revenue
    (conditional decimal sums, double division at the edge)."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT CAST(year(o_orderdate) AS INT) AS order_year,
          CAST(CAST(SUM(CASE WHEN r_name = 'ASIA' THEN {_REV} END) AS STRING) AS DOUBLE)
            / CAST(CAST(SUM({_REV}) AS STRING) AS DOUBLE) AS asia_share,
          count(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY 1
        """
    )


_SHARE_SQL = f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
  CAST(CAST(SUM(CASE WHEN r_name = 'ASIA' THEN {_REV} END) AS VARCHAR) AS DOUBLE)
    / CAST(CAST(SUM({_REV}) AS VARCHAR) AS DOUBLE) AS asia_share,
  count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY 1
"""


def q_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13-shaped two-level aggregation: how many customers placed k
    orders (including zero, via the outer join)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


_DISTRIBUTION_SQL = """
SELECT n_orders, count(*) AS n_customers FROM (
  SELECT c_custkey, count(o_orderkey) AS n_orders
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) GROUP BY n_orders
"""


def q_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18-shaped HAVING gate + join-back: orders whose total quantity
    exceeds 150, with their customer."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_name, o_orderkey,
               strftime_big AS o_date, total_qty
        FROM (
          SELECT l_orderkey,
                 CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
        ) big
        JOIN orders ON o_orderkey = big.l_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN (SELECT o_orderkey AS ok2,
                     date_format(o_orderdate, 'yyyy-MM-dd') AS strftime_big
              FROM orders) d ON d.ok2 = o_orderkey
        """
    )


_BIG_ORDERS_SQL = """
SELECT c_name, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
       total_qty
FROM (
  SELECT l_orderkey,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
) big
JOIN orders ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q_parts_not_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16-shaped NOT IN + anti-semantics: part brands/types never
    shipped in 1995, counted per brand."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_brand, count(*) AS n_parts
        FROM part
        WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem
                                  WHERE year(l_shipdate) = 1995)
          AND p_type NOT LIKE 'PROMO%'
        GROUP BY p_brand
        """
    )


_NOT_ORDERED_SQL = """
SELECT p_brand, count(*) AS n_parts
FROM part
WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem
                          WHERE year(l_shipdate) = 1995)
  AND p_type NOT LIKE 'PROMO%'
GROUP BY p_brand
"""


def q_subquery_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-EXISTS + Q16-NOT-IN + Q13-distribution + funnel + cohort
    retention + Markov transition counts in one union-tagged
    entry (driver cap: the correctness gate records at most 50
    registry entries). All three decorrelate to (group, count) — the
    subquery-planning battery in one driver-checked result."""
    late = q_late_shipment_orders(spark, sf_dir).select(
        F.lit("late_exists").alias("variant"),
        F.col("o_orderpriority").alias("grp"),
        F.col("n_late").cast("bigint").alias("n"),
    )
    not_in = q_parts_not_ordered(spark, sf_dir).select(
        F.lit("not_in_brand").alias("variant"),
        F.col("p_brand").alias("grp"),
        F.col("n_parts").cast("bigint").alias("n"),
    )
    dist = q_order_count_distribution(spark, sf_dir).select(
        F.lit("order_count_dist").alias("variant"),
        F.col("n_orders").cast("string").alias("grp"),
        F.col("n_customers").cast("bigint").alias("n"),
    )
    from .events import (
        q_cohort_retention,
        q_event_transitions,
        q_funnel_steps,
    )

    return (
        late.unionByName(not_in)
        .unionByName(dist)
        .unionByName(q_funnel_steps(spark, sf_dir))
        .unionByName(q_cohort_retention(spark, sf_dir))
        .unionByName(q_event_transitions(spark, sf_dir))
    )


def _events_q(name):
    def _fn(spark, sf_dir):
        from . import events

        return getattr(events, name)(spark, sf_dir)

    return _fn


def _subquery_counts_sql() -> str:
    from .events import _COHORT_SQL, _FUNNEL_SQL, _TRANSITIONS_SQL

    return f"""
SELECT 'late_exists' AS variant, o_orderpriority AS grp, CAST(n_late AS BIGINT) AS n
FROM ({_LATE_SQL})
UNION ALL
SELECT 'not_in_brand' AS variant, p_brand AS grp, CAST(n_parts AS BIGINT) AS n
FROM ({_NOT_ORDERED_SQL})
UNION ALL
SELECT 'order_count_dist' AS variant, CAST(n_orders AS VARCHAR) AS grp,
       CAST(n_customers AS BIGINT) AS n
FROM ({_DISTRIBUTION_SQL})
UNION ALL
SELECT variant, grp, n FROM ({_FUNNEL_SQL})
UNION ALL
SELECT variant, grp, n FROM ({_COHORT_SQL})
UNION ALL
SELECT variant, grp, n FROM ({_TRANSITIONS_SQL})
"""


_SUBQUERY_COUNTS_SQL = _subquery_counts_sql()


def q_trade_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 nation-pair volume + Q8 market share in one union-tagged
    entry (driver cap). variant 'pair_volume': supplier×customer
    nation revenue per ship year; 'rules': q_basket_rules
    (market-basket association rules); 'asia_share': ASIA's fraction of
    yearly revenue (nation columns NULL).

    Both variants aggregate the SAME expanded join core
    (lineitem⋈orders⋈customer⋈supplier⋈nation×2⋈region — every join
    is non-filtering: each lineitem has a supplier, each nation a
    region). The single shared join graph replaces two
    independently-planned 6-way join chains, and the core is
    PERSISTED (narrow 6-column projection, MEMORY_AND_DISK) so the
    two aggregation branches read it once instead of re-executing the
    join per branch — Spark shares broadcast exchanges across a
    union, not join results.
    """
    from pyspark import StorageLevel
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    n_cust = nation.select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_name").alias("cust_nation"),
        F.col("n_regionkey").alias("cn_region"),
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(6,4)")
    core = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n_cust), customer.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(n_supp), supplier.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(region), F.col("cn_region") == region.r_regionkey)
        .select(
            "supp_nation",
            "cust_nation",
            "r_name",
            F.year("l_shipdate").cast("int").alias("ship_year"),
            F.year("o_orderdate").cast("int").alias("order_year"),
            rev.alias("rev"),
        )
    ).persist(StorageLevel.MEMORY_AND_DISK)
    vol = (
        core.filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.col("ship_year").alias("yr"))
        .agg(
            F.sum("rev").cast("double").alias("measure"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            F.lit("pair_volume").alias("variant"),
            "supp_nation",
            "cust_nation",
            "yr",
            "measure",
            F.col("n_items").cast("bigint").alias("n_items"),
        )
    )
    share = (
        core.groupBy(F.col("order_year").alias("yr"))
        .agg(
            (
                F.sum(F.when(F.col("r_name") == "ASIA", F.col("rev")))
                .cast("double")
                / F.sum("rev").cast("double")
            ).alias("measure"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            F.lit("asia_share").alias("variant"),
            F.lit(None).cast("string").alias("supp_nation"),
            F.lit(None).cast("string").alias("cust_nation"),
            "yr",
            "measure",
            F.col("n_items").cast("bigint").alias("n_items"),
        )
    )
    return vol.unionByName(share).unionByName(
        q_basket_rules(spark, sf_dir)
    )


_RULES_MIN_SUPPORT = 2
_RULES_TOP = 20
_RULES_SCALE = 10**6


def q_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'rules' variant: market-basket association rules
    (operators/association.py) over orders-as-baskets of parts —
    top-{t} directed rules by integer-scaled lift (min support
    {ms}). Column mapping: supp_nation/cust_nation = antecedent /
    consequent part, yr = confidence per-mille, measure = scaled
    lift, n_items = the pair's support count."""
    from ..operators.association import association_rules

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("basket"),
        F.col("l_partkey").alias("item"),
    )
    rules = association_rules(
        li,
        "basket",
        "item",
        min_support=_RULES_MIN_SUPPORT,
        scale=_RULES_SCALE,
    )
    top = rules.orderBy(
        F.col("lift_scaled").desc(),
        F.col("antecedent").asc(),
        F.col("consequent").asc(),
    ).limit(_RULES_TOP)
    return top.select(
        F.lit("rules").alias("variant"),
        F.col("antecedent").cast("string").alias("supp_nation"),
        F.col("consequent").cast("string").alias("cust_nation"),
        F.col("conf_milli").cast("int").alias("yr"),
        F.col("lift_scaled").cast("double").alias("measure"),
        F.col("c_xy").cast("bigint").alias("n_items"),
    )


_RULES_SQL = f"""
WITH rbi AS (
  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
), ritems AS (
  SELECT i AS item, count(*) AS c FROM rbi GROUP BY i
), rnb AS (
  SELECT count(DISTINCT b) AS nb FROM rbi
), rpairs AS (
  SELECT x.i AS a, y.i AS bb, count(*) AS c_xy
  FROM rbi x JOIN rbi y ON x.b = y.b AND x.i < y.i
  GROUP BY 1, 2 HAVING count(*) >= {_RULES_MIN_SUPPORT}
), rdir AS (
  SELECT a, bb, c_xy FROM rpairs
  UNION ALL
  SELECT bb, a, c_xy FROM rpairs
), rfull AS (
  SELECT d.a, d.bb, d.c_xy, ca.c AS c_x, cb.c AS c_y,
         (d.c_xy * 1000) // ca.c AS conf_milli,
         (d.c_xy * (SELECT nb FROM rnb)
          * CAST({_RULES_SCALE} AS BIGINT)) // (ca.c * cb.c)
           AS lift_scaled
  FROM rdir d JOIN ritems ca ON ca.item = d.a
              JOIN ritems cb ON cb.item = d.bb
)
SELECT 'rules' AS variant, CAST(a AS VARCHAR) AS supp_nation,
       CAST(bb AS VARCHAR) AS cust_nation,
       CAST(conf_milli AS INTEGER) AS yr,
       CAST(lift_scaled AS DOUBLE) AS measure,
       CAST(c_xy AS BIGINT) AS n_items
FROM rfull
ORDER BY lift_scaled DESC, a ASC, bb ASC LIMIT {_RULES_TOP}
"""


_TRADE_SQL = f"""
SELECT 'pair_volume' AS variant, supp_nation, cust_nation,
       CAST(ship_year AS INTEGER) AS yr, CAST(volume AS DOUBLE) AS measure,
       CAST(n_items AS BIGINT) AS n_items
FROM ({_VOLUME_SQL})
UNION ALL
SELECT 'asia_share' AS variant, CAST(NULL AS VARCHAR) AS supp_nation,
       CAST(NULL AS VARCHAR) AS cust_nation,
       CAST(order_year AS INTEGER) AS yr, CAST(asia_share AS DOUBLE) AS measure,
       CAST(n_items AS BIGINT) AS n_items
FROM ({_SHARE_SQL})
UNION ALL
SELECT * FROM ({_RULES_SQL})
"""


QUERIES: dict[str, Q] = {
    "top_customer_per_nation": Q(q_top_customer_per_nation, _TOP_CUST_SQL),
    "subquery_counts": Q(
        q_subquery_counts,
        _SUBQUERY_COUNTS_SQL,
        variants={
            "cohort": _events_q("q_cohort_retention"),
            "transitions": _events_q("q_event_transitions"),
        },
    ),
    "trade_analytics": Q(
        q_trade_analytics,
        _TRADE_SQL,
        variants={"rules": q_basket_rules},
    ),
    "big_orders": Q(q_big_orders, _BIG_ORDERS_SQL),
}
