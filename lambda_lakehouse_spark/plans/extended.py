"""Extended relational surface — operators the reference lacks but a
complete engine needs (SURVEY §2.3 'not present' list + §2.4/§2.6):
semi/anti joins, intersect/except, rollup & cube, exact + approximate
distinct counting, pivot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lambda_lakehouse_spark.functions.scalar import dsum
from lambda_lakehouse_spark.registry import register
from lambda_lakehouse_spark.sources.readers import read_table


_SEMI_ANTI_ORACLE = """
SELECT c_custkey, c_name, 'has_urgent_order' AS cohort
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
UNION ALL
SELECT c_custkey, c_name, 'no_orders_at_all' AS cohort
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


@register(
    "join_semi_anti",
    _SEMI_ANTI_ORACLE,
    doc="Left-semi (EXISTS) and left-anti (NOT EXISTS) joins — beyond the "
    "reference's join census (§2.3 notes neither exists there)",
    tags=("join", "semi", "anti"),
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
    semi = (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name", F.lit("has_urgent_order").alias("cohort"))
    )
    anti = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", F.lit("no_orders_at_all").alias("cohort"))
    )
    return semi.unionByName(anti)


_SETOP_ORACLE = """
SELECT c_nationkey AS nationkey, 'both_segments' AS tag FROM (
  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
  INTERSECT
  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
)
UNION ALL
SELECT c_nationkey, 'building_only' FROM (
  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
  EXCEPT
  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
)
"""


@register(
    "setops_intersect_except",
    _SETOP_ORACLE,
    doc="INTERSECT / EXCEPT set operations (§2.6: absent in the reference)",
    tags=("setop",),
)
def setops_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    building = cust.where(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    machinery = cust.where(F.col("c_mktsegment") == "MACHINERY").select("c_nationkey")
    both = building.intersect(machinery).select(
        F.col("c_nationkey").alias("nationkey"), F.lit("both_segments").alias("tag")
    )
    only = building.subtract(machinery).select(
        F.col("c_nationkey").alias("nationkey"), F.lit("building_only").alias("tag")
    )
    return both.unionByName(only)


_ROLLUP_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n,
       CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register(
    "agg_rollup",
    _ROLLUP_ORACLE,
    doc="ROLLUP hierarchy totals with GROUPING() markers (§2.4: grouping "
    "sets absent in the reference; free in Catalyst)",
    tags=("agg", "rollup"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
        )
        .select(
            "l_returnflag", "l_linestatus", "sum_qty", "n", "g_flag", "g_status"
        )
    )


_DISTINCT_ORACLE = """
SELECT o_orderstatus,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS n_days,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
"""


@register(
    "agg_count_distinct",
    _DISTINCT_ORACLE,
    doc="Exact multi-column COUNT(DISTINCT) per group (expand + two-phase "
    "agg under the hood); approx_count_distinct is the sketch variant "
    "(tested rows-only in pytest — not hash-comparable across engines)",
    tags=("agg", "distinct"),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct(F.col("o_orderdate").cast("date")).alias("n_days"),
        F.count(F.lit(1)).alias("n_orders"),
    )


_PIVOT_ORACLE = """
SELECT c_mktsegment,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


@register(
    "pivot_status_by_segment",
    _PIVOT_ORACLE,
    doc="Pivot (orderstatus → columns) over a join — §2.6 extension; "
    "fixed pivot values keep the schema static for the planner",
    tags=("pivot", "agg", "join"),
)
def pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "c_mktsegment",
            F.coalesce("F", F.lit(0)).alias("status_f"),
            F.coalesce("O", F.lit(0)).alias("status_o"),
            F.coalesce("P", F.lit(0)).alias("status_p"),
        )
    )
