"""Relational operator coverage (SURVEY §2.2-§2.7) on the test star schema.

Each query re-expresses a row of the reference operator inventory on
the driver's TPC-H-ish tables (the mapping FIXTURES.md §4 suggests),
declaratively, so Catalyst handles pushdown/pruning/join selection:

- P1-P8 projections, computed columns, conjunctive/disjunctive/
  membership predicates (``vn_stg_processing.py:64-123`` idioms)
- J1-J4 left equi joins incl. expression conditions
  (``fact_stock_daily.py:87-104``), J7 broadcast lookups
  (``dim_currency.py:104-115``)
- A1-A3 group-by min, DISTINCT, subset dedup
  (``dim_company.py:64-79``, ``dim_date.py:60``)
- W1-W3 lag / running sum / lead (``dim_company.py:67-83``)
- §2.6 union-by-name with schema alignment
  (``preprocessing.ipynb cell 23``); top-k per group
- §2.7 scalar census: clean-cast kit, sha2 fingerprints, calendar
  functions, when/otherwise chains

Scale notes are inline per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from lambda_lakehouse_spark.functions.scalar import (
    as_double_clean,
    as_long_clean,
    date_sk,
    davg,
    dsum,
    norm_sym,
    sk_sha256,
)
from lambda_lakehouse_spark.operators.align import align_to_contract, union_by_name
from lambda_lakehouse_spark.registry import register
from lambda_lakehouse_spark.sources.readers import read_table


# ---------------------------------------------------------------------------
# Aggregation pipeline (TPC-H Q1 shape) — A-aggs + filter pushdown
# ---------------------------------------------------------------------------

_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register(
    "q1_pricing_summary",
    _Q1_ORACLE,
    doc="TPC-H Q1 shape: filter→hash agg, map-side partial agg, 8 measures",
    tags=("agg", "filter"),
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Narrow scan: only 7 columns read (column pruning) and the
    # shipdate predicate reaches the parquet reader (PushedFilters).
    # Partial aggregation happens map-side; the shuffle carries only
    # |groups| × measures, invariant to input scale.
    li = read_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Top-k join pipeline (TPC-H Q3 shape)
# ---------------------------------------------------------------------------

_Q3_ORACLE = """
SELECT
  l_orderkey,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
  o_orderdate,
  o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register(
    "q3_shipping_priority",
    _Q3_ORACLE,
    doc="TPC-H Q3 shape: selective joins → agg → deterministic top-k",
    tags=("join", "agg", "topk"),
    bench=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # orders and customer grow with SF, so no broadcast hints here —
    # AQE picks BHJ when a filtered side fits the threshold and falls
    # back to shuffle join when it doesn't. Top-k is a
    # TakeOrderedAndProject — no full sort at scale. Tie-break on
    # unique l_orderkey keeps the k-set deterministic for the oracle.
    cutoff = F.lit("1998-03-15").cast("timestamp")
    cust = read_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = read_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = read_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Multi-join revenue rollup (TPC-H Q5 shape) — J-chain + broadcast dims
# ---------------------------------------------------------------------------

_Q5_ORACLE = """
SELECT
  n_name,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


@register(
    "q5_nation_revenue",
    _Q5_ORACLE,
    doc="TPC-H Q5 shape: 4-join star chain, all dims broadcast, single shuffle",
    tags=("join", "agg", "broadcast"),
    bench=True,
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Star-join: every dimension side broadcasts, so the only wide
    # exchange is the final groupBy on n_name — at 100 TB the fact
    # table streams through map-side joins without repartitioning.
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# J1-J4: left equi joins, incl. expression conditions and null-safe semantics
# ---------------------------------------------------------------------------

_LEFT_ENRICH_ORACLE = """
SELECT
  o_orderkey,
  o_totalprice,
  o_orderstatus,
  c_name,
  c_mktsegment,
  n_name,
  r_name
FROM orders
LEFT JOIN customer ON o_custkey = c_custkey
LEFT JOIN nation   ON c_nationkey = n_nationkey
LEFT JOIN region   ON n_regionkey = r_regionkey AND c_mktsegment <> 'MACHINERY'
WHERE o_totalprice > 1000.0
"""


@register(
    "join_left_enrich",
    _LEFT_ENRICH_ORACLE,
    doc="J1-J4: chained left equi joins with an expression condition "
    "(fact_stock_daily.py:87-104 idiom)",
    tags=("join",),
)
def join_left_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Left joins preserve the fact side; the J2-style expression
    # condition (extra non-equi predicate on the join) stays an equi
    # join for planning — the predicate rides along as a join filter.
    orders = read_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 1000.0)
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    j = (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey, "left")
        .join(
            F.broadcast(region),
            (nation.n_regionkey == region.r_regionkey)
            & (cust.c_mktsegment != "MACHINERY"),
            "left",
        )
    )
    return j.select(
        "o_orderkey", "o_totalprice", "o_orderstatus",
        "c_name", "c_mktsegment", "n_name", "r_name",
    )


# ---------------------------------------------------------------------------
# J7: broadcast dimension lookup + rollup
# ---------------------------------------------------------------------------

_BCAST_ORACLE = """
SELECT
  r_name,
  COUNT(*) AS n_customers,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


@register(
    "join_broadcast_lookup",
    _BCAST_ORACLE,
    doc="J7: explicit broadcast lookup joins (dim_currency.py:104-115 idiom)",
    tags=("join", "broadcast", "agg"),
)
def join_broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("total_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# A1-A3: group-by min, DISTINCT, deterministic subset dedup
# ---------------------------------------------------------------------------

_A1_ORACLE = """
SELECT l_orderkey,
       MIN(l_shipdate) AS first_ship,
       MAX(l_shipdate) AS last_ship,
       COUNT(*) AS n_lines
FROM lineitem
GROUP BY l_orderkey
"""


@register(
    "agg_group_min",
    _A1_ORACLE,
    doc="A1: groupBy().agg(min/max/count) (dim_company.py:76-79 idiom)",
    tags=("agg",),
)
def agg_group_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
        F.count(F.lit(1)).alias("n_lines"),
    )


_A2_ORACLE = """
SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
"""


@register(
    "agg_distinct_domain",
    _A2_ORACLE,
    doc="A2: DISTINCT for dim key domains (dim_date.py:60-62 idiom)",
    tags=("agg",),
)
def agg_distinct_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()


_A3_ORACLE = """
SELECT l_orderkey, l_partkey, l_linenumber, l_quantity
FROM (
  SELECT l_orderkey, l_partkey, l_linenumber, l_quantity,
         ROW_NUMBER() OVER (PARTITION BY l_orderkey, l_partkey
                            ORDER BY l_linenumber, l_quantity) AS rn
  FROM lineitem
) WHERE rn = 1
"""


@register(
    "dedup_subset_keys",
    _A3_ORACLE,
    doc="A3: subset dedup (dropDuplicates semantics made deterministic via "
    "row_number over a total order — dim_company.py:64 idiom)",
    tags=("agg", "window", "dedup"),
)
def dedup_subset_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    # dropDuplicates() keeps an arbitrary row per key — fine when rows
    # are duplicates, nondeterministic otherwise. The engine's dedup
    # uses an explicit total order so re-runs (and the oracle) agree.
    li = read_table(spark, sf_dir, "lineitem")
    # order on every carried column — (orderkey, partkey, linenumber)
    # alone is not unique in the data, and a non-total order makes the
    # kept row nondeterministic.
    w = W.partitionBy("l_orderkey", "l_partkey").orderBy("l_linenumber", "l_quantity")
    return (
        li.select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# P1-P8: projection / computed columns / predicate census
# ---------------------------------------------------------------------------

_FILTER_ORACLE = """
SELECT
  o_orderkey,
  o_orderstatus,
  o_orderpriority,
  o_totalprice,
  CASE WHEN o_totalprice >= 200000.0 THEN 'jumbo'
       WHEN o_totalprice >= 50000.0 THEN 'large'
       ELSE 'standard' END AS size_class,
  CAST(o_totalprice >= 200000.0 AS BOOLEAN) AS is_jumbo
FROM orders
WHERE o_custkey IS NOT NULL
  AND (o_orderstatus = 'F' OR o_orderpriority IN ('1-URGENT', '2-HIGH'))
  AND o_totalprice > 0.0
"""


@register(
    "project_filter_flags",
    _FILTER_ORACLE,
    doc="P1-P8: fixed projection, when/otherwise chains, conjunctive + "
    "disjunctive + membership predicates (vn_stg_processing.py idioms)",
    tags=("filter", "project"),
)
def project_filter_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.where(
            F.col("o_custkey").isNotNull()
            & (
                (F.col("o_orderstatus") == "F")
                | F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            )
            & (F.col("o_totalprice") > 0.0)
        )
        .withColumn(
            "size_class",
            F.when(F.col("o_totalprice") >= 200000.0, "jumbo")
            .when(F.col("o_totalprice") >= 50000.0, "large")
            .otherwise("standard"),
        )
        .withColumn("is_jumbo", F.col("o_totalprice") >= 200000.0)
        .select(
            "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice",
            "size_class", "is_jumbo",
        )
    )


# ---------------------------------------------------------------------------
# P9 + §2.6: schema-align to a fixed contract + union-by-name
# ---------------------------------------------------------------------------

_ALIGN_CONTRACT = [
    ("cust_id", "bigint"),
    ("cust_name", "string"),
    ("nation_id", "int"),
    ("acctbal", "double"),
    ("segment", "string"),
    ("country_code", "string"),
]

_ALIGN_ORACLE = """
SELECT c_custkey AS cust_id, c_name AS cust_name, c_nationkey AS nation_id,
       c_acctbal AS acctbal, CAST(NULL AS VARCHAR) AS segment,
       'EVEN' AS country_code
FROM customer WHERE c_nationkey % 2 = 0
UNION ALL
SELECT c_custkey, c_name, c_nationkey,
       CAST(NULL AS DOUBLE), c_mktsegment, 'ODD'
FROM customer WHERE c_nationkey % 2 = 1
"""


@register(
    "schema_align_union",
    _ALIGN_ORACLE,
    doc="P9 + union: align heterogeneous inputs to a 6-col contract with "
    "typed-null padding, then unionByName (format_stg init_spark.py:115-143 "
    "+ preprocessing.ipynb cell 23)",
    tags=("project", "union"),
)
def schema_align_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    # Two country feeds with different column subsets, like vn/us/jp raw.
    even = (
        cust.where(F.col("c_nationkey") % 2 == 0)
        .select(
            F.col("c_custkey").alias("cust_id"),
            F.col("c_name").alias("cust_name"),
            F.col("c_nationkey").alias("nation_id"),
            F.col("c_acctbal").alias("acctbal"),
            F.lit("EVEN").alias("country_code"),
        )
    )
    odd = (
        cust.where(F.col("c_nationkey") % 2 == 1)
        .select(
            F.col("c_custkey").alias("cust_id"),
            F.col("c_name").alias("cust_name"),
            F.col("c_nationkey").alias("nation_id"),
            F.col("c_mktsegment").alias("segment"),
            F.lit("ODD").alias("country_code"),
        )
    )
    aligned = [align_to_contract(df, _ALIGN_CONTRACT) for df in (even, odd)]
    return union_by_name(aligned)


# ---------------------------------------------------------------------------
# W1-W3 + running aggregates over an ordered partition
# ---------------------------------------------------------------------------

_WINDOW_ORACLE = """
SELECT
  event_id, user_id, event_type, value,
  CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn,
  LAG(value)  OVER w AS prev_value,
  LEAD(value) OVER w AS next_value,
  CAST(SUM(CAST(value AS DECIMAL(28,6)))
       OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
    AS running_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@register(
    "window_lag_lead_running",
    _WINDOW_ORACLE,
    doc="W1-W3: lag / lead / running sum / row_number per entity ordered by "
    "time (dim_company.py:67-83 SCD2 trio, generalized)",
    tags=("window",),
)
def window_lag_lead_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    # Unique (ts, event_id) total order → deterministic lag/lead and a
    # sequential (hence engine-identical) running decimal sum.
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return ev.select(
        "event_id", "user_id", "event_type", "value",
        F.row_number().over(w).alias("rn"),
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.sum(F.col("value").cast("decimal(28,6)")).over(wsum).cast("double").alias("running_value"),
    )


_TOPK_ORACLE = """
SELECT c_custkey, o_orderkey, o_totalprice, rk
FROM (
  SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey)
              AS INTEGER) AS rk
  FROM orders
) WHERE rk <= 3
"""


@register(
    "window_topk_per_group",
    _TOPK_ORACLE,
    doc="Top-k per group via ranked window (§2.6 top-k; deterministic "
    "tie-break on unique key)",
    tags=("window", "topk"),
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    w = W.partitionBy("c_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        orders.select(
            F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice"
        )
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
    )


# ---------------------------------------------------------------------------
# §2.7 scalar census: clean-cast kit, fingerprints / surrogate keys, calendar
# ---------------------------------------------------------------------------

_CLEAN_ORACLE = """
SELECT
  p_partkey,
  UPPER(TRIM(p_brand)) AS brand_norm,
  CAST(REGEXP_REPLACE('$' || CAST(p_size AS VARCHAR) || ',000 units',
                      '[^0-9\\.\\-]', '', 'g') AS BIGINT) AS size_clean,
  CAST(REGEXP_REPLACE('US$ ' || CAST(p_size AS VARCHAR) || '.50 approx',
                      '[^0-9\\.\\-]', '', 'g') AS DOUBLE) AS price_clean,
  COALESCE(NULLIF(p_type, 'ECONOMY'), 'STANDARD-FALLBACK') AS type_or_default
FROM part
"""


@register(
    "scalar_clean_cast",
    _CLEAN_ORACLE,
    doc="§2.7 string kit: norm_sym, as_long_clean, as_double_clean on dirty "
    "numerics, coalesce fallback (init_spark.py:38-44)",
    tags=("scalar",),
)
def scalar_clean_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part")
    dirty_long = F.concat(F.lit("$"), F.col("p_size").cast("string"), F.lit(",000 units"))
    dirty_double = F.concat(F.lit("US$ "), F.col("p_size").cast("string"), F.lit(".50 approx"))
    return part.select(
        "p_partkey",
        norm_sym("p_brand").alias("brand_norm"),
        as_long_clean(dirty_long).alias("size_clean"),
        as_double_clean(dirty_double).alias("price_clean"),
        F.coalesce(
            F.nullif(F.col("p_type"), F.lit("ECONOMY")), F.lit("STANDARD-FALLBACK")
        ).alias("type_or_default"),
    )


_SK_ORACLE = """
SELECT
  s_suppkey,
  sha256(s_name || '||' || CAST(s_nationkey AS VARCHAR)) AS supplier_fp,
  md5(CONCAT_WS(':', s_name, CAST(s_nationkey AS VARCHAR))) AS supplier_md5
FROM supplier
"""


@register(
    "scalar_surrogate_keys",
    _SK_ORACLE,
    doc="§2.7 hashing: sha2/md5 fingerprints over concat_ws'd natural keys "
    "(dim_company.py:63,98-99 — crc32 variant kept library-side for parity, "
    "oracle-checked in unit tests via zlib)",
    tags=("scalar", "hash"),
)
def scalar_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = read_table(spark, sf_dir, "supplier")
    return supp.select(
        "s_suppkey",
        sk_sha256("s_name", F.col("s_nationkey").cast("string")).alias("supplier_fp"),
        F.md5(
            F.concat_ws(":", F.col("s_name"), F.col("s_nationkey").cast("string"))
        ).alias("supplier_md5"),
    )


_CALENDAR_ORACLE = """
SELECT DISTINCT
  CAST(STRFTIME(o_orderdate, '%Y%m%d') AS INTEGER) AS date_sk,
  CAST(o_orderdate AS DATE) AS date,
  CAST(YEAR(o_orderdate) AS INTEGER) AS year,
  CAST(QUARTER(o_orderdate) AS INTEGER) AS quarter,
  CAST(MONTH(o_orderdate) AS INTEGER) AS month,
  CAST(DAY(o_orderdate) AS INTEGER) AS day,
  CAST(WEEKOFYEAR(o_orderdate) AS INTEGER) AS week_of_year,
  CAST(DAYOFWEEK(o_orderdate) + 1 AS INTEGER) AS day_of_week,
  (DAYOFWEEK(o_orderdate) + 1) IN (1, 7) AS is_weekend
FROM orders
"""


@register(
    "calendar_dim_date",
    _CALENDAR_ORACLE,
    doc="§2.7 date kit + A2: dim_date build — date_sk smart key, calendar "
    "parts, weekend flag (dim_date.py:60-72)",
    tags=("scalar", "date", "dim"),
)
def calendar_dim_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        date_sk(d).alias("date_sk"),
        d.cast("date").alias("date"),
        F.year(d).alias("year"),
        F.quarter(d).alias("quarter"),
        F.month(d).alias("month"),
        F.dayofmonth(d).alias("day"),
        F.weekofyear(d).alias("week_of_year"),
        F.dayofweek(d).alias("day_of_week"),
        F.dayofweek(d).isin(1, 7).alias("is_weekend"),
    ).distinct()


# ---------------------------------------------------------------------------
# TPC-H Q4 shape — EXISTS-filtered priority census
# ---------------------------------------------------------------------------

_Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


@register(
    "q4_late_orders",
    _Q4_ORACLE,
    doc="TPC-H Q4 shape: correlated EXISTS (orders with a line shipped "
    ">60 days after order date) decorrelated to a left-semi join on the "
    "order key — one shuffle, no per-row subquery",
    tags=("join", "semi", "agg", "subquery"),
)
def q4_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


# ---------------------------------------------------------------------------
# TPC-H Q7 shape — bilateral nation trade volume by year
# ---------------------------------------------------------------------------

_Q7_ORACLE = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS ship_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey  = l_suppkey
JOIN customer ON c_custkey  = o_custkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
"""


@register(
    "q7_nation_trade",
    _Q7_ORACLE,
    doc="TPC-H Q7 shape: 5-way join with a disjunctive cross-table "
    "predicate, yearly rollup — nation dims broadcast, the disjunction "
    "evaluated post-join (it references both sides)",
    tags=("join", "agg", "broadcast"),
)
def q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    supp = read_table(spark, sf_dir, "supplier")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nk") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("c_nk") == F.col("c_nationkey"))
        .where(pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 shape — large-volume orders via IN + HAVING
# ---------------------------------------------------------------------------

_Q18_ORACLE = """
SELECT c_name, o_orderkey, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(28,6))) > 180
)
GROUP BY 1, 2, 3
"""


@register(
    "q18_large_volume",
    _Q18_ORACLE,
    doc="TPC-H Q18 shape: IN-subquery over a grouped HAVING, expressed as "
    "a semi join against the aggregated key set — the aggregation runs "
    "once, not per outer row",
    tags=("join", "semi", "agg", "subquery"),
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,6)")).alias("q"))
        .where(F.col("q") > 180)
        .select("l_orderkey")
    )
    return (
        orders.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_name", "o_orderkey", "o_totalprice")
        .agg(dsum("l_quantity").alias("sum_qty"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q14 shape — promo revenue share (ratio of conditional aggregates)
# ---------------------------------------------------------------------------

_Q14_ORACLE = """
SELECT
  CAST(100.0 AS DOUBLE) *
    CAST(SUM(CAST(CASE WHEN p_type LIKE 'PROMO%'
                       THEN l_extendedprice * (1 - l_discount) ELSE 0 END
             AS DECIMAL(28,6))) AS DOUBLE)
    / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
    AS promo_revenue_pct,
  COUNT(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
"""


@register(
    "q14_promo_revenue",
    _Q14_ORACLE,
    doc="TPC-H Q14 shape: ratio of conditional aggregate to total over a "
    "selective join — part broadcasts, the month filter reaches the "
    "lineitem scan, both sums share one aggregation pass",
    tags=("join", "agg", "broadcast"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    part = read_table(spark, sf_dir, "part")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            (
                F.lit(100.0)
                * dsum(F.when(F.col("p_type").like("PROMO%"), net).otherwise(F.lit(0.0)))
                / dsum(net)
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q19 shape — disjunctive multi-attribute join predicate
# ---------------------------------------------------------------------------

_Q19_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
"""


@register(
    "q19_disjunctive_join",
    _Q19_ORACLE,
    doc="TPC-H Q19 shape: OR-of-ANDs predicate spanning both join sides — "
    "Catalyst extracts the common equi key (p_partkey=l_partkey) for the "
    "hash join and evaluates the disjunction as a post-join filter, with "
    "single-side conjuncts (brand/size, quantity) pushed below the join",
    tags=("join", "filter", "disjunction"),
)
def q19_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & q.between(10, 35))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & q.between(20, 50))
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q15 shape — top supplier via scalar-subquery max
# ---------------------------------------------------------------------------

_Q15_ORACLE = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN rev ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
"""


@register(
    "q15_top_supplier",
    _Q15_ORACLE,
    doc="TPC-H Q15 shape: supplier(s) with the quarter's maximum revenue "
    "— the scalar-subquery-equals-MAX pattern, decorrelated to a 1-row "
    "broadcast MAX aggregate joined back over the per-supplier revenue "
    "relation so the fact table is scanned once and nothing is "
    "single-partition sorted",
    tags=("agg", "subquery", "window", "join"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    supp = read_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    # the scalar MAX as a 1-row broadcast aggregate (supplier relation is
    # sf-proportional — an unpartitioned window max would single-task it)
    mx = rev.agg(F.max("total_revenue").alias("_max"))
    top = rev.crossJoin(F.broadcast(mx)).where(
        F.col("total_revenue") == F.col("_max")
    )
    return (
        supp.join(F.broadcast(top), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )
