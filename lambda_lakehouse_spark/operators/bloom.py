"""Bloom-filter semi-join pruning — the shuffle-free fact-table
pre-filter.

At 100 TB the classic "filter the fact by a filtered dimension" plan
either broadcasts the dimension keys (fine until the key set grows
past executor memory) or shuffles the fact (never fine). The Bloom
pattern broadcasts a FIXED-SIZE bit set instead: k hash positions per
dimension key, the fact keeps only rows whose k positions all hit,
and the (cheap, now tiny) exact semi-join runs on the survivors.
Spark's own runtime row-level filtering
(spark.sql.optimizer.runtime.bloomFilter.enabled) does this invisibly
for equi-joins; this operator materializes the same idea as an
explicit, certifiable relational plan — useful when the probe side is
reused across queries (build once, prune many).

Implementation is pure DataFrame ops: the bit set is a DISTINCT
relation of integer positions (bounded by M_BITS BY CONSTRUCTION —
never by data size), membership is k broadcast hash semi-joins (no
array scans, no UDFs), and md5-derived positions are engine-portable
so the false-positive set itself is deterministic and the DuckDB
oracle reproduces it bit-for-bit.

The certified query reports the accounting a pruning layer needs:
dimension keys, fact rows, Bloom candidates, exact matches, and false
positives (candidates − matches; Bloom filters never produce false
negatives, which the oracle equality implicitly proves).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lambda_lakehouse_spark.registry import register
from lambda_lakehouse_spark.sources.readers import read_table

M_BITS = 131072  # bit-set size: fixed broadcast cost (~1 MB of int64
                 # positions worst-case) regardless of data scale
K_HASHES = 3


def _pos(key, i: int):
    """Hash position i of a key: first 8 md5 hex chars of 'i:key',
    mod M_BITS — identical construction on both engines."""
    h = F.md5(F.concat(F.lit(f"{i}:"), key.cast("string")))
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % M_BITS
    )


def bloom_build(keys: DataFrame, key_col: str) -> DataFrame:
    """Bit-set relation (pos) from a key relation — ≤ M_BITS rows."""
    cols = [_pos(F.col(key_col), i).alias("pos") for i in range(1, K_HASHES + 1)]
    return (
        keys.select(F.explode(F.array(*cols)).alias("pos")).distinct()
    )


def bloom_prune(fact: DataFrame, key_col: str, bits: DataFrame) -> DataFrame:
    """Keep fact rows whose K_HASHES positions all hit the bit set —
    k broadcast semi-joins, zero shuffle of the fact."""
    out = fact
    for i in range(1, K_HASHES + 1):
        out = out.withColumn(f"_p{i}", _pos(F.col(key_col), i)).join(
            F.broadcast(bits.withColumnRenamed("pos", f"_p{i}")),
            f"_p{i}",
            "left_semi",
        )
    return out.drop(*[f"_p{i}" for i in range(1, K_HASHES + 1)])


def _oracle_pos(key_sql: str, i: int) -> str:
    return f"('0x' || substr(md5('{i}:' || {key_sql}), 1, 8))::BIGINT % {M_BITS}"


_BLOOM_ORACLE = f"""
WITH dim AS (
  SELECT DISTINCT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
),
bits AS (
  SELECT DISTINCT pos FROM (
    SELECT {_oracle_pos('c_custkey', 1)} AS pos FROM dim
    UNION
    SELECT {_oracle_pos('c_custkey', 2)} AS pos FROM dim
    UNION
    SELECT {_oracle_pos('c_custkey', 3)} AS pos FROM dim
  )
),
cand AS (
  SELECT o_orderkey FROM orders
  WHERE {_oracle_pos('o_custkey', 1)} IN (SELECT pos FROM bits)
    AND {_oracle_pos('o_custkey', 2)} IN (SELECT pos FROM bits)
    AND {_oracle_pos('o_custkey', 3)} IN (SELECT pos FROM bits)
),
truth AS (
  SELECT o_orderkey FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM dim)
)
SELECT (SELECT COUNT(*) FROM dim) AS n_dim_keys,
       (SELECT COUNT(*) FROM orders) AS n_fact,
       (SELECT COUNT(*) FROM cand) AS n_candidates,
       (SELECT COUNT(*) FROM truth) AS n_true,
       (SELECT COUNT(*) FROM cand) - (SELECT COUNT(*) FROM truth)
         AS n_false_positives
"""


@register(
    "bloom_semijoin_prune",
    _BLOOM_ORACLE,
    doc="Explicit Bloom-filter fact pruning: bounded (≤M_BITS rows) "
    "bit-set relation broadcast as k hash semi-joins — fixed broadcast "
    "cost at any dimension size, no fact shuffle; certifies the exact "
    "candidate/match/false-positive accounting against DuckDB",
    tags=("join", "bloom", "semi", "pruning"),
)
def bloom_semijoin_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    dim = (
        read_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .distinct()
    )
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    bits = bloom_build(dim, "c_custkey")
    cand = bloom_prune(orders, "o_custkey", bits)
    truth = orders.join(
        dim.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", "left_semi"
    )
    counts = (
        dim.agg(F.count(F.lit(1)).alias("n_dim_keys"))
        .crossJoin(orders.agg(F.count(F.lit(1)).alias("n_fact")))
        .crossJoin(cand.agg(F.count(F.lit(1)).alias("n_candidates")))
        .crossJoin(truth.agg(F.count(F.lit(1)).alias("n_true")))
    )
    return counts.select(
        "n_dim_keys",
        "n_fact",
        "n_candidates",
        "n_true",
        (F.col("n_candidates") - F.col("n_true")).alias("n_false_positives"),
    )
