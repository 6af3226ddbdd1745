"""Graph ranking: fixed-iteration PageRank as a pure DataFrame plan.

The reference has no graph operators; a lakehouse feeding training
pipelines wants at least the classic link-analysis primitive (seed
weighting, source-authority scoring). Implemented Spark-first: the
edge relation is a DataFrame, each PageRank iteration is a
join + aggregate, and a FIXED iteration count keeps the whole thing a
single declarative plan Catalyst can see end-to-end (the open-ended
variant — iterate to convergence with lineage truncation — is the
pattern ``dedup.doc_clusters`` already implements; this operator is
the certification-friendly fixed-step form, and its DuckDB oracle
unrolls the same three iterations as CTEs).

Graph: the bipartite part–supplier relation from lineitem (distinct
(l_partkey, l_suppkey) pairs), made symmetric so every node has both
in- and out-edges — no dangling-mass correction needed, which keeps
the per-iteration arithmetic a clean join + sum.

Cross-engine determinism: per-edge contributions ``r(u)/outdeg(u)``
are quantized to decimal(28,6) before the destination-side SUM, so
the one order-sensitive reduction per iteration is exact; teleport
and damping are fixed-shape double arithmetic mirrored verbatim in
the oracle (all literals CAST to DOUBLE there — DuckDB numeric
literals are DECIMAL-typed and decimal division has engine-specific
scale rules).

Scale: each iteration shuffles once on the join key (src) and once on
the aggregate key (dst) — the canonical distributed PageRank layout;
degree is precomputed and rides the edge relation. At real scale the
edge relation would be bucketed by src so iterations co-locate, and a
convergence loop would localCheckpoint between rounds (both patterns
already proven elsewhere in this repo: bucketed PIT join in
tests/test_scale.py, checkpointed iteration in operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lambda_lakehouse_spark.operators.ranking import global_topk
from lambda_lakehouse_spark.registry import register
from lambda_lakehouse_spark.sources.readers import read_table

_DEC = "decimal(28,6)"

DAMPING = 0.85
TELEPORT = 0.15  # 1 - DAMPING, spelled out so both engines fold the same
N_ITER = 3
TOP_K = 100


def pagerank_fixed(edges: DataFrame, n_iter: int = N_ITER) -> DataFrame:
    """PageRank over a directed edge list (src, dst) for a fixed
    number of iterations. Every node must have ≥1 outgoing edge
    (callers symmetrize; asserted nowhere — documented contract).
    Returns (node, r) with r after ``n_iter`` rounds.

    The degree-annotated edge relation is localCheckpoint-ed once:
    without it every iteration's lineage re-derives the edges from
    the raw fact (scan + distinct per round — measured 3x the total
    query cost at sf0.1); with it iterations join against the settled
    relation — the same lineage-truncation pattern
    ``operators/dedup.doc_clusters`` uses for its min-label rounds."""
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ed = edges.join(deg, "src").localCheckpoint()  # settled (src,dst,outdeg)
    nodes = ed.select(F.col("src").alias("node")).distinct()
    nstats = nodes.agg(F.count(F.lit(1)).alias("n"))
    ranks = nodes.crossJoin(F.broadcast(nstats)).select(
        "node", "n", (F.lit(1.0) / F.col("n")).alias("r")
    )
    for _ in range(n_iter):
        contrib = (
            ranks.join(ed, ranks["node"] == ed["src"])
            .select(
                F.col("dst").alias("node_next"),
                (F.col("r") / F.col("outdeg")).cast(_DEC).alias("c"),
            )
            .groupBy("node_next")
            .agg(F.sum("c").cast("double").alias("s"))
        )
        ranks = (
            contrib.crossJoin(F.broadcast(nstats))
            .select(
                F.col("node_next").alias("node"),
                "n",
                (
                    F.lit(TELEPORT) / F.col("n")
                    + F.lit(DAMPING) * F.col("s")
                ).alias("r"),
            )
        )
    return ranks.select("node", "r")


_PR_EDGE_CTE = """
ep AS (
  SELECT DISTINCT 'p:' || l_partkey AS p, 's:' || l_suppkey AS s
  FROM lineitem
),
edges AS (
  SELECT p AS src, s AS dst FROM ep
  UNION ALL
  SELECT s AS src, p AS dst FROM ep
),
deg AS (
  SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY 1
),
nstats AS (
  SELECT COUNT(*) AS n FROM deg
)
"""


def _pr_iter_cte(prev: str, curr: str) -> str:
    return f"""
{curr} AS (
  SELECT e.dst AS node,
         CAST(0.15 AS DOUBLE) / (SELECT n FROM nstats)
           + CAST(0.85 AS DOUBLE)
             * CAST(SUM(CAST(r.r / d.outdeg AS DECIMAL(28,6))) AS DOUBLE)
           AS r
  FROM {prev} r
  JOIN edges e ON e.src = r.node
  JOIN deg d ON d.src = e.src
  GROUP BY e.dst
)
"""


_PR_ORACLE = (
    "WITH "
    + _PR_EDGE_CTE
    + """,
r0 AS (
  SELECT src AS node, CAST(1.0 AS DOUBLE) / (SELECT n FROM nstats) AS r
  FROM deg
)"""
    + ","
    + _pr_iter_cte("r0", "r1")
    + ","
    + _pr_iter_cte("r1", "r2")
    + ","
    + _pr_iter_cte("r2", "r3")
    + f"""
SELECT rank, node, r
FROM (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY r DESC, node) AS INTEGER) AS rank,
         node, r
  FROM r3
)
WHERE rank <= {TOP_K}
"""
)


@register(
    "graph_pagerank_supply",
    _PR_ORACLE,
    doc="3-iteration PageRank over the symmetrized part–supplier "
    "bipartite graph (distinct lineitem pairs): join+aggregate per "
    "round, per-edge contributions decimal-quantized so the one "
    "order-sensitive SUM per iteration is exact; oracle unrolls the "
    "same three iterations as CTEs. Top-100 by (rank DESC, node).",
    tags=("graph", "pagerank", "iterative", "join"),
    bench=True,
)
def graph_pagerank_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").select(
        F.concat(F.lit("p:"), F.col("l_partkey")).alias("p"),
        F.concat(F.lit("s:"), F.col("l_suppkey")).alias("s"),
    ).distinct()
    edges = li.select(F.col("p").alias("src"), F.col("s").alias("dst")).unionAll(
        li.select(F.col("s").alias("src"), F.col("p").alias("dst"))
    )
    pr = pagerank_fixed(edges)
    # distributed top-k over the node-sized rank relation
    # (TakeOrderedAndProject — operators/ranking.py)
    top = global_topk(pr, [F.col("r").desc(), "node"], TOP_K, "rank")
    return top.select(F.col("rank").cast("int").alias("rank"), "node", "r")
