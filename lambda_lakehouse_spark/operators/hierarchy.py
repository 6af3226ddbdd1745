"""Recursive-hierarchy traversal as bounded iterative joins.

Spark has no recursive CTE; the engine expresses transitive traversal
(org charts, BOM explosion, category trees) as a convergence loop of
equi-joins against the edge table — the same iterate-until-fixed-point
mechanism as ``operators.dedup.connected_components`` (min-label
propagation), with ``localCheckpoint`` lineage truncation per round and
a control-plane pending-count as the loop condition. The DuckDB oracle
keeps the declarative ``WITH RECURSIVE`` form, certifying the loop
against real SQL recursion semantics.

Scale: each round is ONE shuffle join keyed on the current node (the
frontier shrinks as rows reach their root); rounds are bounded by the
hierarchy depth, which for any real taxonomy is tiny (≤ tens) and
independent of row count. The demo hierarchy derives edges
arithmetically (parent = child div 10 — a stable synthetic tree over
the part table) but the ENGINE only sees the edge relation: the loop
is pure joins, no closed form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lambda_lakehouse_spark.registry import register
from lambda_lakehouse_spark.sources.readers import read_table

MAX_DEPTH = 20


def flatten_to_roots(nodes: DataFrame, edges: DataFrame,
                     max_depth: int = MAX_DEPTH) -> DataFrame:
    """For each node, walk ``edges`` (child → parent) to its root:
    returns (node, root_key, depth). A node absent from ``edges`` as a
    child is its own root at depth 0. Raises if the walk has not
    converged after ``max_depth`` rounds (cycle or deeper-than-declared
    hierarchy — both bugs worth failing loudly on)."""
    state = nodes.select(
        F.col(nodes.columns[0]).alias("node"),
        F.col(nodes.columns[0]).alias("cur"),
        F.lit(0).alias("depth"),
    )
    for _ in range(max_depth):
        step = (
            state.join(edges, state["cur"] == edges["child"], "left")
            .select(
                "node",
                F.coalesce("parent", "cur").alias("cur"),
                (F.col("depth") + F.when(F.col("parent").isNotNull(), 1)
                 .otherwise(0)).alias("depth"),
                F.col("parent").isNotNull().alias("_moved"),
            )
        )
        step = step.localCheckpoint()  # truncate lineage each round
        moved = step.where("_moved").limit(1).count()  # control-plane
        state = step.drop("_moved")
        if moved == 0:
            return state.select("node", F.col("cur").alias("root_key"), "depth")
    raise RuntimeError(
        f"hierarchy walk did not converge within {max_depth} rounds — "
        "cycle in the edge relation or max_depth too small"
    )


_HIERARCHY_ORACLE = """
WITH RECURSIVE e AS (
  SELECT p_partkey AS child, p_partkey // 10 AS parent
  FROM part WHERE p_partkey >= 10
),
walk AS (
  SELECT p_partkey AS node, p_partkey AS cur, 0 AS depth FROM part
  UNION ALL
  SELECT w.node, e.parent, w.depth + 1 FROM walk w JOIN e ON w.cur = e.child
)
SELECT node AS p_partkey, cur AS root_key, depth
FROM walk WHERE cur NOT IN (SELECT child FROM e)
"""


@register(
    "hierarchy_flatten_iterative",
    _HIERARCHY_ORACLE,
    doc="Transitive hierarchy flattening (node -> root ancestor + "
    "depth) as bounded iterative joins with per-round lineage "
    "truncation — Spark's answer to WITH RECURSIVE, certified "
    "against DuckDB's actual recursive CTE",
    tags=("hierarchy", "iterative", "graph"),
)
def hierarchy_flatten_iterative(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = read_table(spark, sf_dir, "part").select("p_partkey")
    edges = (
        parts.where(F.col("p_partkey") >= 10)
        .select(
            F.col("p_partkey").alias("child"),
            (F.col("p_partkey") / 10).cast("long").alias("parent"),
        )
    )
    out = flatten_to_roots(parts, edges)
    return out.select(F.col("node").alias("p_partkey"), "root_key", "depth")
