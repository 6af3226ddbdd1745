"""Similarity search over embedding columns (beyond-reference).

Approximate-nearest-neighbor building blocks over an
``array<float>`` column:

- ``ann_cosine_topk_brute`` — exact cosine top-k, expressed as the
  *inverted* (position-exploded) formulation: embeddings explode to
  (vec_id, pos, val) rows, dot products become a position-equi join +
  groupBy sum. Two properties make this the right shape:
  (1) cross-engine exactness — sums go through decimal so the score is
  bit-identical on any engine (sum order can't perturb ranks);
  (2) scale — the shuffle key is the position (64-way data-parallel),
  queries broadcast, and no array UDF enters the row path.
- ``ann_cosine_topk_ivf`` — the scale path: candidates restricted to
  the query's coarse cell (here the ``label`` column stands in for an
  IVF/k-means cell id), cutting the candidate set by the cell count.
  Same exact scoring inside the cell.

At 100 TB (billions of vectors) the brute-force variant is the
per-cell scorer inside IVF, and cells come from a trained coarse
quantizer; the plumbing (broadcast queries, decimal-exact partial
sums, row_number top-k) is identical.

Measured alternative (rejected): the ``zip_with`` + ``aggregate``
array dot product — identical values, but ~5× slower at sf0.1
(higher-order-function lambdas evaluate interpreted, outside
whole-stage codegen, while the position-explode + hash-agg pipeline
stays fully codegen'd). If Spark ever compiles HOF lambdas this is
worth re-measuring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from lambda_lakehouse_spark.registry import register
from lambda_lakehouse_spark.sources.readers import read_table

# Dot products are summed as floor-scaled integers: each double product
# is floored at 1e-15 resolution (exact — |product·1e15| < 2^53) and
# integer-summed, which is order-independent AND identical across
# engines by construction (double→decimal cast rounding is not: Spark
# rounds the exact binary expansion, DuckDB rounds in double space —
# they differ by 1 ulp on ~5% of values).
SCALE = int(1e15)
N_QUERIES = 10
TOP_K = 5


def _scaled_sum(prod):
    from pyspark.sql import functions as F  # local alias for clarity

    return F.sum(F.floor(prod * F.lit(float(SCALE))).cast("bigint")).cast(
        "double"
    ) / SCALE


def _flat(emb: DataFrame) -> DataFrame:
    """(vec_id, label, pos, val) with 1-based pos, values as double."""
    return emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos0", "valf"),
    ).select(
        "vec_id",
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.col("valf").cast("double").alias("val"),
    )


def cosine_topk(
    emb: DataFrame,
    query_filter,
    k: int = TOP_K,
    same_label_only: bool = False,
) -> DataFrame:
    flat = _flat(emb)
    norms = flat.groupBy("vec_id").agg(
        _scaled_sum(F.col("val") * F.col("val")).alias("n2")
    )
    q = flat.where(query_filter).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("pos").alias("q_pos"),
        F.col("val").alias("qval"),
    )
    j = flat.join(F.broadcast(q), F.col("pos") == F.col("q_pos"))
    j = j.where(F.col("vec_id") != F.col("query_id"))
    if same_label_only:
        j = j.where(F.col("label") == F.col("q_label"))
    dots = j.groupBy("query_id", "vec_id").agg(
        _scaled_sum(F.col("qval") * F.col("val")).alias("dot")
    )
    nq = norms.select(F.col("vec_id").alias("query_id"), F.col("n2").alias("qn2"))
    nc = norms.select(F.col("vec_id").alias("neighbor_id"), F.col("n2").alias("cn2"))
    scored = (
        dots.withColumnRenamed("vec_id", "neighbor_id")
        # nq is one row per query (bounded) → broadcast; nc is one row
        # per candidate vector (corpus-sized) → no hint, AQE decides.
        .join(F.broadcast(nq), "query_id")
        .join(nc, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (F.col("dot") / F.sqrt(F.col("qn2") * F.col("cn2"))).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )


def _brute_oracle(same_label: bool, k: int) -> str:
    label_cond = "AND c.label = q.label" if same_label else ""
    return f"""
WITH flat AS (
  SELECT vec_id, label, pos, CAST(embedding[pos] AS DOUBLE) AS val
  FROM embeddings, (SELECT unnest(range(1, 65)) AS pos)
),
norms AS (
  SELECT vec_id,
         CAST(SUM(CAST(FLOOR(val * val * 1e15) AS BIGINT)) AS DOUBLE) / 1e15 AS n2
  FROM flat GROUP BY vec_id
),
dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(SUM(CAST(FLOOR(q.val * c.val * 1e15) AS BIGINT)) AS DOUBLE) / 1e15 AS dot
  FROM flat q
  JOIN flat c ON q.pos = c.pos AND c.vec_id <> q.vec_id {label_cond}
  WHERE q.vec_id < {N_QUERIES}
  GROUP BY 1, 2
),
scored AS (
  SELECT query_id, neighbor_id, dot / sqrt(nq.n2 * nc.n2) AS cos_sim
  FROM dots
  JOIN norms nq ON nq.vec_id = query_id
  JOIN norms nc ON nc.vec_id = neighbor_id
)
SELECT query_id, neighbor_id, cos_sim, rk
FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS rk
  FROM scored
)
WHERE rk <= {k}
"""


@register(
    "ann_cosine_topk_brute",
    _brute_oracle(False, TOP_K),
    doc="Exact cosine top-k (brute force) via position-exploded join + "
    "decimal-exact sums — scores bit-identical cross-engine, ranks stable",
    tags=("similarity", "vector"),
    bench=True,
)
def ann_cosine_topk_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    return cosine_topk(emb, F.col("vec_id") < N_QUERIES)


# Near-dup threshold tuned to the synthetic testdata (random-ish
# vectors, max within-label cosine ≈ 0.45); real embedding corpora use
# ~0.95. Pairs are restricted to the same coarse cell (label) — the
# blocked formulation that keeps the pair count sub-quadratic at scale.
NEAR_DUP_COS = 0.30


def _near_dup_oracle(threshold: float) -> str:
    return f"""
WITH flat AS (
  SELECT vec_id, label, pos, CAST(embedding[pos] AS DOUBLE) AS val
  FROM embeddings, (SELECT unnest(range(1, 65)) AS pos)
),
norms AS (
  SELECT vec_id,
         CAST(SUM(CAST(FLOOR(val * val * 1e15) AS BIGINT)) AS DOUBLE) / 1e15 AS n2
  FROM flat GROUP BY vec_id
),
dots AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         CAST(SUM(CAST(FLOOR(a.val * b.val * 1e15) AS BIGINT)) AS DOUBLE) / 1e15 AS dot
  FROM flat a
  JOIN flat b ON a.pos = b.pos AND a.label = b.label AND a.vec_id < b.vec_id
  GROUP BY 1, 2
)
SELECT vec_a, vec_b, dot / sqrt(na.n2 * nb.n2) AS cos_sim
FROM dots
JOIN norms na ON na.vec_id = vec_a
JOIN norms nb ON nb.vec_id = vec_b
WHERE dot / sqrt(na.n2 * nb.n2) >= {threshold}
"""


@register(
    "dedup_embedding_cosine",
    _near_dup_oracle(NEAR_DUP_COS),
    doc="Embedding-cosine near-dup pairs, blocked by coarse cell (label): "
    "all within-cell pairs above the cosine threshold — completes the "
    "dedup family (exact / MinHash-LSH / SimHash / Jaccard / embedding)",
    tags=("dedup", "similarity", "vector"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    flat = _flat(emb)
    a = flat.select(
        F.col("label"), F.col("pos"),
        F.col("vec_id").alias("vec_a"), F.col("val").alias("val_a"),
    )
    b = flat.select(
        F.col("label"), F.col("pos"),
        F.col("vec_id").alias("vec_b"), F.col("val").alias("val_b"),
    )
    dots = (
        a.join(b, ["label", "pos"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .groupBy("vec_a", "vec_b")
        .agg(_scaled_sum(F.col("val_a") * F.col("val_b")).alias("dot"))
    )
    norms = flat.groupBy("vec_id").agg(
        _scaled_sum(F.col("val") * F.col("val")).alias("n2")
    )
    na = norms.select(F.col("vec_id").alias("vec_a"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("vec_id").alias("vec_b"), F.col("n2").alias("nb2"))
    # na/nb hold one norm per vector — corpus-sized, so no broadcast
    # hint; at billions of vectors these must be shuffle-joinable.
    return (
        dots.join(na, "vec_a")
        .join(nb, "vec_b")
        .select(
            "vec_a", "vec_b",
            (F.col("dot") / F.sqrt(F.col("na2") * F.col("nb2"))).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= NEAR_DUP_COS)
    )


@register(
    "ann_cosine_topk_ivf",
    _brute_oracle(True, 3),
    doc="IVF-style ANN: candidates pruned to the query's coarse cell "
    "(label = cell id), exact cosine inside the cell — the 100 TB scale path",
    tags=("similarity", "vector", "ivf"),
)
def ann_cosine_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    return cosine_topk(emb, F.col("vec_id") < N_QUERIES, k=3, same_label_only=True)
