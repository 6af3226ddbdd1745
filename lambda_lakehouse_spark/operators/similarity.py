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


def _score_topk(dots: DataFrame, nq: DataFrame, nc: DataFrame, k: int) -> DataFrame:
    """Shared scoring tail for the brute and IVF paths (kept single so
    they cannot diverge; the probe-all==brute test relies on this):
    ``dots``=(query_id, neighbor_id, dot), ``nq``=(query_id, qn2)
    bounded → broadcast, ``nc``=(neighbor_id, cn2) corpus-sized → AQE
    decides. Deterministic top-k per query via (cos desc, neighbor)."""
    scored = (
        dots.join(F.broadcast(nq), "query_id")
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
    # Query norms computed from q itself, so nq is bounded by
    # construction (q is the filtered query set) — not by the optimizer
    # propagating the filter through the corpus-sized norms aggregate.
    nq = q.groupBy("query_id").agg(
        _scaled_sum(F.col("qval") * F.col("qval")).alias("qn2")
    )
    nc = norms.select(F.col("vec_id").alias("neighbor_id"), F.col("n2").alias("cn2"))
    return _score_topk(dots.withColumnRenamed("vec_id", "neighbor_id"), nq, nc, k)


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


# --- IVF with a TRAINED coarse quantizer (seeded k-means) -------------
#
# Lloyd's k-means expressed as pure DataFrame ops over the
# position-exploded representation, deterministic end-to-end:
# - init: the N_CELLS vectors with the smallest md5(seed || vec_id)
#   become centroids (seeded, engine-portable);
# - assignment: argmin_c (|c|^2 - 2 x·c) via a pos-equi join against the
#   broadcast centroid table (bounded by construction: N_CELLS × dim
#   rows) + row_number tie-broken on (score, cell);
# - update: per-(cell, pos) mean as floor-scaled-integer sum / count.
# All inner products go through the same decimal-exact _scaled_sum as
# the scorer, so a DuckDB oracle replays training bit-for-bit with the
# iterations unrolled as CTEs. A fixed iteration count (no convergence
# collect) keeps the whole plan a static DAG.
#
# At 100 TB: train on a sample, centroids stay broadcast-sized, the
# assignment pass is one map-side join + agg per vector, and queries
# probe N_PROBE cells so the scorer touches corpus/N_CELLS·N_PROBE
# candidates — the standard IVF trade, with recall@k vs brute asserted
# in tests/test_similarity_ivf.py.

N_CELLS = 8
KMEANS_ITERS = 2
N_PROBE = 2
IVF_K = 3
KMEANS_SEED = "ivf-seed:7"


def _init_centroids(flat: DataFrame, n_cells: int, seed: str) -> DataFrame:
    """(cell, pos, cval): embeddings of the n_cells vectors ranked first
    by md5(seed || vec_id) — deterministic seeded selection, resolved
    with TakeOrdered (no global sort of the corpus)."""
    ranked = (
        flat.select("vec_id")
        .distinct()
        .select(
            "vec_id",
            F.md5(F.concat(F.lit(seed), F.col("vec_id").cast("string"))).alias("h"),
        )
        .orderBy("h", "vec_id")
        .limit(n_cells)
    )
    w = W.orderBy("h", "vec_id")  # bounded: n_cells rows
    seeds_df = ranked.select(
        "vec_id", (F.row_number().over(w) - 1).alias("cell")
    )
    return flat.join(F.broadcast(seeds_df), "vec_id").select(
        "cell", "pos", F.col("val").alias("cval")
    )


def _assign_cells(flat: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, cell, score, rk): cells ranked nearest-first per vector
    by squared L2 distance (score = |c|^2 - 2 x·c; |x|^2 is
    rank-constant)."""
    cn = centroids.groupBy("cell").agg(
        _scaled_sum(F.col("cval") * F.col("cval")).alias("cn2")
    )
    dots = (
        flat.join(F.broadcast(centroids), "pos")
        .groupBy("vec_id", "cell")
        .agg(_scaled_sum(F.col("val") * F.col("cval")).alias("dot"))
    )
    scored = dots.join(F.broadcast(cn), "cell").select(
        "vec_id",
        "cell",
        (F.col("cn2") - F.lit(2.0) * F.col("dot")).alias("score"),
    )
    w = W.partitionBy("vec_id").orderBy("score", "cell")
    return scored.select(
        "vec_id", "cell", "score", F.row_number().over(w).alias("rk")
    )


def _update_centroids(flat: DataFrame, assign: DataFrame) -> DataFrame:
    members = flat.join(
        assign.where(F.col("rk") == 1).select("vec_id", "cell"), "vec_id"
    )
    return members.groupBy("cell", "pos").agg(
        (_scaled_sum(F.col("val")) / F.count(F.lit(1))).alias("cval")
    )


def train_ivf_cells(
    emb: DataFrame,
    n_cells: int = N_CELLS,
    iters: int = KMEANS_ITERS,
    seed: str = KMEANS_SEED,
) -> DataFrame:
    """Trained coarse quantizer: (cell, pos, cval) centroid table,
    bounded by construction at n_cells × dim rows."""
    flat = _flat(emb).select("vec_id", "pos", "val")
    centroids = _init_centroids(flat, n_cells, seed)
    for _ in range(iters):
        assign = _assign_cells(flat, centroids)
        centroids = _update_centroids(flat, assign).localCheckpoint()
    return centroids


def ivf_cosine_topk(
    emb: DataFrame,
    query_filter,
    k: int = IVF_K,
    n_probe: int = N_PROBE,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """ANN top-k: queries probe their n_probe nearest trained cells and
    score exactly against only the vectors assigned there."""
    flat = _flat(emb).select("vec_id", "pos", "val")
    if centroids is None:
        centroids = train_ivf_cells(emb)
    assign = _assign_cells(flat, centroids)
    cells = assign.where(F.col("rk") == 1).select("vec_id", "cell")
    qcells = (
        assign.where(query_filter)
        .where(F.col("rk") <= n_probe)
        .select(F.col("vec_id").alias("query_id"), "cell")
    )
    cand = (
        qcells.join(cells, "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    qf = flat.where(query_filter).select(
        F.col("vec_id").alias("q_id"),
        F.col("pos").alias("q_pos"),
        F.col("val").alias("qval"),
    )
    nf = flat.select(
        F.col("vec_id").alias("neighbor_id"), "pos", F.col("val").alias("nval")
    )
    dots = (
        cand.join(nf, "neighbor_id")
        # queries are bounded (the filtered set × dim) → broadcast
        .join(
            F.broadcast(qf),
            (F.col("query_id") == F.col("q_id")) & (F.col("pos") == F.col("q_pos")),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(_scaled_sum(F.col("qval") * F.col("nval")).alias("dot"))
    )
    norms = flat.groupBy("vec_id").agg(
        _scaled_sum(F.col("val") * F.col("val")).alias("n2")
    )
    nq = qf.groupBy("q_id").agg(
        _scaled_sum(F.col("qval") * F.col("qval")).alias("qn2")
    ).withColumnRenamed("q_id", "query_id")
    nc = norms.select(F.col("vec_id").alias("neighbor_id"), F.col("n2").alias("cn2"))
    return _score_topk(dots, nq, nc, k)


def _ivf_oracle(
    n_cells: int = N_CELLS,
    iters: int = KMEANS_ITERS,
    n_probe: int = N_PROBE,
    k: int = IVF_K,
    seed: str = KMEANS_SEED,
) -> str:
    """DuckDB replay of the trained-IVF query: k-means iterations
    unrolled as CTEs, identical floor-scaled-integer arithmetic."""
    ssum = lambda e: (  # noqa: E731
        f"CAST(SUM(CAST(FLOOR(({e}) * 1e15) AS BIGINT)) AS DOUBLE) / 1e15"
    )
    ctes = [
        "flat AS (SELECT vec_id, pos, CAST(embedding[pos] AS DOUBLE) AS val"
        " FROM embeddings, (SELECT unnest(range(1, 65)) AS pos))",
        f"""seeds AS (
  SELECT vec_id, CAST(rn AS INTEGER) - 1 AS cell FROM (
    SELECT vec_id,
           ROW_NUMBER() OVER (ORDER BY md5('{seed}' || CAST(vec_id AS VARCHAR)), vec_id) AS rn
    FROM (SELECT DISTINCT vec_id FROM flat)
  ) WHERE rn <= {n_cells}
)""",
        "cent0 AS (SELECT s.cell, f.pos, f.val AS cval"
        " FROM flat f JOIN seeds s USING (vec_id))",
    ]
    # one assignment block per round PLUS a final one after the last
    # centroid update (i == iters); emitted from a single template so
    # training-time and query-time assignment cannot desynchronize
    for i in range(iters + 1):
        ctes += [
            f"cn{i} AS (SELECT cell, {ssum('cval * cval')} AS cn2"
            f" FROM cent{i} GROUP BY cell)",
            f"dots{i} AS (SELECT f.vec_id, c.cell, {ssum('f.val * c.cval')} AS dot"
            f" FROM flat f JOIN cent{i} c USING (pos) GROUP BY 1, 2)",
            f"""asg{i} AS (
  SELECT vec_id, cell,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cn2 - 2.0 * dot, cell) AS rk
  FROM dots{i} JOIN cn{i} USING (cell)
)""",
        ]
        if i < iters:
            ctes.append(
                f"cent{i + 1} AS (SELECT a.cell, f.pos,"
                f" {ssum('f.val')} / COUNT(*) AS cval"
                f" FROM flat f JOIN (SELECT vec_id, cell FROM asg{i} WHERE rk = 1) a"
                f" USING (vec_id) GROUP BY 1, 2)"
            )
    i = iters
    ctes += [
        f"cells AS (SELECT vec_id, cell FROM asg{i} WHERE rk = 1)",
        f"qcells AS (SELECT vec_id AS query_id, cell FROM asg{i}"
        f" WHERE rk <= {n_probe} AND vec_id < {N_QUERIES})",
        "cand AS (SELECT q.query_id, v.vec_id AS neighbor_id"
        " FROM qcells q JOIN cells v USING (cell)"
        " WHERE v.vec_id <> q.query_id)",
        f"dotsf AS (SELECT c.query_id, c.neighbor_id, {ssum('qf.val * nf.val')} AS dot"
        " FROM cand c"
        " JOIN flat qf ON qf.vec_id = c.query_id"
        " JOIN flat nf ON nf.vec_id = c.neighbor_id AND nf.pos = qf.pos"
        " GROUP BY 1, 2)",
        f"norms AS (SELECT vec_id, {ssum('val * val')} AS n2 FROM flat GROUP BY vec_id)",
        "scored AS (SELECT query_id, neighbor_id,"
        " dot / sqrt(nq.n2 * nc.n2) AS cos_sim"
        " FROM dotsf"
        " JOIN norms nq ON nq.vec_id = query_id"
        " JOIN norms nc ON nc.vec_id = neighbor_id)",
    ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT query_id, neighbor_id, cos_sim, rk
FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS rk
  FROM scored
)
WHERE rk <= {k}
"""
    )


@register(
    "ann_cosine_topk_ivf",
    _ivf_oracle(),
    doc=f"IVF ANN with a TRAINED coarse quantizer: seeded {N_CELLS}-cell "
    f"k-means ({KMEANS_ITERS} Lloyd iterations, pure DataFrame ops, "
    f"decimal-exact), queries probe {N_PROBE} cells, exact cosine inside "
    "— the 100 TB scale path; oracle replays training with unrolled CTEs",
    tags=("similarity", "vector", "ivf", "kmeans"),
    bench=True,
)
def ann_cosine_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    return ivf_cosine_topk(emb, F.col("vec_id") < N_QUERIES)


# (applicationId, sf_dir) → materialized centroid table. Keyed by app id
# so a cached DataFrame can never outlive its SparkSession.
_CENTROID_CACHE: dict[tuple[str, str], DataFrame] = {}


def pretrained_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-once centroids for the serve-path query: first call runs
    seeded k-means and materializes the (n_cells × dim)-bounded
    centroid table (localCheckpoint already truncates its lineage);
    later calls reuse it. This is the production IVF split — training
    is an offline job whose output the serving query reads."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _CENTROID_CACHE:
        emb = read_table(spark, sf_dir, "embeddings")
        _CENTROID_CACHE[key] = train_ivf_cells(emb)
    return _CENTROID_CACHE[key]


@register(
    "ann_cosine_topk_ivf_pretrained",
    _ivf_oracle(),
    doc="IVF ANN serve path: identical query to ann_cosine_topk_ivf but "
    "against PRE-TRAINED centroids (train-once-per-session cache), so "
    "the bench separates training cost from per-query serving cost — "
    "the split a production vector store actually runs. Same oracle: "
    "the cached centroids are exactly what in-plan training produces",
    tags=("similarity", "vector", "ivf", "serving"),
    bench=True,
)
def ann_cosine_topk_ivf_pretrained(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    return ivf_cosine_topk(
        emb,
        F.col("vec_id") < N_QUERIES,
        centroids=pretrained_centroids(spark, sf_dir),
    )
