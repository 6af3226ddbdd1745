"""Model/data evaluation statistics, exact and engine-portable.

A training-data lakehouse is also where model-eval joins the data:
ranking a corpus by a quality score and asking "how well does this
score separate the good docs?" is the same computation as evaluating
a classifier. Two classics, both usually computed approximately (or
single-node) elsewhere, here as exact distributed plans with DuckDB
oracles:

- ``eval_auc_exact`` — ROC AUC via the Mann–Whitney U statistic with
  midrank tie handling: AUC = (Σ midrank(positives) − np(np+1)/2)
  / (np·nn). Per-distinct-score counts reduce the data N:1, the
  cumulative count comes from the distributed prefix-sum
  decomposition (operators/ranking.py — no single-partition ordered
  scan), and doubled midranks keep EVERYTHING integer until one final
  division: 2·midrank(s) = 2·cum_before(s) + count(s) + 1. The exact
  integer numerator ships alongside the double, so the statistic
  hash-certifies even where doubles could not.

- ``eval_decile_lift`` — the decile lift table: rank by score
  descending, cut into 10 exact-NTILE buckets
  (operators/ranking.py exact_global_ntile — no global sort), and per
  bucket report size, positives, positive rate, and lift vs the base
  rate, computed by integer cross-multiplication with one double
  division per row.

The demo scoring uses document length as the score and lang='en' as
the positive label — stand-ins for any (quality score, keep-label)
pair a curation pipeline produces.

Scale-0 integer→double conversions are single correctly-rounded
operations on both engines (unlike scaled decimal→double, see the
gini note in plans/tpch_extra.py), so no string hop is needed here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lambda_lakehouse_spark.operators.ranking import (
    exact_global_ntile,
    prefix_sums_inclusive,
)
from lambda_lakehouse_spark.registry import register
from lambda_lakehouse_spark.sources.readers import read_table

_DEC = "decimal(38,0)"


def auc_exact(
    df: DataFrame, score_col: str, label_col: str
) -> DataFrame:
    """One row (n_pos, n_neg, auc_num2, auc): exact ROC AUC of
    ``score_col`` against boolean ``label_col`` with midrank ties.
    ``auc_num2`` is the exact integer 2·(U statistic) numerator."""
    f = df.groupBy(score_col).agg(
        F.sum(F.when(F.col(label_col), 1).otherwise(0)).alias("_cp"),
        F.count(F.lit(1)).alias("_ct"),
    )
    p = prefix_sums_inclusive(f, [score_col], ["_ct"], ["_ci"])
    # 2*midrank = 2*cum_before + ct + 1 = 2*ci - ct + 1
    s = p.agg(
        F.sum(
            F.col("_cp").cast(_DEC)
            * (2 * F.col("_ci") - F.col("_ct") + 1).cast(_DEC)
        ).alias("_num2a"),
        F.sum("_cp").cast("bigint").alias("n_pos"),
        F.sum(F.col("_ct") - F.col("_cp")).cast("bigint").alias("n_neg"),
    )
    num2 = F.col("_num2a") - (
        F.col("n_pos").cast(_DEC) * (F.col("n_pos") + 1).cast(_DEC)
    )
    return s.select(
        "n_pos",
        "n_neg",
        num2.cast("bigint").alias("auc_num2"),
        (
            num2.cast("double")
            / (F.lit(2.0) * F.col("n_pos").cast("double") * F.col("n_neg"))
        ).alias("auc"),
    )


_AUC_ORACLE = """
WITH f AS (
  SELECT n_chars AS score,
         SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS cp,
         COUNT(*) AS ct
  FROM documents GROUP BY 1
),
p AS (
  SELECT score, cp, ct,
         SUM(ct) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) AS ci
  FROM f
),
s AS (
  SELECT SUM(CAST(cp AS HUGEINT) * (2 * ci - ct + 1)) AS num2a,
         CAST(SUM(cp) AS BIGINT) AS n_pos,
         CAST(SUM(ct - cp) AS BIGINT) AS n_neg
  FROM p
)
SELECT n_pos, n_neg,
       CAST(num2a - CAST(n_pos AS HUGEINT) * (n_pos + 1) AS BIGINT)
         AS auc_num2,
       CAST(num2a - CAST(n_pos AS HUGEINT) * (n_pos + 1) AS DOUBLE)
         / (2.0 * CAST(n_pos AS DOUBLE) * n_neg) AS auc
FROM s
"""


@register(
    "eval_auc_exact",
    _AUC_ORACLE,
    doc="Exact distributed ROC AUC (Mann–Whitney U with midrank ties) "
    "of doc length as a predictor of lang='en': per-score counts "
    "reduce N:1, cumulative counts via the distributed prefix-sum "
    "decomposition, doubled midranks keep the numerator integer — "
    "the exact 2U numerator ships next to the double AUC",
    tags=("eval", "stats", "auc", "ranking"),
    staged=True,
)
def eval_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select(
        "n_chars", (F.col("lang") == "en").alias("is_en")
    )
    return auc_exact(docs, "n_chars", "is_en")


_LIFT_BUCKETS = 10

_LIFT_ORACLE = f"""
WITH t AS (
  SELECT doc_id, n_chars, lang = 'en' AS pos,
         CAST(NTILE({_LIFT_BUCKETS})
              OVER (ORDER BY n_chars DESC, doc_id) AS INTEGER) AS bucket
  FROM documents
),
b AS (
  SELECT bucket, COUNT(*) AS n_rows,
         CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
  FROM t GROUP BY 1
),
tot AS (
  SELECT SUM(n_rows) AS nt, SUM(n_pos) AS npos FROM b
)
SELECT b.bucket, b.n_rows, b.n_pos,
       CAST(b.n_pos AS DOUBLE) / b.n_rows AS pos_rate,
       CAST(CAST(b.n_pos AS HUGEINT) * t.nt AS DOUBLE)
         / (CAST(b.n_rows AS HUGEINT) * t.npos) AS lift
FROM b CROSS JOIN tot t
"""


@register(
    "eval_decile_lift",
    _LIFT_ORACLE,
    doc="Decile lift table of doc length vs lang='en': exact NTILE(10) "
    "bucketing by (score DESC, key) via the two-pass range-partitioned "
    "rank, per-bucket positive rate and lift by integer "
    "cross-multiplication — the model/score evaluation report, "
    "bounded output at any scale",
    tags=("eval", "stats", "lift", "ntile"),
    staged=True,
)
def eval_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", (F.col("lang") == "en").alias("pos")
    )
    t = exact_global_ntile(
        docs, [F.col("n_chars").desc(), "doc_id"], _LIFT_BUCKETS, "bucket"
    )
    b = t.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("pos"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_pos"),
    )
    tot = b.agg(
        F.sum("n_rows").alias("nt"), F.sum("n_pos").alias("npos")
    )
    return (
        b.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_rows",
            "n_pos",
            (F.col("n_pos").cast("double") / F.col("n_rows")).alias(
                "pos_rate"
            ),
            (
                (F.col("n_pos").cast(_DEC) * F.col("nt").cast(_DEC))
                .cast("double")
                / (F.col("n_rows").cast(_DEC) * F.col("npos").cast(_DEC))
                .cast("double")
            ).alias("lift"),
        )
    )
