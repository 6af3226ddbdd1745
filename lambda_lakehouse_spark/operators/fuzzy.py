"""Fuzzy (edit-distance) matching via wildcard-pattern blocking.

The quadratic way to find all string pairs within edit distance 1 is an
all-pairs ``levenshtein`` filter — the oracle below keeps that form.
The engine plan is the FastSS/SymSpell-style *neighborhood blocking*
decomposition: each string of length L emits L wildcard patterns (one
position masked); two equal-length strings at substitution distance
exactly 1 share exactly one pattern, so an equi-self-join on the
pattern yields every candidate pair directly — no cross product. The
join's bucket fan-out is bounded by the alphabet size per masked
position (each bucket holds strings identical everywhere else), so the
plan scales linearly with corpus size where the naive form scales
quadratically.

Applies to fixed-format identifiers (codes, padded ids, SKUs — the
TPC-H ``Supplier#%09d`` names here). For variable-length inputs add
deletion variants on both sides (full FastSS) — same relational shape,
one more pattern family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lambda_lakehouse_spark.registry import register
from lambda_lakehouse_spark.sources.readers import read_table


def edit1_pairs(df: DataFrame, key: str, name: str) -> DataFrame:
    """All (a_key, b_key, a_key < b_key) pairs whose ``name`` values
    are at substitution distance exactly 1 (equal lengths assumed).
    One pattern explode + one equi-join; the ``levenshtein == 1``
    post-filter re-verifies candidates (and screens out any unequal-
    length collisions if the fixed-format assumption is violated)."""
    pats = df.select(
        F.col(key).alias("k"),
        F.col(name).alias("nm"),
        # masked position encoded as a struct (position, prefix,
        # suffix) — no in-band placeholder character to collide with
        F.explode(
            F.expr(
                f"transform(sequence(1, length({name})), "
                f"i -> named_struct('p', i, "
                f"'pre', substring({name}, 1, i - 1), "
                f"'suf', substring({name}, i + 1)))"
            )
        ).alias("pat"),
    )
    a = pats.select(F.col("k").alias("a_key"), F.col("nm").alias("a_nm"), "pat")
    b = pats.select(F.col("k").alias("b_key"), F.col("nm").alias("b_nm"), "pat")
    return (
        a.join(b, "pat")
        .where(F.col("a_key") < F.col("b_key"))
        .where(F.levenshtein("a_nm", "b_nm") == 1)
        .select("a_key", "b_key")
        .distinct()
    )


_FUZZY_ORACLE = """
SELECT a.s_suppkey AS a_key, b.s_suppkey AS b_key
FROM supplier a
JOIN supplier b ON a.s_suppkey < b.s_suppkey
WHERE levenshtein(a.s_name, b.s_name) = 1
"""


@register(
    "fuzzy_pairs_edit1",
    _FUZZY_ORACLE,
    doc="All supplier-name pairs at edit distance 1 via wildcard-"
    "pattern neighborhood blocking (FastSS-style): L patterns per "
    "string, equi-join on the pattern, levenshtein re-verify — linear "
    "candidate generation with alphabet-bounded buckets, vs the "
    "oracle's quadratic all-pairs form",
    tags=("fuzzy", "dedup", "join"),
    bench=True,
)
def fuzzy_pairs_edit1(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return edit1_pairs(sup, key="s_suppkey", name="s_name")
