"""Skew mitigation: salted join for hot keys.

AQE's skew-join splitting (on in ``session.get_spark``) handles most
skew by splitting oversized post-shuffle partitions, but it only works
for sort-merge joins and after a shuffle has materialized. Salting is
the plan-level alternative when one key dominates so heavily that even
a split partition's build side is hot, or when the join must be
shuffled-hash: replicate the small side ``buckets`` times and scatter
the large side's rows of each key uniformly across those buckets, so
no single task owns a whole hot key.

Cost model: small side inflates ``buckets``×; the large side gets one
extra int column. Worth it when max-key-share × large-rows ≫
large-rows / parallelism — i.e. real skew. Equivalent results to the
plain join for any join type that doesn't null-extend the small side
(inner / left).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    buckets: int = 16,
) -> DataFrame:
    """Join ``large ⋈ small`` on ``on``, salted ``buckets`` ways.

    The large side's salt is a deterministic row hash (xxhash64 over
    all columns) mod buckets — rows of the same hot key spread across
    buckets; the small side cross-joins the salt domain. The composite
    key (on + salt) then distributes a hot key over ``buckets`` tasks.
    """
    on = list(on)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(buckets))
    l_salted = large.withColumn(SALT, salt.cast("int"))
    s_salted = small.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return l_salted.join(s_salted, on + [SALT], how).drop(SALT)
