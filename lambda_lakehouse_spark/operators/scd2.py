"""SCD Type-2 builder from periodic snapshots (SURVEY §2.5 W1-W3 + A1 + J6).

Re-expresses the reference's ``curated/dim_company.py:57-110`` — the
most intricate query semantics in the reference — as a reusable
operator:

1. attribute fingerprint: ``sha2(concat_ws('||', attrs), 256)``
   (``dim_company.py:63``)
2. snapshot dedup on (keys, snapshot_date, fingerprint)
   (``dim_company.py:64``)
3. change flag: fingerprint != lag(fingerprint) over entity history
   (W1, ``dim_company.py:67-69``)
4. version group id: running sum of change flags (W2, ``:70-71``)
5. version assembly: groupBy(keys, grp) → min(snapshot) as
   effective_from (A1, ``:76-79``)
6. effective_to: lead(effective_from), open version capped at
   9999-12-31; is_current flag (W3, ``:80-91``)

Boundary semantics (SURVEY G3): the reference sets ``effective_to``
to the NEXT version's ``effective_from`` and point-in-time joins use
a closed interval, so a fact dated exactly on a version boundary
matches two versions. ``closed_boundaries=True`` (default) replicates
that for parity; ``False`` closes intervals with ``date_sub(next, 1)``.

Scale: one shuffle on the entity keys serves steps 3-6 (windows and
the groupBy share the partitioning); Catalyst reuses the exchange.
Hot entities with very long histories are bounded by snapshot
cadence, not data volume.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from lambda_lakehouse_spark.functions.scalar import sk_sha256

OPEN_END_DATE = "9999-12-31"


def build_scd2(
    snapshots: DataFrame,
    keys: Sequence[str],
    attrs: Sequence[str],
    snapshot_col: str,
    closed_boundaries: bool = True,
) -> DataFrame:
    """Collapse per-period snapshots into SCD2 version intervals.

    Returns one row per (entity, contiguous-attribute-run) with
    ``effective_from``, ``effective_to``, ``is_current``, ``version``
    and the attribute columns.
    """
    keys = list(keys)
    attrs = list(attrs)

    fp = sk_sha256(*[F.coalesce(F.col(a).cast("string"), F.lit("~")) for a in attrs])
    snap = snapshots.withColumn("attr_fp", fp).dropDuplicates(
        keys + [snapshot_col, "attr_fp"]
    )

    w_hist = W.partitionBy(*keys).orderBy(snapshot_col)
    snap = (
        snap.withColumn("prev_fp", F.lag("attr_fp").over(w_hist))
        .withColumn(
            "chg",
            F.when(
                F.col("prev_fp").isNull() | (F.col("attr_fp") != F.col("prev_fp")), 1
            ).otherwise(0),
        )
        .withColumn(
            "grp",
            F.sum("chg").over(w_hist.rowsBetween(W.unboundedPreceding, W.currentRow)),
        )
    )

    # Within a version group the fingerprint (hence every attr) is
    # constant, so min() is a deterministic representative.
    versions = snap.groupBy(*keys, "grp").agg(
        F.min(snapshot_col).alias("effective_from"),
        F.min("attr_fp").alias("attr_fp"),
        *[F.min(a).alias(a) for a in attrs],
    )

    w_ver = W.partitionBy(*keys).orderBy("effective_from")
    next_from = F.lead("effective_from").over(w_ver)
    if closed_boundaries:
        eff_to = next_from  # reference G3 parity: boundary day overlaps
    else:
        eff_to = F.date_sub(next_from, 1)
    open_end = F.lit(OPEN_END_DATE).cast("date")
    return (
        versions.withColumn("effective_to", F.coalesce(eff_to, open_end))
        .withColumn("is_current", F.col("effective_to") == open_end)
        .withColumn("version", F.row_number().over(w_ver))
        .drop("grp")
    )
