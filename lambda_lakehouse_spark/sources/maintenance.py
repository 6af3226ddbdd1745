"""Table maintenance: MERGE-style upsert and small-file compaction for
path-based (format-agnostic) partitioned tables.

The reference gets MERGE and file management for free from Iceberg
(`writeTo().overwritePartitions()` + table services); on plain
parquet the engine provides both as partition-scoped rewrites — the
same mechanics a `MERGE INTO` compiles to on any copy-on-write table
format. When Delta/Iceberg jars are on the classpath their native
MERGE is preferable (it adds snapshot isolation); the call signature
here is deliberately the same shape so swapping is mechanical.

Scale posture: both operations touch ONLY the partitions present in
the incoming updates / selected for compaction. A daily upsert into a
100 TB table reads and rewrites one day's partitions, never the table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lambda_lakehouse_spark.functions.scalar import row_fp
from lambda_lakehouse_spark.sources.writer import _table_exists, write_partitioned

# Ceiling on distinct partition tuples collected to the driver for
# partition-scoped MERGE. The collect is control-plane (bounded by
# partition count, not data size), but a mis-keyed call — partitioning
# on a high-cardinality column by mistake — would otherwise OOM the
# driver before any executor touched data.
MAX_MERGE_PARTITIONS = 100_000


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: Sequence[str],
    partition_by: Sequence[str] = (),
    partition_scoped: bool = True,
) -> None:
    """Upsert ``updates`` into the table at ``path``: rows matching on
    ``keys`` are replaced, new keys are inserted (MERGE WHEN MATCHED
    UPDATE / WHEN NOT MATCHED INSERT semantics).

    ``partition_scoped=True`` (default) restricts the target scan to
    the partitions present in ``updates`` (partition pruning keeps the
    read partition-scoped — the 100 TB posture), anti-joins out the
    updated keys, unions the updates, and dynamically overwrites only
    those partitions. **Contract**: a key's partition value must not
    change across upserts (true whenever the partition column is
    derived from the key or from an immutable event date) — a
    partition-moving update would leave the key's old row untouched in
    its old partition. When keys CAN move between partitions, pass
    ``partition_scoped=False``: the whole table is scanned and
    statically rewritten (what any copy-on-write MERGE without an
    index does).
    """
    keys = list(keys)
    partition_by = list(partition_by)

    if not _table_exists(spark, path):
        write_partitioned(updates, path, partition_by=partition_by)
        return

    existing = spark.read.parquet(path)
    # Column-set drift guard: the merge rewrites whole partitions, so a
    # missing target column would silently drop that column for every
    # survivor row in the touched partitions.
    missing = set(existing.columns) - set(updates.columns)
    extra = set(updates.columns) - set(existing.columns)
    if missing or extra:
        raise ValueError(
            f"merge_upsert schema drift: updates missing target columns "
            f"{sorted(missing)}, updates-only columns {sorted(extra)} — "
            f"align schemas before merging"
        )
    target = existing.select(*updates.columns)
    if partition_by and partition_scoped:
        # one job enforces the cap AND yields the list (a separate
        # count-then-collect could disagree under nondeterministic
        # lineage, and would run the distinct twice)
        rows = (
            updates.select(*partition_by)
            .distinct()
            .take(MAX_MERGE_PARTITIONS + 1)
        )
        if len(rows) > MAX_MERGE_PARTITIONS:
            raise ValueError(
                f"merge_upsert: updates span more than {MAX_MERGE_PARTITIONS} "
                f"distinct partitions of {partition_by} — this looks like a "
                "mis-keyed partition spec (high-cardinality column?); "
                "partition-scoped MERGE collects the partition list to the "
                "driver, so refusing rather than risking a driver OOM. Use "
                "partition_scoped=False for a full-table rewrite."
            )
        parts = [tuple(r) for r in rows]
        cond = F.struct(*partition_by).isin(
            [F.struct(*[F.lit(v) for v in p]) for p in parts]
        )
        target = target.where(cond)
    survivors = target.join(
        updates.select(*keys).distinct(), keys, "left_anti"
    )
    merged = survivors.unionByName(updates)
    write_partitioned(
        merged, path, partition_by=partition_by,
        dynamic_overwrite=partition_scoped,
    )


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_by: Sequence[str],
    target_files_per_partition: int = 1,
    partition_filter=None,
) -> None:
    """Rewrite (a subset of) partitions into ``target_files_per_partition``
    files each — the small-file compaction every streaming/micro-batch
    sink eventually needs (each foreachBatch trigger adds files; scan
    cost grows with file count, not data size).

    ``partition_filter`` (a Column) restricts which partitions are
    compacted; by default all. Data is unchanged — only file layout.
    """
    partition_by = list(partition_by)
    df = spark.read.parquet(path)
    if partition_filter is not None:
        df = df.where(partition_filter)
    if target_files_per_partition <= 1:
        # all rows of a partition value hash to one task → 1 file each
        compacted = df.repartition(*partition_by)
    else:
        # salt splits each partition value across ≤k tasks; dropping the
        # salt afterwards is a projection — the physical distribution
        # (and therefore the file fan-out) is preserved
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns]),
            F.lit(target_files_per_partition),
        )
        compacted = (
            df.withColumn("__salt", salt)
            .repartition(*partition_by, "__salt")
            .drop("__salt")
        )
    write_partitioned(compacted, path, partition_by=partition_by)


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """CDC-style change set between two table versions: one row per
    differing key with change_type ∈ {insert, update, delete}.

    A single full-outer join on the keys + a row-fingerprint
    comparison — the shape every copy-on-write change feed compiles
    to. Columns: keys + change_type; pair with the source tables to
    fetch before/after images. At scale this is one shuffle on the
    keys (or zero with bucketed/co-partitioned versions).
    """
    keys = list(keys)
    new_cols = set(new.columns)
    non_keys = [c for c in old.columns if c in new_cols and c not in keys]
    fp = row_fp(*non_keys)
    o = old.select(*keys, fp.alias("_old_fp"))
    n = new.select(*keys, fp.alias("_new_fp"))
    joined = o.join(n, keys, "full_outer")
    return joined.select(
        *keys,
        F.when(F.col("_old_fp").isNull(), F.lit("insert"))
        .when(F.col("_new_fp").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("change_type"),
    ).where(
        F.col("_old_fp").isNull()
        | F.col("_new_fp").isNull()
        | (F.col("_old_fp") != F.col("_new_fp"))
    )


# ---------------------------------------------------------------------------
# Z-order clustering write (data-skipping layout)
# ---------------------------------------------------------------------------
#
# The OPTIMIZE ZORDER BY capability of Delta/Iceberg table services,
# on plain parquet: interleave the bits of two normalized key columns
# into a Morton (Z) value, range-partition + sort the data by it, and
# write. Files then hold locality in BOTH dimensions, so min/max
# footer stats prune scans filtered on either column — the layout
# matters precisely at 100 TB, where a needle query otherwise touches
# every file. The z-value math is plain integer arithmetic (exact on
# any engine); min/max normalization bounds come from one 1-row
# aggregate (control-plane broadcast, never a driver collect).

Z_BITS = 16  # 16 bits per dimension → 32-bit z-values


def _zvalue_expr(bucket_a: str, bucket_b: str) -> str:
    """SQL expression interleaving two pre-bucketed Z_BITS ints."""
    terms = []
    for j in range(Z_BITS):
        terms.append(f"((({bucket_a} >> {j}) & 1) << {2 * j})")
        terms.append(f"((({bucket_b} >> {j}) & 1) << {2 * j + 1})")
    return " + ".join(terms)


def zbucket_sql(c: str, lo: str, hi: str) -> str:
    """Normalize ``c`` into [0, 2^Z_BITS) by the (lo, hi) bounds.
    The divisor guard fires ONLY on a degenerate zero-span column
    (hi == lo -> every row buckets to 0); any real span divides by
    the true range, however small, so sub-1.0 ranges still use the
    full bucket resolution. Engine-portable: same text runs as a
    Spark expression and (upper-cased keywords aside) DuckDB SQL."""
    top = (1 << Z_BITS) - 1
    span = (
        f"(case when cast({hi} as double) = cast({lo} as double) then 1.0"
        f" else cast({hi} as double) - cast({lo} as double) end)"
    )
    return (
        f"least(cast(floor(((cast({c} as double) - cast({lo} as double))"
        f" / {span}) * {1 << Z_BITS}) as bigint), {top})"
    )


def with_zvalue(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Attach ``zval`` (Morton interleave of the two columns, each
    min/max-normalized to Z_BITS bits). Bounds via a 1-row aggregate
    joined back broadcast-style — no driver round trip. The two bucket
    columns are computed ONCE and the interleave references them, so
    the generated expression stays small (32 bit-terms over two
    columns, not 32 copies of the normalization)."""
    bounds = df.agg(
        F.min(col_a).alias("__amin"),
        F.max(col_a).alias("__amax"),
        F.min(col_b).alias("__bmin"),
        F.max(col_b).alias("__bmax"),
    )
    j = (
        df.join(F.broadcast(bounds))
        .withColumn("__ba", F.expr(zbucket_sql(col_a, "__amin", "__amax")))
        .withColumn("__bb", F.expr(zbucket_sql(col_b, "__bmin", "__bmax")))
    )
    return j.withColumn("zval", F.expr(_zvalue_expr("__ba", "__bb"))).drop(
        "__amin", "__amax", "__bmin", "__bmax", "__ba", "__bb"
    )


def zorder_write(
    df: DataFrame,
    col_a: str,
    col_b: str,
    path: str,
    n_files: int = 8,
) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files clustered by the
    Morton order of (col_a, col_b). repartitionByRange gives
    contiguous z-ranges per file (a sampled range exchange — no global
    sort bottleneck); the within-file sort makes row groups locally
    clustered too."""
    out = with_zvalue(df, col_a, col_b)
    (
        out.repartitionByRange(n_files, "zval")
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.mode("overwrite")
        .parquet(path)
    )


# ---------------------------------------------------------------------------
# Incremental rollup maintenance (continuous-aggregate pattern)
# ---------------------------------------------------------------------------
#
# The materialized-rollup refresh every event pipeline runs: a daily
# (day, event_type) aggregate table exists; late/new events arrive;
# ONLY the buckets present in the new batch are recomputed and merged
# — never the whole rollup. At 100 TB the recompute reads one day's
# partitions (partition-pruned by the merge) while the untouched
# history is never scanned. The driver query certifies the refreshed
# table equals a from-scratch rollup.

from pyspark.sql import DataFrame as _DF  # noqa: E402

from lambda_lakehouse_spark.functions.scalar import dsum  # noqa: E402
from lambda_lakehouse_spark.registry import register  # noqa: E402
from lambda_lakehouse_spark.sources.readers import read_table  # noqa: E402


def _daily_rollup(ev: _DF) -> _DF:
    return (
        ev.groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
    )


_ROLLUP_ORACLE = """
SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


@register(
    "rollup_incremental_merge",
    _ROLLUP_ORACLE,
    doc="Incremental materialized-rollup refresh: seed the daily "
    "(day, event_type) aggregate from the even-id half of events, "
    "then merge ONLY the buckets present in the odd-id half "
    "(recomputed from full data, partition-scoped merge_upsert) — "
    "the refreshed table must equal a from-scratch rollup",
    tags=("maintenance", "merge", "incremental", "events"),
)
def rollup_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    base = os.path.join(
        tempfile.gettempdir(),
        f"llh_rollup_merge_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    ev = read_table(spark, sf_dir, "events")
    initial = ev.where(F.col("event_id") % 2 == 0)
    late = ev.where(F.col("event_id") % 2 == 1)

    write_partitioned(
        _daily_rollup(initial), base, partition_by=("day",)
    )
    # affected buckets = those the late batch touches; recompute them
    # from the FULL event set (initial + late) and merge
    affected = late.select(
        F.to_date("ts").alias("day"), "event_type"
    ).distinct()
    updates = _daily_rollup(ev).join(affected, ["day", "event_type"], "left_semi")
    merge_upsert(
        spark, base, updates,
        keys=("day", "event_type"), partition_by=("day",),
    )
    return spark.read.parquet(base).select(
        "day", "event_type", "n_events", "total_value"
    )
