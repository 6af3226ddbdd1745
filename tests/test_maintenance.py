"""MERGE-style upsert + small-file compaction on partitioned parquet."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from lambda_lakehouse_spark.sources.maintenance import (
    compact_partitions,
    merge_upsert,
)
from lambda_lakehouse_spark.sources.readers import read_table
from tests.conftest import SF_DIR


def _orders(spark):
    return (
        read_table(spark, SF_DIR, "orders")
        .select(
            "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus",
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        )
    )


def test_merge_upsert_updates_and_inserts(spark, tmp_path):
    path = str(tmp_path / "orders_tbl")
    base = _orders(spark)
    merge_upsert(spark, path, base, keys=["o_orderkey"], partition_by=["month"])
    n0 = spark.read.parquet(path).count()
    assert n0 == base.count()

    # updates: bump price on 10 existing keys + insert 5 new keys,
    # all within ONE month partition
    month = base.select("month").orderBy("month").first().month
    # deterministic pick: limit without orderBy may select different
    # rows on each evaluation
    upd_existing = (
        base.where(F.col("month") == month).orderBy("o_orderkey").limit(10)
        .withColumn("o_totalprice", F.col("o_totalprice") + 1000.0)
    )
    upd_new = upd_existing.orderBy("o_orderkey").limit(5).withColumn(
        "o_orderkey", F.col("o_orderkey") + 10_000_000
    )
    updates = upd_existing.unionByName(upd_new)
    updated_keys = [r.o_orderkey for r in upd_existing.collect()]

    merge_upsert(spark, path, updates, keys=["o_orderkey"], partition_by=["month"])
    after = spark.read.parquet(path)
    assert after.count() == n0 + 5  # inserts added, updates replaced
    # updated rows carry the new price
    got = after.where(F.col("o_orderkey").isin(updated_keys[:3])).collect()
    orig = {
        r.o_orderkey: r.o_totalprice
        for r in base.where(F.col("o_orderkey").isin(updated_keys[:3])).collect()
    }
    for r in got:
        assert r.o_totalprice == orig[r.o_orderkey] + 1000.0
    # no duplicate keys
    assert after.groupBy("o_orderkey").count().where("count > 1").count() == 0


def test_merge_upsert_partition_move_needs_full_scan(spark, tmp_path):
    path = str(tmp_path / "mv_tbl")
    base = _orders(spark)
    merge_upsert(spark, path, base, keys=["o_orderkey"], partition_by=["month"])
    row = base.orderBy("o_orderkey").first()
    moved = spark.createDataFrame(
        [(row.o_orderkey, row.o_custkey, row.o_totalprice, row.o_orderstatus,
          "2099-01")],
        base.schema,
    )
    # partition-scoped merge cannot see the key's old partition →
    # documented contract violation leaves a duplicate
    merge_upsert(spark, path, moved, keys=["o_orderkey"], partition_by=["month"])
    assert (
        spark.read.parquet(path)
        .where(F.col("o_orderkey") == row.o_orderkey).count() == 2
    )
    # full-scan mode repairs it: one row, in the new partition
    merge_upsert(
        spark, path, moved, keys=["o_orderkey"], partition_by=["month"],
        partition_scoped=False,
    )
    after = spark.read.parquet(path)
    got = after.where(F.col("o_orderkey") == row.o_orderkey).collect()
    assert len(got) == 1 and got[0].month == "2099-01"
    assert after.count() == base.count()


def test_merge_upsert_schema_drift_raises(spark, tmp_path):
    """Regression: updates missing a target column used to rewrite the
    touched partitions WITHOUT that column — silent data loss for every
    survivor row. Now validated up front."""
    import pytest

    path = str(tmp_path / "drift_tbl")
    base = _orders(spark)
    merge_upsert(spark, path, base, keys=["o_orderkey"], partition_by=["month"])

    narrow = base.drop("o_orderstatus").limit(5)
    with pytest.raises(ValueError, match="schema drift"):
        merge_upsert(spark, path, narrow, keys=["o_orderkey"], partition_by=["month"])

    wide = base.withColumn("extra", F.lit(1)).limit(5)
    with pytest.raises(ValueError, match="schema drift"):
        merge_upsert(spark, path, wide, keys=["o_orderkey"], partition_by=["month"])

    # table untouched by the rejected merges
    assert spark.read.parquet(path).count() == base.count()
    assert set(spark.read.parquet(path).columns) == set(base.columns)


def test_merge_upsert_pathological_partition_count_raises(spark, tmp_path, monkeypatch):
    """A mis-keyed partition spec (high-cardinality column) must be
    refused before the driver-side partition-list collect, not after it
    OOMs. The cap is monkeypatched down so the test stays fast."""
    import pytest

    from lambda_lakehouse_spark.sources import maintenance

    monkeypatch.setattr(maintenance, "MAX_MERGE_PARTITIONS", 10)
    path = str(tmp_path / "patho_tbl")
    base = _orders(spark)
    # seed the table under a sane layout so the guarded path (existing
    # table + partition_scoped) is the one exercised
    merge_upsert(spark, path, base, keys=["o_orderkey"], partition_by=["month"])
    # "partitioning" by the key itself: every row its own partition —
    # exactly the mis-keyed call the cap exists for
    with pytest.raises(ValueError, match="distinct partitions"):
        merge_upsert(
            spark, path, base, keys=["o_orderkey"], partition_by=["o_orderkey"]
        )
    # the refusal happened before any write — table layout untouched
    assert spark.read.parquet(path).count() == base.count()


def test_compact_partitions_reduces_files(spark, tmp_path):
    path = str(tmp_path / "fragmented")
    base = _orders(spark)
    # fragment: 12 files per partition
    base.repartition(12).write.partitionBy("month").mode("overwrite").parquet(path)
    n_rows = spark.read.parquet(path).count()
    files_before = len(glob.glob(f"{path}/month=*/*.parquet"))
    n_months = base.select("month").distinct().count()
    assert files_before > n_months

    compact_partitions(spark, path, ["month"], target_files_per_partition=1)
    files_after = len(glob.glob(f"{path}/month=*/*.parquet"))
    assert files_after == n_months
    # data unchanged
    assert spark.read.parquet(path).count() == n_rows

    # k-way compaction bounds files per partition
    compact_partitions(spark, path, ["month"], target_files_per_partition=3)
    for d in glob.glob(f"{path}/month=*"):
        assert 1 <= len(glob.glob(f"{d}/*.parquet")) <= 3
    assert spark.read.parquet(path).count() == n_rows


def test_zorder_write_improves_file_locality(spark, tmp_path):
    """The point of the clustered layout: per-file min/max footer
    ranges of BOTH key columns shrink vs an unclustered write, so
    needle scans on either column prune files. Measured directly from
    parquet footer statistics."""
    import pyarrow.parquet as pq

    from lambda_lakehouse_spark.sources.maintenance import zorder_write
    from lambda_lakehouse_spark.sources.readers import read_table
    from tests.conftest import SF_DIR

    li = read_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    naive = str(tmp_path / "naive")
    zordered = str(tmp_path / "zorder")
    # naive: same file count, insertion order (l_orderkey-correlated)
    li.repartition(8).write.mode("overwrite").parquet(naive)
    zorder_write(li, "l_partkey", "l_suppkey", zordered, n_files=8)

    def total_extent(path: str, col: str) -> float:
        import glob as g

        extent = 0.0
        for f in sorted(g.glob(f"{path}/part-*.parquet")):
            md = pq.ParquetFile(f).metadata
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        lo = c.statistics.min if lo is None else min(lo, c.statistics.min)
                        hi = c.statistics.max if hi is None else max(hi, c.statistics.max)
            assert lo is not None, f"no stats for {col} in {f}"
            extent += hi - lo
        return extent

    # same total data, same file count: summed per-file ranges of each
    # z-ordered dimension must be strictly tighter than the naive
    # layout's (naive files each span ~the full key domain)
    for col in ("l_partkey", "l_suppkey"):
        assert total_extent(zordered, col) < 0.8 * total_extent(naive, col), col

    # row parity: the rewrite is a layout change only
    assert spark.read.parquet(zordered).count() == li.count()


def test_zvalue_monotone_and_degenerate_span(spark):
    """Morton values preserve component-wise dominance (z = f(a)+g(b)
    with disjoint-bit monotone spreads), and a zero-span column
    degrades gracefully: zval then orders purely by the other column
    at full bucket resolution (not collapsed to a handful of buckets)."""
    from lambda_lakehouse_spark.sources.maintenance import with_zvalue

    pts = spark.createDataFrame(
        [(i, float(a), float(b)) for i, (a, b) in enumerate(
            [(0, 0), (1, 2), (2, 2), (3, 1), (100, 100), (100, 50)]
        )],
        "id long, a double, b double",
    )
    z = {r.id: r.zval for r in with_zvalue(pts, "a", "b").collect()}
    # dominance pairs (component-wise <=) must be z-ordered
    assert z[0] <= z[1] <= z[2] <= z[4]
    assert z[5] <= z[4]

    # degenerate: column b constant -> z orders by a alone, strictly
    const_b = spark.createDataFrame(
        [(i, float(i) / 1000.0, 7.0) for i in range(5)],
        "id long, a double, b double",
    )
    zc = [r.zval for r in with_zvalue(const_b, "a", "b")
          .orderBy("id").collect()]
    assert zc == sorted(zc) and len(set(zc)) == 5  # sub-1.0 range keeps resolution
