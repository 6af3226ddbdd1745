"""Snapshot table format: atomic commits, partition-scoped overwrite,
time travel, rollback, optimistic concurrency, vacuum, pruning.

Mirrors the Iceberg capabilities the reference depends on
(``airflow/dags/utils/init_spark.py:84-109`` —
``writeTo(...).overwritePartitions()`` on a Nessie catalog) as a
metadata layer over parquet (``sources/snapshots.py``).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from lambda_lakehouse_spark.sources.snapshots import CommitConflict, SnapshotTable

from tests.conftest import SF_DIR


@pytest.fixture()
def nation(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "nation.parquet"))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_create_read_roundtrip(spark, nation, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), partition_by=["n_regionkey"])
    sid = t.create(nation)
    assert sid == 1
    got = t.read()
    assert got.columns == nation.columns
    assert [f.dataType for f in got.schema.fields] == [
        f.dataType for f in nation.schema.fields
    ]
    assert _rows(got) == _rows(nation)


def test_append_and_time_travel(spark, nation, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), partition_by=["n_regionkey"])
    t.create(nation.where("n_regionkey < 2"))
    ts1 = t.snapshots()[-1]["timestamp_ms"]
    t.append(nation.where("n_regionkey >= 2"))
    assert _rows(t.read()) == _rows(nation)
    # time travel by id and by timestamp
    assert _rows(t.read(snapshot_id=1)) == _rows(nation.where("n_regionkey < 2"))
    assert _rows(t.read(as_of_ms=ts1)) == _rows(nation.where("n_regionkey < 2"))
    ops = [s["operation"] for s in t.snapshots()]
    assert ops == ["create", "append"]


def test_overwrite_partitions_replaces_only_incoming(spark, nation, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), partition_by=["n_regionkey"])
    t.create(nation)
    mod = nation.where("n_regionkey = 0").withColumn(
        "n_name", F.lower("n_name")
    )
    t.overwrite_partitions(mod)
    expect = nation.where("n_regionkey <> 0").unionByName(mod)
    assert _rows(t.read()) == _rows(expect)
    # untouched partitions still served by the ORIGINAL files
    man = t._require_current()
    commits = {f["commit"] for f in man["files"]
               if f["partition"]["n_regionkey"] != "0"}
    first = t._manifest(1)["files"][0]["commit"]
    assert commits == {first}


def test_rollback_appends_history(spark, nation, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), partition_by=["n_regionkey"])
    t.create(nation)
    t.overwrite_partitions(
        nation.where("n_regionkey = 1").withColumn("n_name", F.lower("n_name"))
    )
    sid = t.rollback(1)
    assert sid == 3
    assert _rows(t.read()) == _rows(nation)
    assert [s["operation"] for s in t.snapshots()][-1] == "rollback"


def test_failed_commit_is_invisible_and_vacuumable(spark, nation, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), partition_by=["n_regionkey"])
    t.create(nation)
    # simulate a writer that crashed after writing data, before publishing
    orphan = t._write_data(nation.limit(3))
    assert _rows(t.read()) == _rows(nation)  # reader unaffected
    # age guard: a young orphan could be an IN-FLIGHT commit's staging
    assert t.vacuum(min_age_s=3600) == []
    deleted = t.vacuum()
    assert {f["path"] for f in orphan} <= set(deleted)
    assert _rows(t.read()) == _rows(nation)  # live files untouched


def test_concurrent_commit_conflict(spark, nation, tmp_path):
    path = str(tmp_path / "t")
    t1 = SnapshotTable(spark, path, partition_by=["n_regionkey"])
    t2 = SnapshotTable(spark, path, partition_by=["n_regionkey"])
    t1.create(nation)
    # both writers read snapshot 1 as parent; first append wins
    t1.append(nation.limit(1))
    files = t2._write_data(nation.limit(1))
    with pytest.raises(CommitConflict):
        t2._commit("append", t2._manifest(1)["files"] + files,
                   nation.schema, parent=t2._manifest(1))
    # loser's data files are orphans; table state is the winner's
    assert t2.current_snapshot_id() == 2
    t2.vacuum()


def test_append_retries_lost_race_without_rewriting(spark, nation, tmp_path):
    """Append commits are order-independent, so losing a commit race
    re-points the SAME data files at the new current snapshot
    (Iceberg's retryable-commit path) instead of raising."""
    path = str(tmp_path / "t")
    t1 = SnapshotTable(spark, path, partition_by=["n_regionkey"])
    t2 = SnapshotTable(spark, path, partition_by=["n_regionkey"])
    t1.create(nation.where("n_regionkey = 0"))
    # t2 stages an append against snapshot 1...
    parent_seen_by_t2 = t2._require_current()
    files = t2._write_data(nation.where("n_regionkey = 2"))
    # ...then t1 wins the race for snapshot 2
    t1.append(nation.where("n_regionkey = 1"))
    sid = t2._commit_append_with_retry(
        files, nation.schema, parent_seen_by_t2
    )
    assert sid == 3
    assert _rows(t2.read()) == _rows(nation.where("n_regionkey < 3"))
    # the staged files were re-pointed, not rewritten
    assert {f["commit"] for f in files} <= {
        f["commit"] for f in t2._require_current()["files"]
    }


def test_append_batch_race_on_same_batch_skips(spark, nation, tmp_path):
    path = str(tmp_path / "t")
    t1 = SnapshotTable(spark, path, partition_by=["n_regionkey"])
    t2 = SnapshotTable(spark, path, partition_by=["n_regionkey"])
    t1.append_batch(nation.where("n_regionkey = 0"), batch_id=0)
    parent = t2._require_current()
    files = t2._write_data(nation.where("n_regionkey = 1"))
    # another instance of the same query commits batch 1 first
    t1.append_batch(nation.where("n_regionkey = 1"), batch_id=1)
    got = t2._commit_append_with_retry(
        files, nation.schema, parent, meta={"batch_id": 1},
        abort_if=lambda: 1 in t2.committed_batch_ids(),
    )
    assert got is None  # skipped, no double-append
    assert _rows(t2.read()) == _rows(nation.where("n_regionkey < 2"))
    t2.vacuum()  # loser's staged files are collectable orphans


def test_manifest_pruning_limits_scan_files(spark, nation, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), partition_by=["n_regionkey"])
    t.create(nation)
    pruned = t.read(where={"n_regionkey": 0})
    assert _rows(pruned) == _rows(nation.where("n_regionkey = 0"))
    # the scan must reference ONLY the matching partition's files
    scanned = [f["path"] for f in t._require_current()["files"]
               if f["partition"]["n_regionkey"] == "0"]
    files_in_plan = json.loads(
        pruned.select(F.input_file_name()).distinct().toPandas().to_json(
            orient="values"
        )
    )
    got = {p[0].split("/data/", 1)[1] for p in files_in_plan}
    assert got == {p.split("data/", 1)[1] for p in scanned}


def test_expire_snapshots_keeps_current(spark, nation, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), partition_by=["n_regionkey"])
    t.create(nation.where("n_regionkey = 0"))
    t.create(nation)  # full replace → v2
    expired = t.expire_snapshots(keep_last=1)
    assert expired == [1]
    assert _rows(t.read()) == _rows(nation)
    with pytest.raises(ValueError, match="does not exist"):
        t.read(snapshot_id=1)


def test_schema_drift_rejected(spark, nation, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), partition_by=["n_regionkey"])
    t.create(nation)
    with pytest.raises(ValueError, match="schema drift"):
        t.append(nation.withColumn("extra", F.lit(1)))


def test_merge_upsert_prunes_to_touched_partitions(spark, nation, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), partition_by=["n_regionkey"])
    t.create(nation)
    r2 = nation.where("n_regionkey = 2")
    updates = r2.withColumn("n_name", F.reverse("n_name")).unionByName(
        r2.withColumn("n_nationkey", F.col("n_nationkey") + F.lit(1000))
    )
    t.merge(updates, keys=["n_nationkey"])
    expect = nation.where("n_regionkey <> 2").unionByName(updates)
    assert _rows(t.read()) == _rows(expect)
    # untouched partitions still reference the ORIGINAL commit's files
    man = t._require_current()
    first = t._manifest(1)["files"][0]["commit"]
    untouched = {f["commit"] for f in man["files"]
                 if f["partition"]["n_regionkey"] != "2"}
    assert untouched == {first}


def test_read_incremental_returns_only_appended(spark, nation, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), partition_by=["n_regionkey"])
    t.create(nation.where("n_regionkey < 3"))
    t.append(nation.where("n_regionkey = 3"))
    t.append(nation.where("n_regionkey = 4"))
    inc = t.read_incremental(from_id=1)
    assert _rows(inc) == _rows(nation.where("n_regionkey >= 3"))
    inc2 = t.read_incremental(from_id=1, to_id=2)
    assert _rows(inc2) == _rows(nation.where("n_regionkey = 3"))
    assert t.read_incremental(from_id=3, to_id=3).count() == 0


def test_append_batch_exactly_once(spark, nation, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), partition_by=["n_regionkey"])
    assert t.append_batch(nation.where("n_regionkey = 0"), batch_id=0) == 1
    assert t.append_batch(nation.where("n_regionkey = 1"), batch_id=1) == 2
    # replay of batch 1 (restart-after-crash) is a no-op
    assert t.append_batch(nation.where("n_regionkey = 1"), batch_id=1) is None
    assert _rows(t.read()) == _rows(nation.where("n_regionkey < 2"))
    assert t.committed_batch_ids() == {0, 1}


def test_streaming_snapshot_sink_exactly_once(spark, nation, tmp_path):
    """File-drop stream → snapshot-commit-per-batch sink: every row
    lands exactly once and each micro-batch is one atomic snapshot."""
    from lambda_lakehouse_spark.streaming.jobs import snapshot_append_sink
    from lambda_lakehouse_spark.streaming.sources import file_stream

    src = tmp_path / "drops"
    src.mkdir()
    nation.where("n_regionkey < 2").write.parquet(str(src / "d1"))
    nation.where("n_regionkey >= 2").write.parquet(str(src / "d2"))
    t = SnapshotTable(spark, str(tmp_path / "t"), partition_by=["n_regionkey"])
    stream = file_stream(
        spark, str(src) + "/*", nation.schema, max_files_per_trigger=1
    )
    q = (
        stream.writeStream.foreachBatch(snapshot_append_sink(t))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _rows(t.read()) == _rows(nation)
    ops = [s["operation"] for s in t.snapshots()]
    assert all(op == "append" for op in ops)
    assert len(t.committed_batch_ids()) == len(ops)


def test_delete_where_rewrites_only_candidate_files(spark, nation, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), partition_by=["n_regionkey"])
    t.create(nation)
    t.delete_where(
        F.col("n_nationkey") % 2 == 0, where={"n_regionkey": 1}
    )
    man = t._require_current()
    assert man["operation"] == "delete"
    expect = nation.where(
        "n_regionkey <> 1 OR n_nationkey % 2 <> 0"
    )
    assert _rows(t.read()) == _rows(expect)
    # only partition 1's files were rewritten
    first = t._manifest(1)["files"][0]["commit"]
    untouched = {f["commit"] for f in man["files"]
                 if f["partition"]["n_regionkey"] != "1"}
    rewritten = {f["commit"] for f in man["files"]
                 if f["partition"]["n_regionkey"] == "1"}
    assert untouched == {first} and rewritten != {first}
    # delete history still time-travels
    assert _rows(t.read(snapshot_id=1)) == _rows(nation)


def test_delete_where_null_condition_keeps_row(spark, nation, tmp_path):
    """SQL DELETE semantics: rows where the predicate evaluates to
    NULL are kept, not deleted."""
    t = SnapshotTable(spark, str(tmp_path / "t"), partition_by=["n_regionkey"])
    withnull = nation.withColumn(
        "n_name",
        F.when(F.col("n_nationkey") % 3 == 0, None).otherwise(F.col("n_name")),
    )
    t.create(withnull)
    t.delete_where(F.col("n_name") < "M")  # NULL for every %3==0 row
    expect = withnull.where("n_name IS NULL OR n_name >= 'M'")
    assert _rows(t.read()) == _rows(expect)


def test_delete_where_with_stats_pruning(spark, tmp_path):
    import os

    from tests.conftest import SF_DIR

    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_by=["o_orderkey"])
    t.create(orders.repartitionByRange(6, "o_orderkey")
             .sortWithinPartitions("o_orderkey"))
    before = {f["path"]: f for f in t._require_current()["files"]}
    t.delete_where(F.col("o_orderkey") < 50, range_filter=("o_orderkey", None, 49))
    man = t._require_current()
    # files entirely above the range are carried over byte-identical
    carried = [f for f in man["files"] if f["path"] in before]
    assert len(carried) >= 4
    assert _rows(t.read()) == _rows(orders.where("o_orderkey >= 50"))


def test_compact_preserves_rows_and_shrinks_files(spark, nation, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), partition_by=["n_regionkey"])
    t.create(nation.repartition(4))
    t.append(nation.limit(0))  # empty append still commits
    for _ in range(3):
        t.append(nation.limit(2))
    before = len(t._require_current()["files"])
    t.compact(target_files=1)
    man = t._require_current()
    assert man["operation"] == "compact"
    assert len(man["files"]) < before
    # one file per partition tuple
    parts = [f["partition"]["n_regionkey"] for f in man["files"]]
    assert len(parts) == len(set(parts))
    expect = nation.unionByName(nation.limit(2)).unionByName(
        nation.limit(2)
    ).unionByName(nation.limit(2))
    assert _rows(t.read()) == _rows(expect)
    # pre-compaction history still time-travels
    assert _rows(t.read(snapshot_id=1)) == _rows(nation)


def test_append_merge_schema_adds_column(spark, nation, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), partition_by=["n_regionkey"])
    t.create(nation)
    extra = nation.limit(3).withColumn("score", F.lit(7))
    with pytest.raises(ValueError, match="schema drift"):
        t.append(extra)
    t.append(extra, merge_schema=True)
    got = t.read()
    assert got.columns == nation.columns + ["score"]
    # old files read the new column as NULL
    assert got.where("score IS NULL").count() == nation.count()
    assert got.where("score = 7").count() == 3
    # dropping an existing column is still rejected
    with pytest.raises(ValueError, match="missing"):
        t.append(nation.limit(1).drop("n_name"), merge_schema=True)


def test_column_stats_file_skipping(spark, tmp_path):
    """stats_by columns get per-file min/max in the manifest; a
    range_filter read keeps only files whose range may intersect —
    and still returns exactly the matching rows after the row filter."""
    import os

    from tests.conftest import SF_DIR

    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_by=["o_orderkey"])
    # range-clustered write → disjoint per-file key ranges
    t.create(orders.repartitionByRange(8, "o_orderkey")
             .sortWithinPartitions("o_orderkey"))
    man = t._require_current()
    assert all("stats" in f and "o_orderkey" in f["stats"]
               for f in man["files"])
    lo, hi = 100, 200
    pruned = t.read(range_filter=("o_orderkey", lo, hi))
    n_scanned = pruned.select(F.input_file_name()).distinct().count()
    assert n_scanned < len(man["files"])  # skipping actually happened
    got = pruned.where(F.col("o_orderkey").between(lo, hi))
    expect = orders.where(F.col("o_orderkey").between(lo, hi))
    assert _rows(got) == _rows(expect)
    # one-sided bound
    top = t.read(range_filter=("o_orderkey", 5999, None))
    assert _rows(top.where("o_orderkey >= 5999")) == _rows(
        orders.where("o_orderkey >= 5999")
    )


def test_column_stats_with_partitions(spark, nation, tmp_path):
    """Stats harvesting keys files by commit-relative path, so
    identically named part files in different partition dirs keep
    their own ranges."""
    t = SnapshotTable(
        spark, str(tmp_path / "t"),
        partition_by=["n_regionkey"], stats_by=["n_nationkey"],
    )
    t.create(nation)
    man = t._require_current()
    by_part = {}
    for f in man["files"]:
        s = f["stats"]["n_nationkey"]
        by_part.setdefault(f["partition"]["n_regionkey"], []).append(s)
    # every file's range must match the true per-partition key range
    for rk, spans in by_part.items():
        rows = [r.n_nationkey for r in
                nation.where(F.col("n_regionkey") == int(rk)).collect()]
        lo = min(lo for lo, _ in spans)
        hi = max(hi for _, hi in spans)
        assert lo == min(rows) and hi == max(rows)


def test_null_partition_value_round_trips(spark, nation, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), partition_by=["n_name"])
    withnull = nation.withColumn(
        "n_name", F.when(F.col("n_regionkey") == 0, None).otherwise(F.col("n_name"))
    )
    t.create(withnull)
    got = t.read()
    assert _rows(got) == _rows(withnull)
    only_null = t.read(where={"n_name": None})
    assert _rows(only_null) == _rows(withnull.where("n_name IS NULL"))
