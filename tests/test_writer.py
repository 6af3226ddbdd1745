"""Partitioned writer: create, dynamic partition overwrite semantics
(only incoming partitions replaced), idempotency, guards —
SURVEY §2.1 S5/S6 + §5 idempotency tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lambda_lakehouse_spark.sources.writer import write_partitioned


def _df(spark, rows):
    return spark.createDataFrame(rows, "country string, datadate string, v int")


def test_create_then_read_back(spark, tmp_path):
    path = str(tmp_path / "t1")
    df = _df(spark, [("VN", "d1", 1), ("US", "d1", 2)])
    write_partitioned(df, path, ["country", "datadate"])
    got = spark.read.parquet(path)
    assert got.count() == 2
    assert {r.country for r in got.collect()} == {"VN", "US"}


def test_dynamic_overwrite_replaces_only_incoming_partitions(spark, tmp_path):
    path = str(tmp_path / "t2")
    base = _df(spark, [("VN", "d1", 1), ("US", "d1", 2), ("JP", "d1", 3)])
    write_partitioned(base, path, ["country"])

    # re-run the VN slice with a corrected value
    fix = _df(spark, [("VN", "d1", 99)])
    write_partitioned(fix, path, ["country"])

    got = {r.country: r.v for r in spark.read.parquet(path).collect()}
    assert got == {"VN": 99, "US": 2, "JP": 3}


def test_overwrite_idempotent(spark, tmp_path):
    path = str(tmp_path / "t3")
    df = _df(spark, [("VN", "d1", 1), ("VN", "d2", 2)])
    write_partitioned(df, path, ["country", "datadate"])
    before = sorted(map(tuple, spark.read.parquet(path).collect()))
    write_partitioned(df, path, ["country", "datadate"])  # same batch again
    after = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert before == after


def test_static_overwrite_truncates(spark, tmp_path):
    path = str(tmp_path / "t4")
    write_partitioned(_df(spark, [("VN", "d1", 1), ("US", "d1", 2)]), path, ["country"])
    write_partitioned(
        _df(spark, [("VN", "d1", 9)]), path, ["country"], dynamic_overwrite=False
    )
    got = spark.read.parquet(path).collect()
    assert len(got) == 1 and got[0].v == 9


def test_missing_partition_column_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="partition columns"):
        write_partitioned(_df(spark, [("VN", "d1", 1)]), str(tmp_path / "t5"), ["nope"])


def test_dynamic_overwrite_on_uri_scheme_never_truncates(spark, tmp_path):
    """Regression: existence must resolve through the Hadoop FileSystem
    API. An ``os.path`` check is always False for scheme-qualified URIs
    (``file:``, ``s3a:``, ``hdfs:``...), which silently selected static
    mode and truncated the whole table on the second daily write."""
    path = "file://" + str(tmp_path / "t7")
    base = _df(spark, [("VN", "d1", 1), ("US", "d1", 2), ("JP", "d1", 3)])
    write_partitioned(base, path, ["country"])

    # partition-scoped re-run through the scheme-qualified URI
    write_partitioned(_df(spark, [("VN", "d1", 99)]), path, ["country"])

    got = {r.country: r.v for r in spark.read.parquet(path).collect()}
    assert got == {"VN": 99, "US": 2, "JP": 3}


def test_unresolvable_scheme_fails_instead_of_truncating(spark, tmp_path):
    """A URI scheme the Hadoop conf can't resolve must raise — never
    default to 'table missing' (which would pick static mode and
    truncate on a real cluster where the scheme IS reachable)."""
    from py4j.protocol import Py4JJavaError

    from lambda_lakehouse_spark.sources.writer import _table_exists

    with pytest.raises(Py4JJavaError):
        _table_exists(spark, "nosuchscheme://bucket/table")


def test_write_partitioned_table_dsv2(spark, tmp_path):
    """DSv2 catalog-table path (the reference's Iceberg sink shape).
    create() is exercised against the built-in session catalog; the
    overwritePartitions() round trip completes only under a real V2
    catalog (Iceberg/Delta jars — unavailable offline, see README
    'Table formats') and skips with the blocker otherwise."""
    from pyspark.errors.exceptions.captured import AnalysisException

    from lambda_lakehouse_spark.sources.writer import write_partitioned_table

    spark.sql(f"CREATE DATABASE IF NOT EXISTS v2db LOCATION '{tmp_path}/v2db'")
    try:
        base = _df(spark, [("VN", "d1", 1), ("US", "d1", 2), ("JP", "d1", 3)])
        write_partitioned_table(base, "v2db.t", ["country"])
        assert {r.country: r.v for r in spark.table("v2db.t").collect()} == {
            "VN": 1, "US": 2, "JP": 3,
        }
        with pytest.raises(ValueError, match="partition columns"):
            write_partitioned_table(base, "v2db.t2", ["nope"])
        try:
            write_partitioned_table(_df(spark, [("VN", "d1", 99)]), "v2db.t", ["country"])
        except AnalysisException as ex:
            assert "v1 table" in str(ex)
            pytest.skip(
                "DSv2 overwritePartitions needs a V2 catalog; Iceberg/Delta "
                "jars unavailable offline (README 'Table formats')"
            )
        got = {r.country: r.v for r in spark.table("v2db.t").collect()}
        assert got == {"VN": 99, "US": 2, "JP": 3}
    finally:
        spark.sql("DROP DATABASE v2db CASCADE")


def test_partition_pruning_on_read(spark, tmp_path):
    path = str(tmp_path / "t6")
    write_partitioned(
        _df(spark, [("VN", "d1", 1), ("US", "d1", 2)]), path, ["country"]
    )
    plan = (
        spark.read.parquet(path)
        .where(F.col("country") == "VN")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan
