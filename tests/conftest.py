"""Shared test fixtures: one SparkSession per test run + the
DuckDB-oracle comparator that mirrors the driver's correctness gate
(row-count + column-name-sorted, order-insensitive value comparison).

Native-typed rows (Spark ``collect()``, DuckDB ``fetchall()``) are
compared instead of pandas frames so date/timestamp/decimal dtype
coercions can't mask or fake a mismatch.
"""

from __future__ import annotations

import datetime as dt
import math
import os

import duckdb
import pytest

from lambda_lakehouse_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    yield get_spark(app_name="lakehouse-tests", shuffle_partitions=8)


@pytest.fixture(scope="session")
def ducks():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()


def _canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def canonical_rows(columns, rows):
    """Column-name-sorted, canonicalized, row-sorted representation."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    out = [tuple(_canon_cell(row[i]) for i in order) for row in rows]
    out.sort()
    return cols, out


def assert_query_matches_oracle(spark, ducks, query, sf_dir: str = SF_DIR):
    """Run the Spark query and its DuckDB oracle; assert identical
    column sets and identical sorted canonical rows."""
    sdf = query.spark(spark, sf_dir)
    s_cols, s_rows = canonical_rows(sdf.columns, [tuple(r) for r in sdf.collect()])

    cur = ducks.execute(query.oracle)
    o_columns = [d[0] for d in cur.description]
    o_cols, o_rows = canonical_rows(o_columns, cur.fetchall())

    assert s_cols == o_cols, f"{query.name}: column mismatch {s_cols} vs {o_cols}"
    assert len(s_rows) == len(o_rows), (
        f"{query.name}: row count {len(s_rows)} vs oracle {len(o_rows)}"
    )
    if s_rows != o_rows:
        diffs = [(i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b][:5]
        raise AssertionError(
            f"{query.name}: value mismatch; first diffs (spark vs oracle): {diffs}"
        )
