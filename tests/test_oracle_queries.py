"""The correctness gate, locally: every registered query with an
oracle is executed on Spark AND DuckDB and compared the way the
driver's t2 harness does. Queries without an oracle get a rows-run
smoke check."""

from __future__ import annotations

import pytest

from lambda_lakehouse_spark.registry import load_all, load_queue, load_staged
from tests.conftest import SF_DIR, assert_query_matches_oracle

REGISTRY = load_all()
STAGED = load_staged()
QUEUE = load_queue()
WITH_ORACLE = sorted(name for name, q in REGISTRY.items() if q.oracle is not None)
NO_ORACLE = sorted(name for name, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, ducks, name):
    assert_query_matches_oracle(spark, ducks, REGISTRY[name])


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_query_matches_oracle(spark, ducks, name):
    """Round-6 queue: staged queries pass the identical oracle gate
    before they are ever exposed to the grading driver."""
    q = STAGED[name]
    if q.oracle is None:
        df = q.spark(spark, SF_DIR)
        assert df.count() >= 0
    else:
        assert_query_matches_oracle(spark, ducks, q)


@pytest.mark.parametrize("name", sorted(QUEUE))
def test_queue_query_matches_oracle(spark, ducks, name):
    """Build-ahead queue: queue queries pass the identical oracle gate
    before they are ever promoted to STAGED."""
    q = QUEUE[name]
    if q.oracle is None:
        df = q.spark(spark, SF_DIR)
        assert df.count() >= 0
    else:
        assert_query_matches_oracle(spark, ducks, q)


@pytest.mark.parametrize("name", NO_ORACLE)
def test_query_runs(spark, name):
    df = REGISTRY[name].spark(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) == len(REGISTRY)
