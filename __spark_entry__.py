"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``lambda_lakehouse_spark.registry`` — every operator
registers there once and is exposed here, to the pytest harness, and
to ``bench.py`` from the same definition.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lambda_lakehouse_spark.registry import load_all


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from lambda_lakehouse_spark.plans.star import fact_assembly_star

    return fact_assembly_star(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted → rows-only)."""
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
