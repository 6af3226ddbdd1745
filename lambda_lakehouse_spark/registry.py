"""Central query registry — single source of truth.

Every operator the engine claims (SURVEY §2 inventory + the
training-data extensions) registers here as a named ``Query``:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus, where
SQL-expressible, the exact ANSI SQL a DuckDB oracle runs on the same
parquet tables. ``__spark_entry__.py``, the pytest harness, and
``bench.py`` all consume this registry, so a query is tested, graded,
and benchmarked from one definition.

Cross-engine exactness rules (applied throughout):
- double sums go through decimal(28,6) (see functions.scalar.dsum) —
  order-independent, so Spark's nondeterministic partial-agg order
  and DuckDB agree bit-for-bit;
- column names are aliased identically on both sides (the driver's
  compare sorts columns by name before hashing);
- hashing/fingerprinting uses md5/sha2 hex strings, which both
  engines produce identically.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark: SparkQuery
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name, fn, oracle, doc, tags, bench)
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every query-defining module and return the registry."""
    import lambda_lakehouse_spark.plans.relational  # noqa: F401
    import lambda_lakehouse_spark.plans.star  # noqa: F401
    import lambda_lakehouse_spark.plans.extended  # noqa: F401
    import lambda_lakehouse_spark.operators.dedup  # noqa: F401
    import lambda_lakehouse_spark.operators.multimodal  # noqa: F401
    import lambda_lakehouse_spark.operators.similarity  # noqa: F401
    import lambda_lakehouse_spark.operators.text  # noqa: F401
    import lambda_lakehouse_spark.operators.sessionize  # noqa: F401

    return REGISTRY
