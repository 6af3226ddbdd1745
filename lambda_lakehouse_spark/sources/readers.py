"""Batch sources.

Covers SURVEY §2.1:
- S1 CSV scan with the reference's load-bearing reader options
  (``utils/init_spark.py:22-36``): header, multiLine, quote/escape
  ``"``, UTF-8, PERMISSIVE. Unlike the reference we prefer an explicit
  schema (no ``inferSchema`` extra pass over 100 TB of input).
- S2/S3 table scans: plain ``spark.read.parquet`` over the lakehouse
  layout; ``tables()`` registers the standard test tables as temp
  views so ``spark.sql`` works identically to the reference's
  ``spark.sql("select * from nessie.stg.stg_stock")``.
- S4 local-collection source: just ``spark.createDataFrame`` — used by
  the currency lookup seed (see plans/star.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def spread_if_narrow(df: DataFrame, key: str | None) -> DataFrame:
    """Spread a CPU-bound per-row map across all cores when the scan
    would arrive in fewer splits than ``defaultParallelism`` — WITHOUT
    touching ``.rdd`` (which forces a Python-side RDD conversion of
    the plan on every invocation).

    The decision uses only public plan inputs: ``df.inputFiles()``.
    Fewer files than cores → repartition by ``key``; the shuffle moves
    at most that handful of files' worth of bytes and is dwarfed by
    the per-character hashing / array work it unlocks. At real scale
    (thousands of files) the condition is false and the plan is
    untouched — no shuffle. Non-file relations (in-memory test
    fixtures, upstream shuffles) report no input files and pass
    through unchanged: they either already carry shuffle parallelism
    or are tiny.

    ``key=None`` spreads round-robin (keyless ``repartition(n)``):
    use it when no downstream grouping relies on the distribution AND
    the natural key can collide — e.g. exact-duplicate document texts
    (the very case source_contamination targets) all hash one text key
    to a single partition, re-creating the hot spot the spread exists
    to remove (round-12 advice). Keyless repartition pays the
    sort-before-repartition pass (SPARK-23207) but only inside this
    small-input guard, never at real scale.

    Lives here (not operators/dedup) so every operator module can use
    it without import cycles; dedup re-exports the historical
    ``_spread_if_narrow`` name.
    """
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    files = df.inputFiles()
    if files and len(files) < n_parts:
        return df.repartition(n_parts) if key is None else df.repartition(n_parts, key)
    return df


def read_csv_raw(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
) -> DataFrame:
    """CSV scan with the reference raw-zone contract (S1).

    Reference: ``utils/init_spark.py:22-36`` (multiline quoted
    ``business_summary`` fields, UTF-8 incl. BOM from utf-8-sig
    ingest, PERMISSIVE recovery). ``inferSchema`` only when no schema
    is given — at scale always pass one.
    """
    reader = (
        spark.read.option("header", "true")
        .option("multiLine", "true")
        .option("quote", '"')
        .option("escape", '"')
        .option("encoding", "UTF-8")
        .option("mode", "PERMISSIVE")
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one lakehouse table (S2/S3) from a scale-factor directory.

    Parquet ``timestamp[ns]`` columns (which Spark's reader rejects —
    TimestampType is microsecond-precision) are read as raw int64
    nanos and truncated to microsecond timestamps. Truncation (not
    rounding) matches how columnar engines cast ns→us, so oracle
    comparisons stay exact. Footer-only schema probe — no data read.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    ns_cols = _nanos_timestamp_columns(path)
    if not ns_cols:
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def _nanos_timestamp_columns(path: str) -> list[str]:
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
    except Exception:
        return []
    import pyarrow as pa

    return [
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    ]


def tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every standard table and register each as a temp view.

    Gives the SQL entry point (reference E2: ad-hoc ``spark.sql``)
    the same names the DuckDB oracle uses.
    """
    out: dict[str, DataFrame] = {}
    for name in TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(p):
            df = read_table(spark, sf_dir, name)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out


# ---------------------------------------------------------------------------
# JSON-lines source round trip (S-family widening)
# ---------------------------------------------------------------------------
#
# The reference ingests CSV only; real lakehouse feeds are routinely
# JSON-lines (API exports, event streams). This query certifies the
# JSON source path end-to-end: write a typed subset of events as
# newline-delimited JSON, read it back with an EXPLICIT schema (never
# inferSchema on a 100 TB feed — one malformed line would silently
# stringify a column), and aggregate; the oracle computes the same
# aggregate from the original parquet, so serialization round-trip
# fidelity is part of what's certified.

_JSON_ROUNDTRIP_ORACLE = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type
"""


def _register_json_roundtrip() -> None:
    from lambda_lakehouse_spark.functions.scalar import dsum
    from lambda_lakehouse_spark.registry import register

    @register(
        "source_json_roundtrip",
        _JSON_ROUNDTRIP_ORACLE,
        doc="JSON-lines source certified end-to-end: events written as "
        "NDJSON, read back with an explicit schema (no inference), "
        "aggregated — round-trip fidelity checked against the "
        "original parquet by the oracle",
        tags=("source", "json"),
    )
    def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
        import os as _os
        import shutil
        import tempfile

        base = _os.path.join(
            tempfile.gettempdir(),
            f"llh_json_src_{_os.path.basename(sf_dir.rstrip('/'))}",
        )
        shutil.rmtree(base, ignore_errors=True)
        ev = read_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type", "value"
        )
        ev.write.json(base)
        schema = T.StructType([
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ])
        back = spark.read.schema(schema).json(base)
        return back.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )


_register_json_roundtrip()
