"""Streaming sources — the ingestion half the reference reserved but
never built (SURVEY §2.8: Kafka connection vars for topic
``crypto.trades`` with 6 partitions in ``.env:5-8``, broker commented
out in ``docker-compose-dev.yml:2-40``, zero streaming code).

``kafka_stream`` is the production source (requires the
spark-sql-kafka connector on the classpath — absent in this test
image, so it raises a clear error instead of failing deep inside
stream start). ``file_stream`` / ``rate_stream`` are the test/dev
sources with identical downstream semantics — every operator in
``streaming/jobs.py`` is source-agnostic.

Scale: Kafka parallelism = topic partitions (the reference's 6 → 6
tasks; at real scale partition the topic to ≥ executor cores).
``maxOffsetsPerTrigger`` bounds micro-batch size so a backlogged
topic can't produce an unboundedly large first batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str = "crypto.trades",
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = 1_000_000,
) -> DataFrame:
    """Kafka source → (key, value as string, event metadata) rows."""
    try:
        reader = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", brokers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
        )
        if max_offsets_per_trigger:
            reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
        raw = reader.load()
    except Exception as exc:  # connector jar missing → actionable error
        raise RuntimeError(
            "Kafka source unavailable — add the spark-sql-kafka-0-10 "
            "connector to the classpath (spark.jars.packages)"
        ) from exc
    return raw.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        "topic", "partition", "offset",
        F.col("timestamp").alias("kafka_ts"),
    )


def file_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-drop source: new files in ``path`` become micro-batches —
    the streaming twin of the reference's daily CSV drops."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .format(fmt)
        .load(path)
    )


def rate_stream(spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
    """Synthetic load source (dev/bench): (timestamp, value)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )


def parse_json_events(raw: DataFrame, schema: StructType, value_col: str = "value") -> DataFrame:
    """Parse a JSON payload column into typed columns (the step between
    ``kafka_stream`` and the windowed jobs). Malformed payloads yield
    rows with NULL payload fields and ``_corrupt = true`` — dead-letter
    them by filtering on that flag into a side sink.

    Name collisions resolve in the payload's favor: a parsed field that
    shares a name with a source column (e.g. a payload ``value`` field
    vs Kafka's raw ``value``) replaces it rather than producing
    ambiguous duplicates.
    """
    from pyspark.sql.types import StringType, StructField

    # PERMISSIVE from_json yields an all-NULL struct for malformed
    # input (indistinguishable from a legitimately-empty payload); a
    # corrupt-record field captures the raw string instead.
    crpt = "_corrupt_record"
    with_corrupt = StructType(list(schema.fields) + [StructField(crpt, StringType())])
    parsed = raw.withColumn(
        "_parsed",
        F.from_json(
            F.col(value_col), with_corrupt,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": crpt},
        ),
    )
    fields = [f.name for f in schema.fields]
    keep = [c for c in raw.columns if c != value_col and c not in fields]
    return parsed.select(
        *keep,
        *[F.col(f"_parsed.{n}").alias(n) for n in fields],
        F.col(f"_parsed.{crpt}").isNotNull().alias("_corrupt"),
    )
