"""Structured Streaming jobs — the lambda architecture's speed layer.

The reference reserves but never implements streaming (SURVEY §2.8:
Kafka topic ``crypto.trades`` configured, zero code). This module
completes the lambda greenfield with the Spark-idiomatic equivalents:

- source: any streaming DataFrame (``readStream.format("kafka")`` in
  production; file/rate sources in tests — semantics identical)
- event-time watermarks bounding state for late data
- tumbling / sliding windowed aggregations
- session windows (the streaming twin of operators/sessionize.py)
- ``foreachBatch`` sink running the batch writer's dynamic partition
  overwrite per micro-batch → exactly-once-per-partition, idempotent
  on replay (same rails as the batch layer, SURVEY §2.1 S6)

Scale: watermark + windowed agg state lives in the state store keyed
by (window, group) — bounded by watermark horizon × group
cardinality, independent of stream length. ``foreachBatch`` reuses
the batch writer, so the serving tables are identical whether a day
arrives as a batch file or as a stream.

Watermark caveat (verified empirically on Spark 4.1): the watermark's
HARD guarantee is state cleanup, not late-row exclusion — rows later
than the watermark whose window state was already evicted are dropped,
but a late row that would CREATE new state may still be aggregated
("may or may not be dropped" per the Structured Streaming guide).
Downstream consumers that require exactly-one-window semantics should
dedup in the ``foreachBatch`` sink, not rely on the drop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lambda_lakehouse_spark.functions.scalar import dsum
from lambda_lakehouse_spark.sources.writer import (
    _table_exists,
    write_partitioned,
)


def tumbling_counts(
    stream: DataFrame,
    window: str = "6 hours",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-(window, event_type) counts + exact value sums."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(
    stream: DataFrame,
    window: str = "6 hours",
    slide: str = "3 hours",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Overlapping sliding-window counts per event_type."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def session_rollup(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key: str = "user_id",
) -> DataFrame:
    """Gap-based session windows per key (streaming twin of
    operators/sessionize.sessionize)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), key)
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("session_value"))
        .select(
            key,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def stateful_running_totals(stream: DataFrame, key: str = "user_id") -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-key
    cumulative event count/value emitted once per micro-batch.

    Running totals in *append* mode aren't expressible with built-in
    streaming aggregations (update/complete modes re-emit whole groups);
    per-key state makes them a one-pass operator. State is two scalars
    per key — at scale the state store is keyed by ``key`` and stays
    O(|keys|); production deployments add ``GroupStateTimeout.
    EventTimeTimeout`` + watermark so idle keys expire instead of
    accumulating forever.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    key_type = stream.schema[key].dataType.simpleString()

    def fn(key_tuple, pdfs, state):
        n, total = state.get if state.exists else (0, 0.0)
        batch_n = 0
        for pdf in pdfs:
            batch_n += len(pdf)
            total += float(pdf["value"].sum())
        n += batch_n
        state.update((n, total))
        yield pd.DataFrame(
            {"key": [key_tuple[0]], "batch_n": [batch_n],
             "cum_n": [n], "cum_value": [total]}
        )

    return (
        stream.select(F.col(key).alias("key"), "value")
        .groupBy("key")
        .applyInPandasWithState(
            fn,
            f"key {key_type}, batch_n bigint, cum_n bigint, cum_value double",
            "n bigint, total double",
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def stream_stream_conversion_join(
    clicks: DataFrame,
    purchases: DataFrame,
    within: str = "6 hours",
    watermark: str = "1 hour",
    key: str = "user_id",
    ts_col: str = "ts",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: each purchase matched to the same
    user's clicks in the preceding ``within`` interval (conversion
    attribution). ``how="left_outer"`` additionally emits unconverted
    clicks (purchase columns NULL) once the watermark proves no match
    can still arrive — the funnel-analysis variant.

    Both sides carry watermarks and the join condition bounds event
    time on BOTH ends — that pair is what lets Spark expire join state:
    a buffered click can only match purchases up to ``within`` later,
    so once the purchase-side watermark passes that horizon the click
    is evicted. State size is O(events within watermark+interval
    horizon), independent of stream length.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(
            f"how={how!r} unsupported: right/full outer would emit "
            "NULL-keyed purchase rows; use 'inner' or 'left_outer'"
        )
    c = clicks.withWatermark(ts_col, watermark).select(
        F.col(key).alias("c_key"),
        F.col(ts_col).alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.withWatermark(ts_col, watermark).select(
        F.col(key).alias("p_key"),
        F.col(ts_col).alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    cond = (
        (F.col("c_key") == F.col("p_key"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {within}"))
    )
    return c.join(p, cond, how).select(
        F.col("c_key").alias(key),
        "click_id", "click_ts", "purchase_id", "purchase_ts", "purchase_value",
    )


def dedup_stream(
    stream: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exactly-once dedup on ``keys`` with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` keeps a key in the state store
    only until the watermark passes its event time, so at-least-once
    sources (Kafka redeliveries, file-source replays) collapse to
    exactly-once within the watermark horizon.

    Contrast with plain ``dropDuplicates`` on a stream, whose state
    grows with every distinct key forever — the classic unbounded-state
    leak at 100 TB. The horizon is the dedup guarantee: a duplicate
    arriving later than ``watermark`` after the original may pass; size
    the watermark to the source's maximum redelivery lag.
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def foreach_batch_overwrite(path: str, partition_by: tuple[str, ...]):
    """foreachBatch sink: dynamic-partition-overwrite each micro-batch
    into a parquet table — replays rewrite the same partitions, so the
    sink is idempotent (the streaming analog of the reference's
    re-runnable daily batch, init_spark.py:92-109).

    Contract: each micro-batch must carry COMPLETE partitions (e.g. a
    finished day per trigger — the file-drop cadence the reference's
    daily batch implies). If a partition can span micro-batches, use an
    append sink or a MERGE instead: overwrite would clobber the
    partition's earlier rows.
    """

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_partitioned(batch_df, path, partition_by=partition_by)

    return _sink


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    keys: tuple[str, ...] | list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static join: enrich each micro-batch against a bounded
    static dimension — the speed-layer twin of the batch pipeline's
    broadcast lookups (J7). The static side is re-read per micro-batch
    (so an updated dim table is picked up between triggers) and hinted
    broadcast: stream-static joins are STATELESS — no watermark, no
    state store — precisely because the bounded side ships to every
    task. Only use for dims that stay broadcast-sized; a growing
    right side belongs in a stream-stream join with watermarks.
    """
    return stream.join(F.broadcast(dim), list(keys), how)


def snapshot_append_sink(table):
    """foreachBatch sink appending each micro-batch to a
    :class:`~lambda_lakehouse_spark.sources.snapshots.SnapshotTable`
    as an ATOMIC snapshot commit tagged with the batch id — the
    exactly-once streaming sink the reference's Iceberg storage core
    would provide (each micro-batch = one snapshot; a replayed batch
    after restart is detected by its id and skipped). Readers never
    observe a half-written batch: data files become visible only when
    the batch's manifest publishes.
    """

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        table.append_batch(batch_df, int(epoch_id))

    return _sink


def run_stream_to_memory(df: DataFrame, name: str, output_mode: str = "complete"):
    """Drive a streaming DF to completion against available input and
    return the in-memory result table name (test/dev harness)."""
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return name


def near_dup_alert_sink(
    corpus_bands: DataFrame, alerts_path: str, threshold: float = 0.5
):
    """foreachBatch speed-layer near-dup alerting: each micro-batch of
    incoming (doc_id, text) documents re-hashes ONLY itself and probes
    the persisted corpus band index (``operators.dedup.band_table``)
    via ``minhash_lsh_incremental`` — new×corpus and new×new candidate
    pairs, never a corpus self-join. Pairs with ``est_jaccard >=
    threshold`` are appended to ``alerts_path`` stamped with the epoch.

    This is the lambda-architecture integration of the incremental
    dedup operator: the batch layer maintains the band index (a daily
    ``band_table`` write), the speed layer probes it per trigger, and
    alert consumers read one table partitioned by epoch. The sink is
    idempotent under foreachBatch's at-least-once replay contract: each
    epoch dynamically overwrites ONLY its own ``epoch_id`` partition
    (the same rails as ``foreach_batch_overwrite``), so a micro-batch
    replayed after a crash rewrites identical rows instead of
    appending duplicates.

    Coverage contract (standard lambda split): per trigger the sink
    catches new×corpus and within-batch new×new pairs. A near-dup pair
    SPLIT ACROSS two micro-batches is caught at the batch layer's next
    index refresh (the docs join the band index and the following day's
    increment probes them), not by the speed layer — bounding speed-
    layer state at zero instead of re-implementing the index in the
    state store.
    """
    from lambda_lakehouse_spark.operators.dedup import (
        band_table,
        minhash_lsh_incremental,
    )

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        new_bands = band_table(batch_df.select("doc_id", "text"))
        alerts = (
            minhash_lsh_incremental(corpus_bands, new_bands)
            .where(F.col("est_jaccard") >= threshold)
            .select(
                "doc_a", "doc_b", "n_shared_bands", "est_jaccard",
                F.lit(epoch_id).alias("epoch_id"),
            )
        )
        # replay-idempotent: overwrite this epoch's partition only
        write_partitioned(
            alerts, alerts_path, partition_by=("epoch_id",),
            dynamic_overwrite=True,
        )

    return _sink


def dq_gate_sink(
    rules,
    pass_path: str,
    quarantine_path: str,
):
    """foreachBatch streaming DQ gate: run ``operators.dq
    .with_expectations`` over each micro-batch and route rows to the
    pass / quarantine tables — the speed-layer twin of the batch DQ
    operator (same rule Columns, so batch and stream cannot drift).

    Both writes are replay-idempotent under foreachBatch's
    at-least-once contract: each epoch dynamically overwrites only its
    own ``epoch_id`` partition (the ``near_dup_alert_sink`` rails).
    ``failed_rules`` is stored comma-joined so the quarantine table
    stays flat-typed for any downstream reader.
    """
    from lambda_lakehouse_spark.operators.dq import with_expectations

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        checked = with_expectations(batch_df, rules).withColumn(
            "epoch_id", F.lit(epoch_id)
        )
        passed = checked.where(F.col("dq_pass")).drop("failed_rules", "dq_pass")
        quarantined = (
            checked.where(~F.col("dq_pass"))
            .withColumn("failed_rules", F.concat_ws(",", "failed_rules"))
            .drop("dq_pass")
        )
        # one materialization of the shared verdict subtree per leg is
        # fine: each is a narrow filter over the batch scan
        write_partitioned(
            passed, pass_path, partition_by=("epoch_id",),
            dynamic_overwrite=True,
        )
        write_partitioned(
            quarantined, quarantine_path, partition_by=("epoch_id",),
            dynamic_overwrite=True,
        )

    return _sink


def wap_sink(table, rules, quarantine: list | None = None):
    """foreachBatch Write-Audit-Publish sink: every micro-batch stages
    on an isolated branch, is audited against the declarative DQ
    ``rules`` (operators/dq.py), and publishes to main ONLY if clean —
    the streaming form of ``sources.snapshots.write_audit_publish``.
    A dirty batch is discarded whole (atomic reject: either every row
    of the batch lands or none do) and its id is recorded in
    ``quarantine`` (caller-supplied list) for replay after the
    upstream fix; main's history stays an audited-commits-only chain.

    Exactly-once composition: the publish commit on main carries the
    merge metadata, and replayed CLEAN batches re-stage + re-merge
    idempotently at the table level because the audit is deterministic
    over the batch's rows.
    """
    from lambda_lakehouse_spark.sources.snapshots import write_audit_publish

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        r = write_audit_publish(
            table, batch_df, rules, branch=f"wap-batch-{int(epoch_id)}"
        )
        if r["published"] is None and quarantine is not None:
            quarantine.append(
                {"batch_id": int(epoch_id), "n_rows": r["n_rows"],
                 "n_bad": r["n_bad"]}
            )

    return _sink


def near_dup_index_sink(
    index_path: str, alerts_path: str, threshold: float = 0.5
):
    """foreachBatch speed layer WITH in-stream index refresh: each
    micro-batch probes the cumulative band index (every band committed
    by EARLIER epochs), appends its alerts, then commits its own bands
    — so a near-dup pair split across two micro-batches is caught at
    the later doc's trigger instead of waiting for the batch layer's
    daily refresh. This is ``operators.dedup.dedup_incremental_replay``
    run as a stream: the union of per-epoch alerts over the stream's
    lifetime equals the one-shot LSH self-join over the streamed
    corpus, thresholded (the replay query certifies that equality
    against the DuckDB oracle; the streaming test pins the twin).

    Replay-idempotence (foreachBatch is at-least-once): both the alert
    table and the index are partitioned by ``epoch_id`` and each epoch
    dynamically overwrites ONLY its own partition; the probe reads
    strictly-earlier epochs (``epoch_id < current``), so a replayed
    epoch never sees its own half-committed bands and rewrites
    byte-identical output.

    Scale: per trigger the join cost is |batch bands| probing the
    bucket key of an index that grows with the corpus — the identical
    shape to the certified incremental batch; state-store footprint is
    zero (the index lives in the table layer, not executor state).
    """
    from lambda_lakehouse_spark.operators.dedup import (
        band_table,
        minhash_lsh_incremental,
    )

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        new_bands = band_table(batch_df.select("doc_id", "text"))
        # Explicit existence probe, NOT a bare try/except around the
        # read: a swallowed transient read failure (corrupt file, FS
        # error, permissions) would silently yield an empty corpus —
        # the epoch's alerts miss every cross-epoch pair while its own
        # bands still commit, and since later epochs only probe EARLIER
        # bands those pairs are lost forever, breaking the documented
        # union==full-self-join guarantee. _table_exists fails safe on
        # unresolvable schemes; a genuine read error now propagates so
        # foreachBatch retries the micro-batch instead of committing
        # incomplete alerts.
        if _table_exists(spark, index_path):
            corpus_bands = (
                spark.read.parquet(index_path)
                .where(F.col("epoch_id") < epoch_id)
                .drop("epoch_id")
            )
        else:  # first epoch: no index yet
            corpus_bands = spark.createDataFrame([], new_bands.schema)
        alerts = (
            minhash_lsh_incremental(corpus_bands, new_bands)
            .where(F.col("est_jaccard") >= threshold)
            .select(
                "doc_a", "doc_b", "n_shared_bands", "est_jaccard",
                F.lit(epoch_id).alias("epoch_id"),
            )
        )
        write_partitioned(
            alerts, alerts_path, partition_by=("epoch_id",),
            dynamic_overwrite=True,
        )
        write_partitioned(
            new_bands.withColumn("epoch_id", F.lit(epoch_id)),
            index_path, partition_by=("epoch_id",),
            dynamic_overwrite=True,
        )

    return _sink
