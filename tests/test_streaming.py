"""Structured Streaming jobs (SURVEY §2.8 greenfield): windowed aggs
with watermarks, session windows, foreachBatch dynamic-overwrite sink.
A file stream over the events table drives each query to completion;
results are compared against the equivalent batch computation."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from lambda_lakehouse_spark.functions.scalar import dsum
from lambda_lakehouse_spark.operators.sessionize import sessionize
from lambda_lakehouse_spark.sources.readers import read_table
from lambda_lakehouse_spark.streaming.jobs import (
    foreach_batch_overwrite,
    run_stream_to_memory,
    session_rollup,
    sliding_counts,
    stateful_running_totals,
    tumbling_counts,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_src(spark, tmp_path_factory):
    """Events re-materialized as micros-timestamp parquet so the file
    stream source can read them (driver testdata is timestamp[ns])."""
    path = str(tmp_path_factory.mktemp("stream") / "events")
    batch = read_table(spark, SF_DIR, "events")
    # several files so maxFilesPerTrigger=1 yields real multi-batch runs
    batch.repartition(6).write.mode("overwrite").parquet(path)
    return path, batch


def _stream(spark, path, schema):
    return spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(path)


def test_tumbling_window_matches_batch(spark, events_src):
    path, batch = events_src
    stream = _stream(spark, path, batch.schema)
    name = run_stream_to_memory(
        tumbling_counts(stream, watermark="3650 days"), "tumbling_out"
    )
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.table(name).collect()
    }
    expected = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in (
            batch.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("total_value"))
            .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
        ).collect()
    }
    assert got == expected and len(got) > 0


def test_sliding_window_overlap(spark, events_src):
    path, batch = events_src
    stream = _stream(spark, path, batch.schema)
    name = run_stream_to_memory(
        sliding_counts(stream, watermark="3650 days"), "sliding_out"
    )
    rows = spark.table(name).collect()
    # every event lands in window_size/slide = 2 overlapping windows
    assert sum(r.n_events for r in rows) == 2 * batch.count()


def test_session_window_matches_batch_sessionize(spark, events_src):
    path, batch = events_src
    stream = _stream(spark, path, batch.schema)
    name = run_stream_to_memory(
        session_rollup(stream, watermark="3650 days"), "session_out"
    )
    streamed = spark.table(name)
    # session count per user must equal the batch gap-rule session count
    got = {
        r.user_id: r.n_sessions
        for r in streamed.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_sessions")).collect()
    }
    batch_sessions = sessionize(
        batch.select("event_id", "user_id", "ts", "value"), "user_id", "ts"
    )
    expected = {
        r.user_id: r.n_sessions
        for r in batch_sessions.groupBy("user_id")
        .agg(F.max("session_seq").alias("n_sessions"))
        .collect()
    }
    assert got == expected


def test_stateful_running_totals(spark, events_src):
    path, batch = events_src
    stream = _stream(spark, path, batch.schema)
    name = run_stream_to_memory(
        stateful_running_totals(stream), "stateful_out", output_mode="append"
    )
    out = spark.table(name)
    # the last emission per key carries the final cumulative totals,
    # which must equal the batch aggregation
    final = {
        r.key: (r.cum_n, r.cum_value)
        for r in out.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("key").orderBy(F.col("cum_n").desc())
            ),
        )
        .where(F.col("rk") == 1)
        .collect()
    }
    expected = {
        r.user_id: (r.n, r.total)
        for r in batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert set(final) == set(expected)
    for k, (n, total) in expected.items():
        assert final[k][0] == n
        assert final[k][1] == pytest.approx(total, rel=1e-9)
    # statefulness: with maxFilesPerTrigger=1 most keys span batches,
    # so there must be more emissions than keys
    assert out.count() > len(final)


def test_foreach_batch_dynamic_overwrite_sink(spark, tmp_path_factory, tmp_path):
    # the sink's contract requires partition-complete micro-batches:
    # hash-partition by event_date so no date ever spans two files
    path = str(tmp_path_factory.mktemp("stream") / "events_by_date")
    batch = read_table(spark, SF_DIR, "events").withColumn(
        "event_date", F.to_date("ts").cast("string")
    )
    batch.repartition(6, "event_date").write.mode("overwrite").parquet(path)
    out = str(tmp_path / "serving")
    stream = _stream(spark, path, batch.schema)
    sink = foreach_batch_overwrite(out, ("event_date",))
    q = stream.writeStream.outputMode("append").foreachBatch(sink).start()
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(out)
    assert got.count() == batch.count()
    # replaying the full input is idempotent (dynamic overwrite)
    sink(batch, 999)
    assert spark.read.parquet(out).count() == batch.count()


def test_parse_json_events_stream(spark, tmp_path_factory):
    from pyspark.sql.types import StructType, StructField, StringType, DoubleType

    from lambda_lakehouse_spark.streaming.sources import file_stream, parse_json_events

    path = str(tmp_path_factory.mktemp("stream") / "json_events")
    payloads = [
        ('{"sym": "BTC", "px": 50000.5}',),
        ('{"sym": "ETH", "px": 3000.25}',),
        ("not json at all",),
    ]
    src = spark.createDataFrame(payloads, ["value"])
    src.write.mode("overwrite").parquet(path)

    schema = StructType(
        [StructField("sym", StringType()), StructField("px", DoubleType())]
    )
    stream = file_stream(spark, path, src.schema)
    parsed = parse_json_events(stream, schema)
    name = run_stream_to_memory(parsed, "json_out", output_mode="append")
    rows = spark.table(name).collect()
    got = {(r.sym, r.px, r._corrupt) for r in rows}
    # malformed payload survives as a flagged NULL row (dead-letter-able)
    assert got == {
        ("BTC", 50000.5, False),
        ("ETH", 3000.25, False),
        (None, None, True),
    }


def test_kafka_stream_unavailable_raises(spark):
    from lambda_lakehouse_spark.streaming.sources import kafka_stream

    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        kafka_stream(spark, "localhost:9092")


def test_stream_stream_conversion_join_matches_batch(spark, events_src):
    from lambda_lakehouse_spark.streaming.jobs import stream_stream_conversion_join

    path, batch = events_src
    clicks = _stream(spark, path, batch.schema).where(
        F.col("event_type") == "click"
    )
    purchases = _stream(spark, path, batch.schema).where(
        F.col("event_type") == "purchase"
    )
    within = "6 hours"
    joined = stream_stream_conversion_join(
        clicks, purchases, within=within, watermark="3650 days"
    )
    name = run_stream_to_memory(joined, "conv_out", output_mode="append")
    got = {
        (r.click_id, r.purchase_id) for r in spark.table(name).collect()
    }

    bc = batch.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_key"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    bp = batch.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_key"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    expected = {
        (r.click_id, r.purchase_id)
        for r in bc.join(
            bp,
            (F.col("c_key") == F.col("p_key"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts") + F.expr(f"INTERVAL {within}")
            ),
        ).collect()
    }
    assert got == expected and len(got) > 0


def test_stream_stream_left_outer_emits_unconverted(spark, events_src, tmp_path):
    from lambda_lakehouse_spark.streaming.jobs import stream_stream_conversion_join

    # single-file stream: one data batch (no late-arrival drops from
    # random file order), then the no-data batch advances the watermark
    # so unconverted clicks older than (max_ts - delay - within) emit
    _, batch = events_src
    path = str(tmp_path / "events_one")
    batch.coalesce(1).write.mode("overwrite").parquet(path)
    within = "6 hours"
    clicks = _stream(spark, path, batch.schema).where(
        F.col("event_type") == "click"
    )
    purchases = _stream(spark, path, batch.schema).where(
        F.col("event_type") == "purchase"
    )
    joined = stream_stream_conversion_join(
        clicks, purchases, within=within, watermark="10 minutes",
        how="left_outer",
    )
    name = run_stream_to_memory(joined, "funnel_out", output_mode="append")
    out = spark.table(name)
    got_pairs = {
        (r.click_id, r.purchase_id)
        for r in out.where(F.col("purchase_id").isNotNull()).collect()
    }
    got_null_clicks = {
        r.click_id for r in out.where(F.col("purchase_id").isNull()).collect()
    }

    bc = batch.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_key"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    bp = batch.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_key"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    matched = bc.join(
        bp,
        (F.col("c_key") == F.col("p_key"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {within}")),
    )
    expected_pairs = {(r.click_id, r.purchase_id) for r in matched.collect()}
    matched_click_ids = {p[0] for p in expected_pairs}

    # matched side is exact; the join must not invent or drop pairs
    assert got_pairs == expected_pairs
    # null rows appear only for genuinely unconverted clicks, and the
    # watermark has provably passed for most of the stream → non-empty
    assert got_null_clicks, "expected unconverted clicks to be emitted"
    assert not (got_null_clicks & matched_click_ids)


def test_checkpoint_recovery_exactly_once(spark, events_src, tmp_path):
    """Kill a streaming query mid-stream and restart it from its
    checkpoint: the file sink must end up with every input row exactly
    once (no loss from the kill, no duplicates from the restart)."""
    import time

    path, batch = events_src
    out = str(tmp_path / "recovered_out")
    chk = str(tmp_path / "chk")

    def start():
        return (
            _stream(spark, path, batch.schema)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", chk)
            .outputMode("append")
            .start()
        )

    q = start()
    # wait until at least one batch committed, then kill mid-stream
    deadline = time.time() + 60
    while time.time() < deadline:
        p = q.lastProgress
        if p and p["batchId"] >= 1:
            break
        time.sleep(0.2)
    q.stop()

    q2 = start()
    q2.processAllAvailable()
    q2.stop()

    got = spark.read.parquet(out)
    assert got.count() == batch.count()
    assert got.select("event_id").distinct().count() == batch.count()


def test_sf01_stream_end_to_end_exactly_once(spark, tmp_path_factory):
    """The full speed-layer pipeline at sf0.1 (100k events, 30 days):
    file-drop source → bounded-state streaming dedup → foreachBatch
    dynamic-partition-overwrite into a date-partitioned serving table,
    under at-least-once delivery (the entire input re-dropped as a
    second wave of files). The serving table must hold every event
    exactly once — equal to the batch twin.

    Partition-completeness contract: input files are hash-partitioned
    by event_date, so each date lives in exactly one file and every
    micro-batch (maxFilesPerTrigger=1) carries complete dates; the
    redelivery wave collapses to empty batches inside dedup_stream, so
    the overwrite sink never sees a partial date."""
    from lambda_lakehouse_spark.streaming.jobs import dedup_stream

    sf01 = "/root/testdata/sf0.1"
    path = str(tmp_path_factory.mktemp("sf01_stream") / "events")
    out = str(tmp_path_factory.mktemp("sf01_stream") / "serving")
    batch = read_table(spark, sf01, "events").withColumn(
        "event_date", F.to_date("ts").cast("string")
    )
    # wave 1: original delivery; wave 2: full redelivery (same rows,
    # different file layout — the at-least-once failure mode)
    batch.repartition(6, "event_date").write.mode("overwrite").parquet(path)
    batch.repartition(3, "event_date").write.mode("append").parquet(path)

    stream = _stream(spark, path, batch.schema)
    deduped = dedup_stream(stream, keys=("event_id",), watermark="3650 days")
    sink = foreach_batch_overwrite(out, ("event_date",))
    sq = deduped.writeStream.outputMode("append").foreachBatch(sink).start()
    sq.processAllAvailable()
    sq.stop()

    got = spark.read.parquet(out)
    n_batch = batch.count()
    assert got.count() == n_batch, "serving table lost or duplicated rows"
    assert got.select("event_id").distinct().count() == n_batch
    # the partitioned layout is the serving contract
    assert got.select("event_date").distinct().count() == 30


def test_dedup_stream_collapses_redelivery(spark, tmp_path_factory):
    """At-least-once delivery (the whole input re-appended as a second
    set of files) collapses to exactly-once through
    dropDuplicatesWithinWatermark; state is bounded by the watermark."""
    from lambda_lakehouse_spark.streaming.jobs import dedup_stream

    path = str(tmp_path_factory.mktemp("dedup_stream") / "events")
    batch = read_table(spark, SF_DIR, "events").limit(500)
    # original delivery + full redelivery (same rows, separate files)
    batch.repartition(3).write.mode("overwrite").parquet(path)
    batch.repartition(2).write.mode("append").parquet(path)

    stream = _stream(spark, path, batch.schema)
    name = run_stream_to_memory(
        dedup_stream(stream, keys=("event_id",), watermark="3650 days"),
        "dedup_stream_out",
        output_mode="append",
    )
    got = [r.event_id for r in spark.table(name).collect()]
    assert len(got) == len(set(got)), "duplicates survived the stream dedup"
    assert sorted(got) == sorted(
        r.event_id for r in batch.select("event_id").collect()
    )


def test_near_dup_alert_stream_matches_per_batch_incremental(
    spark, tmp_path_factory
):
    """Speed-layer near-dup alerting: streamed docs probe the persisted
    corpus band index per micro-batch; the alert table must equal the
    union of per-batch incremental results (new×corpus + within-batch
    new×new — the documented lambda coverage contract), with exact
    per-pair scores."""
    from lambda_lakehouse_spark.operators.dedup import (
        band_table,
        minhash_lsh_incremental,
    )
    from lambda_lakehouse_spark.streaming.jobs import near_dup_alert_sink

    docs = read_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "source"
    )
    is_new = F.col("source").isin("src18", "src19")
    corpus = docs.where(~is_new).select("doc_id", "text")
    new = docs.where(is_new).select("doc_id", "text")
    # the persisted index stand-in (batch layer output)
    corpus_bands = band_table(corpus).localCheckpoint()

    # two file drops → two micro-batches (src18 then src19)
    drop_dir = str(tmp_path_factory.mktemp("neardup") / "in")
    b1 = docs.where(F.col("source") == "src18").select("doc_id", "text")
    b2 = docs.where(F.col("source") == "src19").select("doc_id", "text")
    b1.coalesce(1).write.mode("append").parquet(drop_dir)
    b2.coalesce(1).write.mode("append").parquet(drop_dir)

    alerts_path = str(tmp_path_factory.mktemp("neardup") / "alerts")
    stream = _stream(spark, drop_dir, new.schema)
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(near_dup_alert_sink(corpus_bands, alerts_path, 0.5))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in spark.read.parquet(alerts_path).collect()
    }
    expected = {}
    for b in (b1, b2):
        inc = minhash_lsh_incremental(corpus_bands, band_table(b)).where(
            F.col("est_jaccard") >= 0.5
        )
        for r in inc.collect():
            expected[(r.doc_a, r.doc_b)] = r.est_jaccard
    assert set(got) == set(expected)
    assert all(abs(got[k] - expected[k]) < 1e-12 for k in got)
    # sanity: the fixture actually exercises the path
    assert len(got) > 0


def test_dq_gate_stream_partitions_and_matches_batch(spark, events_src, tmp_path):
    """Streaming DQ gate: pass + quarantine tables together hold every
    event exactly once, quarantine rows carry the right failed_rules,
    and the routing matches the batch with_expectations verdicts."""
    from lambda_lakehouse_spark.operators.dq import with_expectations
    from lambda_lakehouse_spark.streaming.jobs import dq_gate_sink

    path, batch = events_src
    rules = {
        "positive_value": F.col("value") > 0,
        "known_type": F.col("event_type").isin(
            "click", "view", "purchase", "signup"
        ),  # 'error' events quarantine
    }
    pass_path = str(tmp_path / "dq_pass")
    quar_path = str(tmp_path / "dq_quarantine")
    stream = _stream(spark, path, batch.schema)
    q = (
        stream.writeStream.foreachBatch(dq_gate_sink(rules, pass_path, quar_path))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    passed = spark.read.parquet(pass_path)
    quarantined = spark.read.parquet(quar_path)
    n_total = batch.count()
    assert passed.count() + quarantined.count() == n_total
    assert quarantined.where(F.col("failed_rules") == "").count() == 0

    # verdict parity with the batch operator on the same rules
    expected_quar = {
        r.event_id
        for r in with_expectations(batch, rules)
        .where(~F.col("dq_pass"))
        .select("event_id")
        .collect()
    }
    got_quar = {r.event_id for r in quarantined.select("event_id").collect()}
    assert got_quar == expected_quar and len(got_quar) > 0

    # every 'error' event quarantines with known_type listed
    err_rows = quarantined.where(F.col("event_type") == "error")
    assert err_rows.count() == batch.where(F.col("event_type") == "error").count()
    assert all(
        "known_type" in r.failed_rules.split(",") for r in err_rows.collect()
    )


def test_stream_static_enrich_matches_batch(spark, events_src):
    """Stream-static broadcast enrichment (stateless, J7's speed-layer
    twin): every micro-batch row picks up its dimension attributes;
    result equals the batch join."""
    from lambda_lakehouse_spark.streaming.jobs import stream_static_enrich

    path, batch = events_src
    dim = batch.select("event_type").distinct().withColumn(
        "type_group",
        F.when(F.col("event_type").isin("view", "click"), "browse")
        .otherwise("convert"),
    )
    stream = _stream(spark, path, batch.schema)
    name = run_stream_to_memory(
        stream_static_enrich(stream, dim, keys=("event_type",)),
        "enrich_out",
        output_mode="append",
    )
    got = spark.table(name).groupBy("type_group").count().collect()
    expected = (
        batch.join(dim, "event_type", "left").groupBy("type_group").count().collect()
    )
    assert {(r.type_group, r["count"]) for r in got} == {
        (r.type_group, r["count"]) for r in expected
    } and len(got) > 0


def test_wap_sink_publishes_clean_quarantines_dirty(spark, tmp_path):
    """Streaming Write-Audit-Publish: micro-batches stage on a branch
    per batch; clean batches publish atomically, a dirty batch is
    rejected WHOLE and recorded for replay — main's history holds
    audited commits only."""
    from lambda_lakehouse_spark.sources.snapshots import SnapshotTable
    from lambda_lakehouse_spark.streaming.jobs import wap_sink

    src = str(tmp_path / "src")
    # 3 single-file batches: two clean, one with a negative value
    spark.createDataFrame([(1, "a", 10.0), (2, "b", 20.0)],
                          "id long, part string, v double"
                          ).coalesce(1).write.parquet(src + "/f1")
    spark.createDataFrame([(3, "a", -5.0), (4, "b", 30.0)],
                          "id long, part string, v double"
                          ).coalesce(1).write.parquet(src + "/f2")
    spark.createDataFrame([(5, "a", 40.0)],
                          "id long, part string, v double"
                          ).coalesce(1).write.parquet(src + "/f3")

    t = SnapshotTable(spark, str(tmp_path / "tbl"), partition_by=["part"])
    t.create(spark.createDataFrame([], "id long, part string, v double"))

    schema = "id long, part string, v double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/f*")
    )
    quarantine: list = []
    q = (
        stream.writeStream.foreachBatch(
            wap_sink(t, {"v_non_negative": F.col("v") >= 0}, quarantine)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(r.id for r in t.read().collect())
    assert got == [1, 2, 5]                      # dirty batch fully absent
    assert len(quarantine) == 1
    assert quarantine[0]["n_bad"] == 1 and quarantine[0]["n_rows"] == 2
    assert t.branches() == []                    # no staging debris
    ops = [s["operation"] for s in t.snapshots()]
    assert ops[0] == "create" and all(o == "merge_branch" for o in ops[1:])


def test_near_dup_index_refresh_stream_equals_full_selfjoin(
    spark, tmp_path_factory
):
    """Speed layer WITH in-stream index refresh: over the stream's
    lifetime the alert union must equal the one-shot LSH self-join of
    the streamed corpus (thresholded), each pair attributed to its
    later doc's epoch — the streaming twin of
    dedup_incremental_replay's certified guarantee."""
    from lambda_lakehouse_spark.operators.dedup import minhash_lsh_pairs
    from lambda_lakehouse_spark.streaming.jobs import near_dup_index_sink

    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    drop_dir = str(tmp_path_factory.mktemp("ndidx") / "in")
    batches = [
        docs.where(F.col("doc_id") % 3 == k).select("doc_id", "text")
        for k in range(3)
    ]
    # One file per drop → one micro-batch each (maxFilesPerTrigger=1).
    # The file source orders files by modification time, and three
    # rapid sequential drops can tie on coarse mtimes — which would
    # batch or reorder the drops and break the epoch-attribution
    # assertion below. Stamp strictly-increasing mtimes explicitly so
    # arrival order is deterministic, not a filesystem accident.
    import glob as _glob
    import os as _os

    stamped: set = set()
    for i, b in enumerate(batches):
        b.coalesce(1).write.mode("append").parquet(drop_dir)
        for f in _glob.glob(drop_dir + "/*.parquet"):
            if f not in stamped:
                _os.utime(f, (1_700_000_000 + 60 * i,) * 2)
                stamped.add(f)

    base = tmp_path_factory.mktemp("ndidx")
    index_path, alerts_path = str(base / "index"), str(base / "alerts")
    stream = _stream(spark, drop_dir, batches[0].schema)
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(near_dup_index_sink(index_path, alerts_path, 0.5))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r.doc_a, r.doc_b): (r.est_jaccard, r.epoch_id)
        for r in spark.read.parquet(alerts_path).collect()
    }
    expected = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in minhash_lsh_pairs(docs).where(
            F.col("est_jaccard") >= 0.5
        ).collect()
    }
    assert set(got) == set(expected)
    assert all(abs(got[k][0] - expected[k]) < 1e-12 for k in got)
    assert len(got) > 0, "fixture must exercise the path"
    # epoch ordering is arrival order (file drops in doc_id%3 order),
    # so each pair's epoch is the later doc's batch
    for (a, b), (_, epoch) in got.items():
        assert epoch == max(a % 3, b % 3)


def test_near_dup_index_sink_replay_is_idempotent(spark, tmp_path_factory):
    """foreachBatch is at-least-once: replaying an epoch (same batch,
    same epoch_id) must leave both the alert table and the band index
    byte-identical — each epoch dynamically overwrites only its own
    partition and probes strictly-earlier epochs."""
    from lambda_lakehouse_spark.streaming.jobs import near_dup_index_sink

    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    b0 = docs.where(F.col("doc_id") % 3 == 0)
    b1 = docs.where(F.col("doc_id") % 3 == 1)
    base = tmp_path_factory.mktemp("ndidem")
    index_path, alerts_path = str(base / "index"), str(base / "alerts")
    sink = near_dup_index_sink(index_path, alerts_path, 0.5)

    sink(b0, 0)
    sink(b1, 1)
    snap_alerts = sorted(map(tuple, spark.read.parquet(alerts_path).collect()))
    snap_index = sorted(map(tuple, spark.read.parquet(index_path).collect()))
    assert snap_alerts

    sink(b1, 1)  # crash-replay of the last epoch
    assert sorted(map(tuple, spark.read.parquet(alerts_path).collect())) == snap_alerts
    assert sorted(map(tuple, spark.read.parquet(index_path).collect())) == snap_index

    sink(b0, 0)  # pathological re-delivery of an OLD epoch: its probe
    # sees no earlier epochs (epoch_id < 0 is empty) and rewrites the
    # identical partition — still a no-op
    assert sorted(map(tuple, spark.read.parquet(alerts_path).collect())) == snap_alerts
    assert sorted(map(tuple, spark.read.parquet(index_path).collect())) == snap_index
