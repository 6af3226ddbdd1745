"""Corpus-construction operators: semantic invariants beyond the oracle
(which only certifies one dataset) — sharding respects the budget,
sampling is deterministic and rate-convergent, materialization keeps
exactly one doc per cluster, filtering partitions the corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from lambda_lakehouse_spark.operators.corpus import (
    _SHARD_BUDGET,
    MIXTURE_WEIGHTS_BP,
    corpus_quality_filter,
    dedup_materialize_corpus,
    sample_mixture_weighted,
    shard_by_token_budget,
)
from lambda_lakehouse_spark.sources.readers import read_table
from tests.conftest import SF_DIR


def test_sharding_respects_budget(spark):
    """Every shard's exclusive-prefix start is inside the previous
    budget window, so a shard never exceeds budget + one document, and
    shard ids are contiguous from 0 within each source."""
    docs = read_table(spark, SF_DIR, "documents")
    sharded = shard_by_token_budget(spark, SF_DIR).join(
        docs.select("doc_id", "n_chars"), "doc_id"
    )
    per_shard = (
        sharded.groupBy("source", "shard_id")
        .agg(F.sum("n_chars").alias("sz"), F.max("n_chars").alias("biggest"))
        .collect()
    )
    for r in per_shard:
        assert r.sz < _SHARD_BUDGET + r.biggest, (r.source, r.shard_id, r.sz)
    by_source = {}
    for r in per_shard:
        by_source.setdefault(r.source, []).append(r.shard_id)
    for source, ids in by_source.items():
        assert sorted(ids) == list(range(len(ids))), source


def test_mixture_sampling_deterministic_and_rate_convergent(spark):
    run1 = {r.doc_id for r in sample_mixture_weighted(spark, SF_DIR).collect()}
    run2 = {r.doc_id for r in sample_mixture_weighted(spark, SF_DIR).collect()}
    assert run1 == run2  # seeded hash → identical sample every run

    docs = read_table(spark, SF_DIR, "documents")
    totals = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    sampled = {
        r.source: r.n
        for r in sample_mixture_weighted(spark, SF_DIR)
        .groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # md5 buckets are uniform; with 25 docs/source allow a wide but
    # direction-checking envelope: low-rate sources sample fewer docs
    # than high-rate ones in aggregate
    low = sum(sampled.get(s, 0) for s, bp in MIXTURE_WEIGHTS_BP.items() if bp <= 3000)
    low_total = sum(totals[s] for s, bp in MIXTURE_WEIGHTS_BP.items() if bp <= 3000)
    high = sum(sampled.get(s, 0) for s, bp in MIXTURE_WEIGHTS_BP.items() if bp >= 7000)
    high_total = sum(totals[s] for s, bp in MIXTURE_WEIGHTS_BP.items() if bp >= 7000)
    assert low / low_total < high / high_total


def test_materialized_corpus_keeps_one_doc_per_cluster(spark):
    from lambda_lakehouse_spark.operators.dedup import (
        _COMPONENTS_THRESHOLD,
        connected_components,
        minhash_lsh_pairs,
    )

    docs = read_table(spark, SF_DIR, "documents")
    kept = dedup_materialize_corpus(spark, SF_DIR)
    pairs = minhash_lsh_pairs(docs.select("doc_id", "text")).where(
        F.col("est_jaccard") >= _COMPONENTS_THRESHOLD
    )
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    clusters = {}
    for r in comp.collect():
        clusters.setdefault(r.cluster_id, set()).add(r.id)
    kept_ids = {r.doc_id for r in kept.collect()}
    # exactly one survivor per cluster, and it is the min id
    for cid, members in clusters.items():
        assert kept_ids & members == {min(members)}
    # every unclustered doc survives
    clustered = set().union(*clusters.values()) if clusters else set()
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert all_ids - clustered <= kept_ids


def test_quality_filter_partitions_corpus(spark):
    out = corpus_quality_filter(spark, SF_DIR)
    n_docs = read_table(spark, SF_DIR, "documents").count()
    assert out.count() == n_docs  # verdict for every doc, pass or fail
    verdicts = {r.verdict for r in out.select("verdict").distinct().collect()}
    assert verdicts <= {
        "pass", "non_english", "too_short", "too_few_tokens", "too_much_punct"
    }
    assert "pass" in verdicts


def test_pack_sequences_nextfit_invariants(spark):
    from lambda_lakehouse_spark.operators.corpus import (
        PACK_BUDGET,
        pack_sequences_nextfit,
    )

    docs = read_table(spark, SF_DIR, "documents")
    packed = pack_sequences_nextfit(docs).collect()

    # every doc packed exactly once
    assert len(packed) == docs.count()
    assert len({(r.source, r.doc_id) for r in packed}) == len(packed)

    by_pack: dict[tuple, list] = {}
    for r in packed:
        by_pack.setdefault((r.source, r.pack_id), []).append(r)
    for rows in by_pack.values():
        total = sum(r.n_chars for r in rows)
        # pack fits the budget unless it is a single oversized doc
        assert total <= PACK_BUDGET or len(rows) == 1

    # packs are contiguous runs in doc_id order (next-fit never splits
    # or reorders): pack_id is non-decreasing along doc_id per source
    for source in {r.source for r in packed}:
        rows = sorted((r for r in packed if r.source == source),
                      key=lambda r: r.doc_id)
        pack_ids = [r.pack_id for r in rows]
        assert pack_ids == sorted(pack_ids)
        assert pack_ids[0] == 0
        # no gaps
        assert set(pack_ids) == set(range(max(pack_ids) + 1))


def test_pack_nextfit_zero_weight_then_oversized(spark):
    """A zero-weight doc must not absorb a following oversized doc
    into its pack (mirrors the recursive-CTE oracle's fold exactly —
    no fill-truthiness shortcut)."""
    from lambda_lakehouse_spark.operators.corpus import pack_sequences_nextfit

    docs = spark.createDataFrame(
        [("s", 1, 0), ("s", 2, 1500), ("s", 3, 10)],
        "source string, doc_id long, n_chars long",
    )
    rows = {r.doc_id: r.pack_id for r in
            pack_sequences_nextfit(docs, budget=1000).collect()}
    assert rows == {1: 0, 2: 1, 3: 2}
