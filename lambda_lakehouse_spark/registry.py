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

# Queries fully implemented and oracle-tested (tests/test_oracle_queries.py
# runs them against DuckDB like everything else) but NOT yet exposed to the
# grading driver: the driver grades a 50-query window per round, and when a
# round's window is already committed to the existing uncertified backlog,
# new work stages here and graduates into REGISTRY (+ DRIVER_PRIORITY) at
# the next round boundary. Staging is a scheduling state, not a quality
# tier — the pytest gate is identical.
#
# GRADUATION PROCEDURE (first session of the following round):
#   1. flip each query's ``staged=True`` to default (remove the kwarg);
#   2. rebuild DRIVER_PRIORITY with tools/gen_driver_window.py (orders
#      never-green first — staged graduates have no green driver row —
#      then --must re-certs, then the stalest greens);
#   3. re-run: python tools/gen_coverage_appendix.py && pytest
#      tests/test_registry_contract.py — the window-fit invariant will
#      fail loudly if too many uncertified queries would queue at once.
# The round-5 cohort (33 queries) graduated at the round-6 boundary,
# the round-6 cohort (24) at the round-7 boundary, the round-7 cohort
# (29) at the round-8 boundary, the round-8 cohort (5) at the round-9
# boundary, the round-9 cohort (5) at the round-10 boundary, and the
# round-10 cohort (5: substring runs/coverage, fertility, isotropy,
# unigram-cosine) at the round-11 boundary, each following exactly
# this procedure. STAGED holds the 5 queue entries promoted
# oldest-first at the round-11 boundary (bitext margin, chi2
# keywords, k-core coreness, signal spearman, k-center coreset),
# queued for round 12.
#
# STALENESS / ROTATION POLICY (adopted round 8, per the round-7
# verdict): at 219 registered queries and a 50-slot driver window, a
# full re-certification cycle takes ~4.5 rounds, so driver-green
# staleness is bounded by scheduling, not by code health (pytest
# re-proves every oracle each run regardless). To keep the bound from
# growing:
#   - new STAGED work is capped at 5 queries per round, so graduations
#     consume at most ~5 window slots the following round;
#   - every remaining slot goes to the stalest greens, oldest round
#     first (gen_driver_window.py orders this mechanically);
#   - changed-plan queries are forced in via --must even if their last
#     green is recent — a green row must certify the CURRENT plan.
# With ≤5 graduates + ~45 rotation slots per round the steady-state
# re-cert cycle is ~224/45 ≈ 5.0 rounds; the r8 window front-loads the
# final oversized graduation (29) and clears 15 of the 49-query
# r4-stale cohort; the r9 window takes the 5 r8 graduates + the
# remaining 34 r4-greens (clearing r4 entirely) + the 11
# alphabetically-first r5 greens.
#
# ROUND-10 ROTATION — EXECUTED (round-9 verdict, demand 2): the 5 r9
# graduates took slots 1-5, three --must re-certs (dedup_ngram_jaccard
# rebased onto the prefix-filter plan; dedup_lsh_eval bounded to the
# md5-selected 18.75% doc slice, measured ~63 s -> ~11 s isolated at
# sf0.1 — both round-9-verdict plan changes — plus the round-10
# simhash bit_count verify rewrite, 14.1 -> ~6.3 s) took slots 6-8,
# all 34 remaining r5 greens cleared the r5 tier (slots 9-42), and
# the 8 alphabetically-first r6 greens filled slots 43-50 (the musts
# consumed the other pre-planned r6 slots). Registry 229; all 50 rows
# green in CORRECTNESS_r10.
#
# ROUND-11 ROTATION — EXECUTED (round-10 verdict, demands 1+4): the 5
# r10 graduates took slots 1-5; five --must re-certs took slots 6-10,
# all round-11 plan changes:
#   agg_approx_sketches split per demand 3 — the registered plan now
#     carries sketch-only contract booleans (cross-estimator
#     agreement, quantile bounds, HLL merge identity); the exact
#     countDistinct / exact-percentile audits moved to a pytest
#     property at small SF (16.5 -> 1.1 s at sf0.1);
#   dedup_lsh_eval slice trimmed 18.75% -> 12.5% (demand 7) AND the
#     shared _doc_grain_jaccard verify given an explicit-count
#     repartition (AQE coalesces the byte-tiny candidate exchange to
#     ONE task and serializes the CPU-dense array_intersect verify —
#     measured 8 s of a 10.9 s run on one core; 10.99 -> 3.8-4.8 s);
#   dedup_minhash_lsh_verified inherits the same verify repartition
#     (~3.7-4.6 s in-session, no regression);
#   dedup_ngram_jaccard / dedup_jaccard_prefix_filter got the same
#     explicit repartition in jaccard_prefix_filter_pairs' inline
#     verify (8.07 -> 6.11 s / 9.10 -> 7.30 s); per the round-10
#     advice the byte-identical twins are ONE certification unit —
#     the must names dedup_ngram_jaccard, prefix_filter inherits;
#   dedup_simhash_hamming_pairs (fifth must, found while building the
#     64-bit queue variant): the one-file-split documents scan
#     serialized the CPU-dense vote loop on one core and
#     CollapseProject inlined the signature expression into sig_int
#     (twice-per-row evaluation) — _spread_if_narrow before the
#     signature projection + checkpoint moved before the conv;
#     6.3 -> ~2.1-3.0 s at sf0.1, output identical.
# The ENTIRE 33-query r6 tier cleared (slots 11-43) and the 7
# alphabetically-first r7 greens filled slots 44-50. Registry 234.
#
# ROUND-12 ROTATION PRE-PLAN: after r11 certifies, the oldest tier is
# the remaining ~42 r7 greens (the 41 never in an r11 slot plus the
# displaced dedup_paragraph_scrub). The r12 window takes the 5 r11
# graduates (the STAGED cohort below) + any changed-plan --musts + as
# many oldest r7 greens as fit to 50; the boundary also promotes the
# QUEUE to STAGED — exactly 5 entries (silhouette, bigram surprisal,
# perplexity drift, ANN recall audit, simhash64), emptying the queue.
# gen_driver_window.py derives the window mechanically, as always.
STAGED: dict[str, Query] = {}

# Build-ahead queue: fully implemented and oracle-tested (the pytest
# gate runs them exactly like registered/staged queries) but not yet
# STAGED, because the ≤5-new-staged-per-round cap for this round is
# already spent. At the next round boundary, up to 5 queue entries are
# PROMOTED to staged (flip ``queue=True`` to ``staged=True``) alongside
# the usual graduation; anything beyond 5 waits another round. This
# keeps the staleness-bounding cap honest while letting a build session
# run ahead of the rotation schedule.
#
# Round-11 boundary promoted the 5 oldest (bitext margin, chi2
# keywords, k-core coreness, signal spearman, k-center coreset) to
# STAGED. Queue depth is now 1 carried (silhouette) + 3 round-10
# build-ahead entries (bigram backoff surprisal, per-source
# perplexity drift, ANN recall@k audit) + the round-11 build-ahead
# (64-bit SimHash banded pairs — the signature-diversity upgrade the
# round-10 verdict named); promote oldest-first at the r12 boundary
# so no entry waits indefinitely behind newer work.
QUEUE: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    bench: bool = False,
    staged: bool = False,
    queue: bool = False,
) -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY or name in STAGED or name in QUEUE:
            raise ValueError(f"duplicate query name: {name}")
        target = QUEUE if queue else (STAGED if staged else REGISTRY)
        target[name] = Query(name, fn, oracle, doc, tags, bench)
        return fn

    return deco


# The grading driver evaluates queries in dict iteration order and caps
# the run at 50 queries (rounds 1 and 2 both graded exactly the first-50
# prefix of this registry's insertion order).  With more than 50
# registered queries a fixed order leaves the tail permanently
# uncertified, so load_all() front-loads the queries that have not yet
# received a green driver correctness row; already-certified queries
# rotate to the back and across consecutive rounds the union of
# CORRECTNESS_r*.json files covers the full registry.  The invariant
# (every query beyond slot 50 holds a prior green row) is pinned by
# tests/test_registry_contract.py.
#
# — round-11 window (50 slots), generated by
#   tools/gen_driver_window.py --must agg_approx_sketches
#   dedup_lsh_eval dedup_minhash_lsh_verified dedup_ngram_jaccard
#   dedup_simhash_hamming_pairs —
# Slots 1-5: the round-11 graduation — the 5 formerly-STAGED round-10
# queries (pytest oracle-green at sf0.001/sf0.01, no driver row yet).
# Slots 6-10: --must re-certs — the five round-11 plan changes (see
# the ROUND-11 ROTATION block above for what changed and the measured
# numbers; dedup_jaccard_prefix_filter shares dedup_ngram_jaccard's
# plan byte-identically and inherits its certification). The fifth
# must is the simhash-pairs serialization fix found while building the
# 64-bit queue variant: spread the one-file-split documents scan
# before the CPU-dense vote loop and move the checkpoint between the
# signature projection and the sig_int conv (CollapseProject was
# inlining the vote expression twice per row) — 6.3 -> ~2.1-3.0 s at
# sf0.1, output identical, oracle unchanged.
# Slots 11-43: the ENTIRE remaining r6-stale cohort (33 queries),
# clearing the r6 tier completely per the rotation policy.
# Slots 44-50: the 7 alphabetically-first r7 greens (the fifth must
# displaced dedup_paragraph_scrub to the next rotation).
DRIVER_PRIORITY: tuple[str, ...] = (
    "text_fertility_by_lang",  # slot 1: NEVER
    "dedup_substring_runs",  # slot 2: NEVER
    "dedup_substring_coverage",  # slot 3: NEVER
    "corpus_source_unigram_cosine",  # slot 4: NEVER
    "eval_embedding_isotropy",  # slot 5: NEVER
    "agg_approx_sketches",  # slot 6: re-cert
    "dedup_lsh_eval",  # slot 7: re-cert
    "dedup_minhash_lsh_verified",  # slot 8: re-cert
    "dedup_ngram_jaccard",  # slot 9: re-cert
    "dedup_simhash_hamming_pairs",  # slot 10: re-cert
    "bloom_semijoin_prune",  # slot 11: green r06
    "calendar_dim_date",  # slot 12: green r06
    "correlated_above_avg",  # slot 13: green r06
    "customer_spend_gini",  # slot 14: green r06
    "dedup_cluster_size_histogram",  # slot 15: green r06
    "dedup_ngram_containment",  # slot 16: green r06
    "dq_freshness_lag",  # slot 17: green r06
    "embed_drift_by_dim",  # slot 18: green r06
    "embed_pca_top_component",  # slot 19: green r06
    "events_anomaly_mad",  # slot 20: green r06
    "events_cusum_changepoint",  # slot 21: green r06
    "explode_positional",  # slot 22: green r06
    "funnel_time_to_convert",  # slot 23: green r06
    "grid_join_similar_parts",  # slot 24: green r06
    "interval_open_orders_sweep",  # slot 25: green r06
    "join_null_safe_eq",  # slot 26: green r06
    "join_semi_anti",  # slot 27: green r06
    "lambda_serving_merge",  # slot 28: green r06
    "market_concentration_hhi",  # slot 29: green r06
    "pivot_status_by_segment",  # slot 30: green r06
    "profile_histogram_equiwidth",  # slot 31: green r06
    "q15_top_supplier",  # slot 32: green r06
    "rfm_customer_segments",  # slot 33: green r06
    "scd2_type6_dim",  # slot 34: green r06
    "seasonal_index_monthly",  # slot 35: green r06
    "sessionize_bounce_rate",  # slot 36: green r06
    "skyline_pareto_parts",  # slot 37: green r06
    "snapshot_branch_merge",  # slot 38: green r06
    "snapshot_delete_rollback",  # slot 39: green r06
    "snapshot_partition_evolution",  # slot 40: green r06
    "snapshot_schema_evolution",  # slot 41: green r06
    "snapshot_wap_publish",  # slot 42: green r06
    "text_novelty_score",  # slot 43: green r06
    "agg_percentile_cont_global",  # slot 44: green r07
    "asof_join_daily_score",  # slot 45: green r07
    "attribution_touchpoints",  # slot 46: green r07
    "corpus_cross_source_overlap",  # slot 47: green r07
    "corpus_curation_pipeline",  # slot 48: green r07
    "curriculum_length_interleave",  # slot 49: green r07
    "dedup_paragraph_fraction",  # slot 50: green r07
)


def load_all() -> dict[str, Query]:
    """Import every query-defining module and return the registry.

    The returned dict is ordered with :data:`DRIVER_PRIORITY` first so the
    driver's 50-query cap lands on the queries that still need
    certification; remaining queries follow in registration order.
    """
    import lambda_lakehouse_spark.plans.relational  # noqa: F401
    import lambda_lakehouse_spark.plans.star  # noqa: F401
    import lambda_lakehouse_spark.plans.extended  # noqa: F401
    import lambda_lakehouse_spark.plans.tpch_extra  # noqa: F401
    import lambda_lakehouse_spark.operators.dedup  # noqa: F401
    import lambda_lakehouse_spark.operators.multimodal  # noqa: F401
    import lambda_lakehouse_spark.operators.similarity  # noqa: F401
    import lambda_lakehouse_spark.operators.text  # noqa: F401
    import lambda_lakehouse_spark.operators.sessionize  # noqa: F401
    import lambda_lakehouse_spark.operators.corpus  # noqa: F401
    import lambda_lakehouse_spark.operators.dq  # noqa: F401
    import lambda_lakehouse_spark.sources.snapshots  # noqa: F401
    import lambda_lakehouse_spark.sources.maintenance  # noqa: F401
    import lambda_lakehouse_spark.operators.fuzzy  # noqa: F401
    import lambda_lakehouse_spark.operators.hierarchy  # noqa: F401
    import lambda_lakehouse_spark.operators.search  # noqa: F401
    import lambda_lakehouse_spark.operators.graph  # noqa: F401
    import lambda_lakehouse_spark.operators.bloom  # noqa: F401
    import lambda_lakehouse_spark.operators.temporal  # noqa: F401
    import lambda_lakehouse_spark.operators.evalstats  # noqa: F401
    import lambda_lakehouse_spark.operators.semantic  # noqa: F401

    ordered: dict[str, Query] = {}
    for name in DRIVER_PRIORITY:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, q in REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    return ordered


def load_staged() -> dict[str, Query]:
    """Import all query modules and return the staged (round-6 queue)
    entries — oracle-tested in pytest, not yet driver-graded."""
    load_all()
    return dict(STAGED)


def load_queue() -> dict[str, Query]:
    """Import all query modules and return the build-ahead QUEUE
    entries — oracle-tested in pytest, promoted to STAGED (≤5/round)
    at the next round boundary."""
    load_all()
    return dict(QUEUE)
