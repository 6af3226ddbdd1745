"""Distributed global-order primitives: top-k, exact rank, ntile,
prefix max — none of which may single-partition-sort an
sf-proportional relation.

Why this module exists: ``row_number().over(Window.orderBy(...))``
with no partition spec moves EVERY row to one task ("WindowExec: No
Partition Defined" at runtime) — fine on 60k rows, dead at 100 TB.
Round-5 review found ten query plans doing exactly that for two
distinct needs, each of which has a classic distributed formulation:

- **global top-k** (``global_topk``): ``orderBy().limit(k)`` plans as
  ``TakeOrderedAndProject`` — every partition keeps its local top-k,
  a single reduce merges the k-row survivors — then rank 1..k is
  re-derived over the ≤k bounded rows with the same two-pass rank
  machinery (never an unpartitioned window, so the plan carries zero
  single-partition sorts of data-sized relations).

- **exact global rank over ALL rows** (``exact_global_rank``), for
  order statistics that genuinely need every row's position (Gini's
  Σ i·y_i, exact ntile buckets, exact percentile picks): the two-pass
  range-partitioned rank. Pass 1 ``repartitionByRange`` on the sort
  key so partition p holds keys strictly below partition p+1, sort
  within partitions, and read the local rank off
  ``monotonically_increasing_id``'s documented per-partition counter
  bits — one exchange + one local sort, no window, no extra shuffle.
  Pass 2 count rows per partition — a #partitions-row
  relation, bounded by cluster config, not by data — prefix-sum those
  counts in a single-row array fold (sorted ``collect_list`` →
  ``aggregate`` higher-order function: a driver-free prefix scan with
  no window and no sort), broadcast the offsets back, add. Identical
  integer ranks to a global sort.

- **exclusive running max** (``prefix_max_exclusive``), the skyline /
  sweep-prefix shape: same range partitioning; local exclusive
  prefix max within each partition, combined with the running max of
  every STRICTLY EARLIER partition's total (the same bounded array
  fold over per-partition maxima) — the textbook distributed
  prefix-scan decomposition.

Determinism contract (everything here is driver-certified): callers
must pass a TOTAL order — the last sort key unique per row —
otherwise range-partition boundaries could split ties arbitrarily.
Every call site in this repo orders by (metric, unique key).

Reference: the reference engine has no counterpart (single-node
pandas pipelines sort in memory, e.g.
``jobs/transform/vn_stg_processing.py`` sorting a day's frame); these
helpers are what the same semantics require on a cluster.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _cols(order: Sequence) -> list:
    return [F.col(c) if isinstance(c, str) else c for c in order]


def _fold_offsets(counts: DataFrame, key: str, val: str, out: str) -> DataFrame:
    """(key, val) → (key, out) where ``out`` = sum of ``val`` over all
    strictly smaller keys: an exclusive prefix sum computed as one
    array fold over the sorted, collected (bounded — #partitions-row)
    relation. No window, no sort node, no driver action."""
    return (
        counts.agg(
            F.sort_array(F.collect_list(F.struct(key, val))).alias("_a")
        )
        .select(
            F.explode(
                F.expr(
                    f"aggregate(_a,"
                    f" struct(cast(0 as bigint) as acc,"
                    f"   cast(array() as array<struct<k:int,o:bigint>>) as out),"
                    f" (s, x) -> struct(s.acc + x.{val},"
                    f"   array_append(s.out, named_struct('k', x.{key}, 'o', s.acc))),"
                    f" s -> s.out)"
                )
            ).alias("_o")
        )
        .select(F.col("_o.k").alias(key), F.col("_o.o").alias(out))
    )


def _ranked_and_counts(
    df: DataFrame, order: Sequence, rank_col: str
) -> tuple[DataFrame, DataFrame]:
    """Core of the two-pass rank: (ranked df, per-partition counts df).
    The counts relation (``_egr_pid``, ``_egr_c``) is #partitions rows
    and shares the range exchange with the rank branch.

    The local rank is read off ``monotonically_increasing_id()`` after
    the in-partition sort — its documented layout is the partition id
    in the upper bits and a per-partition row counter in the lower 33
    — so the rank branch costs exactly ONE exchange of the data (the
    range shuffle) and one local sort: no window, and none of the
    extra hash-by-partition-id shuffle a
    ``row_number() OVER (PARTITION BY pid)`` would add. (Bound: 2^33
    rows per partition — ~8.5e9, far above any sane partition.)

    AQE / ReuseExchange ASSUMPTION: the counts branch and the ranked
    branch must observe IDENTICAL physical partition indices from the
    shared range exchange — the offsets are keyed by pid. That holds
    because (a) ReuseExchange serves both branches from the one
    exchange, and (b) AQE's coalescing decision is a pure function of
    that exchange's runtime statistics, so even when the two reads are
    planned separately they coalesce identically. If either property
    broke, ranks would silently misalign — which is why
    tests/test_ranking.py pins window-parity BOTH with coalescing
    disabled (forces a genuine multi-partition split) and with the
    production-default AQE coalescing enabled
    (test_exact_global_rank_with_aqe_coalescing)."""
    order = _cols(order)
    tagged = (
        df.repartitionByRange(*order)
        .sortWithinPartitions(*order)
        .withColumn("_egr_mid", F.monotonically_increasing_id())
        .withColumn("_egr_pid", F.shiftright("_egr_mid", 33).cast("int"))
        .withColumn("_egr_lrank", F.col("_egr_mid") % F.lit(1 << 33) + 1)
        .drop("_egr_mid")
    )
    # NOTE ON CHAINED CALLS: the counts branch and the ranked branch
    # both consume ``tagged``; exchange reuse usually collapses that
    # within ONE pass, but when a caller CHAINS rank passes the
    # 2-branch duplication COMPOUNDS (RFM's three ntiles re-evaluated
    # the base aggregate ~8x — 27 parquet scans in the initial plan).
    # Callers that chain passes must truncate lineage between them
    # with ``df.localCheckpoint(eager=False)`` — lazy, so plan-only
    # consumers (guardrail sweeps, registration) execute nothing, and
    # honest under repeated benchmarking, unlike persist(), whose
    # CacheManager substitution would silently serve later runs from
    # cache. Deliberately NOT done here centrally: it would hide every
    # caller's below-rank subtree from the plan guardrails.
    counts = tagged.groupBy("_egr_pid").agg(
        F.count(F.lit(1)).alias("_egr_c")
    )
    offsets = _fold_offsets(counts, "_egr_pid", "_egr_c", "_egr_off")
    ranked = (
        tagged.join(F.broadcast(offsets), "_egr_pid")
        .withColumn(
            rank_col,
            (F.col("_egr_lrank") + F.col("_egr_off")).cast("bigint"),
        )
        .drop("_egr_pid", "_egr_lrank", "_egr_off")
    )
    return ranked, counts


def exact_global_rank(
    df: DataFrame,
    order: Sequence,
    rank_col: str = "rank",
) -> DataFrame:
    """Add ``rank_col`` = the exact 1-based global rank of each row
    under the total order ``order``, without a single-partition sort:
    range-partition on the sort key, rank locally, then add broadcast
    cumulative partition-count offsets (see module docstring). Output
    ranks are identical to ``row_number() OVER (ORDER BY order)``;
    the rank column is LONG."""
    ranked, _ = _ranked_and_counts(df, order, rank_col)
    return ranked


def global_topk(
    df: DataFrame,
    order: Sequence,
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-``k`` rows of ``df`` under the total order ``order``, with a
    1-based LONG ``rank_col``. Plans as ``TakeOrderedAndProject``
    (per-partition partial top-k, one k-row merge); the ≤k survivors
    are then ranked in ONE linear pass — explicit single partition
    (bounded: k rows), in-partition sort, monotonic-id row counter.

    Not :func:`exact_global_rank` for the tail (changed round 7): the
    two-pass rank's counts branch and ranked branch each re-evaluate
    their input lineage, and ``TakeOrderedAndProject`` is not an
    Exchange, so ReuseExchange cannot serve the second branch — the
    entire upstream plan ran TWICE (measured +0.3 s on
    ``search_bm25_topk``'s corpus-wide df aggregation at sf0.1, and
    the same double evaluation sat under every top-k in the registry).
    No window either: the single-pass form stays inside the plan
    guardrails (tests/test_scale.py) by construction."""
    order = _cols(order)
    return (
        df.orderBy(*order)
        .limit(k)
        .coalesce(1)
        .sortWithinPartitions(*order)
        .withColumn(
            rank_col, (F.monotonically_increasing_id() + 1).cast("bigint")
        )
    )


def exact_global_ntile(
    df: DataFrame,
    order: Sequence,
    n_buckets: int,
    out_col: str,
) -> DataFrame:
    """Add ``out_col`` = exact ``NTILE(n_buckets) OVER (ORDER BY
    order)`` (int, 1-based) via :func:`exact_global_rank` plus the SQL
    ntile formula: with N rows, the first ``N mod n`` buckets hold
    ``ceil(N/n)`` rows, the rest ``floor(N/n)``. All integer ``div``
    arithmetic — bit-identical to any engine's NTILE."""
    ranked, counts = _ranked_and_counts(df, order, rank_col="_egn_r")
    # N from the bounded per-partition counts (shares the rank branch's
    # range exchange) — never a second full aggregation of the input
    total = counts.agg(
        F.coalesce(F.sum("_egr_c"), F.lit(0)).alias("_egn_n")
    )
    t = (
        ranked.crossJoin(F.broadcast(total))
        .withColumn("_egn_q", F.expr(f"_egn_n div {n_buckets}"))
        .withColumn("_egn_rem", F.expr(f"_egn_n % {n_buckets}"))
    )
    # CaseWhen evaluates branches lazily, so the `div _egn_q` branch is
    # never reached when q = 0 (then rem = N and every rank takes the
    # first branch) — no ANSI divide-by-zero.
    bucket = F.when(
        F.col("_egn_r") <= F.col("_egn_rem") * (F.col("_egn_q") + 1),
        F.expr("(_egn_r - 1) div (_egn_q + 1) + 1"),
    ).otherwise(
        F.col("_egn_rem")
        + F.expr("(_egn_r - 1 - _egn_rem * (_egn_q + 1)) div _egn_q")
        + 1
    )
    return t.withColumn(out_col, bucket.cast("int")).drop(
        "_egn_r", "_egn_n", "_egn_q", "_egn_rem"
    )


def grouped_prefix_sum_rank(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence,
    value,
    sum_col: str,
    pos_col: str,
) -> DataFrame:
    """Per-key inclusive running sum of ``value`` and 1-based position
    under ``order`` — ``SUM(v) OVER (PARTITION BY keys ORDER BY order
    ROWS UNBOUNDED PRECEDING)`` + ``ROW_NUMBER()`` — WITHOUT one task
    per key. A plain keys-partitioned window serializes each key's
    whole history through a single task, which for low-cardinality
    keys (event types, tenants) is the grouped twin of the global-sort
    anti-pattern. Decomposition: range-partition on (keys, order) so a
    hot key's history spans MANY partitions while each partition holds
    contiguous runs; compute local prefix sums/positions within
    (partition, key); then add per-key offsets accumulated over the
    (#partitions x #keys-touching-boundaries) boundary relation — each
    key's boundary slice is <= #partitions rows, bounded by cluster
    config. Exact for decimal values (addition is associative).

    ``value`` may be any Column; callers wanting exactness pass a
    decimal-cast expression. Total order required under each key."""
    order = _cols(order)
    keys = list(keys)
    tagged = df.repartitionByRange(
        *[F.col(k) for k in keys], *order
    ).withColumn("_gps_pid", F.spark_partition_id())
    w = W.partitionBy("_gps_pid", *keys).orderBy(*order)
    local = tagged.withColumn(
        "_gps_lsum",
        F.sum(value).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    ).withColumn("_gps_lpos", F.row_number().over(w))
    bnd = tagged.groupBy("_gps_pid", *keys).agg(
        F.sum(value).alias("_gps_t"), F.count(F.lit(1)).alias("_gps_c")
    )
    ow = (
        W.partitionBy(*keys)
        .orderBy("_gps_pid")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offs = bnd.select(
        "_gps_pid",
        *keys,
        F.sum("_gps_t").over(ow).alias("_gps_osum"),
        F.coalesce(F.sum("_gps_c").over(ow), F.lit(0)).alias("_gps_opos"),
    )
    return (
        local.join(offs, ["_gps_pid", *keys])
        .withColumn(
            sum_col,
            F.when(F.col("_gps_osum").isNull(), F.col("_gps_lsum")).otherwise(
                F.col("_gps_lsum") + F.col("_gps_osum")
            ),
        )
        .withColumn(
            pos_col, (F.col("_gps_lpos") + F.col("_gps_opos")).cast("bigint")
        )
        .drop("_gps_pid", "_gps_lsum", "_gps_lpos", "_gps_osum", "_gps_opos")
    )


def grouped_rank(
    df: DataFrame, keys: Sequence[str], order: Sequence, pos_col: str
) -> DataFrame:
    """Per-key 1-based position under ``order`` — ``ROW_NUMBER() OVER
    (PARTITION BY keys ORDER BY order)`` — via the grouped two-pass
    decomposition (no one-task-per-key sort; see
    :func:`grouped_prefix_sum_rank`)."""
    return grouped_prefix_sum_rank(
        df, keys, order, F.lit(0), "_gr_zero", pos_col
    ).drop("_gr_zero")


def prefix_sums_inclusive(
    df: DataFrame,
    order: Sequence,
    value_cols: Sequence[str],
    out_cols: Sequence[str],
) -> DataFrame:
    """Inclusive running sums of several BIGINT columns under the
    global total order ``order`` — N x ``SUM(v) OVER (ORDER BY order
    ROWS UNBOUNDED PRECEDING)`` — via the same range-partitioned
    decomposition as :func:`exact_global_rank`: local prefix sums per
    partition (one shared WindowExec partitioned by the physical
    partition id), per-partition totals folded into exclusive offsets
    in a single-row array fold, broadcast back. Exact for integer
    values at any partitioning."""
    order = _cols(order)
    vo = list(zip(value_cols, out_cols))
    tagged = df.repartitionByRange(*order).withColumn(
        "_pfs_pid", F.spark_partition_id()
    )
    w = (
        W.partitionBy("_pfs_pid")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = tagged
    for v, o in vo:
        local = local.withColumn(f"_pfs_loc_{o}", F.sum(v).over(w))
    bnd = tagged.groupBy("_pfs_pid").agg(
        *[F.sum(v).alias(f"_pfs_t_{o}") for v, o in vo]
    )
    accs = ", ".join(f"cast(0 as bigint) as acc_{o}" for _, o in vo)
    elem = ",".join(f"{o}:bigint" for _, o in vo)
    steps = ", ".join(f"s.acc_{o} + x._pfs_t_{o}" for _, o in vo)
    emits = ", ".join(f"'{o}', s.acc_{o}" for _, o in vo)
    offsets = (
        bnd.agg(
            F.sort_array(
                F.collect_list(
                    F.struct("_pfs_pid", *[f"_pfs_t_{o}" for _, o in vo])
                )
            ).alias("_a")
        )
        .select(
            F.explode(
                F.expr(
                    f"aggregate(_a,"
                    f" struct({accs},"
                    f"   cast(array() as array<struct<k:int,{elem}>>) as out),"
                    f" (s, x) -> struct({steps},"
                    f"   array_append(s.out, named_struct('k', x._pfs_pid, {emits}))),"
                    f" s -> s.out)"
                )
            ).alias("_o")
        )
        .select(
            F.col("_o.k").alias("_pfs_pid"),
            *[F.col(f"_o.{o}").alias(f"_pfs_off_{o}") for _, o in vo],
        )
    )
    out = local.join(F.broadcast(offsets), "_pfs_pid")
    for _, o in vo:
        out = out.withColumn(
            o, (F.col(f"_pfs_loc_{o}") + F.col(f"_pfs_off_{o}")).cast("bigint")
        )
    drop = (
        ["_pfs_pid"]
        + [f"_pfs_loc_{o}" for _, o in vo]
        + [f"_pfs_off_{o}" for _, o in vo]
    )
    return out.drop(*drop)


def prefix_max_exclusive(
    df: DataFrame,
    order: Sequence,
    value_col: str,
    out_col: str,
) -> DataFrame:
    """Add ``out_col`` = max of ``value_col`` over all STRICTLY
    preceding rows in the global order (null for the first row) —
    ``max() OVER (ORDER BY order ROWS BETWEEN UNBOUNDED PRECEDING AND
    1 PRECEDING)`` without the single-partition sort. Order keys must
    be unique (rows-frame semantics under ties would otherwise depend
    on partition boundaries).

    Distributed prefix-scan decomposition: local exclusive prefix max
    within each range partition, combined with the running max of all
    earlier partitions' totals (bounded array fold, broadcast back).
    ``greatest()`` skips nulls, so the combine is null only when both
    sides are — exactly the global first rows."""
    order = _cols(order)
    vt = df.schema[value_col].dataType.simpleString()
    tagged = df.repartitionByRange(*order).withColumn(
        "_pfx_pid", F.spark_partition_id()
    )
    loc_w = (
        W.partitionBy("_pfx_pid")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    local = tagged.withColumn("_pfx_loc", F.max(value_col).over(loc_w))
    pmax = tagged.groupBy("_pfx_pid").agg(F.max(value_col).alias("_pfx_mx"))
    prior = (
        pmax.agg(
            F.sort_array(
                F.collect_list(F.struct("_pfx_pid", "_pfx_mx"))
            ).alias("_a")
        )
        .select(
            F.explode(
                F.expr(
                    f"aggregate(_a,"
                    f" struct(cast(null as {vt}) as acc,"
                    f"   cast(array() as array<struct<k:int,m:{vt}>>) as out),"
                    f" (s, x) -> struct(greatest(s.acc, x._pfx_mx),"
                    f"   array_append(s.out, named_struct('k', x._pfx_pid, 'm', s.acc))),"
                    f" s -> s.out)"
                )
            ).alias("_o")
        )
        .select(
            F.col("_o.k").alias("_pfx_pid"), F.col("_o.m").alias("_pfx_prior")
        )
    )
    return (
        local.join(F.broadcast(prior), "_pfx_pid")
        .withColumn(out_col, F.greatest("_pfx_loc", "_pfx_prior"))
        .drop("_pfx_pid", "_pfx_loc", "_pfx_prior")
    )
