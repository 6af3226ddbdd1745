"""Pin the distributed global-order primitives against their naive
single-partition window equivalents, with AQE partition coalescing
disabled so the range stage genuinely splits the data across
partitions — the decomposition under test. These helpers back every
top-k / exact-rank / ntile / prefix plan in the registry
(operators/ranking.py), so equivalence here is what makes the
scale-shaped plans safe to certify."""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from lambda_lakehouse_spark.operators.ranking import (
    exact_global_ntile,
    exact_global_rank,
    global_topk,
    prefix_max_exclusive,
    prefix_sums_inclusive,
)


@pytest.fixture()
def no_coalesce(spark):
    key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    yield spark
    spark.conf.set(key, prev)


def _df(spark, n=20000):
    return spark.range(n).select(
        F.col("id"), ((F.col("id") * 37) % 1013).alias("v")
    )


def test_exact_global_rank_equals_window(no_coalesce):
    df = _df(no_coalesce)
    naive = df.withColumn(
        "r", F.row_number().over(W.orderBy("v", "id")).cast("bigint")
    )
    got = exact_global_rank(df, ["v", "id"], "r")
    assert [(x.id, x.r) for x in naive.orderBy("id").collect()] == [
        (x.id, x.r) for x in got.orderBy("id").collect()
    ]


def test_exact_global_rank_with_aqe_coalescing(spark):
    """Same window-parity check under PRODUCTION defaults (AQE
    partition coalescing enabled): the pid-keyed offsets require the
    counts branch and the ranked branch to observe identical physical
    partition indices from the shared range exchange — AQE's coalesce
    decision is a pure function of that exchange's runtime stats, so
    both reads must land on the same layout (documented assumption in
    _ranked_and_counts). This pins the assumption instead of only
    exercising the coalescing-disabled path."""
    assert (
        spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
        == "true"
    )
    df = _df(spark)
    naive = df.withColumn(
        "r", F.row_number().over(W.orderBy("v", "id")).cast("bigint")
    )
    got = exact_global_rank(df, ["v", "id"], "r")
    assert [(x.id, x.r) for x in naive.orderBy("id").collect()] == [
        (x.id, x.r) for x in got.orderBy("id").collect()
    ]


def test_global_topk_equals_window_filter(no_coalesce):
    df = _df(no_coalesce)
    order = [F.col("v").desc(), F.col("id")]
    naive = (
        df.withColumn("rank", F.row_number().over(W.orderBy(*order)))
        .where(F.col("rank") <= 17)
    )
    got = global_topk(df, order, 17)
    assert [(x.id, x.rank) for x in naive.orderBy("rank").collect()] == [
        (x.id, x.rank) for x in got.orderBy("rank").collect()
    ]
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


@pytest.mark.parametrize("n_buckets", [5, 3, 7])
@pytest.mark.parametrize("n", [20000, 4, 1])
def test_exact_global_ntile_matches_sql_ntile(no_coalesce, n_buckets, n):
    df = _df(no_coalesce, 20000)
    d = df.limit(n) if n != 20000 else df
    order = [F.col("v").desc(), F.col("id")]
    naive = d.withColumn("b", F.ntile(n_buckets).over(W.orderBy(*order)))
    got = exact_global_ntile(d, order, n_buckets, "b")
    assert [(x.id, x.b) for x in naive.orderBy("id").collect()] == [
        (x.id, x.b) for x in got.orderBy("id").collect()
    ]


def test_prefix_max_exclusive_equals_window(no_coalesce):
    lv = _df(no_coalesce).groupBy("v").agg(F.max("id").alias("mx"))
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    naive = lv.withColumn("p", F.max("mx").over(w))
    got = prefix_max_exclusive(lv, ["v"], "mx", "p")
    assert [(x.v, x.p) for x in naive.orderBy("v").collect()] == [
        (x.v, x.p) for x in got.orderBy("v").collect()
    ]


def test_prefix_sums_inclusive_equals_window(no_coalesce):
    df = no_coalesce.range(5000).select(
        F.col("id"),
        (F.col("id") % 7).alias("da"),
        ((F.col("id") * 3) % 5).alias("db"),
    )
    w = W.orderBy("id").rowsBetween(W.unboundedPreceding, W.currentRow)
    naive = df.withColumn("ca", F.sum("da").over(w)).withColumn(
        "cb", F.sum("db").over(w)
    )
    got = prefix_sums_inclusive(df, ["id"], ["da", "db"], ["ca", "cb"])
    assert [(r.id, r.ca, r.cb) for r in naive.orderBy("id").collect()] == [
        (r.id, r.ca, r.cb) for r in got.orderBy("id").collect()
    ]


def test_helpers_emit_no_unpartitioned_window_warning(no_coalesce):
    """The whole point: none of the primitives may fall back to an
    unpartitioned WindowExec. Checked structurally — every Window node
    in their executed plans carries a non-empty partition spec (the
    runtime 'No Partition Defined' warning fires exactly when it is
    empty)."""
    import re

    df = _df(no_coalesce)
    plans = [
        exact_global_rank(df, ["v", "id"], "r"),
        global_topk(df, [F.col("v").desc(), "id"], 9),
        exact_global_ntile(df, ["v", "id"], 5, "b"),
        prefix_max_exclusive(
            df.groupBy("v").agg(F.max("id").alias("mx")), ["v"], "mx", "p"
        ),
        prefix_sums_inclusive(df, ["id"], ["v"], ["cv"]),
    ]
    for d in plans:
        for line in (
            d._jdf.queryExecution().executedPlan().toString().splitlines()
        ):
            m = re.match(r"^[\s:+*()\d-]*Window (\[.*)$", line)
            if not m:
                continue
            # bracket groups after the window-expression list: order
            # groups carry ASC/DESC; at least one remaining group must
            # be a partition spec
            groups, depth, cur = [], 0, None
            for ch in m.group(1):
                if ch == "[":
                    depth += 1
                    if depth == 1:
                        cur = []
                        continue
                elif ch == "]":
                    depth -= 1
                    if depth == 0:
                        groups.append("".join(cur))
                        cur = None
                        continue
                if cur is not None:
                    cur.append(ch)
            partition_groups = [
                g
                for g in groups[1:]
                if g and not re.search(r"\b(ASC|DESC)\b", g)
            ]
            assert partition_groups, f"unpartitioned window: {line[:160]}"
