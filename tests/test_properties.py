"""Property-based tests (hypothesis): the SCD2 builder and the as-of
join are checked against brute-force pure-Python models on randomized
inputs — invariants that example-based tests can't sweep.

Strategy notes: hypothesis drives a single shared SparkSession, so
examples are kept small (Spark job latency, not data size, bounds the
budget) and deadlines are disabled.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lambda_lakehouse_spark.operators.scd2 import build_scd2
from lambda_lakehouse_spark.operators.skew import salted_join
from lambda_lakehouse_spark.operators.temporal import as_of_join

BASE = dt.date(2025, 1, 1)

# (entity, day-offset, attribute) snapshots: few entities and days so
# histories collide and version breaks actually occur
snapshots_strategy = st.lists(
    st.tuples(
        st.sampled_from(["A", "B", "C"]),
        st.integers(min_value=0, max_value=9),
        st.sampled_from(["x", "y", "z"]),
    ),
    min_size=1,
    max_size=25,
)


def _scd2_model(rows):
    """Pure-Python SCD2: collapse per-entity date-ordered snapshots
    into attribute runs (last-write-wins per (entity, day) is NOT
    modeled — duplicates with conflicting attrs are excluded by the
    test filter)."""
    by_key: dict[str, dict[int, str]] = {}
    for k, d, a in rows:
        by_key.setdefault(k, {})[d] = a
    versions = {}
    for k, hist in by_key.items():
        runs = []
        for d in sorted(hist):
            if not runs or runs[-1][1] != hist[d]:
                runs.append((d, hist[d]))
        versions[k] = runs
    return versions


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(snapshots_strategy)
def test_scd2_matches_model(spark, rows):
    # drop conflicting duplicates (same entity+day, different attr):
    # snapshot grain is one observation per entity per day
    seen: dict[tuple[str, int], str] = {}
    clean = []
    for k, d, a in rows:
        if (k, d) not in seen:
            seen[(k, d)] = a
            clean.append((k, d, a))
    df = spark.createDataFrame(
        [(k, BASE + dt.timedelta(days=d), a) for k, d, a in clean],
        ["entity", "snap_date", "attr"],
    )
    out = build_scd2(df, keys=("entity",), attrs=("attr",), snapshot_col="snap_date")
    got = {
        k: sorted(
            ((r.effective_from - BASE).days, r.attr)
            for r in out.where(F.col("entity") == k).collect()
        )
        for k in {k for k, _, _ in clean}
    }
    model = _scd2_model(clean)
    assert got == {k: sorted(v) for k, v in model.items()}
    # invariants: exactly one open version per entity; versions dense 1..n
    for k in model:
        vs = out.where(F.col("entity") == k).collect()
        assert sum(r.is_current for r in vs) == 1
        assert sorted(r.version for r in vs) == list(range(1, len(vs) + 1))
        opens = [r for r in vs if r.is_current]
        assert opens[0].effective_to == dt.date(9999, 12, 31)


asof_strategy = st.tuples(
    st.lists(  # left probes: (key, time)
        st.tuples(st.sampled_from(["k1", "k2"]), st.integers(0, 20)),
        min_size=1, max_size=12,
    ),
    st.lists(  # right events: (key, time, value)
        st.tuples(
            st.sampled_from(["k1", "k2"]),
            st.integers(0, 20),
            st.integers(0, 100),
        ),
        min_size=0, max_size=12,
        unique_by=lambda r: (r[0], r[1]),
    ),
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(asof_strategy)
def test_asof_matches_model(spark, data):
    probes, events = data
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(probes)], ["key", "t", "probe_id"]
    )
    right = spark.createDataFrame(events, ["key", "t", "val"]) if events else (
        spark.createDataFrame([], "key string, t long, val long")
    )
    out = as_of_join(
        left, right, keys=("key",), left_time="t", right_time="t",
        value_cols=("val",),
    )
    got = {r.probe_id: r.val for r in out.collect()}
    for i, (k, t) in enumerate(probes):
        prior = [v for (ek, et, v) in events if ek == k and et <= t]
        latest = None
        if prior:
            latest = max(
                (et, v) for (ek, et, v) in events if ek == k and et <= t
            )[1]
        assert got[i] == latest, (i, k, t)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)),
        min_size=1, max_size=20,
    )
)
def test_salted_join_matches_plain(spark, rows):
    large = spark.createDataFrame(rows, ["k", "v"])
    small = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], ["k", "tag"])
    plain = sorted(
        (r.k, r.v, r.tag) for r in large.join(small, ["k"], "left").collect()
    )
    salted = sorted(
        (r.k, r.v, r.tag)
        for r in salted_join(large, small, ["k"], "left", buckets=4).collect()
    )
    assert salted == plain


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(snapshots_strategy)
def test_scd2_incremental_fold_equals_rebuild(spark, rows):
    """apply_scd2_increment folded day-by-day must produce the same
    dimension as a full build_scd2 over all history."""
    from lambda_lakehouse_spark.operators.scd2 import apply_scd2_increment

    seen: dict[tuple[str, int], str] = {}
    clean = []
    for k, d, a in rows:
        if (k, d) not in seen:
            seen[(k, d)] = a
            clean.append((k, d, a))

    full_df = spark.createDataFrame(
        [(k, BASE + dt.timedelta(days=d), a) for k, d, a in clean],
        ["entity", "snap_date", "attr"],
    )
    rebuilt = build_scd2(
        full_df, keys=("entity",), attrs=("attr",), snapshot_col="snap_date"
    )

    dim = None
    for day in sorted({d for _, d, _ in clean}):
        day_rows = [(k, BASE + dt.timedelta(days=d), a)
                    for k, d, a in clean if d == day]
        snap = spark.createDataFrame(day_rows, ["entity", "snap_date", "attr"])
        dim = apply_scd2_increment(
            dim, snap, keys=("entity",), attrs=("attr",),
            snapshot_date_col="snap_date",
        )
        # materialize between days, as a real pipeline would (write →
        # read); otherwise the folded lineage grows exponentially deep
        dim = spark.createDataFrame(dim.collect(), dim.schema)

    canon = lambda df: sorted(  # noqa: E731
        (r.entity, r.effective_from, r.effective_to, r.is_current,
         r.version, r.attr, r.attr_fp)
        for r in df.collect()
    )
    assert canon(dim) == canon(rebuilt)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(  # old rows: (key, v1, v2) — values include separator-attack
        st.tuples(
            st.integers(0, 9),
            st.sampled_from(["a", "a\x1fb", "~", "", None]),
            st.sampled_from(["c", "b\x1fc", "~", None]),
        ),
        min_size=0, max_size=12, unique_by=lambda r: r[0],
    ),
    st.lists(  # new rows
        st.tuples(
            st.integers(0, 9),
            st.sampled_from(["a", "a\x1fb", "~", "", None]),
            st.sampled_from(["c", "b\x1fc", "~", None]),
        ),
        min_size=0, max_size=12, unique_by=lambda r: r[0],
    ),
)
def test_table_diff_matches_model(spark, old_rows, new_rows):
    from lambda_lakehouse_spark.sources.maintenance import table_diff

    schema = "k long, v1 string, v2 string"
    old = spark.createDataFrame(old_rows, schema)
    new = spark.createDataFrame(new_rows, schema)
    got = {r.k: r.change_type for r in table_diff(old, new, keys=["k"]).collect()}
    om = {r[0]: r[1:] for r in old_rows}
    nm = {r[0]: r[1:] for r in new_rows}
    expected = {}
    for k in set(om) | set(nm):
        if k not in om:
            expected[k] = "insert"
        elif k not in nm:
            expected[k] = "delete"
        elif om[k] != nm[k]:
            expected[k] = "update"
    assert got == expected


def test_hll_sketch_partials_merge_to_global_estimate(spark):
    """The 100 TB claim behind agg_approx_sketches: HLL sketches built
    per partition-slice and merged with hll_union_agg estimate the
    same cardinality as one global hll_sketch_agg over all rows (the
    merge is lossless on the observation set; the estimate may differ
    by representation within the error envelope) — so distinct-count
    cost is O(sketch) per partition instead of a value-domain
    shuffle."""
    from pyspark.sql import functions as F

    from lambda_lakehouse_spark.sources.readers import read_table
    from tests.conftest import SF_DIR

    orders = read_table(spark, SF_DIR, "orders").select(
        "o_custkey", F.pmod(F.col("o_orderkey"), F.lit(13)).alias("slice")
    )
    global_est = orders.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("e")
    ).first().e
    merged_est = (
        orders.groupBy("slice")
        .agg(F.hll_sketch_agg("o_custkey").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .first().e
    )
    exact = orders.select("o_custkey").distinct().count()
    # Merge is LOSSLESS on the coupon set, but the union gadget may
    # hold the same set in a different internal representation than a
    # directly-built sketch (sparse->dense promotion order), so the
    # two ESTIMATES need not be bit-equal (observed at sf0.01:
    # 1488 vs 1492 on 1500 exact). Both must sit inside the sketch's
    # accuracy envelope and within 1% of each other.
    assert abs(merged_est - global_est) / exact < 0.01
    assert abs(merged_est - exact) / exact < 0.05  # HLL error envelope
    assert abs(global_est - exact) / exact < 0.05


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_sketch_estimates_within_tolerance_of_exact(spark, sf_dir):
    """The exact-anchored audit behind agg_approx_sketches, moved out
    of the registered driver plan at round 11 (the exact countDistinct
    + exact percentile columns were the profiled ~16.5 s cost of the
    sf0.1 plan; the driver query now certifies the sketch-cost plan
    with sketch-only contract booleans). Here, at small SF where
    exactness is cheap, assert the tight tolerances those booleans
    used to carry: per o_orderstatus group, approx_count_distinct
    (rsd 0.01) and the DataSketches HLL estimate are within 5% of the
    exact distinct-customer count, and percentile_approx(accuracy
    10000) p50/p95 are within 2% of the exact percentiles. Runs at
    BOTH sf0.001 and sf0.01 (round-11 advice): the registered query's
    booleans compare two HLL-family estimators against each other, so
    this exact anchor is the only guard against correlated estimator
    bias — sf0.01 is the same scale the driver certifies at."""
    from pyspark.sql import functions as F

    from lambda_lakehouse_spark.sources.readers import read_table

    orders = read_table(spark, sf_dir, "orders")
    q = F.percentile_approx(
        "o_totalprice", F.array(F.lit(0.5), F.lit(0.95)), F.lit(10000)
    )
    eq = F.expr("percentile(o_totalprice, array(0.5D, 0.95D))")
    rows = (
        orders.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("exact_cd"),
            F.approx_count_distinct("o_custkey", 0.01).alias("acd"),
            F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("hll"),
            q.alias("aq"),
            eq.alias("eq"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r.acd - r.exact_cd) / r.exact_cd <= 0.05, r
        assert abs(r.hll - r.exact_cd) / r.exact_cd <= 0.05, r
        assert abs(r.aq[0] - r.eq[0]) / r.eq[0] <= 0.02, r
        assert abs(r.aq[1] - r.eq[1]) / r.eq[1] <= 0.02, r


# --- band (interval) join vs brute-force model -------------------------

interval_rows = st.lists(
    st.tuples(
        st.sampled_from([1, 2]),                      # key
        st.integers(min_value=0, max_value=600),      # seconds offset
    ),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(interval_rows, interval_rows, st.sampled_from([30, 60, 97]))
def test_interval_join_equals_brute_force(spark, lrows, rrows, tol):
    """Bucketed band join == brute-force pairs on random timestamps and
    tolerances (bucket widths deliberately non-round to hit edges)."""
    from lambda_lakehouse_spark.operators.temporal import interval_join

    base = dt.datetime(2024, 6, 1)
    left = spark.createDataFrame(
        [(k, i, base + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(lrows)],
        "k long, lid long, lts timestamp",
    )
    right = spark.createDataFrame(
        [(k, i, base + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(rrows)],
        "k long, rid long, rts timestamp",
    )
    got = {
        (r.k, r.lid, r.rid)
        for r in interval_join(
            left, right, keys=("k",), left_ts="lts", right_ts="rts", tolerance_s=tol
        ).collect()
    }
    expected = {
        (lk, li, ri)
        for li, (lk, ls) in enumerate(lrows)
        for ri, (rk, rs) in enumerate(rrows)
        if lk == rk and abs(ls - rs) <= tol
    }
    assert got == expected


# --- repetition scores vs pure-Python model ----------------------------

words_strategy = st.lists(
    st.sampled_from(["a", "b", "c", "dd"]), min_size=1, max_size=12
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(words_strategy, min_size=1, max_size=4))
def test_repetition_scores_equal_python_model(spark, docs_words):
    from collections import Counter

    from lambda_lakehouse_spark.operators.text import repetition_scores

    docs = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs_words)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_scores(docs).collect()}
    for i, ws in enumerate(docs_words):
        n = len(ws)
        bigrams = [f"{ws[j]} {ws[j+1]}" for j in range(n - 1)]
        r = got[i]
        assert r.n_words == n
        assert r.distinct_word_ratio == len(set(ws)) / n
        assert r.dup_bigram_frac == (
            (1.0 - len(set(bigrams)) / (n - 1)) if n > 1 else 0.0
        )
        assert r.top_word_share == Counter(ws).most_common(1)[0][1] / n


# ---------------------------------------------------------------------------
# Skyline: window decomposition == brute-force dominance
# ---------------------------------------------------------------------------

points_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=8),   # price level
        st.integers(min_value=0, max_value=8),   # size
    ),
    min_size=1,
    max_size=30,
)


def _skyline_model(pts):
    """Brute-force Pareto frontier on (min price, max size); ties
    (equal price AND size) all survive — no strict inequality."""
    out = []
    for i, (p, s) in enumerate(pts):
        dominated = any(
            (q <= p and t >= s and (q < p or t > s))
            for j, (q, t) in enumerate(pts)
            if j != i
        )
        if not dominated:
            out.append((p, s))
    return sorted(out)


@given(points_strategy)
@settings(
    max_examples=20, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_skyline_window_equals_bruteforce(spark, pts):
    from pyspark.sql import Window as W

    df = spark.createDataFrame(
        [(i, float(p), s) for i, (p, s) in enumerate(pts)],
        ["p_partkey", "p_retailprice", "p_size"],
    )
    levels = df.groupBy("p_retailprice").agg(F.max("p_size").alias("_mx"))
    w = W.orderBy("p_retailprice").rowsBetween(W.unboundedPreceding, -1)
    levels = levels.withColumn("_prev_mx", F.max("_mx").over(w))
    sky = (
        df.join(levels, "p_retailprice")
        .where(
            (F.col("_prev_mx").isNull() | (F.col("_prev_mx") < F.col("p_size")))
            & (F.col("_mx") == F.col("p_size"))
        )
        .select("p_retailprice", "p_size")
    )
    got = sorted((int(r.p_retailprice), r.p_size) for r in sky.collect())
    assert got == _skyline_model(pts)


# ---------------------------------------------------------------------------
# Stride chunking: coverage + reconstruction invariants
# ---------------------------------------------------------------------------

docs_strategy = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=90),
    min_size=1,
    max_size=6,
)


@given(docs_strategy)
@settings(
    max_examples=15, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_chunk_stride_covers_every_token(spark, docs):
    """Invariants vs a pure model: chunk starts advance by exactly the
    stride, every token of every doc falls in >=1 chunk, each chunk is
    the doc's [start, start+len) token slice, and token counts per
    chunk match."""
    from lambda_lakehouse_spark.operators.corpus import (
        CHUNK_LEN,
        CHUNK_STRIDE,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    w = df.select("doc_id", F.split(F.col("text"), " ").alias("w"))
    st_df = w.select(
        "doc_id", "w",
        F.explode(F.expr(f"sequence(0, size(w) - 1, {CHUNK_STRIDE})")).alias("st"),
    )
    chunk = F.expr(f"slice(w, st + 1, {CHUNK_LEN})")
    out = st_df.select(
        "doc_id", "st",
        F.size(chunk).alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    ).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, ws in enumerate(docs):
        chunks = sorted(by_doc[i], key=lambda r: r.st)
        starts = [r.st for r in chunks]
        assert starts == list(range(0, len(ws), CHUNK_STRIDE))
        covered = set()
        for r in chunks:
            want = ws[r.st:r.st + CHUNK_LEN]
            assert r.chunk_text.split(" ") == want
            assert r.n_tokens == len(want)
            covered.update(range(r.st, r.st + r.n_tokens))
        assert covered == set(range(len(ws)))


# ---------------------------------------------------------------------------
# Fuzzy edit-1 pairing: pattern blocking == brute-force levenshtein
# ---------------------------------------------------------------------------

names_strategy = st.lists(
    st.text(alphabet="ab1", min_size=4, max_size=4),
    min_size=2,
    max_size=15,
    unique=True,
)


@given(names_strategy)
@settings(
    max_examples=20, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_edit1_pairs_equal_bruteforce(spark, names):
    from lambda_lakehouse_spark.operators.fuzzy import edit1_pairs

    def lev1(a, b):  # equal length: distance 1 == exactly one diff
        return sum(x != y for x, y in zip(a, b)) == 1

    df = spark.createDataFrame(list(enumerate(names)), ["k", "nm"])
    got = sorted(
        (r.a_key, r.b_key)
        for r in edit1_pairs(df, key="k", name="nm").collect()
    )
    want = sorted(
        (i, j)
        for i in range(len(names))
        for j in range(i + 1, len(names))
        if lev1(names[i], names[j])
    )
    assert got == want


# ---------------------------------------------------------------------------
# Hierarchy flattening: iterative joins == pure-Python walk
# ---------------------------------------------------------------------------

# random forest: node i's parent is a smaller index (acyclic by
# construction) or absent (root)
forest_strategy = st.lists(
    st.integers(min_value=0, max_value=6),  # parent candidate seed
    min_size=1,
    max_size=15,
)


@given(forest_strategy)
@settings(
    max_examples=15, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_flatten_to_roots_equals_model(spark, seeds):
    from lambda_lakehouse_spark.operators.hierarchy import flatten_to_roots

    parents = {}
    for i, s in enumerate(seeds):
        if i > 0 and s < i:  # else: root
            parents[i] = s % i
    nodes = spark.createDataFrame([(i,) for i in range(len(seeds))], ["node_id"])
    edge_rows = [(c, p) for c, p in parents.items()]
    if edge_rows:
        edges = spark.createDataFrame(edge_rows, ["child", "parent"])
    else:
        edges = spark.createDataFrame([], "child long, parent long")
    got = {
        r.node: (r.root_key, r.depth)
        for r in flatten_to_roots(nodes, edges).collect()
    }

    def walk(n):
        d = 0
        while n in parents:
            n, d = parents[n], d + 1
        return n, d

    want = {i: walk(i) for i in range(len(seeds))}
    assert got == want


# ---------------------------------------------------------------------------
# BM25: Spark plan == pure-Python model on random corpora
# ---------------------------------------------------------------------------

bm25_docs_strategy = st.lists(
    st.lists(
        st.sampled_from(["apple", "pear", "fig", "kiwi", "plum"]),
        min_size=1, max_size=8,
    ),
    min_size=2, max_size=6,
)


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(bm25_docs_strategy)
def test_bm25_equals_python_model(spark, docs_words):
    """Per-(query, doc) BM25 scores equal the pure model within the
    decimal(28,6) per-term quantization tolerance."""
    import math

    from lambda_lakehouse_spark.operators.search import bm25_topk

    docs = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs_words)],
        "doc_id long, text string",
    )
    qterms = spark.createDataFrame(
        [(0, "apple"), (0, "fig"), (1, "plum")], "query_id int, word string"
    )
    got = {
        (r.query_id, r.doc_id): r.score
        for r in bm25_topk(docs, qterms, k=100).collect()
    }

    n = len(docs_words)
    avgdl = sum(len(ws) for ws in docs_words) / n
    k1, b = 1.5, 0.75

    def dfreq(w):
        return sum(1 for ws in docs_words if w in ws)

    exp = {}
    for qid, terms in ((0, ["apple", "fig"]), (1, ["plum"])):
        for i, ws in enumerate(docs_words):
            s = 0.0
            for w in terms:
                tf = ws.count(w)
                if not tf:
                    continue
                idf = (n - dfreq(w) + 0.5) / (dfreq(w) + 0.5)
                tfn = tf * (k1 + 1.0) / (
                    tf + k1 * ((1.0 - b) + b * len(ws) / avgdl)
                )
                s += round(idf * tfn, 6)
            if s:
                exp[(qid, i)] = s
    assert set(got) == set(exp)
    for key, score in exp.items():
        assert math.isclose(got[key], score, abs_tol=5e-6), (key, got[key], score)


# ---------------------------------------------------------------------------
# PageRank: Spark plan == power iteration; probability mass conserved
# ---------------------------------------------------------------------------

# canonicalize to (lo, hi) so the symmetrized edge list is a simple
# graph — pagerank_fixed treats its input as a multigraph (parallel
# edges carry weight), and the registry query dedups with distinct()
graph_strategy = st.sets(
    st.tuples(
        st.integers(min_value=0, max_value=6),
        st.integers(min_value=0, max_value=6),
    ),
    min_size=1, max_size=12,
).map(
    lambda es: sorted({(min(a, b), max(a, b)) for a, b in es if a != b})
)


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(graph_strategy)
def test_pagerank_equals_power_iteration(spark, und):
    import math

    from hypothesis import assume

    from lambda_lakehouse_spark.operators.graph import pagerank_fixed

    assume(und)
    edges = spark.createDataFrame(
        [(a, b) for a, b in und] + [(b, a) for a, b in und],
        "src long, dst long",
    )
    got = {r.node: r.r for r in pagerank_fixed(edges, n_iter=3).collect()}

    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nn = len(adj)
    r = {v: 1.0 / nn for v in adj}
    for _ in range(3):
        r = {
            v: 0.15 / nn
            + 0.85 * round(sum(round(r[u] / len(adj[u]), 6)
                               for u in adj if v in adj[u]), 6)
            for v in adj
        }
    assert set(got) == set(r)
    for v in r:
        assert math.isclose(got[v], r[v], abs_tol=1e-5), (v, got[v], r[v])
    # probability mass conserved up to quantization: symmetric graphs
    # have no dangling nodes, so sum(r) stays ~1
    assert math.isclose(sum(got.values()), 1.0, abs_tol=nn * 1e-5)


# ---------------------------------------------------------------------------
# Bloom pruning: no false negatives, ever
# ---------------------------------------------------------------------------


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.sets(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40),
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60),
)
def test_bloom_prune_no_false_negatives(spark, dim_keys, fact_keys):
    from lambda_lakehouse_spark.operators.bloom import bloom_build, bloom_prune

    dim = spark.createDataFrame([(k,) for k in dim_keys], "k long")
    fact = spark.createDataFrame(
        [(i, k) for i, k in enumerate(fact_keys)], "row_id long, k long"
    )
    bits = bloom_build(dim, "k")
    cand = {r.row_id for r in bloom_prune(fact, "k", bits).collect()}
    truth = {i for i, k in enumerate(fact_keys) if k in dim_keys}
    assert truth <= cand


# ---------------------------------------------------------------------------
# As-of nearest join == brute-force argmin model
# ---------------------------------------------------------------------------

_ts_strategy = st.integers(min_value=0, max_value=50)  # seconds offsets


@settings(
    max_examples=15, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(st.tuples(st.sampled_from([1, 2]), _ts_strategy),
             min_size=1, max_size=15),
    st.lists(st.tuples(st.sampled_from([1, 2]), _ts_strategy),
             min_size=0, max_size=15),
    st.sampled_from([3, 10, 100]),
)
def test_asof_nearest_equals_bruteforce(spark, lrows, rrows, tol_s):
    import datetime as dt

    from lambda_lakehouse_spark.operators.temporal import as_of_join_nearest

    base = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
    mk = lambda s: base + dt.timedelta(seconds=s)
    left = spark.createDataFrame(
        [(i, k, mk(s)) for i, (k, s) in enumerate(lrows)],
        "lid long, k long, ts timestamp",
    )
    # dedup right per (key, instant) with max value — the documented
    # uniqueness contract
    rdedup = {}
    for j, (k, s) in enumerate(rrows):
        rdedup[(k, s)] = max(rdedup.get((k, s), -1), j)
    right = spark.createDataFrame(
        [(k, mk(s), v) for (k, s), v in rdedup.items()],
        "k long, rts timestamp, val long",
    )
    out = as_of_join_nearest(
        left, right, keys=["k"], left_time="ts", right_time="rts",
        value_col="val", tolerance_us=tol_s * 1_000_000,
    )
    got = {r.lid: (r.matched_t_us, r.matched_val, r.dist_us)
           for r in out.collect()}

    tol_us = tol_s * 1_000_000
    for i, (k, s) in enumerate(lrows):
        tu = int(mk(s).timestamp() * 1_000_000)
        # argmin by (dist, backward-first, latest rtu)
        best = None
        for (rk, rs), v in rdedup.items():
            if rk != k:
                continue
            rtu = int(mk(rs).timestamp() * 1_000_000)
            d = abs(tu - rtu)
            if d > tol_us:
                continue
            key = (d, 0 if rtu <= tu else 1, -rtu)
            if best is None or key < best[0]:
                best = (key, rtu, v, d)
        want = (best[1], best[2], best[3]) if best else (None, None, None)
        assert got[i] == want, (i, got[i], want)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.integers(min_value=0, max_value=50),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=8),
)
def test_exact_rank_and_ntile_match_model(spark, vals, n_buckets):
    """Randomized sweep of the two-pass global rank/ntile against a
    pure-Python model: rank = position in the (value, index) total
    order; ntile = the SQL bucket formula (first N%n buckets get one
    extra row)."""
    from lambda_lakehouse_spark.operators.ranking import (
        exact_global_ntile,
        exact_global_rank,
    )

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v long")
    order_model = sorted(rows, key=lambda r: (r[1], r[0]))
    want_rank = {rid: i + 1 for i, (rid, _) in enumerate(order_model)}

    got_rank = {
        r.id: r.r for r in exact_global_rank(df, ["v", "id"], "r").collect()
    }
    assert got_rank == want_rank

    n = len(rows)
    q, rem = divmod(n, n_buckets)

    def bucket(rank):
        if rank <= rem * (q + 1):
            return (rank - 1) // (q + 1) + 1
        return rem + (rank - 1 - rem * (q + 1)) // q + 1

    want_b = {rid: bucket(rk) for rid, rk in want_rank.items()}
    got_b = {
        r.id: r.b
        for r in exact_global_ntile(df, ["v", "id"], n_buckets, "b").collect()
    }
    assert got_b == want_b


# --- winnowing guarantee -----------------------------------------------
#
# Schleimer et al.'s theorem: if two strings share a substring of
# length >= K + W - 1, their winnowed fingerprint sets intersect.
# Randomized: two random strings with a random shared passage planted
# at random offsets must share a fingerprint; and winnowing is a
# subset of the full shingle-hash set (density sanity).

_winnow_alpha = st.text(alphabet="abcd ", min_size=0, max_size=60)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    prefix_a=_winnow_alpha,
    suffix_a=_winnow_alpha,
    prefix_b=_winnow_alpha,
    suffix_b=_winnow_alpha,
    passage=st.text(alphabet="wxyz", min_size=23, max_size=48),
)
def test_winnowing_guarantee_planted_passage(
    spark, prefix_a, suffix_a, prefix_b, suffix_b, passage
):
    from lambda_lakehouse_spark.operators.dedup import (
        WIN_K,
        WIN_W,
        winnow_fingerprints,
    )

    assert len(passage) >= WIN_K + WIN_W - 1
    docs = spark.createDataFrame(
        [(0, prefix_a + passage + suffix_a), (1, prefix_b + passage + suffix_b)],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs).collect()
    by_doc: dict[int, set] = {0: set(), 1: set()}
    for r in fps:
        by_doc[r.doc_id].add(r.fp)
    assert by_doc[0] & by_doc[1], (
        "docs sharing a >= K+W-1 substring must share a winnowed fingerprint"
    )


# --- reciprocal-rank fusion --------------------------------------------
#
# Invariants of rrf_fuse on random bounded rankings: (1) a doc ranked
# 1 by every branch is the unique fused maximum; (2) every fused score
# equals the recomputed 1/(K+rank) sum; (3) fused candidate set is
# exactly the union of branch candidate sets.


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    perm_a=st.permutations(list(range(1, 8))),
    perm_b=st.permutations(list(range(1, 8))),
    k=st.integers(min_value=3, max_value=6),
)
def test_rrf_fuse_invariants(spark, perm_a, perm_b, k):
    from lambda_lakehouse_spark.operators.search import RRF_K, rrf_fuse

    # doc 0 is rank 1 in both branches; docs from perm_* fill 2..k
    rank_a = [(0, 0, 1)] + [(0, d, i + 2) for i, d in enumerate(perm_a[: k - 1])]
    rank_b = [(0, 0, 1)] + [(0, d, i + 2) for i, d in enumerate(perm_b[: k - 1])]
    schema = "query_id int, doc_id long, rank int"
    fused = {
        r.doc_id: r.rrf_score
        for r in rrf_fuse(
            [
                spark.createDataFrame(rank_a, schema),
                spark.createDataFrame(rank_b, schema),
            ]
        ).collect()
    }
    ra = {d: r for _, d, r in rank_a}
    rb = {d: r for _, d, r in rank_b}
    assert set(fused) == set(ra) | set(rb)
    for d, score in fused.items():
        want = (1.0 / (RRF_K + ra[d]) if d in ra else 0.0) + (
            1.0 / (RRF_K + rb[d]) if d in rb else 0.0
        )
        assert score == want
    top = max(fused.items(), key=lambda kv: kv[1])
    assert top[0] == 0, "rank-1-everywhere doc must be the fused maximum"
    assert sum(1 for s in fused.values() if s == top[1]) == 1


# ---------------------------------------------------------------------------
# Round-9 queue operators: planted-run completeness and greedy k-center
# invariants
# ---------------------------------------------------------------------------

_substr_strategy = st.tuples(
    st.integers(min_value=10, max_value=16),  # planted shared run length
    st.integers(min_value=0, max_value=4),    # doc-1 prefix length
    st.integers(min_value=0, max_value=4),    # doc-2 prefix length
    st.randoms(use_true_random=False),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_substr_strategy)
def test_substring_runs_planted_run_is_found(spark, params):
    """COMPLETENESS (the gram-diagonal analogue of the winnowing
    guarantee): plant a shared token run of length L >= MIN_RUN at
    arbitrary offsets inside two docs whose other tokens are unique to
    each doc; the pair MUST be reported with max_run_tokens >= L (>=,
    not ==: random flanks can extend the planted run by chance — with
    disjoint flank alphabets they cannot, so equality is also pinned).
    Only two docs exist, so the DF cap can never suppress the run."""
    from lambda_lakehouse_spark.operators.dedup import (
        SUBSTR_MIN_RUN,
        substring_run_pairs,
    )

    run_len, p1, p2, rnd = params
    assert run_len >= SUBSTR_MIN_RUN
    shared = [f"s{i}" for i in range(run_len)]
    d1 = [f"a{i}" for i in range(p1)] + shared + ["a_tail"]
    d2 = [f"b{i}" for i in range(p2)] + shared + ["b_tail", "b_tail2"]
    docs = spark.createDataFrame(
        [(1, " ".join(d1)), (2, " ".join(d2))], "doc_id long, text string"
    )
    rows = substring_run_pairs(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.max_run_tokens == run_len  # disjoint flanks: exactly L


_kcenter_strategy = st.lists(
    st.lists(
        st.integers(min_value=-4, max_value=4).map(float),
        min_size=4,
        max_size=4,
    ),
    min_size=3,
    max_size=12,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_kcenter_strategy)
def test_kcenter_matches_python_greedy_model(spark, vecs):
    """The Spark greedy k-center equals a pure-Python model with the
    same fixed-point distances and (farthest, then min vec_id)
    tie-break, and the selection radii are non-increasing."""
    from lambda_lakehouse_spark.operators.semantic import kcenter_coreset

    k = min(4, len(vecs))
    emb = spark.createDataFrame(
        list(enumerate(vecs)), "vec_id long, embedding array<float>"
    )
    got = [
        (r.step, r.vec_id, r.d2_scaled)
        for r in kcenter_coreset(emb, k=k).orderBy("step").collect()
    ]

    S = 10**12

    def d2(a, b):
        return sum(int((x - y) * (x - y) * S) for x, y in zip(a, b))

    mind = {i: d2(vecs[i], vecs[0]) for i in range(1, len(vecs))}
    want = [(0, 0, 0)]
    for step in range(1, k):
        nxt = max(mind, key=lambda i: (mind[i], -i))
        want.append((step, nxt, mind[nxt]))
        del mind[nxt]  # selected points leave the candidate pool
        for i in mind:
            mind[i] = min(mind[i], d2(vecs[i], vecs[nxt]))
    assert got == want
    radii = [r for _, _, r in got[1:]]
    assert radii == sorted(radii, reverse=True)
    assert len({v for _, v, _ in got}) == len(got)  # distinct picks


_iso_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),  # label
        st.lists(
            st.integers(min_value=-100, max_value=100).map(lambda v: v / 64.0),
            min_size=8,
            max_size=8,
        ),
    ),
    min_size=2,
    max_size=12,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_iso_strategy)
def test_isotropy_matches_fixed_point_model(spark, rows):
    """embedding_isotropy equals a pure-Python replay of the same
    fixed-point quantization (floor at 1e6 for means, 1e12 for
    squares) on random labeled vectors."""
    import math as m

    from lambda_lakehouse_spark.operators.evalstats import (
        _ISO_SCALE_MEAN,
        _ISO_SCALE_SQ,
        embedding_isotropy,
    )

    dims = 8
    emb = spark.createDataFrame(rows, "label int, embedding array<float>")
    got = {r.label: r for r in embedding_isotropy(emb).collect()}

    by_label: dict[int, list[list[float]]] = {}
    for lab, v in rows:
        by_label.setdefault(lab, []).append(v)
    for lab, vs in by_label.items():
        n = len(vs)
        mu2s = qs = 0
        for d in range(dims):
            s = sum(m.floor(v[d] * _ISO_SCALE_MEAN) for v in vs)
            mu = s / _ISO_SCALE_MEAN / n
            mu2s += m.floor(mu * mu * _ISO_SCALE_SQ)
            qs += sum(m.floor(v[d] * v[d] * _ISO_SCALE_SQ) for v in vs)
        r = got[lab]
        assert r.n_vecs == n
        assert m.isclose(r.mu_norm_sq, mu2s / _ISO_SCALE_SQ, rel_tol=0, abs_tol=1e-12)
        assert m.isclose(
            r.mean_norm_sq, qs / _ISO_SCALE_SQ / n, rel_tol=0, abs_tol=1e-12
        )


_cos_strategy = st.lists(
    st.tuples(
        st.sampled_from(["s1", "s2", "s3"]),
        st.lists(st.sampled_from(list("abcde")), min_size=1, max_size=8),
    ),
    min_size=1,
    max_size=10,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_cos_strategy)
def test_unigram_cosine_matches_counter_model(spark, rows):
    """source_unigram_cosine equals the Counter-based closed form on
    random tiny corpora (exact integer dots; IEEE sqrt)."""
    import math as m
    from collections import Counter

    from lambda_lakehouse_spark.operators.corpus import source_unigram_cosine

    docs = spark.createDataFrame(
        [(s, " ".join(ws)) for s, ws in rows], "source string, text string"
    )
    got = {(r.source_a, r.source_b): r for r in source_unigram_cosine(docs).collect()}

    cnt: dict[str, Counter] = {}
    for s, ws in rows:
        cnt.setdefault(s, Counter()).update(ws)
    srcs = sorted(cnt)
    want = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            dot = sum(cnt[a][w] * cnt[b][w] for w in cnt[a].keys() & cnt[b].keys())
            if dot > 0:
                na = sum(c * c for c in cnt[a].values())
                nb = sum(c * c for c in cnt[b].values())
                want[(a, b)] = (dot, dot / (m.sqrt(na) * m.sqrt(nb)))
    assert set(got) == set(want)
    for k, (dot, cos) in want.items():
        assert got[k].dot == dot
        assert m.isclose(got[k].cosine, cos, rel_tol=0, abs_tol=1e-15)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_cos_strategy)
def test_chi2_keywords_matches_counter_model(spark, rows):
    """chi2_keywords equals the Counter-based 2x2 contingency closed
    form (min-count filter, enrichment direction, (chi2 DESC, word)
    top-k per source) on random tiny corpora."""
    import math as m
    from collections import Counter

    from lambda_lakehouse_spark.operators.corpus import chi2_keywords

    docs = spark.createDataFrame(
        [(s, " ".join(ws)) for s, ws in rows], "source string, text string"
    )
    min_count, top_k = 2, 3
    got = {
        (r.source, r.word): r
        for r in chi2_keywords(docs, min_count=min_count, top_k=top_k).collect()
    }

    cnt: dict[str, Counter] = {}
    for s, ws in rows:
        cnt.setdefault(s, Counter()).update(ws)
    n_tot = sum(sum(c.values()) for c in cnt.values())
    w_tot = Counter()
    for c in cnt.values():
        w_tot.update(c)
    want = {}
    for s, c in cnt.items():
        s_tot = sum(c.values())
        scored = []
        for w, a in c.items():
            if a < min_count:
                continue
            b = w_tot[w] - a
            c2 = s_tot - a
            d = n_tot - w_tot[w] - s_tot + a
            if a * d - b * c2 <= 0:
                continue
            chi2 = (
                float(a + b + c2 + d)
                * float(a * d - b * c2)
                * float(a * d - b * c2)
                / (float(a + b) * (c2 + d) * (a + c2) * (b + d))
            )
            scored.append((chi2, w, a))
        scored.sort(key=lambda t: (-t[0], t[1]))
        for chi2, w, a in scored[:top_k]:
            want[(s, w)] = (a, chi2)
    assert set(got) == set(want)
    for k, (a, chi2) in want.items():
        assert got[k].a == a
        assert m.isclose(got[k].chi2, chi2, rel_tol=0, abs_tol=1e-12)


# --- Spearman rho (queue: eval_signal_spearman) -----------------------

spearman_pairs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=0, max_value=5),
    ),
    min_size=2,
    max_size=20,
)


def _spearman_model(pairs):
    """Exact tie-corrected Spearman (Pearson on average ranks) with
    Fraction arithmetic — independent of the operator's rank/decimal
    machinery."""
    from fractions import Fraction
    import math

    def avg_ranks(vals):
        # average rank of a tie group = (min rank + max rank) / 2
        order = sorted(range(len(vals)), key=lambda i: (vals[i], i))
        rn = [0] * len(vals)
        for p, i in enumerate(order):
            rn[i] = p + 1
        out = []
        for i, v in enumerate(vals):
            grp = [rn[j] for j in range(len(vals)) if vals[j] == v]
            out.append(Fraction(min(grp) + max(grp), 2))
        return out

    xs = avg_ranks([p[0] for p in pairs])
    ys = avg_ranks([p[1] for p in pairs])
    n = len(pairs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    if vx <= 0 or vy <= 0:
        return 0.0
    return float(n * sxy - sx * sy) / math.sqrt(float(vx) * float(vy))


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spearman_pairs)
def test_spearman_matches_fraction_model(spark, pairs):
    import math

    from lambda_lakehouse_spark.operators.evalstats import spearman_rho

    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pairs)],
        "doc_id long, x long, y long",
    )
    got = spearman_rho(df, "x", "y").collect()[0].spearman_rho
    assert math.isclose(got, _spearman_model(pairs), abs_tol=1e-9)


# --- k-core coreness (queue: graph_kcore_coreness) --------------------

kcore_graphs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=0, max_value=7),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=16,
)


def _peel_coreness(edges):
    """Textbook k-core peeling on an adjacency dict — the sequential
    definition the h-index refinement must converge to."""
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    core = {}
    k = 0
    alive = dict(adj)
    while alive:
        k += 1
        while True:
            drop = [u for u, nbrs in alive.items() if len(nbrs) < k]
            if not drop:
                break
            for u in drop:
                core[u] = k - 1
                for w in alive[u]:
                    if w in alive:
                        alive[w].discard(u)
                del alive[u]
    return core


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(kcore_graphs)
def test_kcore_hindex_converges_to_peeling(spark, raw_edges):
    """On graphs of <= 8 nodes, n rounds of the h-index refinement
    equal the sequential peeling coreness exactly (Lu et al.'16
    convergence), for any random edge set."""
    from lambda_lakehouse_spark.operators.graph import kcore_coreness

    sym = sorted({(u, v) for u, v in raw_edges} | {(v, u) for u, v in raw_edges})
    nodes = {u for u, _ in sym}
    edges = spark.createDataFrame(sym, "u long, v long")
    got = {r.u: r.h for r in kcore_coreness(edges, iters=len(nodes)).collect()}
    assert got == _peel_coreness(sym)


# --- bitext margin mining (queue: mine_bitext_margin) -----------------

bitext_vectors = st.lists(
    st.lists(
        st.integers(min_value=-3, max_value=3), min_size=4, max_size=4
    ).filter(lambda v: any(v)),
    min_size=2,
    max_size=8,
)


def _bitext_model(vecs):
    """Pure-Python replay of the mining rule. For integer-valued
    vectors the operator's floor-scaled dots are exact integers and
    sqrt/division are single IEEE ops, so Python floats reproduce the
    Spark doubles bit-for-bit — top-1 order, margin, and mutuality
    included."""
    import math

    ids = list(range(len(vecs)))
    n2 = {i: float(sum(x * x for x in vecs[i])) for i in ids}

    def cos(a, b):
        d = float(sum(x * y for x, y in zip(vecs[a], vecs[b])))
        return d / math.sqrt(n2[a] * n2[b])

    def top1(q, side):
        return min(side, key=lambda c: (-cos(q, c), c))

    odd = [i for i in ids if i % 2 == 1]
    even = [i for i in ids if i % 2 == 0]
    out = {}
    if not odd or not even:
        return out
    for q in even:
        y = top1(q, odd)
        c_xy = cos(q, y)
        yb = top1(y, even)
        c_yb = cos(y, yb)
        denom = c_xy + c_yb
        margin = 0.0 if denom <= 0 else 2.0 * c_xy / denom
        out[q] = (y, c_xy, c_yb, margin, 1 if yb == q else 0)
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(bitext_vectors)
def test_bitext_margin_matches_float_model(spark, vecs):
    import math

    from lambda_lakehouse_spark.operators.similarity import bitext_margin_top1

    emb = spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>, label int",
    )
    got = {
        r.query_id: (r.match_id, r.cos_xy, r.cos_y_best, r.margin, r.mutual)
        for r in bitext_margin_top1(emb).collect()
    }
    want = _bitext_model(vecs)
    assert set(got) == set(want)
    for q, (y, c_xy, c_yb, margin, mutual) in want.items():
        gy, gc_xy, gc_yb, gmargin, gmutual = got[q]
        assert (gy, gmutual) == (y, mutual)
        assert math.isclose(gc_xy, c_xy, rel_tol=0, abs_tol=1e-12)
        assert math.isclose(gc_yb, c_yb, rel_tol=0, abs_tol=1e-12)
        assert math.isclose(gmargin, margin, rel_tol=0, abs_tol=1e-12)
