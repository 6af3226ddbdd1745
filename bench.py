#!/usr/bin/env python
"""Benchmark harness: runs the headline queries (registry entries with
``bench=True``) at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1)
on ``local[$SPARK_GRAFT_CPUS]`` and prints TWO JSON lines:

1. a ``"detail"`` record FIRST — per-query samples, wall-clock spans,
   full control sample lists, loadavg readings — everything needed to
   separate noise from regression when reading round-over-round diffs;
2. a compact headline record LAST (kept well under the driver's
   2000-char stdout tail window):

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": <sf>,
     "control": s, "control_end": s,          # no-op probe minima
     "load": [l1, l5, l15], "load_end": [...]}  # /proc/loadavg brackets

``queries`` carries the per-query minimum (the round-over-round
headline); the detail record carries every timing sample so dispersion
is visible, and ``control`` is a fixed trivial plan whose movement
calibrates host load for the round (round-8 verdict, demand 3).

WHY two lines (round-9 verdict, demand 1): the grading driver captures
only the LAST ~2000 chars of stdout, and round 9's single inflated line
(samples + spans ≈ 3.5 kB) pushed the front-of-object ``metric`` /
``value`` keys out of the tail — BENCH_r09.json recorded ``parsed:
null``. The headline record now goes LAST and stays compact so any tail
window ≥ ~1.5 kB always contains a parseable artifact; the detail line
precedes it and is recoverable from full stdout / local runs.

Loadavg telemetry (round-9 verdict, demand 7): the control probes catch
steady host load, but round 9's driver sweep had a floor-level LEADING
control while bursty load inflated mid-sweep spans 5-8x. ``load`` /
``load_end`` record /proc/loadavg at the two control points (and the
detail record keeps a per-query reading) so a contaminated sweep is
flagged by the host itself. Reading rule: on a 32-cpu host, loadavg-1m
materially above the sweep's own steady-state (one saturated JVM)
marks external load; spans localize WHICH queries it covered.

Each query executes end-to-end into the noop sink (full computation,
no driver collect). One tiny warmup query first so JVM/codegen startup
isn't attributed to the first headline query.

Execution order: the round-3 legacy set runs FIRST, in its historical
order, so round-over-round like-for-like comparisons are never
perturbed by queries added later (round 4 showed a 4.2x swing on
``dedup_minhash_lsh`` — 1.20s → 5.08s — after two heavyweight
additions started running before it alphabetically; the round-5
isolated re-measure in a fresh JVM came back at 1.47s, inside the r3
noise envelope: session-accumulated state, not a code regression).
New headline queries append after the legacy set.

Isolation (DEFAULT since round 7): every query runs in its own
subprocess/JVM — one query per session, best-of-3 after an in-process
warmup. Shared-session mode kept growing forensic footnotes (round-4's
4.2x ``dedup_minhash_lsh`` swing, round-6's ``search_bm25_topk`` and
``dedup_incremental_batch`` drifts — all session-accumulated state,
none code regressions), and with 22+ headline queries the
interference surface only grows. Isolated numbers are
session-state-free and comparable round-over-round by construction;
the wall-clock cost (one JVM start per query) is not part of any
reported timing. Set ``SPARK_GRAFT_BENCH_ISOLATE=0`` to opt back into
the legacy shared-session sweep (kept for quick iteration loops).
NOTE: BENCH_r07 is the first isolated-mode artifact — compare it to
r06 per-query with that mode change in mind (isolated ≈ the isolated
re-measures earlier READMEs recorded, not the shared-session column).

Idle-wait gate (round-10 verdict, demand 2; round 11): isolated mode
sleep-polls /proc/loadavg before EACH query subprocess until 1-min
load < 2.0 (bounded at 120 s, then proceeds with that query's
``gate_timeout`` flagged). The headline line carries a
``gate_timeouts`` name list (normally empty); the detail line carries
per-query ``gates`` {waited, timeout}. Env overrides:
SPARK_GRAFT_BENCH_GATE_LOAD / SPARK_GRAFT_BENCH_GATE_TIMEOUT.
"""

from __future__ import annotations

import gc
import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lambda_lakehouse_spark.registry import (  # noqa: E402
    load_all,
    load_queue,
    load_staged,
)
from lambda_lakehouse_spark.session import get_spark  # noqa: E402

# Queries whose timing includes one-time model TRAINING (k-means Lloyd
# iterations), not just query serving. Kept in the headline set because
# the training path itself must stay fast, but the JSON names them so
# the number is never read as pure query cost; the twin in
# SERVE_HEADLINE is the serve-path (pretrained-model) signal.
TRAIN_INCLUSIVE = ("ann_cosine_topk_ivf",)
SERVE_HEADLINE = {"ann_cosine_topk_ivf": "ann_cosine_topk_ivf_pretrained"}

# Historical (round-3) headline order — keep stable, append new queries
# only after this prefix.
LEGACY_ORDER = (
    "ann_cosine_topk_brute",
    "dedup_minhash_lsh",
    "fact_assembly_star",
    "pit_join_fact_dim",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "scd2_user_dim",
    "sessionize_events",
)


def headline_names() -> list[str]:
    registry = load_all()
    flagged = sorted(n for n, q in registry.items() if q.bench)
    ordered = [n for n in LEGACY_ORDER if n in flagged]
    ordered += [n for n in flagged if n not in ordered]
    return ordered


def time_query(spark, q, sf_dir: str, repeats: int = 3) -> list[float]:
    # All samples are recorded (round-8 verdict demand 3): the min is
    # the headline (first pass pays codegen compilation; the min strips
    # transient host noise, which varies up to 2x run-to-run on this
    # shared host), and the full sample list makes noise mechanically
    # separable from regression when reading round-over-round diffs.
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.append(round(time.perf_counter() - t0, 3))
        # Collect BETWEEN samples, outside the timed window: py4j
        # objects form reference cycles, so without an explicit pass
        # each sample's DataFrame graph (and its localCheckpoint
        # blocks, JVM-side) survives until a generational GC happens
        # to run — checkpoint-heavy plans then degrade progressively
        # across repeats as storage memory fills (measured round 11:
        # prefix-filter samples 14/26/130 s in one JVM without this,
        # 8.7/8.3/7.4 s stable at 80 MiB cached with it).
        gc.collect()
    return samples


# Sentinel for the no-op control: a fixed trivial plan (5-row region
# scan into the noop sink) timed EXACTLY like a headline query — own
# JVM, warmup, best-of-3. Its compute is constant across rounds, so
# its movement measures host load / scheduler overhead, calibrating
# whether a round's sub-2s movers are noise or regression.
CONTROL = "__control__"
# Trailing-control sentinel: same plan as CONTROL, re-run AFTER the
# last headline query so load arriving mid-sweep is visible in the
# artifact (control vs control_end disagreement = contaminated sweep).
CONTROL_END = "__control_end__"


# Idle-wait gate (round-10 verdict, demand 2): two consecutive driver
# sweeps were load-contaminated (r9 unparseable + noisy; r10 parseable
# but taken under loadavg 2.8-6.0 with phantom movers up to 6x that
# floor singles refuted). The telemetry made contamination READABLE;
# this gate makes the unattended artifact CLEAN: before each query
# subprocess, sleep-poll until 1-min loadavg drops below the
# threshold, bounded so a persistently-busy host still produces an
# artifact (with that query's ``gate_timeout`` flagged) instead of
# hanging the sweep. Threshold 2.0 per the verdict: between isolated
# subprocesses the host's steady state is ~0; anything materially
# above means the previous JVM's load is still decaying or external
# work is running — both contaminate the next measurement.
GATE_LOAD_MAX = float(os.environ.get("SPARK_GRAFT_BENCH_GATE_LOAD", "2.0"))
GATE_TIMEOUT_S = float(os.environ.get("SPARK_GRAFT_BENCH_GATE_TIMEOUT", "120"))


def wait_for_idle(
    threshold: float = GATE_LOAD_MAX, timeout_s: float = GATE_TIMEOUT_S
) -> dict:
    """Sleep-poll /proc/loadavg until 1-min load < threshold or the
    bound expires. Returns {"waited": sec, "timeout": bool} for the
    artifact; on hosts without /proc the gate is a no-op."""
    t0 = time.time()
    while True:
        load = read_loadavg()
        if load is None or load[0] < threshold:
            return {"waited": round(time.time() - t0, 1), "timeout": False}
        if time.time() - t0 >= timeout_s:
            return {"waited": round(time.time() - t0, 1), "timeout": True}
        time.sleep(5)


def read_loadavg() -> list[float] | None:
    """Host load telemetry (1/5/15-min loadavg). Returns None where
    /proc is unavailable so the artifact stays portable."""
    try:
        with open("/proc/loadavg") as f:
            parts = f.read().split()
        return [float(parts[0]), float(parts[1]), float(parts[2])]
    except Exception:
        return None


def run_single(name: str, sf_dir: str) -> None:
    """Subprocess entry (isolate mode): time ONE query in a fresh JVM.
    One tiny JVM warmup only — the query itself runs exactly the
    best-of-3 of shared mode (the first, codegen-cold pass is
    discarded by the min), keeping per-query subprocess cost at three
    executions."""
    spark = get_spark(app_name=f"lakehouse-bench-{name}")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    if name in (CONTROL, CONTROL_END):
        class _ControlQ:  # same timing path as a registry query
            @staticmethod
            def spark(spark, sf_dir):
                return spark.read.parquet(
                    os.path.join(sf_dir, "region.parquet")
                )
        q = _ControlQ
    else:
        # --single resolves staged/queue names too: isolated timing is
        # the disposition instrument for not-yet-graduated work as well
        q = {**load_all(), **load_staged(), **load_queue()}[name]
    samples = time_query(spark, q, sf_dir)
    print(json.dumps(
        {"query": name, "sec": min(samples), "samples": samples}
    ))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    if len(sys.argv) == 3 and sys.argv[1] == "--single":
        run_single(sys.argv[2], sf_dir)
        return

    names = headline_names()
    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    spans: dict[str, list[float]] = {}
    loads: dict[str, list[float] | None] = {}

    gates: dict[str, dict] = {}
    if os.environ.get("SPARK_GRAFT_BENCH_ISOLATE", "1") != "0":
        # control first AND last: the leading run calibrates the host
        # before any headline runs; the trailing run catches load that
        # arrives MID-sweep, which a clean leading control cannot (seen
        # round 9: control 0.159 s at start, an external load spike
        # later tripled the late-running queries — only a bracketing
        # control makes that visible from the artifact alone)
        for name in [CONTROL] + names + [CONTROL_END]:
            # idle-wait gate: don't start this query's JVM until the
            # previous one's load has decayed (or external load cleared)
            gates[name] = wait_for_idle()
            t_wall = time.time()
            # one retry: a transient subprocess failure (host pressure,
            # torn environment) must not leave a null in the artifact
            for attempt in range(2):
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--single", name],
                    capture_output=True,
                    text=True,
                )
                lines = [
                    l for l in out.stdout.splitlines() if l.startswith('{"query"')
                ]
                if out.returncode == 0 and lines:
                    break
            if out.returncode != 0 or not lines:
                # keep the sweep alive: report the failure, emit null
                # for this query, and preserve every timing already
                # measured instead of losing the whole run. Record the
                # span/samples/load keys too (empty, not absent) so
                # artifact readers iterating any one map see the same
                # key set — round-9 advice flagged the asymmetry.
                reason = (
                    out.stderr.strip().splitlines()[-1][:300]
                    if out.stderr.strip()
                    else "no output"
                )
                print(
                    f"bench isolate: {name} failed (rc={out.returncode}): {reason}",
                    file=sys.stderr,
                )
                timings[name] = None
                samples[name] = []
                spans[name] = [round(t_wall, 1), round(time.time(), 1)]
                loads[name] = read_loadavg()
                continue
            row = json.loads(lines[-1])
            timings[name] = row["sec"]
            samples[name] = row.get("samples", [])
            # wall-clock span of this query's whole subprocess (epoch
            # seconds, JVM start included): round 9 saw sweeps whose
            # leading AND trailing controls sat at the idle floor while
            # a bursty external load inflated only the queries that ran
            # during its window — spans localize WHICH queries a
            # contamination window covered, from the artifact alone
            spans[name] = [round(t_wall, 1), round(time.time(), 1)]
            loads[name] = read_loadavg()
    else:
        spark = get_spark(app_name="lakehouse-bench")
        registry = load_all()
        spark.range(1_000_000).selectExpr("sum(id)").collect()
        registry[names[0]].spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        for name in names:
            samples[name] = time_query(spark, registry[name], sf_dir)
            timings[name] = min(samples[name])

    # Pop the control sentinels out of every per-query map so readers
    # iterating queries/samples/spans/loads see an identical key set
    # (round-9 advice: spans kept the sentinels queries popped).
    control = {
        "sec": timings.pop(CONTROL, None),
        "samples": samples.pop(CONTROL, []),
        "span": spans.pop(CONTROL, []),
        "load": loads.pop(CONTROL, None),
    }
    control_end = {
        "sec": timings.pop(CONTROL_END, None),
        "samples": samples.pop(CONTROL_END, []),
        "span": spans.pop(CONTROL_END, []),
        "load": loads.pop(CONTROL_END, None),
    }
    total = round(sum(t for t in timings.values() if t is not None), 3)

    # Line 1 (FIRST): full dispersion/forensics detail. May be long;
    # the driver's stdout tail may truncate it — that is by design,
    # the headline line below is the artifact of record.
    print(
        json.dumps(
            {
                "detail": "bench-dispersion-record",
                "samples": samples,
                "spans": spans,
                "loads": loads,
                "control": control,
                "control_end": control_end,
                "gates": gates,
                "train_inclusive": list(TRAIN_INCLUSIVE),
                "serve_headline": SERVE_HEADLINE,
            }
        )
    )
    # gate-timeout flags surface in the compact headline too (normally
    # an empty list): a named query here means its timing was taken on
    # a host that never went idle within the gate bound — read that
    # query's number with the per-query `loads` entry in the detail line
    gate_timeouts = [n for n, g in gates.items() if g.get("timeout")]
    # Line 2 (LAST): the compact headline artifact — metric, value,
    # per-query minima, control minima, loadavg brackets. Kept small
    # so the driver's 2000-char stdout tail always parses it.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "control": control["sec"],
                "control_end": control_end["sec"],
                "load": control["load"],
                "load_end": control_end["load"],
                "gate_timeouts": gate_timeouts,
            }
        )
    )


if __name__ == "__main__":
    main()
