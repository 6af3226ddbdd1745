#!/usr/bin/env python
"""Executed-plan scan-amplification audit.

The three compile-time plan guardrails (tests/test_scale.py) can't see
how many times a table is PHYSICALLY scanned: Spark re-executes the
whole lineage for every reference to a relation unless exchange reuse
dedupes it, and exchange reuse silently fails whenever any expression
in the subtree is nondeterministic (collect_set, rand-seeded exprs) or
the branches diverge before the exchange. Round 9 found two such
silent amplifications in new queries (eval_source_contamination: 4
scans for 1 logical pass; quality_ccnet_terciles: 9 for 2) — this tool
sweeps the WHOLE registry so the next one is caught mechanically.

For every registered + staged query: execute to the noop sink at
sf0.001 (cheapest correctness scale) and count `Scan parquet` per
table in the executed plan, plus `Scan ExistingRDD` occurrences
(localCheckpoint reads — those materialize their lineage exactly once,
so they are the FIX shape, not a finding). Report queries whose
max-scans-per-table exceeds the threshold.

A repeat is not automatically a defect: two scans of one table with
different pushed filters/schemas are often the right plan (e.g. an LM
model branch filtered to target sources + the full scoring stream; a
star query reading a dim twice under different keys). The report is
for HUMAN disposition — record verdicts in the baseline dict below so
re-runs only surface NEW amplification.

MEASUREMENT CAVEATS (learned the hard way, round 9):
- The text count over- AND under-states: AQE stage reuse prints reused
  subtrees repeatedly (graph_triangle_count shows 60 textual scans but
  reads ~1.6 passes by bytes), and lazy localCheckpoints hide their
  one materialization scan entirely.
- Hadoop FileSystem statistics only capture footer/open events — the
  vectorized parquet reader's data path bypasses them.
- Stage inputBytes (REST API) is the true read volume, but checkpoint
  RDD reads count as input too.
- THE DISPOSITION INSTRUMENT IS A WALL-CLOCK A/B AT sf0.1. Checkpoints
  only pay when the truncated relation is SMALL relative to what the
  re-scans re-derive (a ≤256-row model, doc-grain scores, gram
  postings). Checkpointing a LARGE shared relation is usually a loss:
  a blanket lazy localCheckpoint inside similarity._flat (the exploded
  vector relation) ballooned ann_cosine_topk_ivf from 3.4 s to 12.6 s
  at sf0.1 — it defeats the query-side filter pushdown into the
  parquet scan and forces full materializations — and was reverted.
  Cheap codegen'd re-scans of a columnar source are often FASTER than
  materializing an exploded intermediate; flag -> measure -> then fix.

    python tools/scan_audit.py [--threshold 3] [--sf-dir .../sf0.001]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Dispositioned scan counts (query -> max scans of any one table in the
# executed plan, verdict in the comment). Entries here are EXPECTED;
# the audit flags only queries above threshold that are absent or
# exceed their recorded count.
BASELINE: dict[str, int] = {}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from lambda_lakehouse_spark.registry import load_all, load_staged

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("scan-audit")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # plan text must carry full scan locations or the per-table regex
    # undercounts (same setting the forced-broadcast guardrail uses)
    spark.conf.set("spark.sql.maxMetadataStringLength", "1000")

    queries = {**load_all(), **load_staged()}
    if args.only:
        queries = {n: q for n, q in queries.items() if n in args.only}

    findings = []
    for name, q in sorted(queries.items()):
        try:
            df = q.spark(spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            ep = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # report, keep sweeping
            print(f"{name}: ERROR {str(e).splitlines()[0][:120]}")
            continue
        per_table: dict[str, int] = {}
        for m in re.finditer(r"Scan parquet[^\n]*?(\w+\.parquet)", ep):
            t = m.group(1)
            per_table[t] = per_table.get(t, 0) + 1
        # fallback: count scans without a path match
        n_scans = len(re.findall(r"Scan parquet", ep))
        n_ckpt = len(re.findall(r"Scan ExistingRDD", ep))
        worst = max(per_table.values(), default=n_scans)
        status = ""
        if worst >= args.threshold and BASELINE.get(name, 0) < worst:
            status = "  <-- AMPLIFIED"
            findings.append((name, worst, per_table))
        print(
            f"{name}: scans={n_scans} per_table={per_table or '{}'} "
            f"ckpt_reads={n_ckpt}{status}"
        )
    print(f"\nFLAGGED (>= {args.threshold} scans of one table, "
          f"not dispositioned): {len(findings)}")
    for name, worst, per_table in findings:
        print(f"  {name}: {worst}x {per_table}")
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main())
