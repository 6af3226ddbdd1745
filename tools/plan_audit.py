#!/usr/bin/env python
"""Plan-quality audit: for each headline (bench=True) query — or EVERY
registry query with ``--all`` — print the physical-plan evidence that
the 100 TB design rules hold: join strategies chosen, filters pushed
to the parquet scan, and the scan's column pruning (ReadSchema). Run
after changing any query:

    python tools/plan_audit.py [sf_dir] [--all]

Red flags to look for: CartesianProduct/BroadcastNestedLoopJoin, a
ReadSchema listing columns the query doesn't use, an empty
PushedFilters under a selective query.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lambda_lakehouse_spark.registry import load_all  # noqa: E402
from lambda_lakehouse_spark.session import get_spark  # noqa: E402


def audit(sf_dir: str, include_all: bool = False) -> None:
    spark = get_spark(app_name="plan-audit")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name, q in sorted(load_all().items()):
        if not (q.bench or include_all):
            continue
        df = q.spark(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        joins = re.findall(
            r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
            r"BroadcastNestedLoopJoin|CartesianProduct)",
            plan,
        )
        exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
        print(f"== {name}")
        print(f"   joins={joins or 'none'} shuffles={exchanges}")
        for s in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
            print(f"   read: {s[:120]}")
        for p in re.findall(r"PushedFilters: \[([^\]]*)\]", plan):
            if p:
                print(f"   pushed: {p[:120]}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--all"]
    audit(
        args[0] if args else "/root/testdata/sf0.1",
        include_all="--all" in sys.argv[1:],
    )
