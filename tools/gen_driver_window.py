#!/usr/bin/env python
"""Compute the next round's DRIVER_PRIORITY window from the recorded
CORRECTNESS_r*.json artifacts.

The grading driver certifies the first 50 queries of registry
iteration order each round, so every round boundary needs a rotation:
never-green queries (fresh graduates, formerly-red rows) MUST sit
inside the window, changed-plan queries SHOULD re-certify, and the
remaining slots go to the stalest greens so the union of rounds keeps
the whole registry recently certified. This tool derives that order
mechanically instead of by hand:

    python tools/gen_driver_window.py [--must name ...] [--window 50]

- ``--must``: names forced into the window right after the
  never-green block (the changed-plan re-cert cohort).
- Output: a ready-to-paste Python tuple for registry.DRIVER_PRIORITY,
  with per-name comments showing the newest green round (or NEVER),
  plus a staleness report for everything left outside.

A query counts as green in round N under the SAME rule
tests/test_registry_contract.py pins: hash_match is True, or — for
oracle-less (rows-only by design) queries — it ran and produced rows
with no error beyond the expected no_oracle marker.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lambda_lakehouse_spark.registry import load_all  # noqa: E402


def newest_green_rounds(repo: str, registry) -> dict[str, int]:
    """query -> newest round number with a green driver row, under the
    contract-test rule (hash match, or rows-only-by-design ran clean)."""
    newest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.load(open(path))
        except Exception as e:  # artifact corrupt: skip, report
            print(f"-- skipping {path}: {e}", file=sys.stderr)
            continue
        for name, row in rows.items():
            if name not in registry:
                continue
            ok = row.get("hash_match") is True or (
                registry[name].oracle is None
                and row.get("spark_rows") is not None
                and row.get("err") in (None, "no_oracle")
            )
            if ok:
                newest[name] = max(newest.get(name, 0), rnd)
    return newest


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--must", nargs="*", default=[], help="forced re-certs")
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument("--repo", default=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    args = ap.parse_args()

    registry = load_all()
    greens = newest_green_rounds(args.repo, registry)

    unknown = [n for n in args.must if n not in registry]
    if unknown:
        print(f"--must names not in registry: {unknown}", file=sys.stderr)
        return 2

    never = [n for n in registry if n not in greens]
    must = [n for n in args.must if n in greens]  # never-greens already in
    rest = sorted(
        (n for n in registry if n in greens and n not in set(must)),
        key=lambda n: (greens[n], n),  # stalest first, name-stable
    )
    window = never + must + rest
    overflow = len(never) + len(must) - args.window
    if overflow > 0:
        # Refuse to emit a silently-truncated window: a paste-without-
        # reading workflow must not drop forced re-certs from
        # certification. Name the dropped entries and exit nonzero.
        dropped = (never + must)[args.window:]
        print(
            f"-- ERROR: {len(never)} never-green + {len(must)} forced "
            f"> window {args.window}: these {overflow} cannot certify "
            f"this round: {', '.join(dropped)}",
            file=sys.stderr,
        )
        return 3

    print("DRIVER_PRIORITY: tuple[str, ...] = (")
    for i, n in enumerate(window[: args.window]):
        tag = "NEVER" if n in never else (
            "re-cert" if n in must else f"green r{greens[n]:02d}"
        )
        print(f'    "{n}",  # slot {i + 1}: {tag}')
    print(")")

    outside = window[args.window:]
    if outside:
        oldest = min(greens.get(n, 0) for n in outside)
        print(
            f"-- {len(outside)} queries outside the window; "
            f"oldest green among them: r{oldest:02d} "
            f"({', '.join(n for n in outside if greens.get(n) == oldest)})"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
