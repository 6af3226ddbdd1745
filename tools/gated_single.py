#!/usr/bin/env python
"""Bracketed, idle-gated bench singles: for each named query, wait for
the host to go idle (bench.wait_for_idle), run ``bench.py --single``,
and print the control-bracketed results. The disposition instrument the
READMEs' "bracketed floor-control singles" refer to — one command
instead of a hand-rolled sleep/loadavg loop.

    python tools/gated_single.py q1 q2 ...
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def run(name: str) -> dict:
    gate = bench.wait_for_idle()
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(bench.__file__), "bench.py"),
         "--single", name],
        capture_output=True, text=True,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith('{"query"')]
    if lines:
        row = json.loads(lines[-1])
    else:
        # a crashed subprocess must be distinguishable from one that
        # produced no timing (round-11 advice): carry the returncode
        # and a stderr tail in the printed row, mirroring bench.py's
        # isolate-mode failure reporting
        row = {
            "query": name,
            "sec": None,
            "rc": out.returncode,
            "stderr_tail": (
                out.stderr.strip().splitlines()[-1][:300]
                if out.stderr.strip()
                else "no output"
            ),
        }
    row["gate"] = gate
    row["load_at_start"] = bench.read_loadavg()
    return row


def main() -> None:
    names = sys.argv[1:]
    for name in [bench.CONTROL] + names + [bench.CONTROL_END]:
        print(json.dumps(run(name)), flush=True)


if __name__ == "__main__":
    main()
