"""Registry / driver-contract invariants: the grading driver evaluates
the first 50 queries in iteration order, so the rotation machinery in
registry.load_all() must stay correct as queries are added."""

from __future__ import annotations

import glob
import json
import os

from lambda_lakehouse_spark.registry import DRIVER_PRIORITY, load_all

GRADED_WINDOW = 50
_ROUNDS = sorted(
    glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))
)


def test_priority_names_all_exist():
    reg = load_all()
    missing = [n for n in DRIVER_PRIORITY if n not in reg]
    assert not missing, f"DRIVER_PRIORITY references unknown queries: {missing}"


def test_priority_is_prefix_of_iteration_order():
    names = list(load_all())
    assert names[: len(DRIVER_PRIORITY)] == [
        n for n in DRIVER_PRIORITY if n in set(names)
    ]


def test_never_graded_queries_fit_in_driver_window():
    """Every query without a prior GREEN driver row must sit inside the
    first GRADED_WINDOW slots; queries rotated out must all hold a
    prior green row (union coverage across rounds). A row counts as
    green only when its hash matched — or, for oracle-less (rows-only
    by design) queries, when it ran without error — so an error row
    can't satisfy the invariant."""
    if not _ROUNDS:
        return  # fresh clone without round artifacts
    reg = load_all()
    certified = set()
    for path in _ROUNDS:
        for name, row in json.load(open(path)).items():
            if name not in reg:
                continue
            if row.get("hash_match") is True:
                certified.add(name)
            elif reg[name].oracle is None and row.get("spark_rows") is not None:
                # rows-only by design: ran and produced rows, and the
                # recorded err (if any) is the expected no_oracle marker
                if row.get("err") in (None, "no_oracle"):
                    certified.add(name)
    names = list(reg)
    window = set(names[:GRADED_WINDOW])
    uncertified = [n for n in names if n not in certified]
    outside = [n for n in uncertified if n not in window]
    assert not outside, (
        f"{len(outside)} uncertified queries sit beyond slot "
        f"{GRADED_WINDOW} and would stay uncertified: {outside}"
    )
    no_row_ever = [n for n in names[GRADED_WINDOW:] if n not in certified]
    assert not no_row_ever


def test_every_query_has_unique_output_columns(built_queries):
    """Duplicate output column names would silently corrupt the
    driver's sort-by-name value compare — check every query's analyzed
    schema for column-name uniqueness (plans shared with the scale
    guardrails via the session-scoped built_queries cache)."""
    offenders = []
    for name, df in built_queries.items():
        cols = df.columns
        if len(set(cols)) != len(cols):
            offenders.append((name, cols))
    assert not offenders, offenders


def test_window_generator_matches_contract_rule():
    """tools/gen_driver_window.py must classify never-green exactly as
    this contract does — the rotation tool and the invariant may never
    disagree about what still needs certification."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "gen_driver_window",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "gen_driver_window.py"),
    )
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)

    reg = load_all()
    greens = tool.newest_green_rounds(
        os.path.join(os.path.dirname(__file__), ".."), reg
    )
    certified = set()
    for path in _ROUNDS:
        for name, row in json.load(open(path)).items():
            if name not in reg:
                continue
            if row.get("hash_match") is True:
                certified.add(name)
            elif reg[name].oracle is None and row.get("spark_rows") is not None:
                if row.get("err") in (None, "no_oracle"):
                    certified.add(name)
    assert set(greens) == certified


def test_window_generator_exits_nonzero_on_overflow(capsys):
    """When never-green + forced --must exceed the window, the tool
    must refuse (exit 3) and NAME the dropped entries on stderr —
    a truncated window can never be pasted unnoticed (round-7 advice)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "gen_driver_window_ovf",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "gen_driver_window.py"),
    )
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)

    reg = load_all()
    greens = tool.newest_green_rounds(
        os.path.join(os.path.dirname(__file__), ".."), reg
    )
    some_greens = sorted(greens)[:3]
    import sys
    from unittest import mock

    argv = ["prog", "--window", "2", "--must", *some_greens]
    with mock.patch.object(sys, "argv", argv):
        rc = tool.main()
    assert rc == 3
    err = capsys.readouterr().err
    assert "cannot certify" in err
    # at least one dropped name is spelled out
    assert any(n in err for n in some_greens)


def test_bench_band_table_matches_headline_set():
    """Every headline query carries an accepted band (the self-defense
    retry is disarmed for a query without one) and no stale band
    entries outlive their headline registration — adding bench=True
    anywhere forces a conscious band choice here."""
    import bench

    names = set(bench.headline_names())
    bands = set(bench.BAND_MAX)
    assert bands == names, (
        f"missing bands: {sorted(names - bands)}; "
        f"stale bands: {sorted(bands - names)}"
    )
    assert all(v > 0 for v in bench.BAND_MAX.values())
