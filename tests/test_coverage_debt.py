"""Verification-debt ratchet (VERDICT r4 ask #2).

Round 3 and round 4 both ended with ~50 registry entries that had
never received a driver CORRECTNESS row because the driver checks only
the first 50 registered names per round.  These tests make that debt a
hard signal instead of a judge finding:

* the live never-driver-green count (recomputed from the registry and
  the committed ``CORRECTNESS_r*.json`` files, NOT from a possibly
  stale ``COVERAGE.json``) must never exceed the committed high-water
  mark in ``coverage_highwater.json``;
* every never-green entry that CAN go green (has an oracle) must sit
  inside the driver's 50-name window, i.e. the window is always
  rotated onto the backlog;
* registry growth is frozen while the backlog exceeds the window's
  slack — new entries may only be added once the prior backlog fits in
  the window with room to spare.
"""

from __future__ import annotations

import glob
import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HIGHWATER_PATH = os.path.join(REPO, "coverage_highwater.json")


def _load_rounds() -> dict[int, dict]:
    rounds: dict[int, dict] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m:
            with open(path) as fh:
                rounds[int(m.group(1))] = json.load(fh)
    return rounds


def _live_debt() -> tuple[list[str], list[str], dict[str, bool]]:
    """(registered names, never-driver-green names, name -> has_oracle)."""
    from mapreduceece563_spark.registry import oracle_sql, queries

    names = list(queries())
    oracles = oracle_sql()
    rounds = _load_rounds()
    never = []
    for name in names:
        green = any(
            (row := data.get(name)) is not None
            and row.get("rows_match")
            and row.get("schema_match")
            and row.get("hash_match")
            for data in rounds.values()
        )
        if not green:
            never.append(name)
    return names, never, {n: n in oracles for n in names}


@pytest.fixture(scope="module")
def debt():
    return _live_debt()


def test_never_green_count_at_or_below_highwater(debt):
    _, never, _ = debt
    with open(HIGHWATER_PATH) as fh:
        hw = json.load(fh)
    assert len(never) <= hw["never_driver_green_max"], (
        f"verification debt grew: {len(never)} never-driver-green entries "
        f"exceed the committed high-water mark "
        f"{hw['never_driver_green_max']}. Rotate the driver window onto "
        f"the backlog instead of registering new entries: {sorted(never)}"
    )


def test_window_is_rotated_onto_backlog(debt):
    """Every oracled never-green entry fits the window, or — when the
    backlog exceeds 50 — the window holds nothing BUT backlog. An
    entry may sit outside ONLY if it is explicitly documented as
    deferred in coverage_highwater.json (the arithmetic leftover of a
    rotation, queued first for the next one); anything else outside
    is unscheduled verification debt and fails."""
    names, never, has_oracle = debt
    with open(HIGHWATER_PATH) as fh:
        hw = json.load(fh)
    window_size = hw["driver_window"]
    deferred = set(hw.get("deferred_outside_window", []))
    window = set(names[:window_size])
    oracled_backlog = [n for n in never if has_oracle[n]]
    outside = [
        n for n in oracled_backlog if n not in window and n not in deferred
    ]
    if len(oracled_backlog) <= window_size:
        assert not outside, (
            f"oracled never-driver-green entries left outside the first "
            f"{window_size} registry positions without a documented "
            f"deferral: {outside}"
        )
    else:
        wasted = [
            n
            for n in names[:window_size]
            if n not in set(never) and n not in deferred
        ]
        assert not wasted, (
            f"backlog exceeds the window yet already-green entries occupy "
            f"window slots: {wasted}"
        )
    # a deferral is a queue, not an exemption: deferred entries must
    # lead the post-window block so the next rotation picks them first
    post_window = names[window_size:]
    for n in sorted(deferred):
        if n in never:
            assert n in post_window[: len(deferred)], (
                f"deferred entry {n} is not at the head of the "
                f"post-window block"
            )


def test_growth_frozen_while_backlog_outstanding(debt):
    names, never, has_oracle = debt
    with open(HIGHWATER_PATH) as fh:
        hw = json.load(fh)
    oracled_backlog = sum(1 for n in never if has_oracle[n])
    slack = max(0, hw["driver_window"] - oracled_backlog)
    allowed = hw["n_entries_when_recorded"] + slack
    assert len(names) <= allowed, (
        f"registry grew to {len(names)} entries while {oracled_backlog} "
        f"prior entries still lack a driver CORRECTNESS row; at most "
        f"{allowed} entries are allowed until the backlog clears "
        f"(ratchet coverage_highwater.json down after a green round)"
    )
