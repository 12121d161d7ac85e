#!/usr/bin/env python
"""Emit COVERAGE.json: per-registry-entry verification coverage.

For every entry in the registry (in registration order — the driver's
correctness snapshot covers the FIRST 50 names), record whether it has
a DuckDB oracle, which rounds' CORRECTNESS_r*.json files contain a row
for it, and whether that row was fully green (rows+schema+hash). This
makes the checked-window rotation auditable per round: an entry with
``"driver_green_rounds": []`` has only the local pytest signal.

Usage:  python coverage_map.py   (writes COVERAGE.json at the repo root)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from mapreduceece563_spark.registry import oracle_sql, queries  # noqa: E402

DRIVER_WINDOW = 50  # the driver snapshots the first N registered names


def main() -> None:
    rounds: dict[int, dict] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as fh:
            rounds[int(m.group(1))] = json.load(fh)

    names = list(queries())
    oracles = oracle_sql()
    entries = {}
    for pos, name in enumerate(names, start=1):
        green, weak = [], []
        for rnd, data in sorted(rounds.items()):
            row = data.get(name)
            if row is None:
                continue
            full = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            )
            (green if full else weak).append(rnd)
        entries[name] = {
            "position": pos,
            "in_driver_window": pos <= DRIVER_WINDOW,
            "has_oracle": name in oracles,
            "driver_green_rounds": green,
            "driver_nongreen_rounds": weak,
        }

    never = [n for n, e in entries.items() if not e["driver_green_rounds"]]
    out = {
        "n_entries": len(names),
        "driver_window": DRIVER_WINDOW,
        "rounds_seen": sorted(rounds),
        "never_driver_green": never,
        "never_green_outside_window": [
            n for n in never if not entries[n]["in_driver_window"]
        ],
        "entries": entries,
    }
    with open(os.path.join(REPO, "COVERAGE.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(
        f"{len(names)} entries; {len(never)} never driver-green; "
        f"{len(out['never_green_outside_window'])} of those outside the "
        f"current window"
    )


if __name__ == "__main__":
    main()
