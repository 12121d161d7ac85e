#!/usr/bin/env python
"""Isolated per-entry optimization probe (round 13).

Times named registry entries with the bench methodology (noop sink,
warmup at sf0.001, min of N passes at SF_DIR) WITHOUT the other 340
entries around them, and dumps ``.explain("formatted")`` for each to
plans/r13/<entry>_<tag>.txt. This is the measure-first loop of
/opt/skills/guides/spark_optimization_guide.md §1: isolate, time the
computation (not the sink), capture the plan shape.

Usage:
    python tools/opt_probe.py [--tag before] [--passes 3] entry [entry ...]
    python tools/opt_probe.py --tag before --plans-only entry ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mapreduceece563_spark.registry import queries  # noqa: E402
from mapreduceece563_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = "/root/testdata/sf0.001"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("entries", nargs="+")
    ap.add_argument("--tag", default="probe")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--plans-only", action="store_true")
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument(
        "--conf", action="append", default=[],
        help="extra k=v session confs applied before planning",
    )
    args = ap.parse_args()

    spark = get_spark("opt-probe")
    for kv in args.conf:
        k, _, v = kv.partition("=")
        spark.conf.set(k, v)
    qs = queries()
    plans_dir = os.path.join(REPO, "plans", "r13")
    os.makedirs(plans_dir, exist_ok=True)

    results: dict[str, float] = {}
    for name in args.entries:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"probe:{name}")
        if not args.no_plan:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            out = os.path.join(plans_dir, f"{name}_{args.tag}.txt")
            with open(out, "w") as fh:
                fh.write(plan)
            print(f"[plan] {out}", file=sys.stderr)
        if args.plans_only:
            continue
        # warm both scales (codegen + page cache), untimed
        fn(spark, WARM_DIR).write.format("noop").mode("overwrite").save()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(args.passes):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        results[name] = round(best, 3)
        print(f"[time] {name}: {results[name]} s", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)

    for name, sec in results.items():
        print(f"{name}\t{sec}")


if __name__ == "__main__":
    main()
