#!/usr/bin/env python
"""Isolated per-entry optimization probe (rounds 13-14).

Times named registry entries with the bench methodology (noop sink,
warmup at sf0.001, min of N passes at SF_DIR) WITHOUT the other 340
entries around them, and dumps ``.explain("formatted")`` for each to
plans/<dir>/<entry>_<tag>.txt. This is the measure-first loop of
/opt/skills/guides/spark_optimization_guide.md §1: isolate, time the
computation (not the sink), capture the plan shape.

``--cold`` (VERDICT r13 ask #1): min-of-N on a warm session hides the
build cost of session-memoized shared stages — the r13 "isolated
after" numbers for the memo families were warm-consumer figures. With
--cold each entry additionally gets a COLD measurement: all session
caches are released (cachemgr.release_session_caches drops every memo
dict and staged frame) and the first pass at SF_DIR is timed by
itself. Reported as ``cold=<s>`` next to the warm min.

Usage:
    python tools/opt_probe.py [--tag before] [--passes 3] entry [...]
    python tools/opt_probe.py --tag before --plans-only entry ...
    python tools/opt_probe.py --cold entry ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mapreduceece563_spark import cachemgr  # noqa: E402
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
    ap.add_argument("--cold", action="store_true")
    ap.add_argument("--plans-dir", default="r14")
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
    plans_dir = os.path.join(REPO, "plans", args.plans_dir)
    os.makedirs(plans_dir, exist_ok=True)

    results: dict[str, tuple[float | None, float]] = {}
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
        cold = None
        if args.cold:
            # honest cold figure: nothing memoized, nothing staged —
            # the first pass pays every shared-stage build this entry
            # triggers (same codegen/page-cache state as bench pass 1
            # after warmup: the sf0.001 warm pass below ran already
            # for prior entries, so JIT noise is mostly gone)
            cachemgr.release_session_caches()
            fn(spark, WARM_DIR).write.format("noop").mode("overwrite").save()
            cachemgr.release_session_caches()
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            cold = round(time.perf_counter() - t0, 3)
        # warm both scales (codegen + page cache), untimed
        fn(spark, WARM_DIR).write.format("noop").mode("overwrite").save()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(args.passes):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        results[name] = (cold, round(best, 3))
        label = f"{results[name][1]} s"
        if cold is not None:
            label += f" (cold {cold} s)"
        print(f"[time] {name}: {label}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)

    for name, (cold, sec) in results.items():
        if cold is None:
            print(f"{name}\t{sec}")
        else:
            print(f"{name}\t{sec}\tcold={cold}")


if __name__ == "__main__":
    main()
