#!/usr/bin/env python
"""A/B spark.sql.codegen.maxFields=260 vs the Spark default (100) —
VERDICT r13 ask #2: is the global knob the source of the uniform
0.7-0.85x headline drift, or noise?

Methodology: one session; per entry, warm at sf0.001 + one untimed
sf0.1 pass, then for each conf value time N passes (pass 1 after a
conf flip pays any codegen recompile for plans wider than the
threshold; narrow plans generate identical code under both values).
Runs A then B then A again to expose any monotonic drift that could
masquerade as a conf effect.
"""

from __future__ import annotations

import json
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

ENTRIES = sys.argv[1].split(",") if len(sys.argv) > 1 else [
    # headline 27 (the drift population)
    "wordcount", "q1_pricing_summary", "q3_top_unshipped",
    "q5_region_revenue", "q6_forecast_revenue", "q8_market_share",
    "q9_profit_by_nation", "q18_large_orders", "sql_supplier_argmax",
    "dedup_minhash", "dedup_groups", "ngram_jaccard_pairs",
    "winnow_fingerprints", "tfidf_cosine_pairs", "tfidf_top_terms",
    "corpus_stats", "multimodal_features", "ivf_ann", "knn_brute_force",
    "sessionize", "user_gap_stats", "events_hourly_anomalies",
    "training_data_filter", "simhash_hamming_pairs", "user_trailing_value",
    "doc_repetition_stats", "semdedup_prune_stats",
    # the wide-aggregate entries the knob was added for
    "bootstrap_ci_revenue", "events_profile",
]
PASSES = 3


def mat(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("ab-maxfields")
    qs = queries()
    out: dict[str, dict[str, list[float]]] = {}
    for name in ENTRIES:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"ab:{name}")
        mat(fn(spark, WARM_DIR))
        mat(fn(spark, SF_DIR))
        res: dict[str, list[float]] = {}
        for tag, conf in (("a260", "260"), ("b100", "100"),
                          ("a260_2", "260")):
            spark.conf.set("spark.sql.codegen.maxFields", conf)
            ts = []
            for _ in range(PASSES):
                t0 = time.perf_counter()
                mat(fn(spark, SF_DIR))
                ts.append(round(time.perf_counter() - t0, 3))
            res[tag] = ts
        out[name] = res
        print(f"{name}: {res}", file=sys.stderr)
        cachemgr.release_session_caches()
    spark.conf.set("spark.sql.codegen.maxFields", "260")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
