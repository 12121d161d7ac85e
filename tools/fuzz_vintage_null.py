"""Adversarial-vintage #5: NULLs. The committed generators never emit
NULL in any nullable column, so every NULL code path — Spark's
NULLS-FIRST vs DuckDB's NULLS-LAST window ordering, isin()/IN
three-valued logic, NOT-IN vs anti-join, CASE-ELSE vs NULL
propagation, NaN leaking into pandas UDFs — went unexercised. This
vintage plants NULLs in the realistically-nullable columns (5% of
text, 10% of lang, 5% of source, 10% of events.value and props) and
re-runs every oracle pair + the round-14 queue + the streaming tier.

First run (round 13) yield: 15 divergences + 3 crashes across six
NULL-policy classes, each fixed with a DOCUMENTED policy:
- NULL value is not a measurement (drift/conformal/AA/t-closeness/
  regression families filter it on both engines);
- NULL-text docs carry no media payload / landing-zone object
  (media builders + binaryfile manifest exclude them);
- scorer audits need lang AND source AND quality defined;
- a NULL source survives a blocklist (anti-join semantics pinned
  over NOT IN's NULL swallow);
- "not known-eval => training data" (coalesce(IN, FALSE));
- NULL text = zero token mass for concentration stats;
- URLs exist only when every generating column does.

Usage: python tools/fuzz_vintage_null.py [/tmp/fuzz_null] [skip,names]
"""
import os
import sys
import time
from collections import Counter
from datetime import datetime
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fuzz_null"
os.makedirs(DST, exist_ok=True)
rng = np.random.RandomState(33)

docs = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
n = len(docs)
for col, frac in (("text", 0.05), ("lang", 0.10), ("source", 0.05)):
    vals = docs[col].to_numpy(dtype=object)
    vals[rng.choice(n, int(n * frac), replace=False)] = None
    docs[col] = vals
docs["n_chars"] = [
    len(t) if isinstance(t, str) else 0 for t in docs["text"]
]
docs.to_parquet(f"{DST}/documents.parquet")

ev = pq.read_table(f"{SRC}/events.parquet").to_pandas()
m = len(ev)
props = ev["props"].to_numpy(dtype=object)
props[rng.choice(m, m // 10, replace=False)] = None
ev["props"] = props
vals = ev["value"].to_numpy(dtype=object)
vals[rng.choice(m, m // 10, replace=False)] = None
ev["value"] = pd.array(
    [float(v) if v is not None else None for v in vals], dtype="float64"
)
ev.to_parquet(f"{DST}/events.parquet")

for t in ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "embeddings"):
    pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"), f"{DST}/{t}.parquet")

print("null vintage written to", DST, flush=True)

sys.path.insert(0, "/root/repo")
from mapreduceece563_spark import registry  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
duck = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    duck.execute(f"CREATE VIEW {t} AS SELECT * FROM '{DST}/{t}.parquet'")


def canon(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, Decimal):
        return round(float(v), 9)
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    if isinstance(v, bytearray):
        return bytes(v)
    return v


qs = registry.queries()
oracles = registry.oracle_sql()
from mapreduceece563_spark.operators import analytics as an
from mapreduceece563_spark.operators import skew as sk
from mapreduceece563_spark.operators import similarity as sim
from mapreduceece563_spark.operators import storage as stg
from mapreduceece563_spark.operators import temporal as tp
from mapreduceece563_spark.operators import trainprep as tr
from mapreduceece563_spark.streaming import late_stream as lls

for _n, (_f, _s) in {
    "q14_rerank": (sim.rerank_two_stage, sim.RERANK_TWO_STAGE_SQL),
    "q14_projection": (
        sim.projection_neighborhood_audit,
        sim.PROJECTION_NEIGHBORHOOD_SQL,
    ),
    "q14_margin": (sim.label_centroid_margin, sim.LABEL_CENTROID_MARGIN_SQL),
    "q14_late": (lls.streaming_late_data_audit, lls.LATE_DATA_AUDIT_SQL),
    "q14_padding": (tr.padding_waste_curve, tr.PADDING_WASTE_SQL),
    "q14_fano": (tp.hourly_burstiness_fano, tp.FANO_SQL),
    "q14_seasonal": (tp.seasonal_decomposition_monthly, tp.SEASONAL_DECOMP_SQL),
    "q14_rowgroup": (stg.rowgroup_size_plan, stg.ROWGROUP_SIZE_SQL),
    "q14_multitouch": (an.multitouch_attribution, an.MULTITOUCH_SQL),
    "q14_broadcast": (sk.broadcast_threshold_plan, sk.BROADCAST_PLAN_SQL),
}.items():
    qs[_n] = _f
    oracles[_n] = _s

skip = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else set()
fails, errs = [], []
t0 = time.time()
ordered = [kv for kv in qs.items() if not kv[0].startswith("streaming_")]
if "streaming" not in skip:
    ordered += [kv for kv in qs.items() if kv[0].startswith("streaming_")]
for i, (name, fn) in enumerate(ordered):
    if name in skip:
        continue
    try:
        sdf = fn(spark, DST)
        scols = sorted(sdf.columns)
        srows = Counter(
            tuple(canon(r[c]) for c in scols) for r in sdf.collect()
        )
        sql = oracles.get(name)
        if sql is None:
            continue
        tbl = duck.execute(sql).fetch_arrow_table()
        ocols = sorted(tbl.column_names)
        orows = Counter(
            tuple(canon(rec[c]) for c in ocols) for rec in tbl.to_pylist()
        )
        if not (scols == ocols and srows == orows):
            fails.append(name)
            print(
                f"DIVERGE {name}: cols={scols == ocols} "
                f"rows {sum(srows.values())}/{sum(orows.values())} "
                f"spark-only={list(srows - orows)[:2]} "
                f"oracle-only={list(orows - srows)[:2]}",
                flush=True,
            )
    except Exception as e:  # noqa: BLE001
        errs.append(name)
        print(f"ERR {name}: {type(e).__name__}: {str(e)[:180]}", flush=True)
    if i % 50 == 0:
        print(f"  [{i}] {name} ({time.time()-t0:.0f}s)", flush=True)

print(f"done in {time.time()-t0:.0f}s; diverging={fails} errors={errs}")
