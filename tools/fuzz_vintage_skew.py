"""Adversarial-vintage #3: KEY SKEW. Vintage #1 perturbs values/text/
time shapes and #2 perturbs relational boundary values, but both keep
key DISTRIBUTIONS roughly uniform — so the giant-group code paths
(windows over one huge user partition, heavy-hitter thresholds, salt
plans, per-source rollups where one source IS the corpus, one label
owning most vectors) never see the shape that makes them interesting.
This vintage plants the skew while keeping every FK valid:

- events: half of all rows reassigned to ONE user (a giant
  sessionize/window partition; user-keyed aggs get a heavy hitter);
  event_type left alone (the type x hour grids stay honest);
- documents: 60% of docs collapse onto ONE source (per-source
  rollups where "rest" is thin), 80% onto ONE language;
- orders: 30% of orders reassigned to ONE customer;
- lineitem: 10% of lines reassigned to the already-largest order,
  l_linenumber renumbered unique within it (the degenerate wide
  order, without the duplicate-(orderkey, linenumber) hazard #2
  already covers);
- embeddings: 70% of vectors relabeled to label 0 (one giant IVF
  cell — the probe set collapses, centroid dominated).

Both engines see the same skewed parquet, so any divergence is a
skew-dependent cross-engine bug (giant-group fold order, tie
handling inside a dominant partition) and any engine error is a
skew-triggered crash class. The 13 streaming members run as the
second phase like the other vintages.

Usage: python tools/fuzz_vintage_skew.py [/tmp/fuzz_skew] [skip,names]
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
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fuzz_skew"
os.makedirs(DST, exist_ok=True)
rng = np.random.RandomState(21)

ev = pq.read_table(f"{SRC}/events.parquet").to_pandas()
m = len(ev)
uid = ev["user_id"].to_numpy().copy()
giant_user = uid[0]
idx = rng.choice(m, m // 2, replace=False)
uid[idx] = giant_user
ev["user_id"] = uid
ev.to_parquet(f"{DST}/events.parquet")

docs = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
n = len(docs)
src_col = docs["source"].to_numpy().copy()
lang_col = docs["lang"].to_numpy().copy()
giant_source, giant_lang = src_col[0], lang_col[0]
src_col[rng.choice(n, (n * 6) // 10, replace=False)] = giant_source
lang_col[rng.choice(n, (n * 8) // 10, replace=False)] = giant_lang
docs["source"] = src_col
docs["lang"] = lang_col
docs.to_parquet(f"{DST}/documents.parquet")

od = pq.read_table(f"{SRC}/orders.parquet").to_pandas()
k = len(od)
cust = od["o_custkey"].to_numpy().copy()
giant_cust = cust[0]
cust[rng.choice(k, (k * 3) // 10, replace=False)] = giant_cust
od["o_custkey"] = cust
od.to_parquet(f"{DST}/orders.parquet")

li = pq.read_table(f"{SRC}/lineitem.parquet").to_pandas()
deg = li["l_orderkey"].value_counts()
giant_order = int(deg.index[0])
move = rng.choice(len(li), len(li) // 10, replace=False)
ok = li["l_orderkey"].to_numpy().copy()
ok[move] = giant_order
li["l_orderkey"] = ok
# renumber the giant order's lines 1..k so (orderkey, linenumber)
# stays unique (vintage #2 owns the duplicate-pair hazard)
ln = li["l_linenumber"].to_numpy().copy()
giant_mask = ok == giant_order
ln[giant_mask] = np.arange(1, giant_mask.sum() + 1)
li["l_linenumber"] = ln
li.to_parquet(f"{DST}/lineitem.parquet")

emb = pq.read_table(f"{SRC}/embeddings.parquet").to_pandas()
lab = emb["label"].to_numpy().copy()
lab[rng.choice(len(emb), (len(emb) * 7) // 10, replace=False)] = 0
emb["label"] = pd.array(lab, dtype="int32")
emb.to_parquet(f"{DST}/embeddings.parquet")

for t in ("region", "nation", "customer", "supplier", "part"):
    pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"), f"{DST}/{t}.parquet")

print("skew vintage written to", DST, flush=True)

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
# the implemented-but-unregistered round-14 queue rides the audit
# (the skew hits it squarely: one giant IVF/centroid cell, dominant
# attribution user, one-source padding census)
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
