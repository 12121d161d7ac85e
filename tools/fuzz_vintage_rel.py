"""Adversarial-vintage #2: the RELATIONAL tier. Vintage #1 perturbed
documents/events/embeddings but copied the TPC-H tables unchanged, so
q1-q22 and the relational operators never saw adversarial input.
This one perturbs orders/lineitem/customer values while keeping keys
FK-valid: price/discount/tax boundary values and rounding-tie cents,
duplicated (orderkey, linenumber) pairs (a known engine-tiebreak
hazard), same-date order floods, zero-quantity lines, and customers
with identical balances (rank-tie pressure).

The 13 streaming members run as a SECOND phase (VERDICT r12 ask #3):
calling each registry entry at the vintage dir spins up its real
drain (replay fixtures + checkpoints are keyed per (app, sf_dir), so
a fresh vintage dir gets fresh fixtures), then compares the sink
read-back to the same DuckDB oracle as the batch tier. Pass a skip
list containing "streaming" to run batch-only."""
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
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fuzz_rel"
os.makedirs(DST, exist_ok=True)
rng = np.random.RandomState(7)

li = pq.read_table(f"{SRC}/lineitem.parquet").to_pandas()
n = len(li)
# rounding-tie prices and zero/extreme discounts
ep = li["l_extendedprice"].to_numpy().copy()
ep[: n // 5] = 100.005
ep[n // 5 : 2 * n // 5] = 0.01
li["l_extendedprice"] = ep
disc = li["l_discount"].to_numpy().copy()
disc[: n // 4] = 0.0
disc[n // 4 : n // 3] = 0.1
li["l_discount"] = disc
qty = li["l_quantity"].to_numpy().copy()
qty[: n // 6] = 0
li["l_quantity"] = qty
# duplicate (orderkey, linenumber) pairs: clone 5% of rows verbatim
dup = li.sample(frac=0.05, random_state=3)
li = pd.concat([li, dup], ignore_index=True)
li.to_parquet(f"{DST}/lineitem.parquet")

od = pq.read_table(f"{SRC}/orders.parquet").to_pandas()
m = len(od)
# flood one date and tie many totalprices
dates = od["o_orderdate"].copy()
dates.iloc[: m // 3] = dates.iloc[0]
od["o_orderdate"] = dates
tp = od["o_totalprice"].to_numpy().copy()
tp[: m // 4] = 50000.005
od["o_totalprice"] = tp
od.to_parquet(f"{DST}/orders.parquet")

cu = pq.read_table(f"{SRC}/customer.parquet").to_pandas()
k = len(cu)
bal = cu["c_acctbal"].to_numpy().copy()
bal[: k // 2] = 4321.105  # mass ties at a rounding boundary
cu["c_acctbal"] = bal
cu.to_parquet(f"{DST}/customer.parquet")

for t in ("region", "nation", "supplier", "part", "documents", "events",
          "embeddings"):
    pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"), f"{DST}/{t}.parquet")

print("relational vintage written to", DST, flush=True)

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
# the implemented-but-unregistered round-14 queue rides the audit too
# (the relational perturbations hit its orders/events/embeddings
# consumers: seasonal decomposition, attribution, the advisors)
from mapreduceece563_spark.operators import analytics as an
from mapreduceece563_spark.operators import skew as sk
from mapreduceece563_spark.operators import similarity as sim
from mapreduceece563_spark.operators import storage as stg
from mapreduceece563_spark.operators import temporal as tp
from mapreduceece563_spark.operators import trainprep as tr
from mapreduceece563_spark.streaming import late_stream as lls

for _qname, (_qfn, _qsql) in {
    "q14_rerank": (sim.rerank_two_stage, sim.RERANK_TWO_STAGE_SQL),
    "q14_projection": (
        sim.projection_neighborhood_audit,
        sim.PROJECTION_NEIGHBORHOOD_SQL,
    ),
    "q14_margin": (sim.label_centroid_margin, sim.LABEL_CENTROID_MARGIN_SQL),
    "q14_late": (lls.streaming_late_data_audit, lls.LATE_DATA_AUDIT_SQL),
    "q14_padding": (tr.padding_waste_curve, tr.PADDING_WASTE_SQL),
    "q14_fano": (tp.hourly_burstiness_fano, tp.FANO_SQL),
    "q14_seasonal": (
        tp.seasonal_decomposition_monthly,
        tp.SEASONAL_DECOMP_SQL,
    ),
    "q14_rowgroup": (stg.rowgroup_size_plan, stg.ROWGROUP_SIZE_SQL),
    "q14_multitouch": (an.multitouch_attribution, an.MULTITOUCH_SQL),
    "q14_broadcast": (sk.broadcast_threshold_plan, sk.BROADCAST_PLAN_SQL),
}.items():
    qs[_qname] = _qfn
    oracles[_qname] = _qsql
skip = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else set()
fails, errs = [], []
t0 = time.time()
# batch tier first, then the streaming tier (whose first member pays
# the concurrent pool drain at the vintage dir)
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
