"""Adversarial-vintage audit (round 12; run on demand, not in CI):
perturb the sf0.001 tables in ways the committed fixtures never
exercise (value ties at rounding boundaries, burst hours, rare
languages, duplicate-heavy/empty/boundary-length text, duplicate and
origin-piled embeddings) and run EVERY registry oracle pair — plus
the unregistered queue — on the result. A divergence is a latent
cross-engine bug of the EWMA class (data-dependent, green on the
committed fixture); an engine exception is a crash-vs-NULL hazard of
the mixture-weights class. Both finds from the first run (round 12)
are fixed and regression-pinned in tests/.

Usage: python tools/fuzz_vintage.py [/tmp/fuzz_sf] [skip,names]
Runtime: ~3.5 min on local[8] batch-only; the 13 streaming members
run as a second phase (their replay fixtures + checkpoints key per
(app, sf_dir), so the vintage dir gets fresh fixtures spilled from
the perturbed events/documents). Pass a skip list containing
"streaming" to run batch-only."""
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
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fuzz_sf"
import os
os.makedirs(DST, exist_ok=True)
rng = np.random.RandomState(42)

# --- documents: keep schema, perturb content ---------------------------
docs = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
texts = docs["text"].tolist()
langs = docs["lang"].tolist()
srcs = docs["source"].tolist()
n = len(docs)
for i in range(n):
    r = i % 10
    if r == 0:
        texts[i] = ""  # empty doc
    elif r == 1:
        texts[i] = "dup dup dup dup dup"  # heavy exact duplication
    elif r == 2:
        texts[i] = ("x" * 71) + " ok --- *** 123"  # >70-char token + punct
    elif r == 3:
        texts[i] = "tie tie tie one two three four five"
    elif r == 4:
        langs[i] = "zz"  # rare language (singleton-ish)
        texts[i] = "lone wolf language document"
    # else keep original
docs["text"] = texts
docs["lang"] = langs
docs["source"] = srcs
docs["n_chars"] = [len(t or "") for t in texts]
docs.to_parquet(f"{DST}/documents.parquet")

# --- events: ties at cent boundaries, bursty hours, value extremes ----
ev = pq.read_table(f"{SRC}/events.parquet").to_pandas()
m = len(ev)
vals = ev["value"].to_numpy().copy()
vals[: m // 4] = 1.005  # rounding-tie territory for *100 quantization
vals[m // 4 : m // 2] = 0.0
vals[m // 2 : m // 2 + m // 8] = 12345.675
ev["value"] = vals
# compress 1/3 of timestamps into one burst hour; leave big gaps
ts = pd.to_datetime(ev["ts"])
burst = ts.iloc[0].floor("h")
idx = rng.choice(m, m // 3, replace=False)
ts.iloc[idx] = burst + pd.to_timedelta(rng.randint(0, 3600, m // 3), unit="s")
ev["ts"] = ts
ev.to_parquet(f"{DST}/events.parquet")

# --- embeddings: exact duplicates + axis-aligned points ---------------
emb = pq.read_table(f"{SRC}/embeddings.parquet").to_pandas()
vecs = list(emb["embedding"])
for i in range(0, len(vecs), 7):
    vecs[i] = vecs[0]  # many exact duplicates of vec 0
for i in range(3, len(vecs), 11):
    v = np.array(vecs[i], dtype=np.float32)
    v[0] = 0.0
    v[1] = 0.0  # pile-up at the origin cell
    vecs[i] = v.tolist()
emb["embedding"] = vecs
emb.to_parquet(f"{DST}/embeddings.parquet")

# --- relational tables: copy unchanged (schema-heavy perturbations
# risk violating FK invariants some operators assert) ------------------
for t in ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem"):
    pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"), f"{DST}/{t}.parquet")

print("vintage written to", DST, flush=True)

# --- run every oracle pair --------------------------------------------
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
# also audit the implemented-but-unregistered queue of the current
# round (the round-13 queue audited here in round 12 is registered
# now and rides the registry loop)
from mapreduceece563_spark.operators import analytics as an
from mapreduceece563_spark.operators import skew as sk
from mapreduceece563_spark.operators import similarity as sim
from mapreduceece563_spark.operators import storage as stg
from mapreduceece563_spark.operators import temporal as tp
from mapreduceece563_spark.operators import trainprep as tr
from mapreduceece563_spark.streaming import late_stream as lls

extra: dict = {
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
}

skip = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else set()
fails, errs = [], []
t0 = time.time()
# batch tier (+ queue) first, then the streaming tier (whose first
# member pays the concurrent pool drain at the vintage dir)
items = [
    (name, fn, oracles.get(name))
    for name, fn in qs.items()
    if not name.startswith("streaming_")
] + [(name, fn, sql) for name, (fn, sql) in extra.items()]
if "streaming" not in skip:
    items += [
        (name, fn, oracles.get(name))
        for name, fn in qs.items()
        if name.startswith("streaming_")
    ]
for i, (name, fn, sql) in enumerate(items):
    if name in skip:
        continue
    try:
        sdf = fn(spark, DST)
        scols = sorted(sdf.columns)
        srows = Counter(
            tuple(canon(r[c]) for c in scols) for r in sdf.collect()
        )
        if sql is None:
            continue
        tbl = duck.execute(sql).fetch_arrow_table()
        ocols = sorted(tbl.column_names)
        orows = Counter(
            tuple(canon(rec[c]) for c in ocols) for rec in tbl.to_pylist()
        )
        if not (scols == ocols and srows == orows):
            fails.append(name)
            so = list(srows - orows)[:2]
            oo = list(orows - srows)[:2]
            print(
                f"DIVERGE {name}: cols={scols == ocols} "
                f"rows {sum(srows.values())}/{sum(orows.values())} "
                f"spark-only={so} oracle-only={oo}",
                flush=True,
            )
    except Exception as e:  # noqa: BLE001
        errs.append(name)
        print(f"ERR {name}: {type(e).__name__}: {str(e)[:160]}", flush=True)
    if i % 50 == 0:
        print(f"  [{i}] {name} ({time.time()-t0:.0f}s)", flush=True)

print(
    f"done in {time.time()-t0:.0f}s; diverging={fails} errors={errs}",
    flush=True,
)
