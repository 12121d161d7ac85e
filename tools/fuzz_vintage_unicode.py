"""Adversarial-vintage #4: UNICODE / TEXT SHAPE. The text pipeline is
the one place the two engines run genuinely different machinery —
Spark's regexp/split are Java regex over UTF-16, DuckDB's are RE2
over UTF-8 — so ASCII-only fixtures can hide divergences in char
classes, case folding, byte-vs-codepoint lengths, and line handling.
This vintage rewrites documents.text with the shapes multilingual
crawls actually produce:

- accented latin (café, naïve — precomposed) and the SAME strings in
  NFD (combining diacritics: a different codepoint sequence that
  renders identically);
- CJK with no whitespace at all; emoji incl. ZWJ sequences;
- right-to-left arabic; greek/cyrillic case pairs (case folding);
- NBSP and other non-ASCII whitespace INSIDE tokens (the single-space
  tokenizer must NOT split on it — §2.7 splits on ' ' only);
- CRLF and lone-\r "lines" inside text;
- zero-width joiners/non-joiners inside words;
- byte-length != char-length stress for every strlen/octet path.

Every other table is copied unchanged; the full registry + the
round-14 queue + the 13 streaming members run as usual. A divergence
is a cross-engine text-semantics bug; an error is a codec crash.

Usage: python tools/fuzz_vintage_unicode.py [/tmp/fuzz_uni] [skip,names]
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
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fuzz_uni"
os.makedirs(DST, exist_ok=True)
rng = np.random.RandomState(4)

import unicodedata

NFC = unicodedata.normalize("NFC", "caf\u00e9 na\u00efve r\u00e9sum\u00e9 z\u00fcrich")
NFD = unicodedata.normalize("NFD", NFC)  # combining diacritics
assert NFC != NFD  # different codepoints, identical rendering
NBSP, THIN = "\u00a0", "\u2009"
ZWNJ, ZWJ = "\u200c", "\u200d"
SHAPES = [
    NFC,
    NFD,
    NFC + " " + NFD,  # both normal forms in one doc
    "\u4e2d\u6587\u6587\u672c\u6ca1\u6709\u7a7a\u683c",  # CJK, no spaces
    "\u65e5\u672c\u8a9e \u30c6\u30b9\u30c8 \u6f22\u5b57",
    "emoji \U0001f600 \U0001f469" + ZWJ + "\U0001f4bb family",  # ZWJ seq
    "\u0645\u0631\u062d\u0628\u0627 \u0628\u0627\u0644\u0639\u0627\u0644\u0645",  # arabic RTL
    "\u0393\u03b5\u03b9\u03ac \u03c3\u03bf\u03c5 \u039a\u03cc\u03c3\u03bc\u03b5",  # greek
    "\u041f\u0440\u0438\u0432\u0435\u0442 \u041c\u0418\u0420 \u043c\u0438\u0440",  # cyrillic case pair
    "nbsp" + NBSP + "inside one" + THIN + "thin token",  # non-ascii ws IN tokens
    "crlf\r\nline and\rlone cr",
    "zero" + ZWNJ + "width" + ZWJ + "joined words",
    "mixed ascii caf\u00e9 \u4e2d\u6587 \U0001f600 end",
    "UPPER \u00c9T\u00c9 lower \u00e9t\u00e9 fold",
]


docs = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
texts = docs["text"].tolist()
n = len(docs)
for i in range(n):
    r = i % 4
    if r == 0:
        texts[i] = SHAPES[i % len(SHAPES)]
    elif r == 1:
        # splice a unicode shape into the original ascii text
        texts[i] = texts[i] + " " + SHAPES[(i // 4) % len(SHAPES)]
    # else keep the original ascii text (the control group)
docs["text"] = texts
docs["n_chars"] = [len(t or "") for t in texts]
docs.to_parquet(f"{DST}/documents.parquet")

for t in ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "embeddings"):
    pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"), f"{DST}/{t}.parquet")

print("unicode vintage written to", DST, flush=True)

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
