"""Planted-fixture / model property tests for the round-14 queue —
the checks the oracle hash cannot see: does the STATISTIC mean what
its name claims on inputs with a known answer, and does the
Spark-vs-DuckDB pair stay glued on randomized synthetic frames (the
test_round13_property.py discipline).
"""

from __future__ import annotations

import datetime

import pandas as pd

from pyspark.sql import functions as F  # noqa: F401  (fixture parity)

from tests.conftest import SF_DIR, assert_frames_match  # noqa: F401


def _duck_for(d, tables):
    import duckdb

    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    return con


# --- hourly_burstiness_fano: planted shapes ----------------------------------


def test_fano_planted_shapes(spark, tmp_path):
    """A clocked (constant) series has Fano 0; piling the same event
    mass into rare bursts pushes Fano above 1000 milli (over-
    dispersed); both engines agree on the planted frame."""
    from mapreduceece563_spark.operators import temporal as tp

    t0 = datetime.datetime(2024, 1, 1)
    recs = []
    eid = 0
    for h in range(100):
        # clocked: exactly 7 every hour
        for _ in range(7):
            recs.append(
                (eid, t0 + datetime.timedelta(hours=h, minutes=1), 1,
                 "clocked", 1.0, "{}")
            )
            eid += 1
        # bursty: 70 events every 10th hour, else nothing
        if h % 10 == 0:
            for _ in range(70):
                recs.append(
                    (eid, t0 + datetime.timedelta(hours=h, minutes=2), 2,
                     "bursty", 1.0, "{}")
                )
                eid += 1
    df = pd.DataFrame(
        recs,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    d = tmp_path / "fano_sf"
    d.mkdir()
    df.to_parquet(str(d / "events.parquet"))
    got = {
        r["event_type"]: r.asDict()
        for r in tp.hourly_burstiness_fano(spark, str(d)).collect()
    }
    assert got["clocked"]["fano_milli"] == 0
    assert got["bursty"]["fano_milli"] > 1000
    # same totals planted
    assert got["clocked"]["n_events"] == 700
    assert got["bursty"]["n_events"] == 700
    con = _duck_for(d, ["events"])
    assert_frames_match(
        tp.hourly_burstiness_fano(spark, str(d)),
        con.execute(tp.FANO_SQL),
        ctx="fano:planted",
    )


# --- seasonal_decomposition_monthly: planted seasonality ---------------------


def test_seasonal_planted_signal(spark, tmp_path):
    """Plant revenue = base + pure month-of-year signal (no trend):
    the detrended x24 series must carry the signal and the residual
    must vanish wherever trend is defined — the decomposition
    recovers exactly what was planted. Engine parity on the same
    frame."""
    from mapreduceece563_spark.operators import temporal as tp

    season = [0, 10, 20, 30, 40, 50, 60, 50, 40, 30, 20, 10]  # dollars
    recs = []
    oid = 0
    for m in range(48):  # 4 full years
        y, mo = 2000 + m // 12, m % 12 + 1
        # one order per month: base 100 + seasonal bump
        recs.append(
            (oid, 1, "O", 100.0 + season[m % 12],
             datetime.datetime(y, mo, 1), "1-URGENT")
        )
        oid += 1
    df = pd.DataFrame(
        recs,
        columns=[
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority",
        ],
    )
    d = tmp_path / "seas_sf"
    d.mkdir()
    # pandas defaults to TIMESTAMP(NANOS), which Spark's parquet
    # reader rejects — coerce to micros (the testdata vintage gotcha)
    df.to_parquet(str(d / "orders.parquet"), coerce_timestamps="us")
    rows = sorted(
        tp.seasonal_decomposition_monthly(spark, str(d)).collect(),
        key=lambda r: r["month_idx"],
    )
    assert len(rows) == 48
    for i, r in enumerate(rows):
        if 6 <= i < 42:
            # pure seasonal signal, zero-sum over any 12-month window
            # centered MA = the annual mean -> residual exactly 0
            assert r["residual_x24"] == 0, r
            # seasonal term reproduces the planted bump around the
            # annual mean of 25.833..: seasonal_x24 in cents*24 =
            # 24*100*(season[m] - mean(season)) up to the floor-mean
            # quantum
            mean_cents24 = sum(season) * 100 * 24 // 12
            want = season[r["month_of_year"] - 1] * 100 * 24 - mean_cents24
            assert abs(r["seasonal_x24"] - want) <= 24, r
    con = _duck_for(d, ["orders"])
    assert_frames_match(
        tp.seasonal_decomposition_monthly(spark, str(d)),
        con.execute(tp.SEASONAL_DECOMP_SQL),
        ctx="seasonal:planted",
    )


# --- multitouch_attribution: hand-built journeys -----------------------------


def test_multitouch_hand_journeys(spark, tmp_path):
    """Three journeys with known answers:
    u1: view, click, purchase($10) -> first=view, last=click,
        linear 500,000 milli-cents each
    u2: click, purchase($20), view, purchase($30) -> window 0: click
        gets all of $20; window 1: view gets all of $30
    u3: purchase($5) with no touches -> no credit rows
    """
    from mapreduceece563_spark.operators import analytics as an

    t0 = datetime.datetime(2024, 3, 1)

    def ev(eid, user, minute, typ, val):
        return (eid, t0 + datetime.timedelta(minutes=minute), user, typ,
                float(val), "{}")

    recs = [
        ev(1, 1, 0, "view", 0), ev(2, 1, 1, "click", 0),
        ev(3, 1, 2, "purchase", 10),
        ev(4, 2, 0, "click", 0), ev(5, 2, 1, "purchase", 20),
        ev(6, 2, 2, "view", 0), ev(7, 2, 3, "purchase", 30),
        ev(8, 3, 0, "purchase", 5),
    ]
    df = pd.DataFrame(
        recs,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    d = tmp_path / "mt_sf"
    d.mkdir()
    df.to_parquet(str(d / "events.parquet"))
    got = {
        r["event_type"]: r.asDict()
        for r in an.multitouch_attribution(spark, str(d)).collect()
    }
    # u1: view first, click last, linear half each of 1000 cents;
    # u2 window 0: click is the ONLY touch (first + last + all linear
    # of 2000 cents); u2 window 1: view likewise for 3000 cents
    assert got["view"]["first_touch_cents"] == 1000 + 3000
    assert got["view"]["last_touch_cents"] == 3000
    assert got["click"]["first_touch_cents"] == 2000
    assert got["click"]["last_touch_cents"] == 1000 + 2000
    assert got["view"]["linear_milli_cents"] == 500_000 + 3_000_000
    assert got["click"]["linear_milli_cents"] == 500_000 + 2_000_000
    # the $5 touchless purchase credits nobody
    total_first = sum(v["first_touch_cents"] for v in got.values())
    assert total_first == 6000
    con = _duck_for(d, ["events"])
    assert_frames_match(
        an.multitouch_attribution(spark, str(d)),
        con.execute(an.MULTITOUCH_SQL),
        ctx="multitouch:hand",
    )


# --- padding_waste_curve: randomized engine-parity ---------------------------


def test_padding_randomized_parity(spark, tmp_path):
    """Randomized doc lengths (incl. boundary values: exactly a rung,
    rung+1, top-rung multiples, giants) keep both engines glued and
    match the pure-python packer."""
    import random

    from mapreduceece563_spark.operators import trainprep as tr

    rng = random.Random(14)
    caps_all = sorted({c for _, caps in tr.PADDING_SCHEMES for c in caps})
    lengths = []
    for c in caps_all:
        lengths += [c, c + 1, 2 * c, 3 * c + 1]
    lengths += [rng.randint(1, 400) for _ in range(120)]
    texts = ["w " * n for n in lengths]  # n tokens each
    df = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": [t.rstrip() for t in texts],
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    d = tmp_path / "pad_sf"
    d.mkdir()
    df.to_parquet(str(d / "documents.parquet"))

    def padded(t, caps):
        top = caps[-1]
        r = t % top
        return (t // top) * top + (min(c for c in caps if c >= r) if r else 0)

    want = {
        name: sum(padded(n, caps) for n in lengths)
        for name, caps in tr.PADDING_SCHEMES
    }
    got = {
        r["scheme"]: r["padded_tokens"]
        for r in tr.padding_waste_curve(spark, str(d)).collect()
    }
    assert got == want
    con = _duck_for(d, ["documents"])
    assert_frames_match(
        tr.padding_waste_curve(spark, str(d)),
        con.execute(tr.PADDING_WASTE_SQL),
        ctx="padding:random",
    )


# --- label_centroid_margin: planted mislabel ---------------------------------


def test_margin_planted_mislabel(spark, tmp_path):
    """Two tight, well-separated clusters; one vector of cluster B
    carries label A. Exactly that vector must be the misfit, and
    label A's worst margin must be negative while clean label B
    stays non-negative."""
    import numpy as np

    from mapreduceece563_spark.operators import similarity as sim

    rng = np.random.RandomState(14)
    vecs, labels = [], []
    for i in range(30):
        v = np.zeros(64, dtype=np.float32)
        v[0] = 0.4 + rng.uniform(-0.01, 0.01)
        vecs.append(v)
        labels.append(0)
    for i in range(30):
        v = np.zeros(64, dtype=np.float32)
        v[1] = 0.4 + rng.uniform(-0.01, 0.01)
        vecs.append(v)
        labels.append(1)
    labels[45] = 0  # a B-cluster vector labeled A
    df = pd.DataFrame(
        {
            "vec_id": range(60),
            "embedding": [v.tolist() for v in vecs],
            "label": pd.array(labels, dtype="int32"),
        }
    )
    d = tmp_path / "margin_sf"
    d.mkdir()
    df.to_parquet(str(d / "embeddings.parquet"))
    got = {
        r["label"]: r.asDict()
        for r in sim.label_centroid_margin(spark, str(d)).collect()
    }
    assert got[0]["n_misfit"] == 1
    assert got[0]["worst_margin"] < 0
    assert got[1]["n_misfit"] == 0
    assert got[1]["worst_margin"] >= 0
    con = _duck_for(d, ["embeddings"])
    assert_frames_match(
        sim.label_centroid_margin(spark, str(d)),
        con.execute(sim.LABEL_CENTROID_MARGIN_SQL),
        ctx="margin:planted",
    )


# --- rerank_two_stage: quantization-displacement control ---------------------


def test_rerank_finds_what_int8_misses(spark, tmp_path):
    """Plant a corpus where int8 scoring misranks: the true nearest
    neighbor of each query differs from the int8-dot argmax only in
    sub-quantum coordinates, so stage 1 ranks a decoy first and the
    fp64 rerank must flip them. Verifies the funnel's reason to
    exist, not just its plumbing."""
    import numpy as np

    from mapreduceece563_spark.operators import similarity as sim

    rng = np.random.RandomState(7)
    vecs = []
    labels = []
    # queries: vec_id < 10, all in cell 0: (0.4, _, 0.003, ...) — the
    # e2 component is SUB-QUANTUM at int8 (0.003 * 127 = 0.38 rounds
    # to 0), so stage 1 sees every query as (51, 0, ...)
    for q in range(10):
        v = np.zeros(64, dtype=np.float32)
        v[0] = 0.4
        v[2] = 0.003
        vecs.append(v)
        labels.append(0)
    # decoys score HIGHER at int8 (0.41 -> 52, dot 51*52 = 2652) but
    # lower in fp64 cosine than the exact query clones (dot8 2601,
    # cosine 1.0): the rerank must flip stage-1's order
    for q in range(10):
        decoy = np.zeros(64, dtype=np.float32)
        decoy[0] = 0.41
        vecs.append(decoy)
        labels.append(0)
        clone = np.zeros(64, dtype=np.float32)
        clone[0] = 0.4
        clone[2] = 0.003
        vecs.append(clone)
        labels.append(0)
    # filler cells so the probe has something to skip
    for i in range(30):
        v = rng.uniform(-0.4, 0.4, 64).astype(np.float32)
        vecs.append(v)
        labels.append(1 + i % 3)
    df = pd.DataFrame(
        {
            "vec_id": range(len(vecs)),
            "embedding": [v.tolist() for v in vecs],
            "label": pd.array(labels, dtype="int32"),
        }
    )
    d = tmp_path / "rerank_sf"
    d.mkdir()
    df.to_parquet(str(d / "embeddings.parquet"))
    rows = sim.rerank_two_stage(spark, str(d)).collect()
    # displacement must actually occur somewhere: some exported row
    # was NOT already in stage-1 order (stage1_rank != final_rank)
    assert any(r["stage1_rank"] != r["final_rank"] for r in rows)
    con = _duck_for(d, ["embeddings"])
    assert_frames_match(
        sim.rerank_two_stage(spark, str(d)),
        con.execute(sim.RERANK_TWO_STAGE_SQL),
        ctx="rerank:planted",
    )
