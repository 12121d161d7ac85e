"""Model-based fuzz for the round-13/14 queue algebra: engineered
distributions the fixtures don't produce — bimodal quality with heavy
ties (MAD), adversarial QI groups (l-diversity), random WAV clips
with injected silence (segmentation), random seasonal series (ACF),
and skewed order values (bootstrap CI) — each against a pure-Python
model."""

from __future__ import annotations

import datetime
import random


def test_mad_model_on_bimodal_ties(spark, tmp_path):
    """Two quality clusters with massive internal ties: the lower
    median must pick the cluster boundary deterministically and the
    outlier census must match the per-doc model."""
    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.operators.textstats import quality_score

    rng = random.Random(14)
    texts = {
        "low": "zz",
        "mid": "the and of",
        "high": ("the quick brown fox " * 5).strip(),
    }
    rows = []
    for i in range(150):
        kind = rng.choice(["low", "low", "mid", "high"])
        rows.append((i, texts[kind], f"L{i % 2}", "s", 10))
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    q = {
        r["doc_id"]: round(r["quality"] * 1_000_000)
        for r in quality_score(spark, str(tmp_path)).collect()
    }
    by_lang: dict = {}
    for i, (d, t, lang, s, nc) in enumerate(rows):
        by_lang.setdefault(lang, []).append(q[d])

    def lower_median(xs):
        return sorted(xs)[(len(xs) - 1) // 2]

    got = {
        r["lang"]: r
        for r in an.quality_mad_outliers(spark, str(tmp_path)).collect()
    }
    for lang, xs in by_lang.items():
        med = lower_median(xs)
        mad = lower_median([abs(x - med) for x in xs])
        n_out = sum(
            1 for x in xs
            if abs(x - med) * an.MAD_Z_NUM > an.MAD_Z_DEN * mad
        )
        g = got[lang]
        assert (g["median_ppm"], g["mad_ppm"], g["n_outliers"]) == (
            med, mad, n_out,
        )


def test_silence_model_on_random_clips(spark):
    """Random WAV clips with silence injected at random positions:
    the helper must match a per-sample Python model across 20 seeds
    (frames, runs, energies)."""
    import numpy as np

    from mapreduceece563_spark.operators import multimodal as mm

    FR = mm.AUDIO_FRAME
    for seed in range(20):
        rng = random.Random(seed)
        nf = rng.randint(1, 12)
        frames = []
        for _ in range(nf):
            if rng.random() < 0.4:
                frames.append([0] * FR)
            else:
                frames.append([rng.randint(-2048, 2047) for _ in range(FR)])
        tail = [rng.randint(-100, 100) for _ in range(rng.randint(0, FR - 1))]
        samples = [x for f in frames for x in f] + tail
        clip = mm.encode_wav(8000, np.array(samples, dtype=np.int64))
        got = mm._silence_stats(clip)

        es = [sum(x * x for x in f) for f in frames]
        total = sum(es)
        silent = [
            e * nf * mm.SILENCE_DEN < mm.SILENCE_NUM * total for e in es
        ]
        longest = run = 0
        for b in silent:
            run = run + 1 if b else 0
            longest = max(longest, run)
        assert got == (
            len(samples), nf, sum(silent), longest, min(es), max(es),
        )


def test_acf_model_on_random_seasonal_series(spark, tmp_path):
    """Random counts with a planted daily cycle plus noise, three
    event types folded into one table: the integer-cleared ACF must
    match the Python model, and the planted-cycle type must show
    acf24 far above the white-noise type."""
    import math

    from mapreduceece563_spark.operators import temporal as tp

    t0 = datetime.datetime(2024, 5, 1)
    rows, eid = [], 0
    series: dict = {}
    for seed, et in ((1, "seasonal"), (2, "noise")):
        rng = random.Random(seed)
        ys = []
        for h in range(24 * 8):
            if et == "seasonal":
                y = 3 + 2 * (h % 24 < 8) + rng.randint(0, 1)
            else:
                y = rng.randint(0, 6)
            ys.append(y)
            for _ in range(y):
                rows.append(
                    (eid, t0 + datetime.timedelta(hours=h), 1, et, 1.0, "{}")
                )
                eid += 1
        series[et] = ys
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    got = {
        r["event_type"]: r
        for r in tp.hourly_autocorrelation(spark, str(tmp_path)).collect()
    }
    for et, ys in series.items():
        # the table only contains hours with y > 0 — the op gap-fills
        # between the first and last OCCUPIED hour, mirror that
        first = next(i for i, y in enumerate(ys) if y > 0)
        last = max(i for i, y in enumerate(ys) if y > 0)
        y = ys[first:last + 1]
        n, s = len(y), sum(y)
        dev = [n * v - s for v in y]
        den = sum(d * d for d in dev)

        def acf(k):
            if den == 0 or n <= k:
                return None
            num = sum(dev[t] * dev[t - k] for t in range(k, n))
            v = math.floor(1e6 * float(num) / float(den))
            return max(-1_000_000, min(1_000_000, v))

        g = got[et]
        assert g["n_hours"] == n
        assert g["acf1_ppm"] == acf(1)
        assert g["acf24_ppm"] == acf(24)
    assert got["seasonal"]["acf24_ppm"] > got["noise"]["acf24_ppm"] + 300_000


def test_bootstrap_model_on_skewed_values(spark, tmp_path):
    """Pareto-ish skewed order values: the replicate means and CI
    picks must match the Python model bit for bit (the frozen weight
    family leaves nothing to chance), and the CI must widen relative
    to a uniform group of the same size."""
    from mapreduceece563_spark.functions.hashing import HASH_MOD
    from mapreduceece563_spark.operators import analytics as an

    rng = random.Random(99)
    ts = datetime.datetime(1995, 6, 1)
    rows, oid = [], 0
    vals: dict = {"SKEW": [], "FLAT": []}
    for i in range(2000):
        v = 10.0 if rng.random() < 0.98 else 50_000.0
        vals["SKEW"].append((oid, round(v * 100)))
        rows.append((oid, 1, "O", v, ts, "SKEW", "c", 0, "")); oid += 1
    for i in range(2000):
        v = 500.0 + (i % 11)
        vals["FLAT"].append((oid, round(v * 100)))
        rows.append((oid, 1, "O", v, ts, "FLAT", "c", 0, "")); oid += 1
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string, o_clerk string, o_shippriority int,"
        " o_comment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    got = {
        r["o_orderpriority"]: r
        for r in an.bootstrap_ci_revenue(spark, str(tmp_path)).collect()
    }
    widths = {}
    for p, kv in vals.items():
        means = []
        for b in range(an.BOOT_B):
            wx = sw = 0
            for k, c in kv:
                w = 2 * (
                    ((an.BOOT_A * (k % HASH_MOD)
                      + an.BOOT_B_STEP * (b + 1)) % HASH_MOD) % 2
                )
                wx += w * c
                sw += w
            means.append(wx // max(sw, 1))
        means.sort()
        g = got[p]
        assert g["ci_lo_cents"] == means[an.BOOT_LO_IDX - 1]
        assert g["ci_hi_cents"] == means[an.BOOT_HI_IDX - 1]
        widths[p] = g["ci_hi_cents"] - g["ci_lo_cents"]
    assert widths["SKEW"] > 10 * widths["FLAT"]
