"""Round-13 queue: implemented + oracle-tested ahead of registration
(the established queue precedent; rounds 10-12 are spoken for).

Four classes: robust stats (median/MAD outlier census), privacy
(distinct-l-diversity), audio segmentation (VAD-style silence runs
off the real RIFF decode), and time-series structure (gap-filled
hourly autocorrelation at lags 1 and 24)."""

from __future__ import annotations

from tests.conftest import SF_DIR, assert_frames_match


def test_mad_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import analytics as an

    assert_frames_match(
        an.quality_mad_outliers(spark, SF_DIR),
        duck.execute(an.QUALITY_MAD_SQL),
        ctx="quality_mad_outliers",
    )


def test_mad_python_model(spark):
    """Lower-median + MAD + Iglewicz-Hoaglin flags recomputed in pure
    Python from the op's own quality scores."""
    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.operators.textstats import quality_score
    from mapreduceece563_spark.sources.catalog import load_table

    q = {
        r["doc_id"]: round(r["quality"] * 1_000_000)
        for r in quality_score(spark, SF_DIR).collect()
    }
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang"
    ).collect()
    by_lang: dict = {}
    for r in docs:
        by_lang.setdefault(r["lang"], []).append(q[r["doc_id"]])

    def lower_median(xs):
        xs = sorted(xs)
        # smallest value whose cumulative count reaches ceil(n/2)
        return xs[(len(xs) - 1) // 2]

    got = {
        r["lang"]: r
        for r in an.quality_mad_outliers(spark, SF_DIR).collect()
    }
    assert set(got) == set(by_lang)
    for lang, xs in by_lang.items():
        med = lower_median(xs)
        mad = lower_median([abs(x - med) for x in xs])
        n_out = sum(
            1 for x in xs
            if abs(x - med) * an.MAD_Z_NUM > an.MAD_Z_DEN * mad
        )
        g = got[lang]
        assert (g["n"], g["median_ppm"], g["mad_ppm"], g["n_outliers"]) == (
            len(xs), med, mad, n_out,
        )
        assert g["outlier_ppm"] == n_out * 1_000_000 // len(xs)


def test_mad_flags_injected_outlier(spark, tmp_path):
    """20 identical docs (MAD = 0) + one extreme doc: with zero MAD
    any deviation is infinite in modified-z terms, so exactly the
    extreme doc is flagged; a clean constant corpus flags nothing."""
    from mapreduceece563_spark.operators import analytics as an

    rows = [(i, "the and of the and", "dirty", "s", 19) for i in range(20)]
    rows.append((20, "zz", "dirty", "s", 2))
    rows += [(i, "the and of", "clean", "s", 11) for i in range(21, 31)]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        r["lang"]: r
        for r in an.quality_mad_outliers(spark, str(tmp_path)).collect()
    }
    assert got["dirty"]["mad_ppm"] == 0
    assert got["dirty"]["n_outliers"] == 1
    assert got["clean"]["n_outliers"] == 0
    assert got["clean"]["mad_ppm"] == 0


def test_mad_plan_is_histogram_bounded(spark):
    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(an.quality_mad_outliers(spark, SF_DIR), "simple")
    assert "row_number" not in p
    assert "windowspecdefinition(lang" in p
    assert "windowspecdefinition(doc_id" not in p


def test_ldiv_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import mining as mn

    assert_frames_match(
        mn.l_diversity_audit(spark, SF_DIR),
        duck.execute(mn.L_DIVERSITY_SQL),
        ctx="l_diversity_audit",
    )


def test_ldiv_python_model(spark):
    from mapreduceece563_spark.operators import mining as mn
    from mapreduceece563_spark.sources.catalog import load_table

    rows = load_table(spark, SF_DIR, "events").select(
        "event_type", "ts", "user_id"
    ).collect()
    groups: dict = {}
    for r in rows:
        key = (r["event_type"], r["ts"].hour)
        users, k = groups.setdefault(key, [set(), 0])
        users.add(r["user_id"])
        groups[key] = [users, k + 1]
    g = mn.l_diversity_audit(spark, SF_DIR).collect()[0]
    ls = {key: (len(u), k) for key, (u, k) in groups.items()}
    assert g["n_groups"] == len(ls)
    assert g["min_l"] == min(l for l, _ in ls.values())
    below = [(l, k) for l, k in ls.values() if l < mn.L_DIV_THRESHOLD]
    assert g["n_groups_below_l"] == len(below)
    assert g["n_rows_at_risk"] == sum(k for _, k in below)


def test_ldiv_flags_single_user_group(spark, tmp_path):
    """A (type, hour) group that is 50 rows of ONE user is k-safe but
    l-unsafe: min_l == 1 and all 50 rows are at risk; a 6-user group
    in the same table is safe."""
    import datetime

    from mapreduceece563_spark.operators import mining as mn

    t0 = datetime.datetime(2024, 1, 1, 9, 0, 0)
    t1 = datetime.datetime(2024, 1, 1, 14, 0, 0)
    rows = [(i, t0, 42, "stalkable", 1.0, "{}") for i in range(50)]
    rows += [
        (50 + i, t1, 100 + i % 6, "busy", 1.0, "{}") for i in range(60)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    g = mn.l_diversity_audit(spark, str(tmp_path)).collect()[0]
    assert g["n_groups"] == 2
    assert g["min_l"] == 1
    assert g["n_groups_below_l"] == 1
    assert g["n_rows_at_risk"] == 50


def test_ldiv_plan_has_no_window(spark):
    from mapreduceece563_spark.operators import mining as mn
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(mn.l_diversity_audit(spark, SF_DIR), "simple")
    assert "Window" not in p
    assert "Join" not in p


def test_silence_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import multimodal as mm

    assert_frames_match(
        mm.audio_silence_segmentation(spark, SF_DIR),
        duck.execute(mm.AUDIO_SILENCE_SQL),
        ctx="audio_silence_segmentation",
    )


def test_silence_helper_on_injected_silence(spark):
    """Hand-built WAV with REAL silence: 3 loud frames, 2 zero
    frames, 1 loud, 2 zero + a partial frame tail — the runs, counts
    and energies are exact; an all-zero clip is all-silent... except
    that zero total energy makes NO frame 'below half the mean', the
    documented adaptive-threshold edge."""
    import numpy as np

    from mapreduceece563_spark.operators import multimodal as mm

    FR = mm.AUDIO_FRAME
    loud = np.full(FR, 1000, dtype=np.int64)
    quiet = np.zeros(FR, dtype=np.int64)
    samples = np.concatenate(
        [loud, loud, loud, quiet, quiet, loud, quiet, quiet,
         np.full(FR // 2, 777, dtype=np.int64)]  # partial tail ignored
    )
    clip = mm.encode_wav(8000, samples)
    n, nf, ns, run, emin, emax = mm._silence_stats(clip)
    assert (n, nf) == (8 * FR + FR // 2, 8)
    assert ns == 4
    assert run == 2
    assert emin == 0 and emax == FR * 1000 * 1000

    flat = mm.encode_wav(8000, np.zeros(4 * FR, dtype=np.int64))
    assert mm._silence_stats(flat) == (4 * FR, 4, 0, 0, 0, 0)


def test_silence_python_model(spark):
    """Replay the WAV generator formula per doc and pin all six
    exported stats."""
    from mapreduceece563_spark.operators import multimodal as mm
    from mapreduceece563_spark.sources.catalog import load_table

    ids = [
        r["doc_id"]
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id").collect()
    ]
    got = {
        r["doc_id"]: r
        for r in mm.audio_silence_segmentation(spark, SF_DIR).collect()
    }
    FR = mm.AUDIO_FRAME
    for d in ids:
        n = 64 + d % 97
        s = [
            (d * mm.WAV_SAMPLE_MULT + i * mm.WAV_SAMPLE_STEP) % 4096 - 2048
            for i in range(n)
        ]
        nf = n // FR
        es = [
            sum(x * x for x in s[f * FR:(f + 1) * FR]) for f in range(nf)
        ]
        total = sum(es)
        silent = [
            e * nf * mm.SILENCE_DEN < mm.SILENCE_NUM * total for e in es
        ]
        longest = run = 0
        for b in silent:
            run = run + 1 if b else 0
            longest = max(longest, run)
        g = got[d]
        assert (
            g["n_samples"], g["n_frames"], g["n_silent"],
            g["longest_silence_run"], g["min_frame_energy"],
            g["max_frame_energy"],
        ) == (n, nf, sum(silent), longest, min(es), max(es))


def test_silence_plan_is_map_only(spark):
    from mapreduceece563_spark.operators import multimodal as mm
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(mm.audio_silence_segmentation(spark, SF_DIR), "simple")
    assert "hashpartitioning" not in p
    assert "Exchange" not in p.split("MapInPandas _encode")[0]


def test_acf_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import temporal as tp

    assert_frames_match(
        tp.hourly_autocorrelation(spark, SF_DIR),
        duck.execute(tp.HOURLY_ACF_SQL),
        ctx="hourly_autocorrelation",
    )


def test_acf_python_model(spark):
    """Gap-filled series + integer-cleared ACF recomputed in pure
    Python, including the clamped float64 division."""
    import math

    from mapreduceece563_spark.operators import temporal as tp
    from mapreduceece563_spark.sources.catalog import load_table

    import calendar

    rows = load_table(spark, SF_DIR, "events").select(
        "event_type", "ts"
    ).collect()
    # hour index from epoch micros, mirroring unix_micros div 3.6e9
    by_type: dict = {}
    for r in rows:
        us = calendar.timegm(r["ts"].timetuple()) * 1_000_000 \
            + r["ts"].microsecond
        by_type.setdefault(r["event_type"], []).append(us // 3_600_000_000)

    got = {
        r["event_type"]: r
        for r in tp.hourly_autocorrelation(spark, SF_DIR).collect()
    }
    assert set(got) == set(by_type)
    for et, hs in by_type.items():
        h0, h1 = min(hs), max(hs)
        y = [0] * (h1 - h0 + 1)
        for h in hs:
            y[h - h0] += 1
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
        assert g["acf1_ppm"] == acf(tp.ACF_LAG_SHORT)
        assert g["acf24_ppm"] == acf(tp.ACF_LAG_SEASON)


def test_acf_on_perfectly_periodic_series(spark, tmp_path):
    """A strictly 24h-periodic series over exactly 10 cycles has
    acf24_ppm == 900000 EXACTLY (num24 sums 9 of the 10 identical
    cycles' squared deviations); a constant series is NULL (den 0)."""
    import datetime

    from mapreduceece563_spark.operators import temporal as tp

    t0 = datetime.datetime(2024, 3, 1, 0, 0, 0)
    rows, eid = [], 0
    for day in range(10):
        for hour in range(24):
            ts = t0 + datetime.timedelta(days=day, hours=hour)
            for _ in range(1 + (hour % 3)):  # pattern 1,2,3 repeating
                rows.append((eid, ts, 1, "periodic", 1.0, "{}")); eid += 1
            rows.append((eid, ts, 1, "constant", 1.0, "{}")); eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    got = {
        r["event_type"]: r
        for r in tp.hourly_autocorrelation(spark, str(tmp_path)).collect()
    }
    assert got["periodic"]["n_hours"] == 240
    assert got["periodic"]["acf24_ppm"] == 900_000
    assert got["constant"]["acf1_ppm"] is None
    assert got["constant"]["acf24_ppm"] is None


def test_acf_plan_windows_hour_series_only(spark):
    from mapreduceece563_spark.operators import temporal as tp
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(tp.hourly_autocorrelation(spark, SF_DIR), "simple")
    assert "windowspecdefinition(event_type" in p
    assert "hashpartitioning(event_id" not in p
    assert "row_number" not in p


def test_round13_queue_on_empty_tables(spark, tmp_path):
    import duckdb
    import pyarrow.parquet as pq

    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.operators import mining as mn
    from mapreduceece563_spark.operators import multimodal as mm
    from mapreduceece563_spark.operators import temporal as tp
    from mapreduceece563_spark.sources.catalog import TABLES

    d = tmp_path / "empty_sf"
    d.mkdir()
    for t in TABLES:
        schema = pq.read_schema(f"{SF_DIR}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")

    for name, fn, sql in (
        ("quality_mad_outliers", an.quality_mad_outliers,
         an.QUALITY_MAD_SQL),
        ("l_diversity_audit", mn.l_diversity_audit, mn.L_DIVERSITY_SQL),
        ("audio_silence_segmentation", mm.audio_silence_segmentation,
         mm.AUDIO_SILENCE_SQL),
        ("hourly_autocorrelation", tp.hourly_autocorrelation,
         tp.HOURLY_ACF_SQL),
    ):
        assert_frames_match(
            fn(spark, str(d)), con.execute(sql), ctx=f"empty:{name}"
        )
    con.close()
