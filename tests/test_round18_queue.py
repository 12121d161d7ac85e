"""Round-18 queue: implemented + oracle-tested ahead of registration.

salt_plan_advisor computes what every salting rewrite hardcodes —
how many salts each hot key actually needs."""

from __future__ import annotations

from tests.conftest import SF_DIR, assert_frames_match


def test_salt_plan_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import skew as sk

    assert_frames_match(
        sk.salt_plan_advisor(spark, SF_DIR),
        duck.execute(sk.SALT_PLAN_SQL),
        ctx="salt_plan_advisor",
    )


def test_salt_plan_python_model_and_invariants(spark):
    """Pure-Python ceil arithmetic, plus the advisor's own contract:
    every uncapped key's worst slice lands at or under the target,
    and adding one fewer salt would NOT have sufficed for keys above
    the target (minimality)."""
    from mapreduceece563_spark.operators import skew as sk
    from mapreduceece563_spark.sources.catalog import load_table

    from collections import Counter

    freq = Counter(
        r["event_type"]
        for r in load_table(spark, SF_DIR, "events")
        .select("event_type").collect()
    )
    got = {
        r["event_type"]: r
        for r in sk.salt_plan_advisor(spark, SF_DIR).collect()
    }
    assert set(got) == set(freq)
    T, CAP = sk.SALT_TARGET_ROWS, sk.SALT_PLAN_CAP
    for k, f in freq.items():
        g = got[k]
        s = min((f + T - 1) // T, CAP)
        assert (g["freq"], g["salts_needed"]) == (f, s)
        assert g["worst_slice_rows"] == (f + s - 1) // s
        assert g["dim_replication_extra"] == s - 1
        if s < CAP:
            assert g["worst_slice_rows"] <= T
            if s > 1:  # minimality: one fewer salt would overflow
                assert (f + (s - 1) - 1) // (s - 1) > T


def test_salt_plan_on_planted_hot_key(spark, tmp_path):
    """A 50k-row hot key next to a 10-row cold key: the hot key gets
    exactly ceil(50000/1000) = 50 salts with its worst slice exactly
    at the 1000-row target; the cold key gets 1 salt and no dim
    replication."""
    import datetime

    from mapreduceece563_spark.operators import skew as sk

    ts = datetime.datetime(2024, 1, 1)
    rows = [(i, ts, 1, "hot", 1.0, "{}") for i in range(50_000)]
    rows += [(50_000 + i, ts, 1, "cold", 1.0, "{}") for i in range(10)]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    got = {
        r["event_type"]: r
        for r in sk.salt_plan_advisor(spark, str(tmp_path)).collect()
    }
    assert got["hot"]["salts_needed"] == 50
    assert got["hot"]["worst_slice_rows"] == 1000
    assert got["hot"]["dim_replication_extra"] == 49
    assert got["cold"]["salts_needed"] == 1
    assert got["cold"]["worst_slice_rows"] == 10
    assert got["cold"]["dim_replication_extra"] == 0


def test_round18_queue_on_empty_tables(spark, tmp_path):
    import duckdb
    import pyarrow.parquet as pq

    from mapreduceece563_spark.operators import skew as sk
    from mapreduceece563_spark.sources.catalog import TABLES

    d = tmp_path / "empty_sf"
    d.mkdir()
    for t in TABLES:
        schema = pq.read_schema(f"{SF_DIR}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")

    assert_frames_match(
        sk.salt_plan_advisor(spark, str(d)),
        con.execute(sk.SALT_PLAN_SQL),
        ctx="empty:salt_plan_advisor",
    )
    from mapreduceece563_spark.operators import multimodal as mm

    assert_frames_match(
        mm.audio_quality_audit(spark, str(d)),
        con.execute(mm.AUDIO_QUALITY_SQL),
        ctx="empty:audio_quality_audit",
    )
    from mapreduceece563_spark.operators import temporal as tp

    assert_frames_match(
        tp.ewma_control_chart(spark, str(d)),
        con.execute(tp.EWMA_CONTROL_SQL),
        ctx="empty:ewma_control_chart",
    )
    assert_frames_match(
        mm.image_exposure_audit(spark, str(d)),
        con.execute(mm.IMAGE_EXPOSURE_SQL),
        ctx="empty:image_exposure_audit",
    )
    con.close()


def test_audio_quality_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import multimodal as mm

    assert_frames_match(
        mm.audio_quality_audit(spark, SF_DIR),
        duck.execute(mm.AUDIO_QUALITY_SQL),
        ctx="audio_quality_audit",
    )


def test_audio_quality_python_model(spark):
    """Replay the generator formula and all four stats per clip."""
    from mapreduceece563_spark.operators import multimodal as mm
    from mapreduceece563_spark.sources.catalog import load_table

    ids = [
        r["doc_id"]
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id").collect()
    ]
    got = {
        r["doc_id"]: r
        for r in mm.audio_quality_audit(spark, SF_DIR).collect()
    }
    for d in ids:
        n = 64 + d % 97
        s = [
            (d * mm.WAV_SAMPLE_MULT + i * mm.WAV_SAMPLE_STEP) % 4096 - 2048
            for i in range(n)
        ]
        peak = max(abs(x) for x in s)
        clipped = sum(1 for x in s if abs(x) >= mm.CLIP_LIMIT)
        dc = (2000 * (sum(s) + peak * n) + n) // (2 * n) - 1000 * peak
        g = got[d]
        assert (g["n_samples"], g["peak"]) == (n, peak)
        assert g["clipped_ppm"] == clipped * 1_000_000 // n
        assert g["dc_offset_milli"] == dc


def test_audio_quality_helper_on_broken_recordings(spark):
    """Hand-built pathologies on REAL bytes: a half-clipped square
    wave reports exactly 500000 ppm clipped; a +100 DC-shifted sine-
    ish ramp reports dc_offset_milli == 100000; a clean zero-mean
    ramp reports 0 clipped and 0 offset."""
    import numpy as np

    from mapreduceece563_spark.operators import multimodal as mm

    FR = 64
    half_clip = np.array(
        [2047 if i % 2 == 0 else 100 for i in range(FR)], dtype=np.int64
    )
    n, cl, dc, peak = mm._audio_quality_of(mm.encode_wav(8000, half_clip))
    assert (n, peak) == (FR, 2047)
    assert cl == 500_000

    shifted = np.array(
        [100 + (1 if i % 2 == 0 else -1) for i in range(FR)],
        dtype=np.int64,
    )
    n, cl, dc, peak = mm._audio_quality_of(mm.encode_wav(8000, shifted))
    assert cl == 0
    assert dc == 100_000  # mean is exactly +100.0

    clean = np.array(
        [(i % 21) - 10 for i in range(FR * 2)], dtype=np.int64
    )
    # 128 samples = 6 zero-mean periods + leftovers (-10, -9):
    # mean = -19/128 = -0.1484..., half-up milli = -148
    n, cl, dc, peak = mm._audio_quality_of(mm.encode_wav(8000, clean))
    assert cl == 0
    assert dc == -148


def test_audio_quality_plan_is_map_only(spark):
    from mapreduceece563_spark.operators import multimodal as mm
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(mm.audio_quality_audit(spark, SF_DIR), "simple")
    assert "hashpartitioning" not in p
    assert "Exchange" not in p.split("MapInPandas _encode")[0].split(
        "MapInPandas _audit"
    )[0].replace("RoundRobinPartitioning", "")


def test_ewma_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import temporal as tp

    assert_frames_match(
        tp.ewma_control_chart(spark, SF_DIR),
        duck.execute(tp.EWMA_CONTROL_SQL),
        ctx="ewma_control_chart",
    )


def test_ewma_python_model(spark):
    """Replay the quantized recursion step-for-step in pure Python —
    the integer fold must match bit-exactly over the full series."""
    import calendar

    from mapreduceece563_spark.operators import temporal as tp
    from mapreduceece563_spark.sources.catalog import load_table

    rows = load_table(spark, SF_DIR, "events").select(
        "event_type", "ts"
    ).collect()
    by_type: dict = {}
    for r in rows:
        us = calendar.timegm(r["ts"].timetuple()) * 1_000_000 \
            + r["ts"].microsecond
        by_type.setdefault(r["event_type"], []).append(us // 3_600_000_000)
    got = {
        r["event_type"]: r
        for r in tp.ewma_control_chart(spark, SF_DIR).collect()
    }
    for et, hs in by_type.items():
        h0, h1 = min(hs), max(hs)
        y = [0] * (h1 - h0 + 1)
        for h in hs:
            y[h - h0] += 1
        s, alarms = -1, 0
        for v in y:
            if s >= 0 and v * 1000 > tp.EWMA_K_NUM * s + tp.EWMA_FLOOR:
                alarms += 1
            s = v * 1000 if s < 0 else (
                tp.EWMA_NUM * v * 1000 + (tp.EWMA_DEN - tp.EWMA_NUM) * s
            ) // tp.EWMA_DEN
        g = got[et]
        assert (g["n_hours"], g["ewma_final_milli"], g["n_alarms"]) == (
            len(y), s, alarms,
        )


def test_ewma_alarms_on_injected_burst(spark, tmp_path):
    """A steady 3-events-per-hour baseline with one 100-event burst
    hour: exactly ONE alarm (the chart re-absorbs the burst within
    the smoothing horizon); the burst-free twin alarms zero times."""
    import datetime

    from mapreduceece563_spark.operators import temporal as tp

    t0 = datetime.datetime(2024, 4, 1)
    rows, eid = [], 0
    for h in range(200):
        ts = t0 + datetime.timedelta(hours=h)
        n = 100 if h == 150 else 3
        for _ in range(n):
            rows.append((eid, ts, 1, "bursty", 1.0, "{}")); eid += 1
        for _ in range(3):
            rows.append((eid, ts, 1, "steady", 1.0, "{}")); eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    got = {
        r["event_type"]: r
        for r in tp.ewma_control_chart(spark, str(tmp_path)).collect()
    }
    assert got["bursty"]["n_alarms"] == 1
    assert got["steady"]["n_alarms"] == 0
    # the smoothed level ends back near the 3000-milli baseline
    assert abs(got["steady"]["ewma_final_milli"] - 3000) <= 1


def test_ewma_plan_folds_per_type_arrays(spark):
    """The recursion runs inside an array fold on the per-type hour
    series — no per-event window, no iterative joins."""
    from mapreduceece563_spark.operators import temporal as tp
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(tp.ewma_control_chart(spark, SF_DIR), "simple")
    assert "Window" not in p
    assert "hashpartitioning(event_id" not in p


def test_image_exposure_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import multimodal as mm

    assert_frames_match(
        mm.image_exposure_audit(spark, SF_DIR),
        duck.execute(mm.IMAGE_EXPOSURE_SQL),
        ctx="image_exposure_audit",
    )


def test_image_exposure_python_model(spark):
    """Replay the PPM-group pixel formula and all five stats."""
    from mapreduceece563_spark.operators import multimodal as mm
    from mapreduceece563_spark.sources.catalog import load_table

    ids = [
        r["doc_id"]
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id").collect()
    ]
    got = {
        r["doc_id"]: r
        for r in mm.image_exposure_audit(spark, SF_DIR).collect()
    }
    for d in ids[:60]:
        grp, off = d // mm.AHASH_VARIANTS, d % mm.AHASH_OFFSETS
        w, h = 4 + grp % 5, 3 + grp % 4
        vals = [
            (grp * mm.PPM_PIXEL_MULT + i * mm.PPM_PIXEL_STEP)
            % mm.AHASH_PIXEL_MOD + off
            for i in range(w * h * 3)
        ]
        n = len(vals)
        g = got[d]
        assert g["n_channels"] == n
        assert g["over_ppm"] == sum(
            1 for v in vals if v >= mm.EXPO_HI
        ) * 1_000_000 // n
        assert g["under_ppm"] == sum(
            1 for v in vals if v <= mm.EXPO_LO
        ) * 1_000_000 // n
        assert g["mean_luma_milli"] == (2000 * sum(vals) + n) // (2 * n)
        assert g["dynamic_range"] == max(vals) - min(vals)


def test_image_exposure_helper_on_broken_frames(spark):
    """Hand-built pathologies on REAL bytes: an all-white frame is
    100% blown with zero dynamic range; an all-black frame is 100%
    crushed; a half-and-half frame reports exactly 500000 ppm each
    and the full range."""
    import numpy as np

    from mapreduceece563_spark.operators import multimodal as mm

    w, h = 4, 4
    white = np.full((h, w, 3), 255, dtype=np.uint8)
    n, over, under, mean, dr = mm._image_exposure_of(
        mm.encode_ppm(w, h, white)
    )
    assert (over, under, dr) == (1_000_000, 0, 0)
    assert mean == 255_000

    black = np.zeros((h, w, 3), dtype=np.uint8)
    n, over, under, mean, dr = mm._image_exposure_of(
        mm.encode_ppm(w, h, black)
    )
    assert (over, under, mean, dr) == (0, 1_000_000, 0, 0)

    half = np.zeros((h, w, 3), dtype=np.uint8)
    half[: h // 2] = 255
    n, over, under, mean, dr = mm._image_exposure_of(
        mm.encode_ppm(w, h, half)
    )
    assert (over, under, dr) == (500_000, 500_000, 255)
    assert mean == 127_500


def test_image_exposure_plan_is_map_only(spark):
    from mapreduceece563_spark.operators import multimodal as mm
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(mm.image_exposure_audit(spark, SF_DIR), "simple")
    assert "hashpartitioning" not in p
