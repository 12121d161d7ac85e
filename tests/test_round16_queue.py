"""Round-16 queue: implemented + oracle-tested ahead of registration.

seasonal_naive_backtest is the forecast-evaluation class:
hourly_autocorrelation measures whether the lag-24 structure exists,
this measures what the baseline that assumes it actually ACHIEVES —
the bar any fancier forecaster must beat."""

from __future__ import annotations

import datetime

from tests.conftest import SF_DIR, assert_frames_match


def test_backtest_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import temporal as tp

    assert_frames_match(
        tp.seasonal_naive_backtest(spark, SF_DIR),
        duck.execute(tp.SEASONAL_BACKTEST_SQL),
        ctx="seasonal_naive_backtest",
    )


def test_backtest_python_model(spark):
    """Gap-filled series, lag-24 forecast, holdout filter, and both
    integer metrics replayed in pure Python."""
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
        for r in tp.seasonal_naive_backtest(spark, SF_DIR).collect()
    }
    for et, hs in by_type.items():
        h0, h1 = min(hs), max(hs)
        y = [0] * (h1 - h0 + 1)
        for h in hs:
            y[h - h0] += 1
        pts = []
        for t in range(len(y)):
            if t < tp.BACKTEST_LAG:
                continue
            if (h0 + t) <= h1 - tp.BACKTEST_HOLDOUT_HOURS:
                continue
            a, f = y[t], y[t - tp.BACKTEST_LAG]
            sm = 2 * abs(a - f) * 1_000_000 // (a + f) if a + f else 0
            pts.append((a, f, abs(a - f), sm))
        if not pts:
            assert et not in got
            continue
        n = len(pts)
        g = got[et]
        assert g["n_scored"] == n
        assert g["total_actual"] == sum(a for a, _, _, _ in pts)
        assert g["mae_milli"] == (
            2000 * sum(e for _, _, e, _ in pts) + n
        ) // (2 * n)
        assert g["smape_ppm"] == (
            2 * sum(s for _, _, _, s in pts) + n
        ) // (2 * n)
        assert g["n_both_zero"] == sum(
            1 for a, f, _, _ in pts if a == 0 and f == 0
        )


def test_backtest_perfect_on_periodic_series(spark, tmp_path):
    """Semantic pin: a strictly 24h-periodic series backtests to MAE
    and sMAPE of exactly 0 (the baseline is exact when the structure
    it assumes holds); adding a one-hour spike INSIDE the holdout
    puts exactly two misses on the board (the spike itself and its
    lag-24 echo)."""
    from mapreduceece563_spark.operators import temporal as tp

    t0 = datetime.datetime(2024, 3, 1, 0, 0, 0)
    rows, eid = [], 0
    for day in range(10):
        for hour in range(24):
            ts = t0 + datetime.timedelta(days=day, hours=hour)
            for _ in range(1 + hour % 3):
                rows.append((eid, ts, 1, "clean", 1.0, "{}")); eid += 1
            for _ in range(1 + hour % 3):
                rows.append((eid, ts, 1, "spiked", 1.0, "{}")); eid += 1
    # one extra event in the holdout (day 8, hour 12)
    rows.append(
        (eid, t0 + datetime.timedelta(days=8, hours=12), 1, "spiked",
         1.0, "{}")
    )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    got = {
        r["event_type"]: r
        for r in tp.seasonal_naive_backtest(spark, str(tmp_path)).collect()
    }
    assert got["clean"]["mae_milli"] == 0
    assert got["clean"]["smape_ppm"] == 0
    assert got["spiked"]["mae_milli"] > 0
    # the spike is missed once as an actual and once as a forecast
    assert got["spiked"]["n_scored"] == got["clean"]["n_scored"]


def test_backtest_plan_windows_hour_series_only(spark):
    from mapreduceece563_spark.operators import temporal as tp
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(tp.seasonal_naive_backtest(spark, SF_DIR), "simple")
    assert "windowspecdefinition(event_type" in p
    assert "hashpartitioning(event_id" not in p
    assert "row_number" not in p


def test_round16_queue_on_empty_tables(spark, tmp_path):
    import duckdb
    import pyarrow.parquet as pq

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

    assert_frames_match(
        tp.seasonal_naive_backtest(spark, str(d)),
        con.execute(tp.SEASONAL_BACKTEST_SQL),
        ctx="empty:seasonal_naive_backtest",
    )
    from mapreduceece563_spark.operators import textstats as ts

    assert_frames_match(
        ts.filter_disparate_impact(spark, str(d)),
        con.execute(ts.DISPARATE_IMPACT_SQL),
        ctx="empty:filter_disparate_impact",
    )
    from mapreduceece563_spark.operators import corpus as cp

    assert_frames_match(
        cp.token_weighted_quality(spark, str(d)),
        con.execute(cp.TOKEN_WEIGHTED_SQL),
        ctx="empty:token_weighted_quality",
    )
    from mapreduceece563_spark.operators import analytics as an

    assert_frames_match(
        an.aa_test_calibration(spark, str(d)),
        con.execute(an.AA_TEST_SQL),
        ctx="empty:aa_test_calibration",
    )
    con.close()


def test_disparate_impact_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import textstats as ts

    assert_frames_match(
        ts.filter_disparate_impact(spark, SF_DIR),
        duck.execute(ts.DISPARATE_IMPACT_SQL),
        ctx="filter_disparate_impact",
    )


def test_disparate_impact_python_model(spark):
    """Per-lang pass rates, the deterministic best-language pick, and
    the cross-multiplied exact DI ratios replayed from the op's own
    quality scores."""
    from mapreduceece563_spark.operators import textstats as ts
    from mapreduceece563_spark.operators.textstats import quality_score
    from mapreduceece563_spark.sources.catalog import load_table

    q = {
        (r["doc_id"]): (r["quality"], r["n_tokens"])
        for r in quality_score(spark, SF_DIR).collect()
    }
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang"
    ).collect()
    rates: dict = {}
    for r in docs:
        quality, n_tokens = q[r["doc_id"]]
        ok = quality >= ts.MIN_QUALITY and n_tokens >= ts.MIN_TOKENS
        n, p = rates.setdefault(r["lang"], [0, 0])
        rates[r["lang"]] = [n + 1, p + (1 if ok else 0)]
    best_lang = min(
        rates, key=lambda L: (-(rates[L][1] * ts.DI_RATE_SCALE
                                // rates[L][0]), L)
    )
    nb, pb = rates[best_lang]
    got = {
        r["lang"]: r
        for r in ts.filter_disparate_impact(spark, SF_DIR).collect()
    }
    assert set(got) == set(rates)
    for lang, (n, p) in rates.items():
        g = got[lang]
        assert (g["n"], g["n_pass"]) == (n, p)
        assert g["pass_ppm"] == p * 1_000_000 // n
        di = p * nb * 1_000_000 // max(pb * n, 1)
        assert g["di_vs_best_ppm"] == di
        assert g["below_four_fifths"] == (di < ts.DI_FOUR_FIFTHS_PPM)
    assert got[best_lang]["di_vs_best_ppm"] == 1_000_000
    assert not got[best_lang]["below_four_fifths"]


def test_disparate_impact_flags_planted_skew(spark, tmp_path):
    """Planted gate skew: a language whose docs all pass vs one where
    only half do -> the second sits at exactly 500000 ppm of the
    first and is flagged; equal-rate languages are not."""
    from mapreduceece563_spark.operators import textstats as ts

    good = ("the and of for with that this from " * 10).strip()
    bad = "zz"
    rows = []
    for i in range(20):
        rows.append((i, good, "winner", "s", len(good)))
    for i in range(20, 40):
        rows.append((i, good if i % 2 == 0 else bad, "half", "s", 10))
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        r["lang"]: r
        for r in ts.filter_disparate_impact(spark, str(tmp_path)).collect()
    }
    assert got["winner"]["pass_ppm"] == 1_000_000
    assert got["winner"]["di_vs_best_ppm"] == 1_000_000
    assert got["half"]["pass_ppm"] == 500_000
    assert got["half"]["di_vs_best_ppm"] == 500_000
    assert got["half"]["below_four_fifths"]
    assert not got["winner"]["below_four_fifths"]


def test_disparate_impact_plan_is_lang_bounded(spark):
    """One groupBy(lang) with map-side partials; the best-language
    row broadcasts back over the |langs| frame; no window, no
    per-doc exchange."""
    from mapreduceece563_spark.operators import textstats as ts
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(ts.filter_disparate_impact(spark, SF_DIR), "simple")
    assert "Window" not in p
    assert "hashpartitioning(doc_id" not in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p


def test_token_weighted_quality_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import corpus as cp

    assert_frames_match(
        cp.token_weighted_quality(spark, SF_DIR),
        duck.execute(cp.TOKEN_WEIGHTED_SQL),
        ctx="token_weighted_quality",
    )


def test_token_weighted_quality_python_model(spark):
    """Weighted order statistics replayed in pure Python from the
    op's own (quality ppm, n_tokens) pairs."""
    from mapreduceece563_spark.operators import corpus as cp
    from mapreduceece563_spark.operators.textstats import quality_score
    from mapreduceece563_spark.sources.catalog import load_table

    q = {
        r["doc_id"]: (round(r["quality"] * 1_000_000), r["n_tokens"])
        for r in quality_score(spark, SF_DIR).collect()
    }
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source"
    ).collect()
    by_src: dict = {}
    for r in docs:
        qp, tok = q[r["doc_id"]]
        by_src.setdefault(r["source"], []).append((qp, tok))
    got = {
        r["source"]: r
        for r in cp.token_weighted_quality(spark, SF_DIR).collect()
    }
    for src, pairs in by_src.items():
        tot = sum(t for _, t in pairs)
        if tot == 0:
            assert src not in got
            continue
        pairs.sort()
        g = got[src]
        assert g["total_tokens"] == tot
        for k, col in ((1, "q25_ppm"), (2, "q50_ppm"), (3, "q75_ppm")):
            cum = 0
            for qp, t in pairs:
                cum += t
                if 4 * cum >= k * tot:
                    assert g[col] == qp
                    break


def test_token_weighted_median_shifts_with_mass(spark, tmp_path):
    """Semantic pin: 10 short clean docs + ONE junk doc carrying 90%
    of the token mass — the DOC-median quality is the clean value,
    but the token-weighted median must be the junk doc's quality
    (that is what the model actually trains on)."""
    from mapreduceece563_spark.operators import corpus as cp
    from mapreduceece563_spark.operators.textstats import quality_score

    clean = "the and of for with that"  # 6 tokens, all stopwords
    junk = " ".join(["zzqx"] * 540)  # 540 tokens, zero stopwords
    rows = [(i, clean, "x", "mix", len(clean)) for i in range(10)]
    rows.append((10, junk, "x", "mix", len(junk)))
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    qs = {
        r["doc_id"]: round(r["quality"] * 1_000_000)
        for r in quality_score(spark, str(tmp_path)).collect()
    }
    g = cp.token_weighted_quality(spark, str(tmp_path)).collect()[0]
    assert g["total_tokens"] == 10 * 6 + 540
    # junk holds 90% of the mass: all three quartiles land on it
    assert g["q25_ppm"] == g["q50_ppm"] == g["q75_ppm"] == qs[10]
    assert qs[10] < qs[0]  # and it IS the low-quality doc


def test_token_weighted_quality_plan_is_histogram_bounded(spark):
    from mapreduceece563_spark.operators import corpus as cp
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(cp.token_weighted_quality(spark, SF_DIR), "simple")
    assert "row_number" not in p
    assert "windowspecdefinition(source" in p
    assert "windowspecdefinition(doc_id" not in p


def test_aa_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import analytics as an

    assert_frames_match(
        an.aa_test_calibration(spark, SF_DIR),
        duck.execute(an.AA_TEST_SQL),
        ctx="aa_test_calibration",
    )


def test_aa_python_model_and_negative_control(spark):
    """Replay the hash split + MWU algebra in pure Python, and assert
    the negative control itself: the fixture's A/A split must fire
    ZERO false positives (each half samples the same distribution)."""
    from mapreduceece563_spark.functions.hashing import HASH_MOD
    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.sources.catalog import load_table

    rows = load_table(spark, SF_DIR, "events").select(
        "event_id", "event_type", "value"
    ).collect()
    by_type: dict = {}
    for r in rows:
        is_b = ((an.AA_A * (r["event_id"] % HASH_MOD) + an.AA_B)
                % HASH_MOD) % 2
        by_type.setdefault(r["event_type"], []).append(
            (round(r["value"] * 100), bool(is_b))
        )
    got = {
        r["event_type"]: r
        for r in an.aa_test_calibration(spark, SF_DIR).collect()
    }
    assert set(got) == set(by_type)
    for et, vals in by_type.items():
        vals.sort()
        n = len(vals)
        n_a = sum(1 for _, b in vals if not b)
        n_b = n - n_a
        ra_x2 = tie_t = 0
        i = 0
        while i < n:
            j = i
            while j < n and vals[j][0] == vals[i][0]:
                j += 1
            c = j - i
            tie_t += c**3 - c
            ra_x2 += (2 * i + c + 1) * sum(
                1 for k in range(i, j) if not vals[k][1]
            )
            i = j
        u_x2 = ra_x2 - n_a * (n_a + 1)
        g = got[et]
        assert (g["n_a"], g["n_b"]) == (n_a, n_b)
        assert g["cles_ppm"] == u_x2 * 500_000 // max(n_a * n_b, 1)
        lhs = an.MWU_Z2_005_DEN * n * (n - 1) * (u_x2 - n_a * n_b) ** 2
        rhs = (
            an.MWU_Z2_005_NUM * n_a * n_b
            * ((n + 1) * n * (n - 1) - tie_t)
        )
        assert g["false_positive"] == (lhs > rhs)
    # the calibration claim on the real fixture
    any_row = next(iter(got.values()))
    assert any_row["n_false_positives"] == 0
    assert any_row["n_types"] == len(by_type)


def test_aa_fires_on_a_genuinely_broken_split(spark, tmp_path):
    """Positive control for the negative control: if the 'A/A' split
    secretly correlates with the metric (here: the hash bit decides
    the VALUE), the machinery must fire — proving the zero-FP result
    on real data is earned, not vacuous."""
    import datetime

    from mapreduceece563_spark.functions.hashing import HASH_MOD
    from mapreduceece563_spark.operators import analytics as an

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(400):
        bit = ((an.AA_A * (i % HASH_MOD) + an.AA_B) % HASH_MOD) % 2
        rows.append((i, t0, 1, "rigged", 10.0 + 90.0 * bit, "{}"))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    g = an.aa_test_calibration(spark, str(tmp_path)).collect()[0]
    assert g["false_positive"]
    assert g["n_false_positives"] == 1
    assert g["cles_ppm"] == 0  # A's values all strictly below B's


def test_aa_plan_is_histogram_bounded(spark):
    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(an.aa_test_calibration(spark, SF_DIR), "simple")
    assert "row_number" not in p
    assert "windowspecdefinition(event_type" in p
    assert "hashpartitioning(event_id" not in p
