"""Round-19 queue: implemented + oracle-tested ahead of registration.

session_gap_sensitivity closes the parameter loop on sessionize's
hardcoded 30-minute gap."""

from __future__ import annotations

from tests.conftest import SF_DIR, assert_frames_match


def test_gap_sensitivity_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import sessions as ss

    assert_frames_match(
        ss.session_gap_sensitivity(spark, SF_DIR),
        duck.execute(ss.SESSION_GAP_SENSITIVITY_SQL),
        ctx="session_gap_sensitivity",
    )


def test_gap_sensitivity_cross_operator_identity(spark):
    """The 30-minute row's n_sessions must EQUAL the session count
    sessionize actually produces — the closed-form
    n_users + |{gaps > T}| identity against the real windowed
    sessionizer — and more sessions at tighter thresholds
    (monotonicity)."""
    from mapreduceece563_spark.operators import sessions as ss

    got = {
        r["gap_minutes"]: r
        for r in ss.session_gap_sensitivity(spark, SF_DIR).collect()
    }
    assert got[30]["n_sessions"] == ss.sessionize(spark, SF_DIR).count()
    assert got[15]["n_sessions"] >= got[30]["n_sessions"] \
        >= got[60]["n_sessions"]


def test_gap_sensitivity_python_model(spark):
    """Gap multiset + threshold counts + half-up means in Python."""
    from mapreduceece563_spark.operators import sessions as ss
    from mapreduceece563_spark.sources.catalog import load_table

    rows = load_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_id"
    ).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append((r["ts"], r["event_id"]))
    gaps = []
    for evs in by_user.values():
        evs.sort()
        for (a, _), (b, _) in zip(evs, evs[1:]):
            gaps.append((b - a).total_seconds() * 1e6)
    n_events, n_users = len(rows), len(by_user)
    got = {
        r["gap_minutes"]: r
        for r in ss.session_gap_sensitivity(spark, SF_DIR).collect()
    }
    for m in ss.GAP_SWEEP_MINUTES:
        t_us = m * 60 * 1_000_000
        ns = n_users + sum(1 for g in gaps if g > t_us)
        g = got[m]
        assert g["n_sessions"] == ns
        assert g["mean_events_milli"] == (2000 * n_events + ns) // (2 * ns)


def test_round19_queue_on_empty_tables(spark, tmp_path):
    import duckdb
    import pyarrow.parquet as pq

    from mapreduceece563_spark.operators import sessions as ss
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
        ss.session_gap_sensitivity(spark, str(d)),
        con.execute(ss.SESSION_GAP_SENSITIVITY_SQL),
        ctx="empty:session_gap_sensitivity",
    )
    from mapreduceece563_spark.operators import dedup as dd

    assert_frames_match(
        dd.jaccard_threshold_sweep(spark, str(d)),
        con.execute(dd.JACCARD_SWEEP_ORACLE),
        ctx="empty:jaccard_threshold_sweep",
    )
    assert_frames_match(
        dd.df_cap_sensitivity(spark, str(d)),
        con.execute(dd.DF_CAP_SENSITIVITY_ORACLE),
        ctx="empty:df_cap_sensitivity",
    )
    con.close()


def test_jaccard_sweep_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import dedup as dd

    assert_frames_match(
        dd.jaccard_threshold_sweep(spark, SF_DIR),
        duck.execute(dd.JACCARD_SWEEP_ORACLE),
        ctx="jaccard_threshold_sweep",
    )


def test_jaccard_sweep_is_integer_exact_vs_pair_op(spark):
    """Cross-operator identity: the sweep's 0.5 row must count at
    least the pairs the registered 0.8-gated pair op reports (its
    gate is stricter), the bands must be monotone non-increasing —
    and at every threshold the integer decision must agree with a
    pure-Python exact-fraction check over the pair op's candidates."""
    from fractions import Fraction

    from mapreduceece563_spark.operators import dedup as dd

    got = {
        r["threshold_ppm"]: r
        for r in dd.jaccard_threshold_sweep(spark, SF_DIR).collect()
    }
    ns = [got[t]["n_pairs"] for t in dd.JACCARD_SWEEP_PPM]
    assert ns == sorted(ns, reverse=True)
    docs = [got[t]["n_docs_affected"] for t in dd.JACCARD_SWEEP_PPM]
    assert docs == sorted(docs, reverse=True)

    gated = dd.ngram_jaccard_pairs(spark, SF_DIR).collect()
    # every 0.8-gated pair must be counted by the 0.7 and 0.5 bands
    assert got[700_000]["n_pairs"] >= len(gated)
    assert got[500_000]["n_pairs"] >= len(gated)
    # and pairs the gate reports at >= 0.9 (rounded double) must be
    # within the integer 0.9 band's count
    n_90 = sum(1 for r in gated if Fraction(str(r["jaccard"])) >= Fraction(9, 10))
    assert got[900_000]["n_pairs"] >= n_90


def test_jaccard_sweep_planted_bands(spark, tmp_path):
    """Planted pairs at known exact Jaccard levels: identical docs
    (j=1) land in every band; a pair built to j=0.6 lands in the 0.5
    band only."""
    from mapreduceece563_spark.operators import dedup as dd

    # doc pair A: identical 20-shingle docs -> jaccard exactly 1
    base = " ".join(f"w{chr(97+i)}x" for i in range(22))
    # doc pair B: shingle sets overlapping at exactly 12/20 = 0.6:
    # shared 18-word prefix (16 shared shingles of 20) gives 16/24 =
    # 0.666 -> engineer simpler: use the band MEMBERSHIP property
    # rather than an exact value — shared prefix, distinct suffixes
    words = [f"q{chr(97+i)}z" for i in range(16)]
    b1 = " ".join(words + ["alpha", "beta", "gamma", "delta"])
    b2 = " ".join(words + ["epsln", "zeta", "eta", "theta"])
    rows = [
        (0, base, "en", "s", len(base)),
        (1, base, "en", "s", len(base)),
        (2, b1, "en", "s", len(b1)),
        (3, b2, "en", "s", len(b2)),
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        r["threshold_ppm"]: r
        for r in dd.jaccard_threshold_sweep(spark, str(tmp_path)).collect()
    }
    # the identical pair is in every band; the prefix pair
    # (14 shared shingles of 18+18 -> j = 14/22 = 0.636) only in 0.5
    assert got[900_000]["n_pairs"] == 1
    assert got[700_000]["n_pairs"] == 1
    assert got[500_000]["n_pairs"] == 2
    assert got[500_000]["n_docs_affected"] == 4


def test_df_cap_sensitivity_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import dedup as dd

    assert_frames_match(
        dd.df_cap_sensitivity(spark, SF_DIR),
        duck.execute(dd.DF_CAP_SENSITIVITY_ORACLE),
        ctx="df_cap_sensitivity",
    )


def test_df_cap_sensitivity_python_model(spark):
    """Closed-form sweep replayed from the collected df histogram —
    and the candidate-pair identity itself: sum(df*(df-1)/2) over
    kept shingles."""
    from collections import Counter

    from mapreduceece563_spark.operators import dedup as dd
    from mapreduceece563_spark.sources.catalog import load_table

    import math

    sh = dd.doc_shingle_hashes(spark, SF_DIR).collect()
    df = Counter(r["h0"] for r in sh)
    n_docs = load_table(spark, SF_DIR, "documents").count()
    cap = max(dd.DF_CAP_MIN, math.floor(dd.DF_CAP_K * math.sqrt(n_docs)))
    got = {
        r["cap_pct"]: r for r in dd.df_cap_sensitivity(spark, SF_DIR).collect()
    }
    for pct in dd.DF_CAP_SWEEP_PCT:
        kept = [c for c in df.values() if c * 100 <= cap * pct]
        g = got[pct]
        assert g["cap_value"] == cap * pct // 100
        assert g["n_shingles_kept"] == len(kept)
        assert g["n_postings_kept"] == sum(kept)
        assert g["n_candidate_pairs"] == sum(
            c * (c - 1) // 2 for c in kept
        )


def test_df_cap_sensitivity_binds_on_planted_boilerplate(spark, tmp_path):
    """A shingle planted in 120 of 120 docs (df 120 > cap 100): the
    100% cap EXCLUDES it — its C(120,2) = 7140 pairs appear only in
    the 200% band, which is exactly the quadratic blowup the cap
    exists to fence off."""
    from mapreduceece563_spark.operators import dedup as dd

    rows = []
    for i in range(120):
        # shared trigram 'common shared boiler' + a unique tail
        tail = " ".join(
            chr(97 + (i * 7 + k) % 26) * 3 for k in range(3)
        )
        rows.append(
            (i, f"common shared boiler {tail}", "en", "s", 40)
        )
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        r["cap_pct"]: r
        for r in dd.df_cap_sensitivity(spark, str(tmp_path)).collect()
    }
    # cap = max(100, floor(8*sqrt(120))) = 100
    assert got[100]["cap_value"] == 100
    boiler_pairs = 120 * 119 // 2
    assert got[200]["n_candidate_pairs"] \
        >= got[100]["n_candidate_pairs"] + boiler_pairs
    assert got[50]["n_candidate_pairs"] <= got[100]["n_candidate_pairs"]
