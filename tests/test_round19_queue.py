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
    con.close()
