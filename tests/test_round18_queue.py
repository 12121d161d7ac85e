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
    con.close()
