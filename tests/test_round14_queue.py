"""Round-14 queue: implemented + oracle-tested ahead of registration
(rounds 10-13 are spoken for by their own four-entry queues).

vacuum_orphan_scan completes the lakehouse-upkeep tier: compaction
plans the rewrite, MERGE applies it, time travel reads old versions,
zone maps prune, Merkle syncs replicas — VACUUM counts what the
rewrite stranded, from the REAL directory state."""

from __future__ import annotations

from tests.conftest import SF_DIR, assert_frames_match


def test_vacuum_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import storage as st

    assert_frames_match(
        st.vacuum_orphan_scan(spark, SF_DIR),
        duck.execute(st.VACUUM_ORPHAN_SQL),
        ctx="vacuum_orphan_scan",
    )


def test_vacuum_accounting_model(spark):
    """The orphan generation must be exactly the small-files base
    (one file per occupied 64-bucket residue, rows = pre-cutoff
    orders) and the live generation exactly the compacted rewrite —
    recomputed from the orders table in Python, plus the real-files
    invariant that listing = live + orphans with no overlap."""
    import datetime

    from mapreduceece563_spark.operators import storage as st
    from mapreduceece563_spark.sources.catalog import load_table

    cutoff = datetime.datetime.fromisoformat(st.MERGE_CUTOFF)
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderdate"
    ).collect()
    base = [r["o_orderkey"] for r in orders if r["o_orderdate"] < cutoff]
    ins = [r["o_orderkey"] for r in orders if r["o_orderdate"] >= cutoff]
    merged = [k for k in base if k % 13 != 0] + ins
    g = st.vacuum_orphan_scan(spark, SF_DIR).collect()[0]
    assert g["n_orphan_files"] == len(
        {k % st.MERGE_SMALL_BUCKETS for k in base}
    )
    assert g["n_live_files"] == len(
        {k % st.MERGE_COMPACT_BUCKETS for k in merged}
    )
    assert g["n_orphan_rows"] == len(base)
    assert g["n_live_rows"] == len(merged)
    assert g["n_files_listed"] == g["n_live_files"] + g["n_orphan_files"]


def test_vacuum_manifest_is_persisted_and_task_uuid_named(spark):
    """The manifest is REAL persisted parquet naming the compacted
    generation's actual task-UUID files — every name must re-resolve
    against the directory on disk."""
    import os

    from mapreduceece563_spark.operators import storage as st

    _, final_dir, _, _ = st._merge_tables(spark, SF_DIR)
    mdir = st._vacuum_manifest_dir(spark, SF_DIR)
    names = [
        r["file_name"] for r in spark.read.parquet(mdir).collect()
    ]
    assert names and all("/" in n and n.endswith(".parquet") for n in names)
    for n in names:
        assert os.path.isfile(os.path.join(final_dir, n)), n


def test_vacuum_plan_reads_zero_data_columns(spark):
    """The listing scans must project ONLY the _metadata.file_path
    hidden column (ReadSchema: struct<> — no data columns), and the
    manifest join must broadcast."""
    from mapreduceece563_spark.operators import storage as st
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(st.vacuum_orphan_scan(spark, SF_DIR), "formatted")
    assert "ReadSchema: struct<>" in p
    assert "BroadcastHashJoin" in p


def test_round14_queue_on_empty_tables(spark, tmp_path):
    import duckdb
    import pyarrow.parquet as pq

    from mapreduceece563_spark.operators import storage as st
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
        st.vacuum_orphan_scan(spark, str(d)),
        con.execute(st.VACUUM_ORPHAN_SQL),
        ctx="empty:vacuum_orphan_scan",
    )
    con.close()
