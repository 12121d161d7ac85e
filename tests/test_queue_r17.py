"""Round-17 registration queue, built and oracle-tested in round 10.

The split-leakage audit (exact and near duplicates straddling the
train/test boundary — decontamination turned inward), chunk-level
exact dedup over the RAG manifest, and the conformal interval at
three coverage targets off one calibration pass.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR, assert_frames_match


# --- split_leakage_audit ---------------------------------------------------


def test_split_leakage_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import trainprep as tr

    assert_frames_match(
        tr.split_leakage_audit(spark, SF_DIR),
        duck.execute(tr.SPLIT_LEAKAGE_ORACLE),
        ctx="split_leakage_audit",
    )


def test_split_leakage_python_model(spark):
    """Replay both tiers in Python from the raw split assignment,
    digests, and the banded candidate pairs; the audit must also
    reconcile with train_test_split's test census."""
    from mapreduceece563_spark.operators import dedup as dd
    from mapreduceece563_spark.operators import trainprep as tr
    from mapreduceece563_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", tr._split_col().alias("split")
    ).collect()
    split = {r["doc_id"]: r["split"] for r in docs}
    import hashlib

    digest = {
        r["doc_id"]: hashlib.md5(r["text"].encode()).hexdigest()
        for r in docs
    }
    train_keys = {
        digest[d] for d, s in split.items() if s == "train"
    }
    test_ids = [d for d, s in split.items() if s == "test"]
    exact = sum(1 for d in test_ids if digest[d] in train_keys)
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in dd.dedup_minhash(spark, SF_DIR)
        .select("doc_a", "doc_b")
        .collect()
    ]
    near = {
        (b if split[a] == "train" else a)
        for a, b in pairs
        if {split[a], split[b]} == {"train", "test"}
    }
    r = tr.split_leakage_audit(spark, SF_DIR).collect()[0]
    assert r["n_test_docs"] == len(test_ids)
    assert r["n_exact_leaked"] == exact
    assert r["n_neardup_leaked"] == len(near)
    n = max(len(test_ids), 1)
    assert r["exact_leak_ppm"] == exact * 1_000_000 // n
    assert r["neardup_leak_ppm"] == len(near) * 1_000_000 // n
    census = {
        row["split"]: row["n_docs"]
        for row in tr.train_test_split(spark, SF_DIR).collect()
    }
    assert r["n_test_docs"] == census.get("test", 0)


def test_split_leakage_joins_digests_and_bands_only(spark):
    """Invariant pin: no all-pairs anywhere — the near tier filters
    the banded candidate frame, the exact tier semi-joins digests."""
    from mapreduceece563_spark.operators import trainprep as tr
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(tr.split_leakage_audit(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in p


# --- chunk_dedup_stats -------------------------------------------------


def test_chunk_dedup_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import corpus as cp

    assert_frames_match(
        cp.chunk_dedup_stats(spark, SF_DIR),
        duck.execute(cp.CHUNK_DEDUP_ORACLE),
        ctx="chunk_dedup_stats",
    )


def test_chunk_dedup_python_model(spark):
    """Replay the census from the manifest itself; totals must
    reconcile with the manifest row count and the cross-doc tier is
    a subset of the duplicate tier."""
    from mapreduceece563_spark.operators import corpus as cp

    rows = cp.doc_chunk_manifest(spark, SF_DIR).collect()
    fams: dict = {}
    for r in rows:
        n, docs = fams.get(r["chunk_hash"], (0, set()))
        docs.add(r["doc_id"])
        fams[r["chunk_hash"]] = (n + 1, docs)
    r = cp.chunk_dedup_stats(spark, SF_DIR).collect()[0]
    assert r["n_chunks"] == len(rows)
    assert r["n_distinct_chunks"] == len(fams)
    assert r["n_chunks_in_dup_families"] == sum(
        n for n, _ in fams.values() if n > 1
    )
    assert r["n_cross_doc_hashes"] == sum(
        1 for _, d in fams.values() if len(d) > 1
    )
    assert r["n_chunks_cross_doc"] == sum(
        n for n, d in fams.values() if len(d) > 1
    )
    assert r["n_chunks_cross_doc"] <= r["n_chunks_in_dup_families"]


def test_chunk_dedup_never_shuffles_text(spark):
    """Invariant pin: the only exchange keys on the chunk hash (the
    manifest's map-only contract carried through)."""
    import re

    from mapreduceece563_spark.operators import corpus as cp
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(cp.chunk_dedup_stats(spark, SF_DIR), "simple")
    keys = re.findall(r"Exchange hashpartitioning\(([^,#]*)", p)
    assert keys and all(k == "chunk_hash" for k in keys), keys


# --- conformal_alpha_sweep ----------------------------------------------


def test_conformal_sweep_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import analytics as an

    assert_frames_match(
        an.conformal_alpha_sweep(spark, SF_DIR),
        duck.execute(an.CONFORMAL_SWEEP_ORACLE),
        ctx="conformal_alpha_sweep",
    )


def test_conformal_sweep_physics(spark):
    """Structure the hash can't see: widths are monotone in the
    target, the 90% row equals the registered single-alpha entry,
    and coverage tracks the target within the finite-sample slack
    3/sqrt(n_test) + 1/n_cal (a loose Wilson-style bound — the
    guarantee is in expectation, not per-sample)."""
    import math

    from mapreduceece563_spark.operators import analytics as an

    sweep = {
        (r["event_type"], r["target_ppm"]): r
        for r in an.conformal_alpha_sweep(spark, SF_DIR).collect()
    }
    single = {
        r["event_type"]: r
        for r in an.conformal_event_value_interval(spark, SF_DIR).collect()
    }
    types = {et for et, _ in sweep}
    assert types == set(single)
    for et in types:
        widths = [
            sweep[(et, t)]["q_resid"] for t in an.CONF_TARGETS_PPM
        ]
        assert widths == sorted(widths), et
        r90 = sweep[(et, 900_000)]
        assert r90["q_resid"] == single[et]["q_resid"], et
        assert r90["coverage_ppm"] == single[et]["coverage_ppm"], et
        for t in an.CONF_TARGETS_PPM:
            r = sweep[(et, t)]
            slack = int(
                (3 / math.sqrt(max(r["n_test"], 1)) + 1 / max(r["n_cal"], 1))
                * 1_000_000
            )
            assert r["coverage_ppm"] >= t - slack, (et, t)


# --- empty-table behavior, all three -----------------------------------


def test_queue_r17_on_empty_tables(spark, tmp_path):
    import duckdb
    import pyarrow.parquet as pq

    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.operators import corpus as cp
    from mapreduceece563_spark.operators import trainprep as tr
    from mapreduceece563_spark.sources.catalog import TABLES

    d = tmp_path / "empty_sf"
    d.mkdir()
    for t in TABLES:
        schema = pq.read_schema(f"{SF_DIR}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")

    for name, fn, sql in [
        (
            "split_leakage_audit",
            tr.split_leakage_audit,
            tr.SPLIT_LEAKAGE_ORACLE,
        ),
        ("chunk_dedup_stats", cp.chunk_dedup_stats, cp.CHUNK_DEDUP_ORACLE),
        (
            "conformal_alpha_sweep",
            an.conformal_alpha_sweep,
            an.CONFORMAL_SWEEP_ORACLE,
        ),
    ]:
        assert_frames_match(
            fn(spark, str(d)), con.execute(sql), ctx=f"empty:{name}"
        )
