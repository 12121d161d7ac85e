"""Round-9 queue: implemented + oracle-tested ahead of registration
(the TWS / round-7-queue / round-8-queue precedent — the debt ceiling
ratcheted to the 4 round-8 registrations and moves down only, so these
wait for the round-9 window).

Each entry gets the same oracle compare the driver will run, plus the
invariants the hash check cannot see.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR, assert_frames_match


def test_quality_quantile_normalize_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import textstats as ts

    sdf = ts.quality_quantile_normalize(spark, SF_DIR)
    assert_frames_match(
        sdf,
        duck.execute(ts.QUALITY_QUANTILE_SQL),
        ctx="quality_quantile_normalize",
    )


def test_quality_quantile_normalize_is_a_cdf(spark):
    """Per source: decile masses cover the source exactly, deciles are
    in range, and the normalization actually spreads mass across the
    scale (>= 5 occupied deciles per source — a degenerate mapping
    that piles everything into one decile would pass the hash check
    against an equally degenerate oracle)."""
    from mapreduceece563_spark.operators import textstats as ts
    from mapreduceece563_spark.sources.catalog import load_table

    out = ts.quality_quantile_normalize(spark, SF_DIR)
    rows = out.collect()
    assert all(0 <= r["decile"] <= 9 for r in rows)
    assert all(0 <= r["mean_quality_ppm"] <= 1_000_000 for r in rows)

    per_source = {}
    occupied = {}
    for r in rows:
        per_source[r["source"]] = per_source.get(r["source"], 0) + r["n_docs"]
        occupied[r["source"]] = occupied.get(r["source"], 0) + 1
    truth = {
        r["source"]: r["n"]
        for r in load_table(spark, SF_DIR, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert per_source == truth
    assert min(occupied.values()) >= 5, occupied

    # mid-rank CDF is monotone: within a source, higher deciles hold
    # higher-or-equal mean raw scores
    by_source: dict = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(
            (r["decile"], r["mean_quality_ppm"])
        )
    for src, ds in by_source.items():
        ds.sort()
        means = [m for _, m in ds]
        assert means == sorted(means), (src, ds)


def test_ivf_incremental_assign_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import similarity as sim

    sdf = sim.ivf_incremental_assign(spark, SF_DIR)
    assert_frames_match(
        sdf,
        duck.execute(sim.IVF_INCREMENTAL_SQL),
        ctx="ivf_incremental_assign",
    )


def test_ivf_incremental_assign_conserves_the_batch(spark):
    """Every arriving vector lands in exactly one cell (sum(n_new) ==
    batch size), resident counts match the old split, and the mean
    ingest cosine stays a valid cosine in ppm."""
    from mapreduceece563_spark.operators import similarity as sim
    from mapreduceece563_spark.sources.catalog import load_table

    out = sim.ivf_incremental_assign(spark, SF_DIR).collect()
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "label")
    max_id = emb.agg(F.max("vec_id")).collect()[0][0]
    cut = (max_id + 1) * sim.IVF_INCR_OLD_NUM // 5
    n_new_truth = emb.filter(F.col("vec_id") >= cut).count()
    old_truth = {
        r["label"]: r["n"]
        for r in emb.filter(F.col("vec_id") < cut)
        .groupBy("label")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert sum(r["n_new"] for r in out) == n_new_truth
    for r in out:
        assert r["n_old"] == old_truth[r["cell"]]
        assert -1_000_000 <= r["mean_cos_ppm"] <= 1_000_000
    assert len(out) >= 2, "fixture must exercise several cells"


def test_round9_queue_on_empty_tables(spark, tmp_path):
    """Both queue ops must agree with their oracles on EMPTY tables —
    quality_quantile_normalize folds windows over zero histogram rows;
    ivf_incremental_assign's ingest cutoff (max(vec_id)+1) goes NULL
    over zero rows and must empty BOTH splits identically in both
    engines."""
    import duckdb
    import pyarrow.parquet as pq

    from mapreduceece563_spark.operators import similarity as sim
    from mapreduceece563_spark.operators import textstats as ts
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
        ts.quality_quantile_normalize(spark, str(d)),
        con.execute(ts.QUALITY_QUANTILE_SQL),
        ctx="empty:quality_quantile_normalize",
    )
    assert_frames_match(
        sim.ivf_incremental_assign(spark, str(d)),
        con.execute(sim.IVF_INCREMENTAL_SQL),
        ctx="empty:ivf_incremental_assign",
    )
    con.close()


def test_round9_queue_plans(spark):
    """Physics pins ahead of registration: the CDF normalization must
    never shuffle or window per doc (its windows slide over the
    (source, score) histogram only), and the ingest op must read its
    cached split (one computation for three consumers) with the
    quantizer broadcast."""
    from mapreduceece563_spark.operators import similarity as sim
    from mapreduceece563_spark.operators import textstats as ts
    from mapreduceece563_spark.plans import plan_string

    p1 = plan_string(ts.quality_quantile_normalize(spark, SF_DIR), "simple")
    assert "hashpartitioning(doc_id" not in p1, (
        "per-doc exchange crept into the histogram formulation"
    )
    # invariant pins, not plan-shape counts (round-9 ADVICE: exact
    # node counts break on Spark upgrades without a semantic
    # regression): the CDF needs at least one Window, and every
    # window runs over the (source, score) histogram — never per doc
    assert "Window" in p1
    assert "windowspecdefinition(doc_id" not in p1, (
        "a per-doc window crept into the histogram formulation"
    )

    p2 = plan_string(sim.ivf_incremental_assign(spark, SF_DIR), "simple")
    assert "InMemoryTableScan" in p2, (
        "the split frame must be cached once and served to its three "
        "consumers (centroid build, resident counts, arriving batch) "
        "from InMemoryTableScan"
    )
    assert "BroadcastExchange" in p2  # cutoff scalar / quantizer side
