"""Plan/shape pins for the sequence-mining, state-compaction, ER, and
LM-surprisal operators. Value parity vs DuckDB is covered registry-wide
by test_registry_oracle; here we pin the SCALE properties:

- user_latest_state must be a partial-aggregable max(struct), not a
  window: 2 HashAggregates around one exchange, no Window node;
- the histogram's min/max side must be broadcast (no shuffle of the
  scan for a 1-row stat);
- the ER join must be an equi-join on the blocking key (no cartesian);
- transition-matrix probabilities must sum to 1 per source type.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mapreduceece563_spark import registry
from mapreduceece563_spark.plans import plan_string
from tests.conftest import SF_DIR

Q = registry.queries()


def test_latest_state_is_partial_agg_not_window(spark):
    plan = plan_string(Q["user_latest_state"](spark, SF_DIR), "simple")
    assert "Window" not in plan
    assert plan.count("HashAggregate") == 2 or "SortAggregate" in plan


def test_latest_state_matches_window_formulation(spark):
    """The aggregate formulation must agree with the obvious window
    one (same engine, so this isolates the max(struct) trick itself)."""
    from pyspark.sql import Window
    from mapreduceece563_spark.sources.catalog import load_table

    got = {
        (r["user_id"], r["last_ts"], r["last_event_type"])
        for r in Q["user_latest_state"](spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    want = {
        (r["user_id"], r["ts"], r["event_type"])
        for r in ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    assert got == want


def test_histogram_broadcasts_stats_and_covers_all_rows(spark):
    df = Q["events_value_histogram"](spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    rows = df.collect()
    assert all(0 <= r["bin"] <= 19 for r in rows)
    n_total = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert sum(r["n"] for r in rows) == n_total


def test_part_name_match_stats_blocked_and_consistent(spark):
    df = Q["part_name_match_stats"](spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert "CartesianProduct" not in plan
    rows = df.collect()
    assert rows
    n_parts_total = sum(r["n_parts"] for r in rows)
    assert n_parts_total == spark.read.parquet(
        f"{SF_DIR}/part.parquet"
    ).count()
    for r in rows:
        assert r["n_names"] <= r["n_parts"]
        # weighted part-pairs can't be fewer than the name pairs found
        assert r["near_part_pairs"] >= r["near_name_pairs"]


def test_transition_probabilities_sum_to_one(spark):
    rows = Q["event_transition_matrix"](spark, SF_DIR).collect()
    by_src: dict[str, float] = {}
    for r in rows:
        by_src[r["from_type"]] = by_src.get(r["from_type"], 0.0) + r["p"]
    assert by_src, "no transitions found"
    for src, total in by_src.items():
        assert math.isclose(total, 1.0, abs_tol=1e-4), (src, total)


def test_lm_surprisal_is_positive_and_bounded(spark):
    rows = Q["doc_lm_surprisal"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_bigrams"] >= 1
        # -ln(p) with p in (0, 1]; ln of the rarest possible bigram is
        # bounded by ln(total corpus bigrams).
        assert 0.0 <= r["avg_surprisal"] < 30.0


def test_events_profile_single_pass_expand(spark):
    """All five exact count-distincts must plan as ONE scan with an
    Expand (multi-distinct rewrite), not five separate scans."""
    plan = plan_string(Q["events_profile"](spark, SF_DIR), "simple")
    assert plan.count("Scan parquet") == 1, plan
    assert "Expand" in plan


def test_fk_audit_uses_anti_joins(spark):
    plan = plan_string(Q["fk_integrity_audit"](spark, SF_DIR), "simple")
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    rows = {r["fk_edge"]: r for r in Q["fk_integrity_audit"](spark, SF_DIR).collect()}
    assert set(rows) == {
        "orders->customer", "lineitem->orders", "customer->nation"
    }
    # the generated star schema has no dangling keys
    assert all(r["n_orphans"] == 0 for r in rows.values())


def test_table_checksum_is_order_independent(spark):
    """Same data through a different partitioning must give the same
    XOR signature."""
    from mapreduceece563_spark.operators import mining as mn

    base = {
        (r["source"], r["n_rows"], r["xor_sig"])
        for r in Q["table_checksum"](spark, SF_DIR).collect()
    }
    # identical signature from a completely different input layout
    again = {
        (r["source"], r["n_rows"], r["xor_sig"])
        for r in mn._xor_rollup(
            mn._row_hashes(spark, SF_DIR).repartition(7)
        ).collect()
    }
    assert base == again


def test_holdout_exactly_k_per_source(spark):
    from mapreduceece563_spark.operators.textstats import HOLDOUT_K

    rows = Q["per_source_holdout"](spark, SF_DIR).collect()
    per_src: dict[str, int] = {}
    for r in rows:
        per_src[r["source"]] = per_src.get(r["source"], 0) + 1
    n_docs_per_src = {
        r["source"]: r["n"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .groupBy("source")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    for src, n in per_src.items():
        assert n == min(HOLDOUT_K, n_docs_per_src[src])


def test_triangle_count_on_known_graph(spark):
    """Complete graph K_n has C(n,3) triangles — the fixture's tiny
    vocabulary makes the co-occurrence graph complete, which pins the
    orientation+wedge+closure arithmetic exactly."""
    import math

    r = Q["triangle_count"](spark, SF_DIR).collect()[0]
    n, m = r["n_nodes"], r["n_edges"]
    if m == n * (n - 1) // 2:  # complete graph at this SF
        assert r["n_triangles"] == math.comb(n, 3)
    else:
        assert 0 <= r["n_triangles"] <= math.comb(n, 3)
