"""Corpus-hygiene operators: semantics fixtures + plan pins.

Oracle parity for every entry is covered registry-wide by
tests/test_registry_oracle.py; here we pin the semantics that the
synthetic fixture can't distinguish and the plan shapes that matter
at 100 TB (broadcast anti-join, shared shingle stage, no corpus-side
shuffle in the sampler)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduceece563_spark import registry
from mapreduceece563_spark.operators import corpus as cp
from mapreduceece563_spark.plans import plan_string
from tests.conftest import SF_DIR

Q = registry.queries()


def test_blocklist_anti_join_is_broadcast(spark):
    plan = plan_string(Q["source_blocklist_survivors"](spark, SF_DIR), "simple")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # the corpus side must not shuffle for the join itself: one
    # exchange total (the final groupBy), none feeding the join
    assert plan.count("Exchange hashpartitioning") == 1


def test_blocklist_sources_absent(spark):
    rows = Q["source_blocklist_survivors"](spark, SF_DIR).collect()
    sources = {r["source"] for r in rows}
    assert sources.isdisjoint(set(cp.BLOCKLIST))
    assert sources, "anti-join must not drop everything"


def test_boilerplate_reuses_shared_shingle_stage(spark):
    """Both boilerplate queries must start from the persisted shingle
    stage shared with the dedup family (InMemoryTableScan in-plan)."""
    for name in ("boilerplate_ngrams", "boilerplate_fraction"):
        plan = plan_string(Q[name](spark, SF_DIR), "simple")
        assert "InMemoryTableScan" in plan, name


def test_boilerplate_fraction_bounds(spark):
    rows = Q["boilerplate_fraction"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_boiler"] <= r["n_shingles"]
        assert 0.0 <= r["boiler_frac"] <= 1.0


def test_stratified_sample_balances_strata(spark):
    """Each stratum's sampled count lands near the min stratum count
    (hash-bucket admission is binomial around the keep-rate)."""
    docs = (
        Q["stratified_sample"](spark, SF_DIR)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert len(docs) >= 2
    counts = [r["n"] for r in docs]
    mn, mx = min(counts), max(counts)
    assert mx <= 3 * mn, f"strata badly unbalanced after sampling: {counts}"


def test_stratified_sample_is_deterministic(spark):
    a = {r["doc_id"] for r in Q["stratified_sample"](spark, SF_DIR).collect()}
    b = {r["doc_id"] for r in Q["stratified_sample"](spark, SF_DIR).collect()}
    assert a == b and a


def test_char_class_ratios_sum_sane(spark):
    rows = Q["char_class_stats"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["alpha_ratio"] <= 1.0
        assert 0.0 <= r["space_ratio"] <= 1.0
        # fixture text is words + single spaces: classes are exhaustive
        assert abs(r["alpha_ratio"] + r["space_ratio"] - 1.0) < 1e-6


def test_kmeans_partitions_all_vectors(spark):
    """Fixed-iteration k-means: every vector lands in exactly one of
    the K clusters; inertia is finite and non-negative."""
    from mapreduceece563_spark.operators.clustering import K
    from mapreduceece563_spark.sources.catalog import load_table

    rows = Q["kmeans_2iter"](spark, SF_DIR).collect()
    assert 1 <= len(rows) <= K
    total = load_table(spark, SF_DIR, "embeddings").count()
    assert sum(r["n_vectors"] for r in rows) == total
    assert all(r["inertia"] >= 0.0 for r in rows)
