"""Storage-layout operators: the layout changes the PLAN, never the
ANSWER. Oracle parity is covered registry-wide; here we pin the plan
shapes that are the whole point of the layout:

- bucketed join: sort-merge join with the ONLY exchange being the
  final (tiny) groupBy — neither join side shuffles at read time;
- partition pruning: the event_type predicate appears in
  PartitionFilters (directory-level pruning), not PushedFilters
  (row-group-level), and non-matching partitions are never scanned.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduceece563_spark import registry
from mapreduceece563_spark.operators import storage as stg
from mapreduceece563_spark.plans import plan_string
from tests.conftest import SF_DIR

Q = registry.queries()


def test_bucketed_join_has_no_read_side_exchange(spark):
    df = Q["bucketed_join_revenue"](spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert "SortMergeJoin" in plan
    # one exchange total: the final groupBy. The join itself consumes
    # the bucketed distribution directly.
    assert plan.count("Exchange hashpartitioning") == 1


def test_bucketed_layout_written_once_per_session(spark):
    t1 = stg._bucketed_tables(spark, SF_DIR)
    t2 = stg._bucketed_tables(spark, SF_DIR)
    assert t1 == t2
    assert spark.catalog.tableExists(t1[0])
    assert spark.catalog.tableExists(t1[1])


def test_partition_pruning_reaches_the_scan(spark):
    df = Q["partition_pruned_purchases"](spark, SF_DIR)
    plan = plan_string(df, "formatted")
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "purchase" in pf[0], plan


def test_partitioned_layout_only_purchase_rows(spark):
    """The pruned read must agree with a raw filtered read."""
    path = stg._partitioned_events(spark, SF_DIR)
    pruned = spark.read.parquet(path).filter(
        F.col("event_type") == "purchase"
    )
    raw = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_raw = raw.filter(F.col("event_type") == "purchase").count()
    assert pruned.count() == n_raw
