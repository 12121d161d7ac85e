"""Pin the physical-plan properties that matter at scale: predicate
pushdown, column pruning, broadcast joins, top-k without global sort."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduceece563_spark import registry
from mapreduceece563_spark.plans import plan_report, plan_string
from mapreduceece563_spark.sources.catalog import load_table
from tests.conftest import SF_DIR

Q = registry.queries()


def test_q1_filter_pushed_and_columns_pruned(spark):
    rep = plan_report(Q["q1_pricing_summary"](spark, SF_DIR))
    assert rep.pushed_filters, "l_shipdate filter must reach the parquet scan"
    # 7 needed columns, not all 11
    assert set(rep.read_schema_cols) == {
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_shipdate",
    }


def test_q5_dims_broadcast(spark):
    rep = plan_report(Q["q5_region_revenue"](spark, SF_DIR))
    assert rep.n_broadcast_joins >= 3
    assert rep.n_sortmerge_joins == 0


def test_topk_no_global_sort(spark):
    plan = plan_string(Q["topk_words"](spark, SF_DIR), "simple")
    assert "TakeOrderedAndProject" in plan


def test_scan_projection_prunes(spark):
    df = load_table(spark, SF_DIR, "lineitem").select("l_orderkey")
    rep = plan_report(df)
    assert rep.read_schema_cols == ["l_orderkey"]


def test_wordcount_partial_aggregation(spark):
    """The reference's hand-built combiner (map-side partial agg) must
    appear natively: two HashAggregates around one exchange."""
    plan = plan_string(Q["wordcount"](spark, SF_DIR), "simple")
    assert plan.count("HashAggregate") >= 2
    assert "Exchange hashpartitioning(word" in plan
