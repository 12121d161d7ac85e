"""Join-strategy control: Spark must honor per-join hints — the
knob a 100 TB deployment turns when statistics mislead the planner
(a "small" dim that isn't, a broadcast that OOMs, a sort-merge where
co-partitioned shuffle-hash is cheaper)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduceece563_spark.plans import plan_string
from mapreduceece563_spark.sources.catalog import load_table
from tests.conftest import SF_DIR


def _joined(spark, hint: str):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    return li.join(
        orders.hint(hint), li["l_orderkey"] == orders["o_orderkey"]
    ).groupBy("o_orderpriority").agg(F.count("*").alias("n"))


def test_broadcast_hint_forces_broadcast(spark):
    assert "BroadcastHashJoin" in plan_string(
        _joined(spark, "broadcast"), "simple"
    )


def test_merge_hint_forces_sort_merge(spark):
    plan = plan_string(_joined(spark, "merge"), "simple")
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_shuffle_hash_hint_forces_hash_join(spark):
    plan = plan_string(_joined(spark, "shuffle_hash"), "simple")
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan
