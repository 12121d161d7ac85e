"""DataFrame.observe — free pipeline metrics without a second pass.

At 100 TB the difference between ``df.count()`` for monitoring and
``observe()`` is an entire extra scan: observed metrics accumulate
inside the one real action. This pins the API contract (metrics
visible after the action, values exact)."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from mapreduceece563_spark.sources.catalog import load_table
from tests.conftest import SF_DIR


def test_observe_metrics_match_direct_aggregates(spark):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_quantity", "l_extendedprice"
    )
    obs = Observation("ingest_stats")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias(
            "price_cents"
        ),
    )
    # one real action; metrics ride along, no second scan
    n_filtered = observed.filter(F.col("l_quantity") > 25).count()

    direct = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias(
            "price_cents"
        ),
        F.sum(F.when(F.col("l_quantity") > 25, 1).otherwise(0)).alias("nf"),
    ).collect()[0]

    got = obs.get
    assert got["n_rows"] == direct["n_rows"]
    assert got["price_cents"] == direct["price_cents"]
    assert n_filtered == direct["nf"]
