"""Skew-aware aggregation: the two-phase (salted) rewrite.

``event_type`` has ~5 values over the whole corpus — the canonical
skewed key. A plain ``count(DISTINCT user_id)`` per type funnels
every row for a type through one reducer. The rewrite aggregates on
the COMPOSITE key (event_type, user_id) first — high cardinality, so
the exchange spreads across all partitions and map-side partial
aggregation still combines — then re-aggregates the small
intermediate on the skewed key alone. Same result, no hot partition.

Here the natural second key (user_id) plays the salt role; for a
pure SUM over a skewed key with no natural sub-key you'd salt with
``pmod(hash(id), N)`` — the plan shape is identical. Spark's AQE
skew-join handling covers joins, but skewed *aggregation on
distinct* needs this rewrite at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table


def events_type_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: row count, distinct users, exact value sum —
    computed through the two-phase skew-safe plan."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", "value"
    )
    phase1 = ev.groupBy("event_type", "user_id").agg(
        F.count("*").alias("_n"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("_vc"),
    )
    return (
        phase1.groupBy("event_type")
        .agg(
            F.sum("_n").alias("n_events"),
            F.count("*").alias("n_distinct_users"),
            F.sum("_vc").alias("_vc2"),
        )
        .select(
            "event_type",
            "n_events",
            "n_distinct_users",
            (F.col("_vc2") / 100.0).alias("value_sum"),
        )
    )


EVENTS_TYPE_PROFILE_SQL = """
SELECT event_type, count(*) AS n_events,
       count(DISTINCT user_id) AS n_distinct_users,
       sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0 AS value_sum
FROM events GROUP BY event_type
"""


APPROX_TOL = 0.10


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact vs sketched distinct counts per event_type.

    At 100 TB the exact count(DISTINCT) is the expensive path (full
    shuffle of the composite key); approx_count_distinct is one pass
    with fixed-size HLL sketches that merge map-side. The engines'
    sketch internals differ, so the oracle-checked columns are the
    exact count plus a BOOLEAN 'sketch landed within 10%' — pinning
    that the approximate path is wired and sane in both engines."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    agg = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact"),
        F.approx_count_distinct("user_id").alias("_n_approx"),
    )
    ok = (
        F.abs(F.col("_n_approx") - F.col("n_exact"))
        <= F.col("n_exact") * APPROX_TOL
    )
    return agg.select("event_type", "n_exact", ok.alias("approx_within_tol"))


APPROX_DISTINCT_SQL = f"""
SELECT event_type,
       count(DISTINCT user_id) AS n_exact,
       abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
         <= count(DISTINCT user_id) * {APPROX_TOL} AS approx_within_tol
FROM events GROUP BY event_type
"""
