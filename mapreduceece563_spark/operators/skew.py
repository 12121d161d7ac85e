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
    """Exact distinct users per event_type (the oracle-checked half of
    the approximate-distinct surface).

    The sketch half lives in `approx_distinct_sketch` + a Spark-side
    pytest tolerance assertion: Spark's HLL++ and DuckDB's sketch are
    different algorithms, so cross-engine-comparing any sketch-derived
    column (even a 'within 10%' boolean) only holds while BOTH
    independent sketches land on the same side of the tolerance — a
    fixture or engine-version change could break the hash spuriously
    (ADVICE r1)."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )


APPROX_DISTINCT_SQL = """
SELECT event_type,
       count(DISTINCT user_id) AS n_exact
FROM events GROUP BY event_type
"""


def approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketched distinct users per event_type — the 100 TB path.

    Exact count(DISTINCT) shuffles the full composite key; HLL++
    sketches are fixed-size and merge map-side, one pass. No DuckDB
    oracle (sketch internals are engine-specific); the driver records
    the weaker rows-only check, and tests/test_partitioning.py asserts
    the sketch lands within APPROX_TOL of the exact count."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("n_approx")
    )
