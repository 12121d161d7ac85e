"""Event sessionization: gap-based session assignment with window
functions — lag to detect gaps, cumulative sum to number sessions.

One shuffle on user_id; within a partition everything is a sorted
window pass. Gap arithmetic uses integer microseconds end-to-end
(never float seconds) so Spark and the oracle agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions: a new session starts when the gap from the
    previous event exceeds 30 minutes. Returns one row per session
    with exact-cents value totals."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    order_w = Window.partitionBy("user_id").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    us = F.unix_micros(F.col("ts"))
    prev_us = F.lag(us).over(order_w)
    is_new = F.when(
        prev_us.isNull() | ((us - prev_us) > SESSION_GAP_US), 1
    ).otherwise(0)
    with_sess = ev.withColumn(
        "session_id",
        F.sum(is_new).over(
            order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("_vc"),
        )
        .select(
            "user_id", "session_id", "n_events", "session_start",
            "session_end", (F.col("_vc") / 100.0).alias("value_sum"),
        )
    )


SESSIONIZE_SQL = f"""
WITH ordered AS (
  SELECT event_id, user_id, ts, value,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY ts ASC, event_id ASC) AS prev_us,
         epoch_us(ts) AS us
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > {SESSION_GAP_US}
                 THEN 1 ELSE 0 END AS is_new
  FROM ordered
),
sess AS (
  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id
                              ORDER BY ts ASC, event_id ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end,
       sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0 AS value_sum
FROM sess GROUP BY user_id, session_id
"""


def session_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same sessionization expressed with Spark's NATIVE session
    window (`F.session_window`): sessions merge while the gap is
    strictly under 30 minutes; the window end is last-event-ts + gap.

    Checking this against the hand-rolled lag/cumsum oracle pins the
    boundary semantics of the built-in operator (a gap of exactly 30
    minutes starts a NEW session). In Structured Streaming the
    identical expression runs incrementally with watermark-bounded
    state — one definition serves batch and stream."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


SESSION_WINDOW_SQL = f"""
WITH ordered AS (
  SELECT user_id, ts,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts ASC)
           AS prev_us,
         epoch_us(ts) AS us
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us >= {SESSION_GAP_US}
                 THEN 1 ELSE 0 END AS is_new
  FROM ordered
),
sess AS (
  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS sid
  FROM flagged
)
SELECT user_id, min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events
FROM sess GROUP BY user_id, sid
"""


def user_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap statistics, fully native: `lag` over
    a user-ordered window to form the gap column, then one grouped
    aggregate with `percentile(gap, 0.5)` for the exact median
    (linear interpolation over int64 microseconds — midpoints are
    x.0 or x.5, exactly representable, so Spark's `percentile` and
    DuckDB's `median` cannot disagree; the contract proven in
    events_value_outliers / price_percentiles).

    100 TB posture: one shuffle on user_id, a sorted window pass, a
    partial+final aggregate. No whole-group materialization — the
    round-3 Arrow grouped-map version (kept as
    `user_gap_stats_arrow`, pinned by tests/test_arrow_paths.py)
    required a whale user's entire event history to fit one task's
    memory; this plan never does."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    w = Window.partitionBy("user_id").orderBy(F.asc("us"))
    staged = ev.select("user_id", F.unix_micros("ts").alias("us"))
    gaps = staged.withColumn("gap", F.col("us") - F.lag("us").over(w))
    return gaps.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.expr("CAST(percentile(gap, 0.5) AS DOUBLE)").alias("median_gap_us"),
        F.max("gap").alias("max_gap_us"),
    )


def user_gap_stats_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInPandas`` variant of `user_gap_stats` —
    NOT registered (same answer, Arrow path). Exists to pin the
    applyInPandas harness: grouping key handling, Arrow batch shape,
    output schema contract. The registered entry uses the native
    window plan above; at 100 TB a whole-group grouped-map on a
    whale user would OOM a task, so this is a harness test, not a
    query path."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")

    def _stats(pdf: pd.DataFrame) -> pd.DataFrame:
        us = np.sort(pdf["ts"].astype("int64").to_numpy())
        gaps = np.diff(us)
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [len(us)],
                "median_gap_us": [
                    float(np.median(gaps)) if len(gaps) else None
                ],
                "max_gap_us": [int(gaps.max()) if len(gaps) else None],
            }
        )

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("median_gap_us", T.DoubleType()),
            T.StructField("max_gap_us", T.LongType()),
        ]
    )
    staged = ev.select("user_id", F.unix_micros("ts").alias("ts"))
    return staged.groupBy("user_id").applyInPandas(_stats, schema=schema)


USER_GAP_STATS_SQL = """
WITH gaps AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts)) AS gap
  FROM events
)
SELECT user_id, count(*) AS n_events,
       CAST(median(gap) AS DOUBLE) AS median_gap_us,
       max(gap) AS max_gap_us
FROM gaps GROUP BY user_id
"""


TRIGRAM_TOP_K = 20


def session_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 event-type trigrams that occur INSIDE a session (the
    3-step paths users actually walk) — the path-analysis feed for a
    UX or recommendation team.

    Session assignment is the same 30-minute-gap lag/cumsum machine
    as `sessionize`; the trigram pass is two ``lead`` calls over the
    SAME (user_id, ts, event_id) sort order, so Catalyst runs all
    three window functions in one exchange + one sort — event rows
    are touched exactly once after the shuffle. Trigrams never cross
    a session boundary (the leads are partitioned by session). The
    aggregate is |types|^3-bounded; top-k is TakeOrderedAndProject
    with a lexical tiebreak."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    order_w = Window.partitionBy("user_id").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    us = F.unix_micros(F.col("ts"))
    prev_us = F.lag(us).over(order_w)
    is_new = F.when(
        prev_us.isNull() | ((us - prev_us) > SESSION_GAP_US), 1
    ).otherwise(0)
    with_sess = ev.withColumn(
        "session_id",
        F.sum(is_new).over(
            order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    sw = Window.partitionBy("user_id", "session_id").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    tri = (
        with_sess.select(
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(sw).alias("e2"),
            F.lead("event_type", 2).over(sw).alias("e3"),
        )
        .filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
        .select(
            F.concat_ws(">", "e1", "e2", "e3").alias("trigram")
        )
    )
    return (
        tri.groupBy("trigram")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("trigram"))
        .limit(TRIGRAM_TOP_K)
    )


SESSION_TRIGRAMS_SQL = f"""
WITH ordered AS (
  SELECT event_id, user_id, ts, event_type,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY ts ASC, event_id ASC) AS prev_us,
         epoch_us(ts) AS us
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > {SESSION_GAP_US}
                 THEN 1 ELSE 0 END AS is_new
  FROM ordered
),
sess AS (
  SELECT *, sum(is_new) OVER (PARTITION BY user_id
                              ORDER BY ts ASC, event_id ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS session_id
  FROM flagged
),
tri AS (
  SELECT event_type AS e1,
         lead(event_type, 1) OVER (PARTITION BY user_id, session_id
                                   ORDER BY ts ASC, event_id ASC) AS e2,
         lead(event_type, 2) OVER (PARTITION BY user_id, session_id
                                   ORDER BY ts ASC, event_id ASC) AS e3
  FROM sess
)
SELECT e1 || '>' || e2 || '>' || e3 AS trigram,
       count(*) AS n_occurrences
FROM tri WHERE e2 IS NOT NULL AND e3 IS NOT NULL
GROUP BY 1
ORDER BY n_occurrences DESC, trigram ASC
LIMIT {TRIGRAM_TOP_K}
"""
