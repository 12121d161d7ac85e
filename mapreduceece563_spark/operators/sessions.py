"""Event sessionization: gap-based session assignment with window
functions — lag to detect gaps, cumulative sum to number sessions.

One shuffle on user_id; within a partition everything is a sorted
window pass. Gap arithmetic uses integer microseconds end-to-end
(never float seconds) so Spark and the oracle agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..cachemgr import stage
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


# ----------------------------------------------------------------------
# Round-7 queue (implemented + tested ahead of registration — the
# round-6 freeze left zero slots; see SURVEY.md "Round-7 queue").
# ----------------------------------------------------------------------


def _sessions_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, session_id, s_us, e_us) — interval endpoints in
    integer microseconds, session definition identical to
    sessionize()."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    order_w = Window.partitionBy("user_id").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    us = F.unix_micros(F.col("ts"))
    prev_us = F.lag(us).over(order_w)
    is_new = F.when(
        prev_us.isNull() | ((us - prev_us) > SESSION_GAP_US), 1
    ).otherwise(0)
    with_sess = ev.withColumn("_us", us).withColumn(
        "session_id",
        F.sum(is_new).over(
            order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return with_sess.groupBy("user_id", "session_id").agg(
        F.min("_us").alias("s_us"), F.max("_us").alias("e_us")
    )


def session_concurrency_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day — the sweep-line computed as a
    DISTRIBUTED prefix sum: the classic formulation sorts every
    +1/-1 endpoint into one global running sum (a single-task window
    at any scale), so instead the timeline is partitioned by calendar
    day and each day sweeps independently given its carry-in (the
    sessions already open at midnight).

    carry_in(d) = sessions with s < day_start <= e, counted via a
    broadcast non-equi join against the tiny day dimension (bounded
    by the calendar, not the data). Within a day the running sum over
    (+1 at session start, -1 at session end; starts before ends on a
    tie, a session active on [s, e] inclusive) is a window
    partitioned BY DAY — every partition sweeps in parallel, which is
    the whole point. peak(d) = carry_in + max(0, max prefix sum):
    the max() clamps to the day-start concurrency when the first
    in-day motion is a carry-in session ending. A day fully inside
    one long session has no endpoints at all and still reports
    peak = carry_in (gap rule means such a day always has events, so
    it is in the day dimension). Everything is int64 microseconds and
    counts — no floats to drift cross-engine."""
    # cached: one row per session; feeds the carry-in join AND both
    # endpoint-delta branches — uncached, the sessionize window over
    # events re-ran per reference (10 parquet scans / 18 Exchanges
    # in the r13 plan audit). Guide §5.
    sessions = _sessions_frame(spark, sf_dir).transform(stage)

    days = (
        load_table(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("day"))
        .distinct()
        .withColumn("day_us", F.unix_micros(F.col("day").cast("timestamp")))
    )

    carry = (
        sessions.join(
            F.broadcast(days),
            (F.col("s_us") < F.col("day_us"))
            & (F.col("e_us") >= F.col("day_us")),
        )
        .groupBy("day")
        .agg(F.count("*").alias("carry_in"))
    )

    deltas = (
        sessions.select(
            F.to_date(F.timestamp_micros("s_us")).alias("day"),
            F.col("s_us").alias("us"),
            F.lit(1).alias("delta"),
        )
        .unionAll(
            sessions.select(
                F.to_date(F.timestamp_micros("e_us")).alias("day"),
                F.col("e_us").alias("us"),
                F.lit(-1).alias("delta"),
            )
        )
    )
    sweep_w = (
        Window.partitionBy("day")
        .orderBy(F.asc("us"), F.desc("delta"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    day_stats = (
        deltas.withColumn("_run", F.sum("delta").over(sweep_w))
        .groupBy("day")
        .agg(
            F.max("_run").alias("_max_run"),
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0)).alias(
                "n_starts"
            ),
            F.sum(F.when(F.col("delta") == -1, 1).otherwise(0)).alias(
                "n_ends"
            ),
        )
    )

    return (
        days.select("day")
        .join(carry, "day", "left")
        .join(day_stats, "day", "left")
        .select(
            "day",
            F.coalesce("carry_in", F.lit(0)).alias("carry_in"),
            F.coalesce("n_starts", F.lit(0)).alias("n_starts"),
            F.coalesce("n_ends", F.lit(0)).alias("n_ends"),
            (
                F.coalesce("carry_in", F.lit(0))
                + F.greatest(
                    F.lit(0), F.coalesce("_max_run", F.lit(0))
                )
            ).alias("peak_concurrency"),
        )
    )


SESSION_CONCURRENCY_SQL = f"""
WITH ordered AS (
  SELECT event_id, user_id, ts, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY ts ASC, event_id ASC) AS prev_us
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > {SESSION_GAP_US}
                 THEN 1 ELSE 0 END AS is_new
  FROM ordered
),
numbered AS (
  SELECT *, sum(is_new) OVER (PARTITION BY user_id
                              ORDER BY ts ASC, event_id ASC
                              ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
),
sessions AS (
  SELECT user_id, session_id, min(us) AS s_us, max(us) AS e_us
  FROM numbered GROUP BY 1, 2
),
days AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day,
         epoch_us(CAST(CAST(ts AS DATE) AS TIMESTAMP)) AS day_us
  FROM events
),
carry AS (
  SELECT d.day, count(*) AS carry_in
  FROM sessions s JOIN days d
    ON s.s_us < d.day_us AND s.e_us >= d.day_us
  GROUP BY 1
),
deltas AS (
  SELECT CAST(make_timestamp(s_us) AS DATE) AS day,
         s_us AS us, 1 AS delta FROM sessions
  UNION ALL
  SELECT CAST(make_timestamp(e_us) AS DATE) AS day,
         e_us AS us, -1 AS delta FROM sessions
),
swept AS (
  SELECT day, delta,
         sum(delta) OVER (PARTITION BY day
                          ORDER BY us ASC, delta DESC
                          ROWS UNBOUNDED PRECEDING) AS run
  FROM deltas
),
day_stats AS (
  SELECT day, max(run) AS max_run,
         CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_starts,
         CAST(sum(CASE WHEN delta = -1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_ends
  FROM swept GROUP BY 1
)
SELECT d.day,
       CAST(coalesce(c.carry_in, 0) AS BIGINT) AS carry_in,
       coalesce(s.n_starts, 0) AS n_starts,
       coalesce(s.n_ends, 0) AS n_ends,
       CAST(coalesce(c.carry_in, 0)
            + greatest(0, coalesce(s.max_run, 0)) AS BIGINT)
         AS peak_concurrency
FROM days d
LEFT JOIN carry c ON c.day = d.day
LEFT JOIN day_stats s ON s.day = d.day
"""


# --- session gap-threshold sensitivity (round-19 queue) ------------------

GAP_SWEEP_MINUTES = (15, 30, 60)


def session_gap_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many sessions does each gap threshold produce — the
    parameter-tuning loop for sessionize's hardcoded 30 minutes (the
    lsh_precision/recall discipline applied to sessionization): a
    plateau across thresholds means the choice is safe; a steep slope
    means session-level metrics are an artifact of the cutoff.

    Closed-form from the GAP MULTISET, one pass: per user the lag()
    gaps (the user_gap_stats window), then for every threshold T,
    n_sessions(T) = n_users + |{gaps > T}| — each over-threshold gap
    starts one extra session. The sweep never re-sessionizes: the
    three thresholds are three conditional counts over the same gap
    frame (exact integers), plus mean events/session in half-up
    milli. Also pins the 30-minute row's session count EQUAL to what
    sessionize actually produces (the oracle hash makes the
    cross-operator identity a driver-checked invariant).

    Scale posture (100 TB): one lag() window per user sequence and
    one global conditional aggregate — adding a threshold adds a
    column, not a pass.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    order_w = Window.partitionBy("user_id").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    us = F.unix_micros(F.col("ts"))
    gaps = ev.select(
        "user_id", (us - F.lag(us).over(order_w)).alias("_gap")
    )
    totals = gaps.agg(
        F.count(F.lit(1)).alias("_n_events"),
        F.countDistinct("user_id").alias("_n_users"),
        *[
            F.coalesce(
                F.sum((F.col("_gap") > m * 60 * 1_000_000).cast("long")),
                F.lit(0).cast("long"),
            ).alias(f"_x{m}")
            for m in GAP_SWEEP_MINUTES
        ],
    )
    rows = [
        totals.select(
            F.lit(m).cast("long").alias("gap_minutes"),
            (F.col("_n_users") + F.col(f"_x{m}")).alias("n_sessions"),
            F.expr(
                f"CASE WHEN _n_users + _x{m} > 0 THEN"
                f" (2000 * _n_events + (_n_users + _x{m}))"
                f" div (2 * (_n_users + _x{m})) END"
            ).alias("mean_events_milli"),
        )
        for m in GAP_SWEEP_MINUTES
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


_GAP_SWEEP_VALUES = ", ".join(
    f"({m}, {m * 60 * 1_000_000})" for m in GAP_SWEEP_MINUTES
)

SESSION_GAP_SENSITIVITY_SQL = f"""
WITH gaps AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS _gap
  FROM events
),
totals AS (
  SELECT CAST(count(*) AS BIGINT) AS _n_events,
         CAST(count(DISTINCT user_id) AS BIGINT) AS _n_users
  FROM gaps
),
sweep AS (SELECT * FROM (VALUES {_GAP_SWEEP_VALUES})
           AS s(gap_minutes, gap_us)),
counted AS (
  SELECT s.gap_minutes,
         (SELECT CAST(count(*) AS BIGINT) FROM gaps g
          WHERE g._gap > s.gap_us) AS _x
  FROM sweep s
)
SELECT CAST(c.gap_minutes AS BIGINT) AS gap_minutes,
       CAST(t._n_users + c._x AS BIGINT) AS n_sessions,
       CAST((2000 * t._n_events + (t._n_users + c._x))
            // (2 * (t._n_users + c._x)) AS BIGINT) AS mean_events_milli
FROM counted c, totals t
"""
