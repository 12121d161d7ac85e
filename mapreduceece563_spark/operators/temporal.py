"""Temporal join operators: as-of join, time-range join, band join.

Spark has no ASOF JOIN operator (DuckDB does), so the as-of join is
re-expressed as the classic union-tag plan: union the build side and
the probe side, sort once per key partition, and carry the latest
build row forward with ``last(..., ignorenulls=True)``. That is ONE
shuffle on the join key and a single window pass — at 100 TB this is
the textbook scalable shape (a per-key sort-merge), with no
inequality-join blowup and no per-row subquery.

The time-range join buckets both sides by hour so the join is an
EQUI-join on (user_id, hour_bucket) with the exact range predicate
applied after — candidate pairs are bounded by bucket co-residency
instead of a full per-user cross product. The band join broadcasts
the tiny band table (BroadcastNestedLoopJoin over 4 rows ~ free).

All gap arithmetic is integer microseconds end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table

FOLLOWUP_WINDOW_US = 3_600_000_000  # 1 hour

# (band_name, lo, hi) — o_totalprice in [lo, hi)
PRICE_BANDS = (
    ("budget", 0, 50_000),
    ("mid", 50_000, 150_000),
    ("premium", 150_000, 300_000),
    ("luxury", 300_000, 10_000_000),
)


def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase event, the user's most recent click event
    at-or-before the purchase (an as-of join events->events).

    Union-tag plan: clicks (build) and purchases (probe) are unioned,
    then per user, ordered by (ts, tag) with builds sorting before
    probes at equal ts, each probe picks up the last non-null build
    id seen so far. Purchases with no prior click keep NULLs."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("_tag"),
        F.col("event_id").alias("_build_id"),
        F.lit(None).cast("long").alias("_probe_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("_tag"),
        F.lit(None).cast("long").alias("_build_id"),
        F.col("event_id").alias("_probe_id"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.asc("ts"), F.asc("_tag"), F.asc("_build_id")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged = clicks.unionByName(purchases).select(
        "user_id",
        "ts",
        "_tag",
        "_probe_id",
        F.last("_build_id", ignorenulls=True).over(w).alias("_last_click"),
        F.last(
            F.when(F.col("_tag") == 0, F.unix_micros(F.col("ts"))),
            ignorenulls=True,
        ).over(w).alias("_last_click_us"),
    )
    return merged.filter(F.col("_tag") == 1).select(
        F.col("_probe_id").alias("purchase_id"),
        "user_id",
        F.col("_last_click").alias("last_click_id"),
        (F.unix_micros(F.col("ts")) - F.col("_last_click_us")).alias("gap_us"),
    )


# Oracle uses DuckDB's native ASOF JOIN. (user_id, ts) is unique in
# the events table, so the as-of match is deterministic on both sides.
ASOF_JOIN_SQL = """
SELECT p.event_id AS purchase_id, p.user_id,
       c.event_id AS last_click_id,
       CASE WHEN c.event_id IS NULL THEN NULL
            ELSE epoch_us(p.ts) - epoch_us(c.ts) END AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def purchase_followup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchase event: how many same-user events land in the hour
    right after it (ts, ts + 1h].

    Range join done scalably: both sides get an hour-bucket key; a
    purchase probes its own bucket and the next one, so the join is an
    equi-join on (user_id, bucket) and the exact interval predicate
    only filters bucket-local candidates."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    us = F.unix_micros(F.col("ts"))
    purchases = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            us.alias("p_us"),
        )
        .withColumn(
            "bucket",
            F.explode(
                F.array(
                    F.floor(F.col("p_us") / FOLLOWUP_WINDOW_US),
                    F.floor(F.col("p_us") / FOLLOWUP_WINDOW_US) + 1,
                )
            ),
        )
    )
    cand = ev.select(
        "user_id",
        us.alias("e_us"),
        F.floor(us / FOLLOWUP_WINDOW_US).alias("bucket"),
    )
    hits = (
        purchases.join(cand, ["user_id", "bucket"])
        .filter(
            (F.col("e_us") > F.col("p_us"))
            & (F.col("e_us") <= F.col("p_us") + FOLLOWUP_WINDOW_US)
        )
        .groupBy("purchase_id", "user_id")
        .agg(F.count("*").alias("n_followups"))
    )
    all_p = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), "user_id")
    )
    return all_p.join(hits, ["purchase_id", "user_id"], "left").select(
        "purchase_id",
        "user_id",
        F.coalesce(F.col("n_followups"), F.lit(0)).alias("n_followups"),
    )


FOLLOWUP_SQL = f"""
SELECT p.event_id AS purchase_id, p.user_id,
       count(e.event_id) AS n_followups
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN events e
  ON e.user_id = p.user_id
 AND epoch_us(e.ts) > epoch_us(p.ts)
 AND epoch_us(e.ts) <= epoch_us(p.ts) + {FOLLOWUP_WINDOW_US}
GROUP BY p.event_id, p.user_id
"""


def orders_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classify each order into a price tier and roll up per band —
    the bands are STATIC, PROVABLY-DISJOINT compile-time constants,
    so the scale-right plan is a map-side chained CASE expression
    inside whole-stage codegen: zero join, zero per-row band-table
    predicate sweep, the only exchange is the 4-group aggregate.

    Round-8 fix (VERDICT r7 #3): the previous formulation ran a
    broadcast nested-loop inequality join against the 4-row band
    table — correct, but it evaluates rows x bands predicates and
    materializes a join for what is a pure row-local classification.
    tests/test_plans.py pins the absence of BroadcastNestedLoopJoin
    here. The band-JOIN class (genuinely overlapping bands, where a
    row can land in several bands and an inequality join is the only
    correct plan) is covered by orders_price_band_overlap below.

    The DuckDB oracle deliberately keeps the VALUES-join formulation:
    two independent evaluation strategies, one answer."""
    orders = load_table(spark, sf_dir, "orders").select("o_totalprice")
    case = None
    for name, lo, hi in PRICE_BANDS:
        cond = (F.col("o_totalprice") >= lo) & (F.col("o_totalprice") < hi)
        case = F.when(cond, name) if case is None else case.when(cond, name)
    banded = orders.select(
        case.alias("band_name"), "o_totalprice"
    ).filter(F.col("band_name").isNotNull())
    return (
        banded.groupBy("band_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("_tc"),
        )
        .select("band_name", "n_orders", (F.col("_tc") / 100.0).alias("total_price"))
    )


_BANDS_VALUES = ", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in PRICE_BANDS)

ORDERS_PRICE_BAND_SQL = f"""
SELECT band_name, count(*) AS n_orders,
       sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0 AS total_price
FROM orders
JOIN (VALUES {_BANDS_VALUES}) AS bands(band_name, lo, hi)
  ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band_name
"""


# Overlapping marketing tiers: a row can satisfy several bands, so the
# rollup is a genuine fan-out — no disjoint CASE rewrite exists.
OVERLAP_BANDS = (
    ("entry_reach", 0, 100_000),
    ("core_reach", 50_000, 200_000),
    ("premium_reach", 150_000, 400_000),
    ("whale_reach", 250_000, 10_000_000),
)


def orders_price_band_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band join where the bands OVERLAP (audience-reach tiers): each
    order contributes to every band whose [lo, hi) range contains it,
    so the output is a fan-out and an inequality join is the only
    correct plan — this is the class the disjoint-band CASE rewrite
    (orders_price_band above) cannot express.

    Scale posture (100 TB): the band table is a handful of static
    rows — broadcast nested-loop IS the right physical plan here
    (each row evaluates k tiny range predicates; no shuffle of the
    fact side, and the fan-out is bounded by the band count, <= 4x).
    With thousands of bands you'd interval-bucket both sides into an
    equi-join (the purchase_followup_counts pattern above); for a
    static marketing-tier table that machinery would cost more than
    the predicates it saves. tests/test_plans.py pins the broadcast
    (no fact-side exchange before the join)."""
    orders = load_table(spark, sf_dir, "orders").select("o_totalprice")
    bands = spark.createDataFrame(
        list(OVERLAP_BANDS), "band_name string, lo long, hi long"
    )
    joined = orders.join(
        F.broadcast(bands),
        (F.col("o_totalprice") >= F.col("lo"))
        & (F.col("o_totalprice") < F.col("hi")),
    )
    return (
        joined.groupBy("band_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("long")
            ).alias("_tc"),
        )
        .select(
            "band_name",
            "n_orders",
            (F.col("_tc") / 100.0).alias("total_price"),
        )
    )


_OVERLAP_VALUES = ", ".join(
    f"('{n}', {lo}, {hi})" for n, lo, hi in OVERLAP_BANDS
)

ORDERS_PRICE_BAND_OVERLAP_SQL = f"""
SELECT band_name, count(*) AS n_orders,
       sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0 AS total_price
FROM orders
JOIN (VALUES {_OVERLAP_VALUES}) AS bands(band_name, lo, hi)
  ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band_name
"""


# --- time-series shapes: range-frame rolling window, calendar spine --

def rolling_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type, the trailing-7-day event-value sum for every
    active day — a RANGE window frame (value-based, in days), not a
    ROWS frame, so missing days genuinely shrink the window.

    Scale posture: the window NEVER runs over raw events. Events
    pre-aggregate to (event_type, day) first — the rolling frame then
    slides over a frame that is #types x #days rows no matter how many
    raw events exist, which is the only survivable formulation at
    100 TB (a per-event range window would sort the whole table per
    type). Ordering key is integer epoch-days so both engines bound
    the frame with exact integer arithmetic; revenue is int64 cents."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.round(F.col("value") * 100, 0).cast("long").alias("_c"),
    )
    daily = ev.groupBy("event_type", "day").agg(F.sum("_c").alias("_rev_c"))
    daily = daily.withColumn(
        "_epd", F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("_epd")
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "event_type",
        "day",
        F.round(F.sum("_rev_c").over(w) / 100.0, 4).alias("rev_7d"),
        F.count("*").over(w).alias("n_days_in_window"),
    )


ROLLING_7D_REVENUE_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         sum(CAST(round(value * 100, 0) AS BIGINT)) AS _rev_c,
         CAST(ts AS DATE) - DATE '1970-01-01' AS _epd
  FROM events GROUP BY event_type, CAST(ts AS DATE)
)
SELECT event_type, day,
       round(sum(_rev_c) OVER w / 100.0, 4) AS rev_7d,
       count(*) OVER w AS n_days_in_window
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY _epd
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


def daily_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily 'error' counts over the full [min_day, max_day]
    calendar: a generated day spine left-joined to the observed daily
    counts, absent days emitted as 0 — the densification step every
    downstream time-series model (anomaly, forecasting) assumes.

    The spine comes from sequence() over the 1-row min/max aggregate:
    generated distributively from a broadcast scalar, never collected
    to the driver. Both joined sides are day-grained (tiny), so the
    only full-table work is the one pre-aggregation scan."""
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "event_type"
    )
    bounds = ev.agg(
        F.min("day").alias("_d0"), F.max("day").alias("_d1")
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("_d0"), F.col("_d1"), F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    daily = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("day")
        .agg(F.count("*").alias("_n"))
    )
    return spine.join(daily, "day", "left").select(
        "day", F.coalesce(F.col("_n"), F.lit(0).cast("long")).alias("n_errors")
    )


DAILY_GAP_FILL_SQL = """
WITH bounds AS (
  SELECT min(CAST(ts AS DATE)) AS _d0, max(CAST(ts AS DATE)) AS _d1
  FROM events
),
spine AS (
  SELECT CAST(unnest(generate_series(_d0, _d1, INTERVAL 1 DAY)) AS DATE)
         AS day
  FROM bounds
),
daily AS (
  SELECT CAST(ts AS DATE) AS day, count(*) AS _n
  FROM events WHERE event_type = 'error' GROUP BY CAST(ts AS DATE)
)
SELECT spine.day, COALESCE(_n, 0) AS n_errors
FROM spine LEFT JOIN daily USING (day)
"""


# --- linearly-decayed engagement score --------------------------------

DECAY_FULL = 100   # weight of an event on the reference day
DECAY_PER_DAY = 3  # weight lost per day of age
DECAY_TOP = 50


def decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top users by time-decayed engagement: each event contributes
    max(0, DECAY_FULL - DECAY_PER_DAY * age_days) where age is
    measured back from the newest event in the table — a windowed
    linear decay (events older than ~33 days contribute nothing).

    Linear integer decay instead of the usual exponential HALF-LIFE
    on purpose: exp()/pow() doubles are libm-dependent and a
    last-ulp difference between engines flips rankings on ties; the
    piecewise-linear weight keeps the whole score in int64 while
    preserving the recency-weighting semantics. One shuffle on
    user_id; the reference date is a broadcast 1-row aggregate, not
    a second scan. Deterministic top-k via (score desc, user_id)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    ref = ev.agg(F.max("d").alias("ref_d"))
    scored = ev.crossJoin(F.broadcast(ref)).select(
        "user_id",
        F.greatest(
            F.lit(0),
            F.lit(DECAY_FULL)
            - F.lit(DECAY_PER_DAY) * F.datediff("ref_d", "d"),
        ).cast("long").alias("wt"),
    )
    per_user = scored.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum("wt").alias("score"),
    )
    return per_user.orderBy(F.desc("score"), F.asc("user_id")).limit(
        DECAY_TOP
    )


DECAYED_ENGAGEMENT_SQL = f"""
WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
ref AS (SELECT max(d) AS ref_d FROM ev),
scored AS (
  SELECT user_id,
         CAST(greatest(0, {DECAY_FULL}
              - {DECAY_PER_DAY} * date_diff('day', d, ref_d)) AS BIGINT)
           AS wt
  FROM ev CROSS JOIN ref
)
SELECT user_id, count(*) AS n_events, CAST(sum(wt) AS BIGINT) AS score
FROM scored GROUP BY user_id
ORDER BY score DESC, user_id ASC
LIMIT {DECAY_TOP}
"""


LOCAL_TZ = "America/New_York"


def events_hourly_local_tz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day activity profile in a NAMED civil timezone
    (America/New_York) — the dashboard view every global event
    pipeline needs, and a classic cross-engine divergence trap: both
    engines must consult the same IANA tzdata with the same
    interpretation of the stored instant.

    The stored timestamps are UTC instants (catalog contract). Spark
    shifts with ``from_utc_timestamp``; the oracle pins the
    interpretation SESSION-INDEPENDENTLY by composing DuckDB's
    two-argument ``timezone`` twice (naive→UTC-instant→NY wall
    clock), so the driver's DuckDB session timezone cannot change the
    result. Map-only + one 24x|types| aggregate."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts")
    return (
        ev.select(
            "event_type",
            F.hour(F.from_utc_timestamp("ts", LOCAL_TZ)).alias("local_hour"),
        )
        .groupBy("local_hour", "event_type")
        .agg(F.count("*").alias("n_events"))
    )


EVENTS_HOURLY_LOCAL_SQL = f"""
SELECT CAST(extract(hour FROM
         timezone('{LOCAL_TZ}', timezone('UTC', ts))) AS INTEGER)
         AS local_hour,
       event_type, count(*) AS n_events
FROM events GROUP BY 1, 2
"""


# --- hourly autocorrelation / seasonality audit (round-13 queue) --------

ACF_LAG_SHORT = 1
ACF_LAG_SEASON = 24


def hourly_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the gap-filled hourly event-count series at
    lag 1 (persistence) and lag 24 (daily seasonality), per event
    type — the audit a monitoring pipeline runs before trusting "same
    hour yesterday" baselines (events_hourly_anomalies assumes the
    lag-24 structure; this measures whether it actually exists).

    The series is densified first (the daily_gap_fill spine, at hour
    grain per event type): skipping empty hours would silently glue
    non-adjacent hours together and fabricate correlation. ACF uses
    the standard full-series mean and denominator, cleared of the
    rational mean by multiplying through by n^2:
    num_k = sum((n*y_t - S)(n*y_{t-k} - S)) over the n-k pairs,
    den = sum((n*y_t - S)^2), S = sum(y) — both exact in
    DECIMAL(38,0)/HUGEINT; the single float64 division
    r_k_ppm = floor(1e6 * num_k / den) is clamped to [-1e6, 1e6]
    (the spearman_quality_length contract: engine-identical, the
    integers on both sides are bit-equal). NULL when the series is
    constant (den = 0) or shorter than the lag.

    Scale posture (100 TB): everything after the one full-table
    pre-aggregation (groupBy event_type, hour — map-side partials)
    is hour-grained: the spine generates distributively from a
    broadcast-scalar bounds row, the lag windows slide over per-type
    hour series (8.8k rows/type/year), and the rollup is one row per
    type. No per-event window anywhere.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000").alias("_h"),
    )
    counts = ev.groupBy("event_type", "_h").agg(
        F.count(F.lit(1)).alias("_y")
    )
    bounds = counts.groupBy("event_type").agg(
        F.min("_h").alias("_h0"), F.max("_h").alias("_h1")
    )
    spine = bounds.select(
        "event_type",
        F.explode(
            F.sequence(F.col("_h0"), F.col("_h1"), F.lit(1))
        ).alias("_h"),
    )
    filled = spine.join(counts, ["event_type", "_h"], "left").select(
        "event_type",
        "_h",
        F.coalesce(F.col("_y"), F.lit(0).cast("long")).alias("_y"),
    )
    stats = filled.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_y").alias("_s")
    )
    w = Window.partitionBy("event_type").orderBy("_h")
    lagged = (
        filled.join(stats, "event_type")
        .withColumn("_y1", F.lag("_y", ACF_LAG_SHORT).over(w))
        .withColumn("_y24", F.lag("_y", ACF_LAG_SEASON).over(w))
    )
    dev = "(CAST(_n AS DECIMAL(38,0)) * {col} - _s)"
    rolled = lagged.groupBy("event_type").agg(
        F.max("_n").alias("n_hours"),
        F.sum(F.expr(f"{dev.format(col='_y')} * {dev.format(col='_y')}")
              ).alias("_den"),
        F.sum(
            F.expr(
                f"CASE WHEN _y1 IS NOT NULL THEN"
                f" {dev.format(col='_y')} * {dev.format(col='_y1')} END"
            )
        ).alias("_num1"),
        F.sum(
            F.expr(
                f"CASE WHEN _y24 IS NOT NULL THEN"
                f" {dev.format(col='_y')} * {dev.format(col='_y24')} END"
            )
        ).alias("_num24"),
    )
    r = (
        "CAST(CASE WHEN _den > 0 AND {num} IS NOT NULL THEN"
        " GREATEST(-1000000, LEAST(1000000,"
        " FLOOR(1000000.0 * CAST({num} AS DOUBLE)"
        " / CAST(_den AS DOUBLE)))) END AS BIGINT)"
    )
    return rolled.select(
        "event_type",
        "n_hours",
        F.expr(r.format(num="_num1")).alias("acf1_ppm"),
        F.expr(r.format(num="_num24")).alias("acf24_ppm"),
    )


HOURLY_ACF_SQL = f"""
WITH ev AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS _h FROM events
),
counts AS (
  SELECT event_type, _h, CAST(count(*) AS BIGINT) AS _y
  FROM ev GROUP BY event_type, _h
),
bounds AS (
  SELECT event_type, min(_h) AS _h0, max(_h) AS _h1
  FROM counts GROUP BY event_type
),
spine AS (
  SELECT event_type, unnest(range(_h0, _h1 + 1)) AS _h FROM bounds
),
filled AS (
  SELECT s.event_type, s._h, coalesce(c._y, 0) AS _y
  FROM spine s LEFT JOIN counts c
    ON s.event_type = c.event_type AND s._h = c._h
),
stats AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS _n,
         CAST(sum(_y) AS BIGINT) AS _s
  FROM filled GROUP BY event_type
),
lagged AS (
  SELECT f.event_type, f._y, t._n, t._s,
         lag(f._y, {ACF_LAG_SHORT}) OVER
           (PARTITION BY f.event_type ORDER BY f._h) AS _y1,
         lag(f._y, {ACF_LAG_SEASON}) OVER
           (PARTITION BY f.event_type ORDER BY f._h) AS _y24
  FROM filled f JOIN stats t ON f.event_type = t.event_type
),
rolled AS (
  SELECT event_type,
         CAST(max(_n) AS BIGINT) AS n_hours,
         sum((CAST(_n AS HUGEINT) * _y - _s)
             * (CAST(_n AS HUGEINT) * _y - _s)) AS _den,
         sum(CASE WHEN _y1 IS NOT NULL THEN
               (CAST(_n AS HUGEINT) * _y - _s)
               * (CAST(_n AS HUGEINT) * _y1 - _s) END) AS _num1,
         sum(CASE WHEN _y24 IS NOT NULL THEN
               (CAST(_n AS HUGEINT) * _y - _s)
               * (CAST(_n AS HUGEINT) * _y24 - _s) END) AS _num24
  FROM lagged GROUP BY event_type
)
SELECT event_type, n_hours,
       CAST(CASE WHEN _den > 0 AND _num1 IS NOT NULL THEN
              GREATEST(-1000000, LEAST(1000000,
                FLOOR(1000000.0 * CAST(_num1 AS DOUBLE)
                      / CAST(_den AS DOUBLE)))) END AS BIGINT) AS acf1_ppm,
       CAST(CASE WHEN _den > 0 AND _num24 IS NOT NULL THEN
              GREATEST(-1000000, LEAST(1000000,
                FLOOR(1000000.0 * CAST(_num24 AS DOUBLE)
                      / CAST(_den AS DOUBLE)))) END AS BIGINT) AS acf24_ppm
FROM rolled
"""


# --- seasonal-naive forecast backtest (round-16 queue) -------------------

BACKTEST_LAG = 24          # seasonal-naive: y_hat(t) = y(t - 24h)
BACKTEST_HOLDOUT_HOURS = 120  # score the last 5 days of the series


def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the seasonal-naive forecaster (y_hat(t) = the
    count at the same hour yesterday) over the LAST 120 hours of each
    event type's gap-filled hourly series — the forecast-evaluation
    class: hourly_autocorrelation measures whether the lag-24
    structure exists; this measures what a baseline that ASSUMES it
    actually achieves, which is the bar any fancier forecaster must
    beat before it earns its complexity.

    Integer-exact metrics over the holdout: n_scored, total actual,
    MAE as mae_milli = (2000*sum|e| + n) div (2n) (the half-up milli
    idiom over non-negative sums), and sMAPE as the mean of per-point
    2|a-f| * 1e6 div (a+f) ratios (each point's ratio an exact
    integer, zero-denominator points — both actual and forecast 0 —
    scored as 0 error by convention and counted separately as
    n_both_zero). The gap-fill matters twice here: skipped empty
    hours would both fabricate lag alignment and hide zero-actual
    misses.

    Scale posture (100 TB): the hourly_autocorrelation shape — one
    map-side-partial groupBy to the hour histogram, the spine
    generated distributively from broadcast bounds, ONE lag window
    over the per-type hour series, and a per-type rollup. The holdout
    filter prunes the window output before any metric math.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000").alias("_h"),
    )
    counts = ev.groupBy("event_type", "_h").agg(
        F.count(F.lit(1)).alias("_y")
    )
    bounds = counts.groupBy("event_type").agg(
        F.min("_h").alias("_h0"), F.max("_h").alias("_h1")
    )
    spine = bounds.select(
        "event_type",
        F.col("_h1"),
        F.explode(
            F.sequence(F.col("_h0"), F.col("_h1"), F.lit(1))
        ).alias("_h"),
    )
    filled = spine.join(counts, ["event_type", "_h"], "left").select(
        "event_type",
        "_h",
        "_h1",
        F.coalesce(F.col("_y"), F.lit(0).cast("long")).alias("_y"),
    )
    w = Window.partitionBy("event_type").orderBy("_h")
    scored = (
        filled.withColumn("_f", F.lag("_y", BACKTEST_LAG).over(w))
        .filter(
            (F.col("_f").isNotNull())
            & (F.col("_h") > F.col("_h1") - BACKTEST_HOLDOUT_HOURS)
        )
        .select(
            "event_type",
            "_y",
            "_f",
            F.abs(F.col("_y") - F.col("_f")).alias("_ae"),
            F.expr(
                "CASE WHEN _y + _f > 0 THEN"
                " 2 * abs(_y - _f) * 1000000 div (_y + _f)"
                " ELSE 0 END"
            ).alias("_smape_pt"),
        )
    )
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.sum("_y").alias("total_actual"),
        F.expr(
            "(2000 * sum(_ae) + count(1)) div (2 * count(1))"
        ).alias("mae_milli"),
        F.expr(
            "(2 * sum(_smape_pt) + count(1)) div (2 * count(1))"
        ).alias("smape_ppm"),
        F.sum(
            ((F.col("_y") == 0) & (F.col("_f") == 0)).cast("long")
        ).alias("n_both_zero"),
    )


SEASONAL_BACKTEST_SQL = f"""
WITH ev AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS _h FROM events
),
counts AS (
  SELECT event_type, _h, CAST(count(*) AS BIGINT) AS _y
  FROM ev GROUP BY event_type, _h
),
bounds AS (
  SELECT event_type, min(_h) AS _h0, max(_h) AS _h1
  FROM counts GROUP BY event_type
),
spine AS (
  SELECT event_type, _h1, unnest(range(_h0, _h1 + 1)) AS _h FROM bounds
),
filled AS (
  SELECT s.event_type, s._h, s._h1, coalesce(c._y, 0) AS _y
  FROM spine s LEFT JOIN counts c
    ON s.event_type = c.event_type AND s._h = c._h
),
lagged AS (
  SELECT event_type, _h, _h1, _y,
         lag(_y, {BACKTEST_LAG}) OVER
           (PARTITION BY event_type ORDER BY _h) AS _f
  FROM filled
),
scored AS (
  SELECT event_type, _y, _f,
         abs(_y - _f) AS _ae,
         CASE WHEN _y + _f > 0 THEN
           2 * abs(_y - _f) * 1000000 // (_y + _f)
         ELSE 0 END AS _smape_pt
  FROM lagged
  WHERE _f IS NOT NULL AND _h > _h1 - {BACKTEST_HOLDOUT_HOURS}
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_scored,
       CAST(sum(_y) AS BIGINT) AS total_actual,
       CAST((2000 * sum(_ae) + count(*)) // (2 * count(*)) AS BIGINT)
         AS mae_milli,
       CAST((2 * sum(_smape_pt) + count(*)) // (2 * count(*)) AS BIGINT)
         AS smape_ppm,
       CAST(sum(CASE WHEN _y = 0 AND _f = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_both_zero
FROM scored GROUP BY event_type
"""


# --- EWMA control chart (round-18 queue) ---------------------------------

EWMA_NUM = 125     # alpha = 125/1000 = 1/8
EWMA_DEN = 1000
EWMA_K_NUM = 2     # alarm when y*1000 > 2*s_prev + floor guard
EWMA_FLOOR = 5000  # +5 counts of slack so a quiet series can't alarm


def ewma_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart over the gap-filled hourly count series —
    the ONLINE member of the monitoring family (KS/MWU compare
    epochs after the fact, CUSUM scans a closed window; EWMA is what
    a live dashboard actually runs: smooth, compare, alarm, update).
    Alarms where the hour's count exceeds twice the smoothed baseline
    plus slack: y_t * 1000 > 2 * s_(t-1) + 5000.

    The recursion s_t = (125*y_t*1000 + 875*s_(t-1)) div 1000 is a
    SEQUENTIAL fold — the one shape SQL windows can't express — run
    as an ordered-array aggregate() per event type with the state
    QUANTIZED to int64 millis at every step: a float fold would
    accumulate engine-specific rounding 720 steps deep, an integer
    fold is bit-exact on both engines by construction. The series is
    gap-filled first (a skipped empty hour would smooth across a gap
    and miss the quiet period that makes the next burst an anomaly).

    Scale posture (100 TB): the fold runs over the per-type HOUR
    series (~720 values/month — kilobytes), collected per type AFTER
    the map-side-partial hourly groupBy; the corpus-sized work is the
    same one histogram pass every temporal entry shares. Output is
    one row per event type.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000").alias("_h"),
    )
    counts = ev.groupBy("event_type", "_h").agg(
        F.count(F.lit(1)).alias("_y")
    )
    bounds = counts.groupBy("event_type").agg(
        F.min("_h").alias("_h0"), F.max("_h").alias("_h1")
    )
    spine = bounds.select(
        "event_type",
        F.explode(
            F.sequence(F.col("_h0"), F.col("_h1"), F.lit(1))
        ).alias("_h"),
    )
    filled = spine.join(counts, ["event_type", "_h"], "left").select(
        "event_type",
        "_h",
        F.coalesce(F.col("_y"), F.lit(0).cast("long")).alias("_y"),
    )
    series = filled.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_h", "_y"))),
            lambda st: st["_y"],
        ).alias("_ys")
    )
    # fold state: (s_milli, n_alarms); s seeds on the first value.
    # integer floor division inside the lambda via (a - a%d)/d — the
    # numerator becomes an exact multiple of d, so the float division
    # is exact below 2^53 on both engines
    def _idiv(a, d):
        return ((a - a % F.lit(d)) / F.lit(d)).cast("long")

    fold = F.aggregate(
        F.col("_ys"),
        F.struct(
            F.lit(-1).cast("long").alias("s"),
            F.lit(0).cast("long").alias("alarms"),
        ),
        lambda acc, y: F.struct(
            F.when(acc["s"] < 0, y * 1000)
            .otherwise(
                _idiv(
                    F.lit(EWMA_NUM) * y * 1000
                    + F.lit(EWMA_DEN - EWMA_NUM) * acc["s"],
                    EWMA_DEN,
                )
            )
            .alias("s"),
            (
                acc["alarms"]
                + F.when(
                    (acc["s"] >= 0)
                    & (y * 1000 > F.lit(EWMA_K_NUM) * acc["s"]
                       + F.lit(EWMA_FLOOR)),
                    1,
                ).otherwise(0)
            ).alias("alarms"),
        ),
    )
    return series.select(
        "event_type",
        F.size("_ys").alias("n_hours"),
        fold["s"].alias("ewma_final_milli"),
        fold["alarms"].alias("n_alarms"),
    )


EWMA_CONTROL_SQL = f"""
WITH ev AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS _h FROM events
),
counts AS (
  SELECT event_type, _h, CAST(count(*) AS BIGINT) AS _y
  FROM ev GROUP BY event_type, _h
),
bounds AS (
  SELECT event_type, min(_h) AS _h0, max(_h) AS _h1
  FROM counts GROUP BY event_type
),
spine AS (
  SELECT event_type, unnest(range(_h0, _h1 + 1)) AS _h FROM bounds
),
filled AS (
  SELECT s.event_type, s._h, coalesce(c._y, 0) AS _y
  FROM spine s LEFT JOIN counts c
    ON s.event_type = c.event_type AND s._h = c._h
),
series AS (
  SELECT event_type, list(_y ORDER BY _h) AS _ys
  FROM filled GROUP BY event_type
),
folded AS (
  SELECT event_type, len(_ys) AS n_hours,
         list_reduce(
           -- FIELD ORDER IS LOAD-BEARING: DuckDB v1.0's struct-lambda
           -- fold lets a field that references an EARLIER-declared
           -- field observe its already-updated value from the second
           -- step on (fuzz-verified: 591/2000 random series flipped
           -- the alarm count with 's' declared first). 'alarms' reads
           -- acc.s and must therefore be declared BEFORE 's' — under
           -- sequential-update semantics it then sees the old value,
           -- and under correct (simultaneous) semantics nothing
           -- changes, so this ordering is right either way.
           list_prepend({{'alarms': CAST(0 AS BIGINT),
                          's': CAST(-1 AS BIGINT)}},
             list_transform(_ys,
               y -> {{'alarms': CAST(0 AS BIGINT), 's': CAST(y AS BIGINT)}})),
           (acc, e) -> {{
             'alarms': acc.alarms
                       + CASE WHEN acc.s >= 0
                               AND e.s * 1000 > {EWMA_K_NUM} * acc.s
                                                + {EWMA_FLOOR}
                              THEN 1 ELSE 0 END,
             's': CASE WHEN acc.s < 0 THEN e.s * 1000
                       ELSE ({EWMA_NUM} * e.s * 1000
                             + {EWMA_DEN - EWMA_NUM} * acc.s)
                            // {EWMA_DEN} END}}) AS st
  FROM series
)
SELECT event_type,
       CAST(n_hours AS BIGINT) AS n_hours,
       CAST(st.s AS BIGINT) AS ewma_final_milli,
       CAST(st.alarms AS BIGINT) AS n_alarms
FROM folded
"""


# --- burstiness / Fano factor (round-13 queue, built round 10) --------------


def burstiness_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index of dispersion (Fano factor) of the gap-filled hourly
    count series, per event type: F = sample_variance / mean. A
    Poisson arrival process has F = 1; F >> 1 is bursty traffic
    (flash crowds, retry storms), F << 1 is a rate-limited or
    scheduled feed. The dispersion member of the monitoring family
    (ACF measures memory, EWMA tracks level, KS/PSI compare epochs;
    Fano classifies the arrival PROCESS).

    INTEGER-exact end to end: with S = sum(y), Q = sum(y^2), n hours,
    sample variance = (n*Q - S^2) / (n*(n-1)) and mean = S/n, so
    F = (n*Q - S^2) / ((n-1) * S) — a single ratio of int64 products
    (n*Q <= 8.8e3 * (1e12)^2 would overflow, so both engines compute
    the two products in DECIMAL(38,0)/HUGEINT and the exported
    fano_milli = 1000 * num div den is the exact floored ratio).
    The overdispersed flag is the pure integer comparison num > den.
    NULL when n < 2 or S = 0.

    Scale posture (100 TB): identical to hourly_autocorrelation —
    one map-side-partial (type, hour) groupBy, a generated hour
    spine off broadcast bounds, a one-row-per-type rollup. Nothing
    touches events twice.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000").alias("_h"),
    )
    counts = ev.groupBy("event_type", "_h").agg(
        F.count(F.lit(1)).alias("_y")
    )
    bounds = counts.groupBy("event_type").agg(
        F.min("_h").alias("_h0"), F.max("_h").alias("_h1")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence(F.col("_h0"), F.col("_h1"), F.lit(1))).alias(
            "_h"
        ),
    )
    filled = spine.join(counts, ["event_type", "_h"], "left").select(
        "event_type",
        F.coalesce(F.col("_y"), F.lit(0).cast("long")).alias("_y"),
    )
    agg = filled.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("_y").alias("_s"),
        F.sum(F.col("_y") * F.col("_y")).alias("_q"),
    )
    num = F.expr(
        "CAST(n_hours AS DECIMAL(38,0)) * _q"
        " - CAST(_s AS DECIMAL(38,0)) * _s"
    )
    den = F.expr("CAST(n_hours - 1 AS DECIMAL(38,0)) * _s")
    return agg.select(
        "event_type",
        "n_hours",
        F.col("_s").alias("n_events"),
        F.when(
            (F.col("n_hours") < 2) | (F.col("_s") == 0),
            F.lit(None).cast("long"),
        )
        .otherwise(
            F.expr(
                "CAST((1000 * (CAST(n_hours AS DECIMAL(38,0)) * _q"
                " - CAST(_s AS DECIMAL(38,0)) * _s))"
                " div (CAST(n_hours - 1 AS DECIMAL(38,0)) * _s)"
                " AS BIGINT)"
            )
        )
        .alias("fano_milli"),
        F.when(
            (F.col("n_hours") < 2) | (F.col("_s") == 0),
            F.lit(None).cast("boolean"),
        )
        .otherwise(num > den)
        .alias("overdispersed"),
    )


BURSTINESS_SQL = """
WITH ev AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS _h FROM events
),
counts AS (
  SELECT event_type, _h, CAST(count(*) AS BIGINT) AS _y
  FROM ev GROUP BY event_type, _h
),
bounds AS (
  SELECT event_type, min(_h) AS _h0, max(_h) AS _h1
  FROM counts GROUP BY event_type
),
spine AS (
  SELECT event_type, unnest(range(_h0, _h1 + 1)) AS _h FROM bounds
),
filled AS (
  SELECT s.event_type, COALESCE(c._y, 0) AS _y
  FROM spine s LEFT JOIN counts c
    ON c.event_type = s.event_type AND c._h = s._h
),
agg AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_hours,
         CAST(sum(_y) AS BIGINT) AS _s,
         CAST(sum(_y * _y) AS BIGINT) AS _q
  FROM filled GROUP BY event_type
)
SELECT event_type, n_hours, _s AS n_events,
       CASE WHEN n_hours < 2 OR _s = 0 THEN NULL
            ELSE CAST((1000 * (CAST(n_hours AS HUGEINT) * _q
                               - CAST(_s AS HUGEINT) * _s))
                      // (CAST(n_hours - 1 AS HUGEINT) * _s) AS BIGINT)
       END AS fano_milli,
       CASE WHEN n_hours < 2 OR _s = 0 THEN NULL
            ELSE CAST(n_hours AS HUGEINT) * _q
                 - CAST(_s AS HUGEINT) * _s
                 > CAST(n_hours - 1 AS HUGEINT) * _s
       END AS overdispersed
FROM agg
"""


# --- seasonality strength (round-15 queue, built round 10) ------------------


def seasonality_strength_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much of the hourly-count variance does the hour-of-day
    profile explain — eta-squared (the one-way ANOVA R^2) of the
    gap-filled hourly series grouped by hour-of-day, per event type.
    This is the number that justifies (or kills) every "same hour
    yesterday" baseline: hourly_autocorrelation's lag-24 r says the
    series rhymes day over day; eta^2 says how LOUDLY — a type at
    eta^2 ~ 0 needs a level model, one near 1 is schedule-driven.

    INTEGER/DECIMAL-exact: with S = sum(y), Q = sum(y^2), n hours,
    and per-hour-of-day totals T_g over n_g hours, eta^2 =
    (n * sum_g T_g^2/n_g - S^2) / (n*Q - S^2). Each group's
    T_g^2/n_g is floored at micro scale in DECIMAL(38,0) — a_g =
    (T_g^2 * 1e6) div n_g — so the cross-group SUM is an integer sum
    (order-free; a double sum over groups would be fold-order-
    dependent), and the final eta2_ppm = 1e6 * (n*A - 1e6*S^2) div
    (1e6*(n*Q - S^2)) is one exact 128-bit division. Headroom: the
    DECIMAL(38,0) chain holds to T_g ~ 1e13 events per (type, hour-
    of-day) — far past any real feed. NULL when the series is
    constant (den = 0) or shorter than 2 hours.

    Scale posture (100 TB): the burstiness_by_type shape — one
    map-side-partial (type, hour) groupBy, the generated spine, a
    24-cell hour-of-day rollup, and a one-row-per-type finish.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000").alias("_h"),
    )
    counts = ev.groupBy("event_type", "_h").agg(
        F.count(F.lit(1)).alias("_y")
    )
    bounds = counts.groupBy("event_type").agg(
        F.min("_h").alias("_h0"), F.max("_h").alias("_h1")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence(F.col("_h0"), F.col("_h1"), F.lit(1))).alias(
            "_h"
        ),
    )
    filled = spine.join(counts, ["event_type", "_h"], "left").select(
        "event_type",
        (F.col("_h") % 24).alias("_hod"),
        F.coalesce(F.col("_y"), F.lit(0).cast("long")).alias("_y"),
    )
    per_g = filled.groupBy("event_type", "_hod").agg(
        F.sum("_y").alias("_tg"), F.count(F.lit(1)).alias("_ng")
    )
    per_type = per_g.groupBy("event_type").agg(
        F.sum("_ng").alias("n_hours"),
        F.sum("_tg").alias("_s"),
        F.sum(
            F.expr(
                "(CAST(_tg AS DECIMAL(38,0)) * _tg * 1000000) div _ng"
            )
        ).alias("_a"),
    )
    q = filled.groupBy("event_type").agg(
        F.sum(F.col("_y") * F.col("_y")).alias("_q")
    )
    num = F.expr(
        "CAST(n_hours AS DECIMAL(38,0)) * _a"
        " - CAST(1000000 AS DECIMAL(38,0)) * _s * _s"
    )
    den = F.expr(
        "CAST(1000000 AS DECIMAL(38,0))"
        " * (CAST(n_hours AS DECIMAL(38,0)) * _q"
        " - CAST(_s AS DECIMAL(38,0)) * _s)"
    )
    return per_type.join(q, "event_type").select(
        "event_type",
        "n_hours",
        F.col("_s").alias("n_events"),
        F.when(
            (F.col("n_hours") < 2)
            | (
                F.expr(
                    "CAST(n_hours AS DECIMAL(38,0)) * _q"
                    " - CAST(_s AS DECIMAL(38,0)) * _s"
                )
                == 0
            ),
            F.lit(None).cast("long"),
        )
        .otherwise(
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0))"
                " * (CAST(n_hours AS DECIMAL(38,0)) * _a"
                "    - CAST(1000000 AS DECIMAL(38,0)) * _s * _s))"
                " div (CAST(1000000 AS DECIMAL(38,0))"
                " * (CAST(n_hours AS DECIMAL(38,0)) * _q"
                "    - CAST(_s AS DECIMAL(38,0)) * _s)) AS BIGINT)"
            )
        )
        .alias("eta2_ppm"),
    )


SEASONALITY_STRENGTH_SQL = """
WITH ev AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS _h FROM events
),
counts AS (
  SELECT event_type, _h, CAST(count(*) AS BIGINT) AS _y
  FROM ev GROUP BY event_type, _h
),
bounds AS (
  SELECT event_type, min(_h) AS _h0, max(_h) AS _h1
  FROM counts GROUP BY event_type
),
spine AS (
  SELECT event_type, unnest(range(_h0, _h1 + 1)) AS _h FROM bounds
),
filled AS (
  SELECT s.event_type, s._h % 24 AS _hod, COALESCE(c._y, 0) AS _y
  FROM spine s LEFT JOIN counts c
    ON c.event_type = s.event_type AND c._h = s._h
),
per_g AS (
  SELECT event_type, _hod,
         CAST(sum(_y) AS BIGINT) AS _tg,
         CAST(count(*) AS BIGINT) AS _ng
  FROM filled GROUP BY event_type, _hod
),
per_type AS (
  SELECT event_type,
         CAST(sum(_ng) AS BIGINT) AS n_hours,
         CAST(sum(_tg) AS BIGINT) AS _s,
         sum((CAST(_tg AS HUGEINT) * _tg * 1000000) // _ng) AS _a
  FROM per_g GROUP BY event_type
),
qq AS (
  SELECT event_type, CAST(sum(_y * _y) AS BIGINT) AS _q
  FROM filled GROUP BY event_type
)
SELECT p.event_type, p.n_hours, p._s AS n_events,
       CASE WHEN p.n_hours < 2
              OR CAST(p.n_hours AS HUGEINT) * q._q
                 - CAST(p._s AS HUGEINT) * p._s = 0 THEN NULL
            ELSE CAST((CAST(1000000 AS HUGEINT)
                       * (CAST(p.n_hours AS HUGEINT) * p._a
                          - CAST(1000000 AS HUGEINT) * p._s * p._s))
                      // (CAST(1000000 AS HUGEINT)
                          * (CAST(p.n_hours AS HUGEINT) * q._q
                             - CAST(p._s AS HUGEINT) * p._s)) AS BIGINT)
       END AS eta2_ppm
FROM per_type p JOIN qq q USING (event_type)
"""


# --- Theil-Sen robust hourly trend (r12 queue, batch 3) --------------------


def theil_sen_hourly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen slope of the gap-filled hourly event-count series,
    per event type — the robust member of the trend family: the OLS
    slope (events_value_regression's machinery) moves arbitrarily far
    under one corrupted hour (an outage backfill, a bot burst); the
    median of all pairwise slopes has a 29% breakdown point and is
    the estimator monitoring actually wants for "is traffic drifting
    up or down".

    Integer contract: the series rides the hourly_autocorrelation
    gap-fill spine (skipping empty hours would fabricate slope);
    each of the C(n,2) pairwise slopes (y_j - y_i)/(j - i) is floor-
    quantized to MICRO-counts-per-hour, computed SHIFTED into
    nonnegative territory first (slope + 1e6*max_count, a broadcast
    data-derived offset both engines compute identically) and
    unshifted after. The shift is a CONVENTION pinning floor
    semantics for signed quotients: both engines truncate toward
    zero on integer division (Spark div and DuckDB BIGINT/HUGEINT
    `//` alike — verified, see the dbscan_core_cells note in
    clustering.py), and truncation == floor on nonnegative ints. The reported slope is the LOWER MEDIAN
    (2*cum >= n, the quality_mad_outliers pick) over the slope
    histogram — exact, no interpolation. Types with a single
    observed hour export NULL.

    Scale posture (100 TB): pair count is C(n_hours, 2) per type —
    bounded by the TIME RANGE squared, corpus-size-free (the hourly
    histogram groupBy collapses the events map-side first); ~677
    observed hours/type here -> ~230k pairs/type. For a multi-year
    horizon, bucket to days or subsample pairs — the estimator
    degrades gracefully; the histogram + cumulative-window median
    never ranks per pair twice.

    Exactness bound (ADVICE r11): the shifted numerator
    `1e6*(y2-y1) + off*(h2-h1)` is int64, with off = 1e6 *
    max_hourly_count — exact only while max_hourly_count *
    span_hours <= ~9.2e12 (e.g. ~1e9 events/hour over a year, or
    ~1e8 over a decade). Past that, compute the shifted quotient in
    DECIMAL(38,0)/HUGEINT like the drift family, or bucket to days
    first (which also tames the pair count).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000").alias("_h"),
    )
    counts = ev.groupBy("event_type", "_h").agg(
        F.count(F.lit(1)).alias("_y")
    )
    bounds = counts.groupBy("event_type").agg(
        F.min("_h").alias("_h0"), F.max("_h").alias("_h1")
    )
    spine = bounds.select(
        "event_type",
        F.explode(
            F.sequence(F.col("_h0"), F.col("_h1"), F.lit(1))
        ).alias("_h"),
    )
    # eagerly materialized once (r13): the filled hourly histogram
    # feeds the offset aggregate AND both sides of the pair self-join;
    # uncached, the events scan + histogram + spine join re-ran per
    # reference (19 parquet scans in the before-plan). The frame is
    # time-range-bounded (hours x types), corpus-size-free.
    filled = spine.join(counts, ["event_type", "_h"], "left").select(
        "event_type",
        "_h",
        F.coalesce(F.col("_y"), F.lit(0).cast("long")).alias("_y"),
    ).localCheckpoint(eager=True)
    off = filled.agg(
        (F.coalesce(F.max("_y"), F.lit(0)) * 1_000_000).alias("_off")
    )
    a = filled.select(
        "event_type", F.col("_h").alias("_h1c"), F.col("_y").alias("_y1")
    )
    b = filled.select(
        "event_type", F.col("_h").alias("_h2c"), F.col("_y").alias("_y2")
    )
    pairs = (
        a.join(b, "event_type")
        .filter(F.col("_h2c") > F.col("_h1c"))
        .crossJoin(F.broadcast(off))
        .select(
            "event_type",
            F.expr(
                "(1000000 * (_y2 - _y1) + _off * (_h2c - _h1c))"
                " div (_h2c - _h1c) - _off"
            ).alias("_slope"),
        )
    )
    hist = pairs.groupBy("event_type", "_slope").agg(
        F.count(F.lit(1)).alias("_c")
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("_slope")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = hist.groupBy("event_type").agg(
        F.sum("_c").alias("n_pairs")
    )
    med = (
        hist.withColumn("_cum", F.sum("_c").over(w_cum))
        .join(tot, "event_type")
        .filter(2 * F.col("_cum") >= F.col("n_pairs"))
        .groupBy("event_type")
        .agg(F.min("_slope").alias("slope_micro_per_hour"))
    )
    per_type = filled.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours")
    )
    return (
        per_type.join(tot, "event_type", "left")
        .join(med, "event_type", "left")
        .select(
            "event_type",
            "n_hours",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            "slope_micro_per_hour",
        )
    )


THEIL_SEN_SQL = """
WITH ev AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS _h FROM events
),
counts AS (
  SELECT event_type, _h, CAST(count(*) AS BIGINT) AS _y
  FROM ev GROUP BY event_type, _h
),
bounds AS (
  SELECT event_type, min(_h) AS _h0, max(_h) AS _h1
  FROM counts GROUP BY event_type
),
spine AS (
  SELECT event_type, unnest(range(_h0, _h1 + 1)) AS _h FROM bounds
),
filled AS (
  SELECT s.event_type, s._h, coalesce(c._y, 0) AS _y
  FROM spine s LEFT JOIN counts c
    ON c.event_type = s.event_type AND c._h = s._h
),
off AS (
  SELECT CAST(coalesce(max(_y), 0) * 1000000 AS BIGINT) AS _off
  FROM filled
),
pairs AS (
  SELECT a.event_type,
         (1000000 * (b._y - a._y) + o._off * (b._h - a._h))
           // (b._h - a._h) - o._off AS _slope
  FROM filled a
  JOIN filled b ON a.event_type = b.event_type AND b._h > a._h
  CROSS JOIN off o
),
hist AS (
  SELECT event_type, _slope, CAST(count(*) AS BIGINT) AS _c
  FROM pairs GROUP BY event_type, _slope
),
tot AS (
  SELECT event_type, CAST(sum(_c) AS BIGINT) AS n_pairs
  FROM hist GROUP BY event_type
),
med AS (
  SELECT h.event_type, min(h._slope) AS slope_micro_per_hour
  FROM (SELECT event_type, _slope,
               CAST(sum(_c) OVER (PARTITION BY event_type ORDER BY _slope
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS _cum
        FROM hist) h
  JOIN tot t ON t.event_type = h.event_type
  WHERE 2 * h._cum >= t.n_pairs
  GROUP BY h.event_type
),
per_type AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours
  FROM filled GROUP BY event_type
)
SELECT p.event_type, p.n_hours,
       coalesce(t.n_pairs, 0) AS n_pairs,
       m.slope_micro_per_hour
FROM per_type p
LEFT JOIN tot t ON t.event_type = p.event_type
LEFT JOIN med m ON m.event_type = p.event_type
"""


# --- Page-Hinkley sequential drift detection ----------------------------

PH_DELTA_MILLI = 500  # tolerated drift per step: 0.5 counts/hour
PH_LAMBDA_MILLI = 20_000  # alarm threshold: 20 counts of accumulated excess


def page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley upward-drift detector over the gap-filled hourly
    count series, per event type — the sequential member of the drift
    family tuned for SLOW ramps: CUSUM (cusum_drift_scan) restarts at
    zero and flags step changes; EWMA (ewma_control_chart) smooths
    and flags spikes; Page-Hinkley accumulates every hour's excess
    over the RUNNING mean and alarms when the gap to the historical
    minimum exceeds lambda — the classical test for "traffic has been
    creeping up for days".

    Although PH is usually WRITTEN as a recursion, its state is
    prefix-summable: m_t = sum_i(1000*y_i - (1000*S_i div i) - delta)
    with S_i the prefix sum — so unlike ewma_control_chart (a true
    multiplicative recurrence that needs the ordered-array fold), PH
    runs entirely on CUMULATIVE WINDOWS: row_number, prefix sum,
    per-row integer term, cumulative m, prefix min — every step an
    exact int64 on both engines, no float and no fold. (Deliberate:
    DuckDB v1.0's list_reduce struct-lambda lets later struct fields
    observe EARLIER fields' already-updated values from the second
    step on — a cross-field fold like PH's would silently diverge;
    windows sidestep the hazard entirely.) The running-mean division
    (1000*S_i) div i is nonnegative, so Spark's truncation equals
    DuckDB's floor; 1000*S_i stays in int64 to ~9e15 cumulative
    events per type within the window.

    Scale posture (100 TB): the corpus-sized work is the one
    map-side-partial hourly groupBy the temporal family shares; all
    windows slide over the per-type HOUR series (~720 rows/month),
    and the rollup is one tiny groupBy. Output: one row per type.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000").alias("_h"),
    )
    counts = ev.groupBy("event_type", "_h").agg(
        F.count(F.lit(1)).alias("_y")
    )
    bounds = counts.groupBy("event_type").agg(
        F.min("_h").alias("_h0"), F.max("_h").alias("_h1")
    )
    spine = bounds.select(
        "event_type",
        F.explode(
            F.sequence(F.col("_h0"), F.col("_h1"), F.lit(1))
        ).alias("_h"),
    )
    filled = spine.join(counts, ["event_type", "_h"], "left").select(
        "event_type",
        "_h",
        F.coalesce(F.col("_y"), F.lit(0).cast("long")).alias("_y"),
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("_h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    stepped = filled.select(
        "event_type",
        "_h",
        "_y",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("_h"))
        .cast("long")
        .alias("_i"),
        F.sum("_y").over(w_cum).alias("_s"),
    ).select(
        "event_type",
        "_h",
        F.expr(
            f"1000 * _y - (1000 * _s) div _i - {PH_DELTA_MILLI}"
        ).alias("_term"),
    )
    walked = stepped.select(
        "event_type",
        "_h",
        F.sum("_term").over(w_cum).alias("_m"),
    ).select(
        "event_type",
        "_h",
        "_m",
        F.least(F.lit(0).cast("long"), F.min("_m").over(w_cum)).alias("_mn"),
    )
    return walked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.max_by(F.col("_m") - F.col("_mn"), F.col("_h")).alias("_drop"),
        F.sum(
            F.when(
                F.col("_m") - F.col("_mn") > PH_LAMBDA_MILLI, 1
            ).otherwise(0)
        ).alias("n_alarm_hours"),
    ).select(
        "event_type",
        "n_hours",
        F.col("_drop").alias("ph_final_milli"),
        "n_alarm_hours",
    )


PAGE_HINKLEY_SQL = f"""
WITH ev AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS _h FROM events
),
counts AS (
  SELECT event_type, _h, CAST(count(*) AS BIGINT) AS _y
  FROM ev GROUP BY event_type, _h
),
bounds AS (
  SELECT event_type, min(_h) AS _h0, max(_h) AS _h1
  FROM counts GROUP BY event_type
),
spine AS (
  SELECT event_type, unnest(range(_h0, _h1 + 1)) AS _h FROM bounds
),
filled AS (
  SELECT s.event_type, s._h, coalesce(c._y, 0) AS _y
  FROM spine s LEFT JOIN counts c
    ON s.event_type = c.event_type AND s._h = c._h
),
stepped AS (
  SELECT event_type, _h,
         1000 * _y
         - (1000 * CAST(sum(_y) OVER w AS BIGINT))
           // CAST(row_number() OVER (PARTITION BY event_type ORDER BY _h)
                   AS BIGINT)
         - {PH_DELTA_MILLI} AS _term
  FROM filled
  WINDOW w AS (PARTITION BY event_type ORDER BY _h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
cum_m AS (
  SELECT event_type, _h,
         CAST(sum(_term) OVER w AS BIGINT) AS _m
  FROM stepped
  WINDOW w AS (PARTITION BY event_type ORDER BY _h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
walked AS (
  SELECT event_type, _h, _m,
         least(CAST(0 AS BIGINT), CAST(min(_m) OVER w AS BIGINT)) AS _mn
  FROM cum_m
  WINDOW w AS (PARTITION BY event_type ORDER BY _h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_hours,
       CAST(arg_max(_m - _mn, _h) AS BIGINT) AS ph_final_milli,
       CAST(sum(CASE WHEN _m - _mn > {PH_LAMBDA_MILLI} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_alarm_hours
FROM walked GROUP BY event_type
"""


# --- SAX motif discovery over the hourly series --------------------------

SAX_FRAME_HOURS = 6  # PAA frame width
SAX_ALPHABET = 4  # symbols per frame (equal-width bins)
SAX_TOP_MOTIFS = 3  # motifs reported per type


def sax_motif_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX motif discovery on the gap-filled hourly count series, per
    event type: PAA-average 6-hour frames, discretize each frame into
    a 4-symbol alphabet, and report the top-3 most frequent 3-frame
    motifs — the "what shape does a typical day have" primitive
    (recurring ramp-up/plateau/drop patterns) that the drift family
    (point alarms) and seasonality_strength (one global number) both
    miss. Repeated motifs are candidate habits/bot loops; a flat
    motif table is a structureless series.

    INTEGER-exact SAX: the PAA mean is milli-quantized via the
    nonnegative floor division (1000*frame_sum) div frame_hours
    (truncation == floor on nonnegative ints); symbols come from the
    domain-bounded equal-width rule (v - lo) * 4 div (hi - lo + 1)
    against the per-type PAA min/max (the kendall bucketing formula —
    breakpoints from equal-FREQUENCY quartiles would need a rank pass
    per type; equal-width keeps the whole pipeline histogram-shaped
    and is the standard SAX variant for count series). A constant
    series degenerates to symbol 0 everywhere by the +1 denominator.
    Motifs are the base-4 integer s0*16 + s1*4 + s2 from two lead()
    steps; ranking is (count desc, motif asc) — engine-total order.

    Scale posture (100 TB): the corpus-sized work is the shared
    hourly histogram groupBy; frames collapse it 6:1 map-side; the
    lead windows and the motif rollup slide over the per-type FRAME
    series (~120 rows/month/type). WindowGroupLimit bounds the final
    top-3. Output: <= 3 rows per event type.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000").alias("_h"),
    )
    counts = ev.groupBy("event_type", "_h").agg(
        F.count(F.lit(1)).alias("_y")
    )
    bounds = counts.groupBy("event_type").agg(
        F.min("_h").alias("_h0"), F.max("_h").alias("_h1")
    )
    spine = bounds.select(
        "event_type",
        F.explode(
            F.sequence(F.col("_h0"), F.col("_h1"), F.lit(1))
        ).alias("_h"),
    )
    filled = spine.join(counts, ["event_type", "_h"], "left").select(
        "event_type",
        "_h",
        F.coalesce(F.col("_y"), F.lit(0).cast("long")).alias("_y"),
    )
    frames = (
        filled.groupBy(
            "event_type",
            F.expr(f"_h div {SAX_FRAME_HOURS}").alias("_f"),
        )
        .agg(
            F.expr("(1000 * sum(_y)) div count(*)").alias("_paa")
        )
    )
    lims = frames.groupBy("event_type").agg(
        F.min("_paa").alias("_lo"), F.max("_paa").alias("_hi")
    )
    syms = frames.join(F.broadcast(lims), "event_type").select(
        "event_type",
        "_f",
        F.expr(
            f"((_paa - _lo) * {SAX_ALPHABET}) div (_hi - _lo + 1)"
        ).alias("_s"),
    )
    w_lead = Window.partitionBy("event_type").orderBy("_f")
    grams = syms.select(
        "event_type",
        "_s",
        F.lead("_s", 1).over(w_lead).alias("_s1"),
        F.lead("_s", 2).over(w_lead).alias("_s2"),
    ).filter(F.col("_s2").isNotNull())
    motifs = grams.groupBy(
        "event_type",
        (
            F.col("_s") * SAX_ALPHABET * SAX_ALPHABET
            + F.col("_s1") * SAX_ALPHABET
            + F.col("_s2")
        ).alias("motif"),
    ).agg(F.count(F.lit(1)).alias("n_occurrences"))
    w_rank = Window.partitionBy("event_type").orderBy(
        F.desc("n_occurrences"), F.asc("motif")
    )
    return (
        motifs.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= SAX_TOP_MOTIFS)
        .select("event_type", "rank", "motif", "n_occurrences")
    )


SAX_MOTIF_SQL = f"""
WITH ev AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS _h FROM events
),
counts AS (
  SELECT event_type, _h, CAST(count(*) AS BIGINT) AS _y
  FROM ev GROUP BY event_type, _h
),
bounds AS (
  SELECT event_type, min(_h) AS _h0, max(_h) AS _h1
  FROM counts GROUP BY event_type
),
spine AS (
  SELECT event_type, unnest(range(_h0, _h1 + 1)) AS _h FROM bounds
),
filled AS (
  SELECT s.event_type, s._h, coalesce(c._y, 0) AS _y
  FROM spine s LEFT JOIN counts c
    ON s.event_type = c.event_type AND s._h = c._h
),
frames AS (
  SELECT event_type, _h // {SAX_FRAME_HOURS} AS _f,
         (1000 * CAST(sum(_y) AS BIGINT)) // CAST(count(*) AS BIGINT)
           AS _paa
  FROM filled GROUP BY event_type, _h // {SAX_FRAME_HOURS}
),
lims AS (
  SELECT event_type, min(_paa) AS _lo, max(_paa) AS _hi
  FROM frames GROUP BY event_type
),
syms AS (
  SELECT f.event_type, f._f,
         ((f._paa - l._lo) * {SAX_ALPHABET}) // (l._hi - l._lo + 1) AS _s
  FROM frames f JOIN lims l ON f.event_type = l.event_type
),
grams AS (
  SELECT event_type, _s,
         lead(_s, 1) OVER w AS _s1,
         lead(_s, 2) OVER w AS _s2
  FROM syms
  WINDOW w AS (PARTITION BY event_type ORDER BY _f)
),
motifs AS (
  SELECT event_type,
         CAST(_s * {SAX_ALPHABET * SAX_ALPHABET} + _s1 * {SAX_ALPHABET}
              + _s2 AS BIGINT) AS motif,
         CAST(count(*) AS BIGINT) AS n_occurrences
  FROM grams WHERE _s2 IS NOT NULL
  GROUP BY event_type, _s, _s1, _s2
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
             ORDER BY n_occurrences DESC, motif ASC) AS rank
  FROM motifs
)
SELECT event_type, CAST(rank AS BIGINT) AS rank, motif, n_occurrences
FROM ranked WHERE rank <= {SAX_TOP_MOTIFS}
"""


# --- hourly burstiness (Fano factor) (round-14 queue) -------------------

def hourly_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic-shape audit per event type: the Fano factor
    (variance-to-mean ratio) of the gap-filled hourly count series —
    the one-number answer to "is this stream Poisson-like (~1),
    clocked (<1), or bursty (>1)". The sibling of
    hourly_autocorrelation on the same spine: ACF measures WHEN
    counts co-move, Fano measures HOW spiky they are; capacity
    planning and anomaly thresholds want both.

    PURE-integer algebra: with n hours, S = sum(y), Q = sum(y^2)
    (exact int64 off the same gap-filled spine as the ACF — skipping
    empty hours would hide exactly the gaps that make a stream
    bursty), population variance * n^2 = n*Q - S^2 and mean * n = S,
    so fano_milli = 1000 * (n*Q - S^2) div (n*S) — one floor
    division in DECIMAL(38,0)/HUGEINT (n*Q ~ hours * events^2/hour
    wraps int64 at ~1e6 events/hour-scale); the operands are
    nonnegative (Cauchy-Schwarz: n*Q >= S^2), so floor == truncate on
    both engines with no shift needed. NULL when the type has no
    events (S = 0).

    Scale posture (100 TB): identical to hourly_autocorrelation —
    ONE map-side-partial groupBy collapses the corpus to (type,
    hour), the spine is generated from a broadcast bounds row,
    the rollup is one row per type. Nothing downstream of the first
    aggregate is corpus-granular.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000").alias("_h"),
    )
    counts = ev.groupBy("event_type", "_h").agg(
        F.count(F.lit(1)).alias("_y")
    )
    bounds = counts.groupBy("event_type").agg(
        F.min("_h").alias("_h0"), F.max("_h").alias("_h1")
    )
    spine = bounds.select(
        "event_type",
        F.explode(
            F.sequence(F.col("_h0"), F.col("_h1"), F.lit(1))
        ).alias("_h"),
    )
    filled = spine.join(counts, ["event_type", "_h"], "left").select(
        "event_type",
        F.coalesce(F.col("_y"), F.lit(0).cast("long")).alias("_y"),
    )
    rolled = filled.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("_y").alias("_s"),
        F.sum(F.expr("_y * _y")).alias("_q"),
    )
    return rolled.select(
        "event_type",
        "n_hours",
        F.col("_s").alias("n_events"),
        F.expr(
            "CAST(CASE WHEN _s > 0 THEN"
            " (CAST(n_hours AS DECIMAL(38,0)) * _q"
            "  - CAST(_s AS DECIMAL(38,0)) * _s) * 1000"
            " div (CAST(n_hours AS DECIMAL(38,0)) * _s)"
            " END AS BIGINT)"
        ).alias("fano_milli"),
        F.expr("1000 * _s div n_hours").alias("mean_milli"),
    )


FANO_SQL = """
WITH counts AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS _h,
         count(*) AS _y
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, min(_h) AS _h0, max(_h) AS _h1
  FROM counts GROUP BY 1
),
spine AS (
  SELECT event_type, unnest(range(_h0, _h1 + 1)) AS _h FROM bounds
),
filled AS (
  SELECT s.event_type, coalesce(c._y, 0) AS _y
  FROM spine s LEFT JOIN counts c
    ON s.event_type = c.event_type AND s._h = c._h
),
rolled AS (
  SELECT event_type, count(*) AS n_hours,
         CAST(sum(_y) AS BIGINT) AS _s,
         CAST(sum(_y * _y) AS BIGINT) AS _q
  FROM filled GROUP BY 1
)
SELECT event_type, n_hours, _s AS n_events,
       CAST(CASE WHEN _s > 0 THEN
         (CAST(n_hours AS HUGEINT) * _q - CAST(_s AS HUGEINT) * _s) * 1000
         // (CAST(n_hours AS HUGEINT) * _s)
       END AS BIGINT) AS fano_milli,
       1000 * _s // n_hours AS mean_milli
FROM rolled
"""


# --- classical seasonal decomposition, monthly (round-14 queue) ---------

# Shift for the floor-mean of SIGNED detrended values (the theil_sen
# floor-semantics convention: both engines truncate toward zero on
# integer division, so shift the operand nonnegative, floor == trunc,
# unshift). 1e16 cents*24 ~ $4e12/month of detrended revenue — far
# above any per-month residual this side of a planetary economy;
# DECIMAL(38,0)/HUGEINT gives 21 spare digits over the shift.
SEASONAL_SHIFT = 10_000_000_000_000_000


def seasonal_decomposition_monthly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Classical additive decomposition of the monthly order-revenue
    series: observed = trend + seasonal + residual — the structure
    check behind every "revenue is down this month" conversation
    (is it trend, or is it just August?).

    Textbook construction, made engine-exact by scaling instead of
    dividing: on the gap-filled month spine (months with no orders
    count 0 — the ~80-month range is data-derived),
    * trend_x24  = y[-6] + 2*sum(y[-5..+5]) + y[+6] — the centered
      12-month moving average times 24 (half-weight endpoints make an
      even window symmetric), NULL at the 6-month edges;
    * detrended_x24 = 24*y - trend_x24 (exact int, NULL at edges);
    * seasonal_x24 = floor-mean of detrended_x24 over the month-of-
      year group (shifted-nonnegative quotient in DECIMAL(38,0),
      {SEASONAL_SHIFT:.0e} shift — see the module division note);
    * residual_x24 = detrended_x24 - seasonal_x24.
    Everything is cents*24 int64s; no float enters the pipeline, so
    both engines agree bit for bit.

    Scale posture (100 TB): the corpus collapses to one (month) row
    set in the first map-side-partial groupBy (~12 rows/year —
    TIME-range bounded, corpus-size-free); the single-partition
    windows that follow ride a series whose length a century caps at
    1,200 rows. The one full scan is the pre-aggregation.
    """
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    od = load_table(spark, sf_dir, "orders").select(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias(
            "_m"
        ),
        cents.alias("_c"),
    )
    monthly = od.groupBy("_m").agg(F.sum("_c").alias("_y"))
    bounds = monthly.agg(
        F.min("_m").alias("_m0"), F.max("_m").alias("_m1")
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("_m0"), F.col("_m1"), F.lit(1))
        ).alias("_m")
    )
    filled = spine.join(monthly, "_m", "left").select(
        "_m", F.coalesce(F.col("_y"), F.lit(0).cast("long")).alias("_y")
    )
    w = Window.orderBy("_m")
    mid = w.rowsBetween(-5, 5)
    full = w.rowsBetween(-6, 6)
    with_trend = filled.select(
        "_m",
        "_y",
        F.when(
            F.count(F.lit(1)).over(full) == 13,
            2 * F.sum("_y").over(mid)
            + F.lag("_y", 6).over(w)
            + F.lead("_y", 6).over(w),
        ).alias("_t24"),
    ).select(
        "_m",
        "_y",
        "_t24",
        (24 * F.col("_y") - F.col("_t24")).alias("_d24"),
        (F.col("_m") % 12 + 1).alias("month_of_year"),
    )
    seas = Window.partitionBy("month_of_year")
    return (
        with_trend.select(
            "_m",
            "_y",
            "_t24",
            "_d24",
            "month_of_year",
            F.expr(
                f"CAST(CASE WHEN count(_d24) OVER"
                f" (PARTITION BY month_of_year) > 0 THEN"
                f" (sum(CAST(_d24 AS DECIMAL(38,0))) OVER"
                f"   (PARTITION BY month_of_year)"
                f"  + CAST({SEASONAL_SHIFT} AS DECIMAL(38,0))"
                f"    * count(_d24) OVER (PARTITION BY month_of_year))"
                f" div count(_d24) OVER (PARTITION BY month_of_year)"
                f" - {SEASONAL_SHIFT} END AS BIGINT)"
            ).alias("seasonal_x24"),
        )
        .select(
            F.col("_m").alias("month_idx"),
            "month_of_year",
            F.col("_y").alias("revenue_cents"),
            F.col("_t24").alias("trend_x24"),
            F.col("_d24").alias("detrended_x24"),
            "seasonal_x24",
            (F.col("_d24") - F.col("seasonal_x24")).alias("residual_x24"),
        )
    )


SEASONAL_DECOMP_SQL = f"""
WITH monthly AS (
  SELECT year(o_orderdate) * 12 + month(o_orderdate) - 1 AS _m,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS _y0
  FROM orders GROUP BY 1
),
bounds AS (SELECT min(_m) AS _m0, max(_m) AS _m1 FROM monthly),
spine AS (SELECT unnest(range(_m0, _m1 + 1)) AS _m FROM bounds),
filled AS (
  SELECT s._m, coalesce(m._y0, 0) AS _y
  FROM spine s LEFT JOIN monthly m ON s._m = m._m
),
with_trend AS (
  SELECT _m, _y,
         CAST(CASE WHEN count(*) OVER
                (ORDER BY _m ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING) = 13
         THEN 2 * sum(_y) OVER
                (ORDER BY _m ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)
              + lag(_y, 6) OVER (ORDER BY _m)
              + lead(_y, 6) OVER (ORDER BY _m)
         END AS BIGINT) AS _t24
  FROM filled
),
with_det AS (
  SELECT _m, _y, _t24, CAST(24 * _y - _t24 AS BIGINT) AS _d24,
         _m % 12 + 1 AS month_of_year
  FROM with_trend
)
SELECT _m AS month_idx, month_of_year,
       _y AS revenue_cents, _t24 AS trend_x24, _d24 AS detrended_x24,
       CAST(CASE WHEN count(_d24) OVER (PARTITION BY month_of_year) > 0
       THEN (sum(CAST(_d24 AS HUGEINT)) OVER (PARTITION BY month_of_year)
             + CAST({SEASONAL_SHIFT} AS HUGEINT)
               * count(_d24) OVER (PARTITION BY month_of_year))
            // count(_d24) OVER (PARTITION BY month_of_year)
            - {SEASONAL_SHIFT} END AS BIGINT) AS seasonal_x24,
       CAST(_d24 - (CASE WHEN count(_d24) OVER (PARTITION BY month_of_year) > 0
       THEN (sum(CAST(_d24 AS HUGEINT)) OVER (PARTITION BY month_of_year)
             + CAST({SEASONAL_SHIFT} AS HUGEINT)
               * count(_d24) OVER (PARTITION BY month_of_year))
            // count(_d24) OVER (PARTITION BY month_of_year)
            - {SEASONAL_SHIFT} END) AS BIGINT) AS residual_x24
FROM with_det
"""
