"""Product-analytics operators over the event stream: ordered funnel
conversion, weekly cohort retention, and an event-type pivot.

The reference engine has no event-analytics surface (SURVEY.md §0 —
it is a word-count engine); these extend the engine the same way the
corpus/training operators do, with every plan shaped for the 100 TB
posture:

- **Funnel** is the interesting one at scale. The naive formulation
  re-scans and re-joins the event table once per funnel step (the
  3-CTE shape the DuckDB oracle uses). The Spark plan instead does
  ONE shuffle — groupBy(user_id) — and runs the ordered step machine
  as a native ``aggregate`` over the per-user sorted event array:
  per-key state-machine reduction, the classic MapReduce "secondary
  sort" pattern, with no Python and no second pass. Per-user event
  counts are bounded (product analytics, not firehose), so the
  collected array is small; a pathological power-user key would be
  handled by the same salting rewrite as operators/skew.py.
- **Cohort retention** shuffles twice on user_id (first-seen week,
  distinct active weeks) then aggregates a tiny (cohort, offset)
  grid — the wide exchanges are both on the natural key.
- **Pivot** passes the category values explicitly, so Spark skips
  the eager distinct-scan job that ``pivot(col)`` without values
  needs — at 100 TB that scan is a full extra pass over the table.

All comparisons run on microsecond longs in both engines (Spark
events.ts is ns-truncated-to-us by the catalog loader; the oracle
uses ``epoch_us``), so strict ``>`` funnel ordering can never
disagree on sub-microsecond ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..cachemgr import stage
from ..sources.catalog import load_table

# Ordered funnel definition: first view, then a click strictly after
# that view, then a purchase strictly after that click.
FUNNEL_STEPS = ("view", "click", "purchase")

# The event-type domain, passed explicitly to pivot() so no
# distinct-values pre-scan runs.
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users completing each prefix of the view->click->purchase
    funnel, computed in one shuffle.

    Per user: sort events by (ts_us, type), then fold a 3-slot state
    machine (t1 = first view; t2 = first click with ts > t1; t3 =
    first purchase with ts > t2) as a native ``aggregate`` expression.
    Equivalent to the oracle's per-step min-join formulation because
    the fold visits events in ascending ts order with strict
    inequalities. Returns one row: n_view / n_view_click /
    n_view_click_purchase."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_type")
        .filter(F.col("event_type").isin(*FUNNEL_STEPS))
        .select(
            "user_id",
            F.unix_micros(F.col("ts")).alias("ts_us"),
            F.col("event_type").alias("et"),
        )
    )
    per_user = ev.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("ts_us"), F.col("et")))
        ).alias("evs")
    )
    nolong = F.lit(None).cast("long")
    init = F.struct(
        nolong.alias("t1"), nolong.alias("t2"), nolong.alias("t3")
    )
    state = F.aggregate(
        F.col("evs"),
        init,
        lambda acc, e: F.struct(
            F.when(
                acc["t1"].isNull() & (e["et"] == FUNNEL_STEPS[0]), e["ts_us"]
            )
            .otherwise(acc["t1"])
            .alias("t1"),
            F.when(
                acc["t2"].isNull()
                & acc["t1"].isNotNull()
                & (e["et"] == FUNNEL_STEPS[1])
                & (e["ts_us"] > acc["t1"]),
                e["ts_us"],
            )
            .otherwise(acc["t2"])
            .alias("t2"),
            F.when(
                acc["t3"].isNull()
                & acc["t2"].isNotNull()
                & (e["et"] == FUNNEL_STEPS[2])
                & (e["ts_us"] > acc["t2"]),
                e["ts_us"],
            )
            .otherwise(acc["t3"])
            .alias("t3"),
        ),
    )
    stages = per_user.select(state.alias("s"))
    return stages.agg(
        F.count(F.col("s")["t1"]).alias("n_view"),
        F.count(F.col("s")["t2"]).alias("n_view_click"),
        F.count(F.col("s")["t3"]).alias("n_view_click_purchase"),
    )


FUNNEL_SQL = f"""
WITH t1 AS (
  SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
  WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t2
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND epoch_us(e.ts) > t1.t1
  GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t3
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND epoch_us(e.ts) > t2.t2
  GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM t1) AS n_view,
       (SELECT count(*) FROM t2) AS n_view_click,
       (SELECT count(*) FROM t3) AS n_view_click_purchase
"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention grid: users bucketed by the ISO week of
    their first event; for each (cohort_week, week_offset), how many
    of them were active that week. The standard retention matrix."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    week = F.to_date(F.date_trunc("week", F.col("ts")))
    first = ev.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    active = ev.select("user_id", week.alias("activity_week")).distinct()
    return (
        active.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("activity_week"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


COHORT_RETENTION_SQL = """
WITH first AS (
  SELECT user_id, min(CAST(date_trunc('week', ts) AS DATE)) AS cohort_week
  FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE)
         AS activity_week
  FROM events
)
SELECT f.cohort_week,
       CAST((a.activity_week - f.cohort_week) / 7 AS BIGINT)
         AS week_offset,
       count(*) AS n_users
FROM active a JOIN first f USING (user_id)
GROUP BY f.cohort_week, week_offset
"""


def events_daily_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events-per-day pivoted wide by event type (one column per
    type). The value list is passed explicitly so no distinct-scan
    job precedes the aggregation."""
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date(F.col("ts")).alias("day"), "event_type"
    )
    wide = ev.groupBy("day").pivot("event_type", list(EVENT_TYPES)).count()
    return wide.select(
        "day",
        *[
            F.coalesce(F.col(t), F.lit(0).cast("long")).alias(f"n_{t}")
            for t in EVENT_TYPES
        ],
    )


_PIVOT_COLS = ",\n       ".join(
    f"count(*) FILTER (WHERE event_type = '{t}') AS n_{t}"
    for t in EVENT_TYPES
)
EVENTS_DAILY_PIVOT_SQL = f"""
SELECT CAST(ts AS DATE) AS day,
       {_PIVOT_COLS}
FROM events GROUP BY day
"""


def events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier profile per event_type: median, MAD (median
    absolute deviation), and the count of events whose deviation
    exceeds 3x MAD — the standard robust z-score screen for metric
    streams, where mean/stddev would be dragged by the very outliers
    being hunted.

    Median needs the data twice (deviations are relative to the
    median), so this is inherently two aggregation passes plus an
    outlier count — each pass groups on event_type with the interim
    per-type medians BROADCAST back, so the event table is never
    re-shuffled on a second key. Values are quantized to int64 cents
    before the percentile so Spark's `percentile` and DuckDB's
    `quantile_cont` interpolate over identical integers (the
    operators/relational.py price_percentiles contract): every
    intermediate is a multiple of 0.25 cents, exactly representable,
    so the 3x-MAD boundary cannot disagree between engines."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("_c"),
    )
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(_c, 0.5)").alias("_med_c")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "_med_c", F.abs(F.col("_c") - F.col("_med_c")).alias("_adev")
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(_adev, 0.5)").alias("_mad_c")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.max("_med_c") / 100.0, 4).alias("med_value"),
            F.round(F.max("_mad_c") / 100.0, 4).alias("mad_value"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("_adev") > 3.0 * F.col("_mad_c"), 1
                    ).otherwise(0)
                ),
                F.lit(0).cast("long"),
            ).alias("n_outliers"),
        )
    )


EVENTS_VALUE_OUTLIERS_SQL = """
WITH c AS (
  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS _c FROM events
),
med AS (
  SELECT event_type, quantile_cont(_c, 0.5) AS _med_c FROM c GROUP BY event_type
),
dev AS (
  SELECT c.event_type, _med_c, abs(_c - _med_c) AS _adev
  FROM c JOIN med USING (event_type)
),
mad AS (
  SELECT event_type, quantile_cont(_adev, 0.5) AS _mad_c
  FROM dev GROUP BY event_type
)
SELECT dev.event_type,
       count(*) AS n_events,
       round(max(_med_c) / 100.0, 4) AS med_value,
       round(max(_mad_c) / 100.0, 4) AS mad_value,
       CAST(count(*) FILTER (WHERE _adev > 3.0 * _mad_c) AS BIGINT)
         AS n_outliers
FROM dev JOIN mad USING (event_type)
GROUP BY dev.event_type
"""


def user_reach_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by day (the reach/adoption curve). A
    running COUNT(DISTINCT) over raw events is unbounded state; the
    exact rewrite is the first-seen trick — a user contributes to the
    curve only on min(day) — so the heavy work is ONE user-keyed
    min-aggregate and the cumulative sum runs over the #days-row
    daily-new frame (an ordered window over a calendar-sized input is
    deliberately fine; it never sees event- or user-cardinality)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("day"))
    daily_new = first.groupBy("day").agg(F.count("*").alias("n_new_users"))
    w = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily_new.select(
        "day",
        "n_new_users",
        F.sum("n_new_users").over(w).alias("cum_users"),
    )


USER_REACH_CURVE_SQL = """
WITH first AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events GROUP BY user_id
),
daily_new AS (
  SELECT day, count(*) AS n_new_users FROM first GROUP BY day
)
SELECT day, n_new_users,
       CAST(sum(n_new_users) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_users
FROM daily_new
"""


def rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing-7-day distinct active users, per day with any
    event activity — the DAU/WAU-style rolling reach metric.

    A windowed COUNT(DISTINCT) over raw events is either unbounded
    state (streaming) or the inequality join the oracle writes (day
    spine x user-days, O(days x users) with no equi key). The Spark
    rewrite is the bounded-fan-out explode: dedupe to (user, day)
    first — the only pass that ever sees event cardinality — then
    each user-day emits the 7 window days it contributes to
    (``sequence(day, day+6)``), dedupes (user, win_day) and counts.
    Fan-out is exactly x7 of the user-day frame regardless of corpus
    size, every join/agg is an equi-shuffle, and the final count is
    per-day tiny. A left-semi join restricts the output to days that
    actually have events (trailing windows keep a day "active" for a
    week otherwise)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    user_days = ev.distinct()
    days = user_days.select("day").distinct()
    contrib = (
        user_days.select(
            "user_id",
            F.explode(
                F.expr("sequence(day, date_add(day, 6), interval 1 day)")
            ).alias("day"),
        )
        .distinct()
        .join(days, "day", "left_semi")
    )
    return contrib.groupBy("day").agg(
        F.count("*").alias("n_active_users")
    )


ROLLING_7D_ACTIVE_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
days AS (SELECT DISTINCT day FROM ud)
SELECT d.day, count(DISTINCT u.user_id) AS n_active_users
FROM days d
JOIN ud u ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
GROUP BY d.day
"""


def event_drift_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square homogeneity test of the event-type mix between the
    first and second half of the stream's time range — the
    distribution-drift check a pipeline runs before trusting a new
    data delivery.

    Plan: one 1-row min/max aggregate broadcast back over the scan
    labels each event with its half (pure integer microsecond
    midpoint, no floats); one groupBy((event_type, half)) builds the
    contingency table (|types| x 2 rows); marginals and the statistic
    are computed on that tiny frame. Identity used:
    (obs - r*c/N)^2 / (r*c/N) = (N*obs - r*c)^2 / (N*r*c), which
    keeps everything integer. N*obs reaches ~1e11 at sf0.1 so its
    square overflows int64 — the quadratic runs in 128-bit on BOTH
    engines (Spark DECIMAL(38,0), DuckDB HUGEINT), the same
    contract as basket_brand_lift. Per-cell milli-unit floor division
    is applied identically in both engines before the sum."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.unix_micros("ts").alias("us")
    )
    bounds = ev.agg(
        F.min("us").alias("_lo"), F.max("us").alias("_hi")
    )
    halves = ev.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.when(
            F.col("us") <= F.expr("_lo + (_hi - _lo) div 2"), F.lit("h1")
        )
        .otherwise(F.lit("h2"))
        .alias("half"),
    )
    cells = halves.groupBy("event_type", "half").agg(
        F.count("*").alias("obs")
    )
    w_type = Window.partitionBy("event_type")
    w_half = Window.partitionBy("half")
    scored = cells.select(
        "obs",
        F.sum("obs").over(w_type).alias("_r"),
        F.sum("obs").over(w_half).alias("_c"),
    ).crossJoin(
        F.broadcast(
            cells.agg(
                F.sum("obs").alias("_n"),
                F.count_distinct("event_type").alias("_nt"),
            )
        )
    )
    per_cell = scored.select(
        "_nt",
        F.expr(
            "CAST((1000 * (CAST(_n AS DECIMAL(38,0)) * obs - CAST(_r AS"
            " DECIMAL(38,0)) * _c) * (CAST(_n AS DECIMAL(38,0)) * obs -"
            " CAST(_r AS DECIMAL(38,0)) * _c)) div (CAST(_n AS"
            " DECIMAL(38,0)) * _r * _c) AS BIGINT)"
        ).alias("_chi_milli"),
    )
    return per_cell.groupBy().agg(
        F.count("*").alias("n_cells"),
        F.max(F.col("_nt") - 1).alias("df"),
        (F.sum("_chi_milli") / 1000.0).alias("chi_square"),
    )


EVENT_DRIFT_CHISQ_SQL = """
WITH ev AS (
  SELECT event_type, epoch_us(ts) AS us FROM events
),
bounds AS (SELECT min(us) AS lo, max(us) AS hi FROM ev),
halves AS (
  SELECT event_type,
         CASE WHEN us <= lo + (hi - lo) // 2 THEN 'h1' ELSE 'h2' END AS half
  FROM ev CROSS JOIN bounds
),
cells AS (
  SELECT event_type, half, count(*) AS obs
  FROM halves GROUP BY event_type, half
),
tot AS (
  SELECT CAST(sum(obs) AS HUGEINT) AS n,
         count(DISTINCT event_type) AS nt
  FROM cells
),
scored AS (
  SELECT obs,
         sum(obs) OVER (PARTITION BY event_type) AS r,
         sum(obs) OVER (PARTITION BY half) AS c,
         n, nt
  FROM cells CROSS JOIN tot
),
per_cell AS (
  SELECT nt,
         CAST((1000 * (n * obs - CAST(r AS HUGEINT) * c)
                    * (n * obs - CAST(r AS HUGEINT) * c))
              // (n * CAST(r AS HUGEINT) * c) AS BIGINT) AS chi_milli
  FROM scored
)
SELECT count(*) AS n_cells,
       CAST(max(nt) - 1 AS BIGINT) AS df,
       sum(chi_milli) / 1000.0 AS chi_square
FROM per_cell
"""


WINSOR_LO = 0.05
WINSOR_HI = 0.95
# Phase-1 bucket width for the exact order statistics (cents): $100
# buckets bound the bucket spine by the price domain (~1e3 buckets),
# independent of corpus size.
WINSOR_BUCKET = 10_000


def winsorized_revenue_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per return flag: row count and the mean extended price before
    and after winsorizing at the flag's own [p5, p95] — the robust
    aggregate a metrics pipeline publishes when a few whale rows
    would otherwise move the average.

    Two passes over the fact in both engines: a per-flag exact
    percentile aggregate (3 rows) broadcasts back over the scan, and
    the clamp + re-aggregate is map-side. The interpolated
    percentiles run over int64 cents (the proven
    percentile/quantile_cont contract); the resulting DOUBLE bounds
    are floored to int64 cents identically in both engines BEFORE
    the clamp, so the winsorized sum is an integer sum — fold order
    cannot drift a cent. Means use the half-up int idiom."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.round(F.col("l_extendedprice") * 100, 0)
        .cast("long")
        .alias("_c"),
    )
    # Exact percentiles via a two-phase bucket order-statistic
    # instead of the percentile() aggregate (r13 optimization):
    # percentile() buffers every value in a per-group map and ships
    # those maps through partial aggregation — measured 1.7 s of
    # this entry's 2.5 s at sf0.1 (and a per-cent histogram barely
    # compresses: 594k distinct cents in 600k rows). Phase 1 buckets
    # cents to a $100 spine — bounded by the PRICE DOMAIN, never the
    # corpus (the t-closeness quantization lesson) — and a cumulative
    # window over the tiny bucket histogram locates the bucket and
    # rank-base of each of the four target order statistics. Phase 2
    # rescans only the boundary-bucket rows (~n/buckets each) and a
    # within-bucket row_number picks the exact values. The
    # interpolation then reproduces Percentile.getPercentile
    # BIT-EXACTLY: pos = p * (n-1) in double, lower/higher =
    # floor/ceil(pos), (higher-pos)*lowerKey + (pos-lower)*higherKey
    # in that operand order. NULL cents fall into a NULL bucket whose
    # cum range is zero-width (index conditions can never match) and
    # are excluded from n, matching percentile()'s NULL skipping; an
    # all-NULL group keeps its flag with NULL bounds via the left
    # join from the phase-1 frame. pmod keeps the bucket floor-div
    # monotone for negative cents.
    bkt = F.expr(
        f"(_c - pmod(_c, {WINSOR_BUCKET})) div {WINSOR_BUCKET}"
    )
    bh = li.groupBy("l_returnflag", bkt.alias("_b")).agg(
        F.count(F.lit(1)).alias("_k")
    )
    wf = Window.partitionBy("l_returnflag")
    wo = wf.orderBy("_b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    nn_k = F.when(F.col("_b").isNotNull(), F.col("_k")).otherwise(F.lit(0))
    cum = bh.select(
        "l_returnflag",
        "_b",
        nn_k.alias("_kn"),
        F.sum(nn_k).over(wo).alias("_cum"),
        F.sum(nn_k).over(wf).alias("_n"),
    )

    def _idx(p: float):
        pos = F.lit(p) * (F.col("_n") - 1).cast("double")
        return F.floor(pos), F.ceil(pos)

    def _bpick(idx, out: str):
        hit = (idx >= F.col("_cum") - F.col("_kn")) & (idx < F.col("_cum"))
        return [
            F.max(F.when(hit, F.col("_b"))).alias(f"_b{out}"),
            F.max(F.when(hit, F.col("_cum") - F.col("_kn"))).alias(
                f"_base{out}"
            ),
        ]

    lo_l, lo_h = _idx(WINSOR_LO)
    hi_l, hi_h = _idx(WINSOR_HI)
    # cached: the 3-row bucket-selection frame feeds the phase-2 scan
    # filter AND the final bounds join; uncached, phase 1 re-ran per
    # reference.
    sel = cum.groupBy("l_returnflag").agg(
        *_bpick(lo_l, "ll"),
        *_bpick(lo_h, "lh"),
        *_bpick(hi_l, "hl"),
        *_bpick(hi_h, "hh"),
        F.max("_n").alias("_n"),
    ).transform(stage)
    li2 = (
        li.join(F.broadcast(sel), "l_returnflag")
        .withColumn("_b", bkt)
        .filter(
            F.col("_b").isNotNull()
            & (
                (F.col("_b") == F.col("_bll"))
                | (F.col("_b") == F.col("_blh"))
                | (F.col("_b") == F.col("_bhl"))
                | (F.col("_b") == F.col("_bhh"))
            )
        )
    )
    wrn = Window.partitionBy("l_returnflag", "_b").orderBy("_c")
    rn = li2.withColumn("_rn", F.row_number().over(wrn))

    def _vpick(idx, b: str, base: str, out: str):
        hit = (F.col("_b") == F.col(b)) & (
            F.col("_rn") == idx - F.col(base) + 1
        )
        return F.max(F.when(hit, F.col("_c"))).alias(out)

    picked = rn.groupBy("l_returnflag").agg(
        _vpick(lo_l, "_bll", "_basell", "_vll"),
        _vpick(lo_h, "_blh", "_baselh", "_vlh"),
        _vpick(hi_l, "_bhl", "_basehl", "_vhl"),
        _vpick(hi_h, "_bhh", "_basehh", "_vhh"),
    )

    def _interp(p: float, vl: str, vh: str) -> Column:
        pos = F.lit(p) * (F.col("_n") - 1).cast("double")
        lower, higher = F.floor(pos), F.ceil(pos)
        return F.when(
            lower == higher, F.col(vl).cast("double")
        ).otherwise(
            (higher.cast("double") - pos) * F.col(vl).cast("double")
            + (pos - lower.cast("double")) * F.col(vh).cast("double")
        )

    bounds = (
        sel.select("l_returnflag", "_n")
        .join(picked, "l_returnflag", "left")
        .select(
            "l_returnflag",
            F.floor(_interp(WINSOR_LO, "_vll", "_vlh")).alias("_lo"),
            F.floor(_interp(WINSOR_HI, "_vhl", "_vhh")).alias("_hi"),
        )
    )
    clamped = li.join(F.broadcast(bounds), "l_returnflag").select(
        "l_returnflag",
        "_c",
        F.least(F.greatest(F.col("_c"), F.col("_lo")), F.col("_hi")).alias(
            "_w"
        ),
    )
    return (
        clamped.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("_c").alias("_sr"),
            F.sum("_w").alias("_sw"),
        )
        .select(
            "l_returnflag",
            "n_items",
            (
                F.expr("(2 * _sr + n_items) div (2 * n_items)") / 100.0
            ).alias("mean_raw"),
            (
                F.expr("(2 * _sw + n_items) div (2 * n_items)") / 100.0
            ).alias("mean_winsorized"),
        )
    )


WINSORIZED_REVENUE_SQL = f"""
WITH c AS (
  SELECT l_returnflag,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS c
  FROM lineitem
),
bounds AS (
  SELECT l_returnflag,
         CAST(floor(quantile_cont(c, {WINSOR_LO})) AS BIGINT) AS lo,
         CAST(floor(quantile_cont(c, {WINSOR_HI})) AS BIGINT) AS hi
  FROM c GROUP BY l_returnflag
),
clamped AS (
  SELECT c.l_returnflag, c.c,
         least(greatest(c.c, b.lo), b.hi) AS w
  FROM c JOIN bounds b ON c.l_returnflag = b.l_returnflag
)
SELECT l_returnflag, count(*) AS n_items,
       ((2 * sum(c) + count(*)) // (2 * count(*))) / 100.0 AS mean_raw,
       ((2 * sum(w) + count(*)) // (2 * count(*))) / 100.0
         AS mean_winsorized
FROM clamped GROUP BY l_returnflag
"""


# --- grouped-map OLS regression ----------------------------------------

REG_MILLI = 1000


def events_value_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS regression of event value (cents) on
    hour-of-day, computed in an Arrow ``applyInPandas`` grouped map —
    the "fit a small model per group" shape (per-domain trend fits,
    per-segment elasticities) that genuinely needs imperative numeric
    code per group rather than a SQL aggregate.

    Cross-engine determinism contract: inside the pandas function all
    sums are exact int64 (hour <= 23, cents <= ~10^6, n <= ~10^5 per
    group keeps every product under 2^63); slope and intercept are
    then derived with a FIXED float operation order — slope =
    double(n*sxy - sx*sy) / double(n*sxx - sx*sx), intercept =
    (sy - slope*sx)/n — that the DuckDB oracle repeats verbatim, so
    the doubles are bit-identical and the final half-up milli
    quantization (floor(x*1000+0.5), identical on identical doubles)
    cannot split. Output is all-integer.

    Scale posture: the exchange carries (event_type, hour, cents)
    triples — at 100 TB you would pre-aggregate per (type, hour)
    before the grouped map (24 rows per group regardless of corpus
    size); here the raw rows flow so the grouped map does real work
    per group."""
    import math

    import pandas as pd

    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.hour("ts").cast("long").alias("h"),
            F.round(F.col("value") * 100, 0).cast("long").alias("vc"),
        )
        # a regression observation needs BOTH coordinates: NULL-value
        # rows are not observations (NULL-vintage policy — without
        # the filter a NULL becomes NaN in the grouped map and the
        # oracle's count(*)/sum() split asymmetrically)
        .filter(F.col("vc").isNotNull())
    )

    def _ols(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["h"].to_numpy()
        y = pdf["vc"].to_numpy()
        n = len(pdf)
        sx = int(x.sum())
        sy = int(y.sum())
        sxx = int((x * x).sum())
        sxy = int((x * y).sum())
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        slope = float(num) / float(den) if den != 0 else 0.0
        intercept = (sy - slope * sx) / n
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_events": [n],
                "slope_millicents": [
                    int(math.floor(slope * REG_MILLI + 0.5))
                ],
                "intercept_cents": [int(math.floor(intercept + 0.5))],
            }
        )

    return ev.groupBy("event_type").applyInPandas(
        _ols,
        "event_type STRING, n_events BIGINT, slope_millicents BIGINT,"
        " intercept_cents BIGINT",
    )


EVENTS_REGRESSION_SQL = f"""
WITH per AS (
  SELECT event_type,
         CAST(extract(hour FROM ts) AS BIGINT) AS h,
         CAST(round(value * 100, 0) AS BIGINT) AS vc
  FROM events
  WHERE value IS NOT NULL
),
sums AS (
  SELECT event_type, count(*) AS n,
         sum(h) AS sx, sum(vc) AS sy,
         sum(h * h) AS sxx, sum(h * vc) AS sxy
  FROM per GROUP BY event_type
),
fit AS (
  SELECT event_type, n,
         CASE WHEN (n * sxx - sx * sx) <> 0
              THEN CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE)
              ELSE 0.0 END AS slope,
         sx, sy
  FROM sums
)
SELECT event_type,
       n AS n_events,
       CAST(floor(slope * {REG_MILLI} + 0.5) AS BIGINT)
         AS slope_millicents,
       CAST(floor((sy - slope * sx) / n + 0.5) AS BIGINT)
         AS intercept_cents
FROM fit
"""


# --- exact weighted median (round-7 queue) ------------------------------

def weighted_median_by_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact WEIGHTED lower median of order value (int64 cents) per
    market segment, weight = the order's lineitem count — the weighted
    order-statistic class the registry lacks (price_percentiles is
    unweighted; deciles are ntile buckets, not weight-mass cuts).

    The median is the smallest value v whose cumulative weight over
    values <= v reaches half the segment's total weight
    (2*cumw >= W in pure int64, no halving division). The cumulative
    window uses a RANGE frame ordered by the value itself, so tied
    values share one cumulative mass and the result is independent of
    intra-tie row order — the detail that makes the answer
    engine-deterministic (a ROWS frame would expose each engine's
    tie order). One shuffle keys the window and the aggregate by
    segment; at 100 TB segments are few, so the per-segment sort is
    the classic quantile-by-key shape (and a skewed segment would
    move to the partial-histogram rewrite price_percentiles uses).

    Weights and values are exact: cents = round(price*100) as int64,
    weight = count(*)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.round(F.col("o_totalprice") * 100, 0)
        .cast("long")
        .alias("cents"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    wts = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("w"))
    )
    base = orders.join(
        wts, orders["o_orderkey"] == wts["l_orderkey"]
    ).join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
    cum_w = (
        Window.partitionBy("c_mktsegment")
        .orderBy("cents")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    whole = Window.partitionBy("c_mktsegment")
    # _n rides the SAME unordered whole-segment window as _tot, so
    # the per-segment order count needs no second pass over the base
    # join (r13 — the old plan re-ran the three-table join for a
    # separate n_orders rollup: 12 parquet scans / 18 Exchanges)
    ranked = base.select(
        F.col("c_mktsegment").alias("segment"),
        "cents",
        "w",
        F.sum("w").over(cum_w).alias("_cumw"),
        F.sum("w").over(whole).alias("_tot"),
        F.count(F.lit(1)).over(whole).alias("_n"),
    )
    return (
        ranked.filter(2 * F.col("_cumw") >= F.col("_tot"))
        .groupBy("segment")
        .agg(
            F.min("cents").alias("w_median_cents"),
            F.max("_tot").alias("total_weight"),
            F.max("_n").alias("n_orders"),
        )
        .select("segment", "n_orders", "total_weight", "w_median_cents")
    )


WEIGHTED_MEDIAN_SQL = """
WITH base AS (
  SELECT c.c_mktsegment AS segment,
         CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS cents,
         w.w
  FROM orders o
  JOIN (SELECT l_orderkey, count(*) AS w FROM lineitem
        GROUP BY l_orderkey) w ON o.o_orderkey = w.l_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
),
ranked AS (
  SELECT segment, cents, w,
         sum(w) OVER (PARTITION BY segment ORDER BY cents
                      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS _cumw,
         sum(w) OVER (PARTITION BY segment) AS _tot
  FROM base
)
SELECT r.segment,
       n.n_orders,
       CAST(max(r._tot) AS BIGINT) AS total_weight,
       min(r.cents) AS w_median_cents
FROM ranked r
JOIN (SELECT segment, count(*) AS n_orders FROM ranked GROUP BY segment) n
  ON r.segment = n.segment
WHERE 2 * r._cumw >= r._tot
GROUP BY r.segment, n.n_orders
"""


# --- Benford leading-digit audit (round-7 queue) ------------------------

# round(log10(1 + 1/d) * 1e6) for d = 1..9 — universal constants,
# embedded as integer literals so neither engine evaluates a log at
# query time (cross-engine log/pow ulp drift is the known hash killer).
BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law forensic audit of order values: observed leading
    digit distribution (ppm, exact int64) against the Benford
    expectation — the data-forensics class (fraud/synthetic-data
    screening) next to k_anonymity_audit and table_expectations_audit.

    The leading digit comes from the cents value's decimal string
    (substring, not floor(v/10^floor(log10 v)) — the float log path
    misclassifies exact powers of ten at the ulp boundary). Expected
    shares are compile-time integer constants (see BENFORD_PPM), the
    observed share is one exact integer division per digit, and every
    digit 1-9 is emitted even at zero observations (a LEFT join from
    the literal digit spine) so the output shape is fixed. Map-only
    until a 9-row aggregate: nothing here moves more than the digit
    histogram at any scale."""
    digits = spark.createDataFrame(
        [(d, BENFORD_PPM[d]) for d in range(1, 10)],
        "digit INT, expected_ppm BIGINT",
    )
    obs = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("long")
            .alias("cents")
        )
        .filter(F.col("cents") > 0)
        .select(
            F.substring(F.col("cents").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count("*").alias("n_obs"))
    )
    tot = obs.agg(F.sum("n_obs").alias("_n"))
    return (
        F.broadcast(digits)
        .join(obs, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce(F.col("n_obs"), F.lit(0).cast("long")).alias(
                "n_obs"
            ),
            "expected_ppm",
            F.expr(
                "CAST(1000000 * coalesce(n_obs, 0) AS BIGINT) div _n"
            ).alias("obs_ppm"),
            (
                F.expr(
                    "CAST(1000000 * coalesce(n_obs, 0) AS BIGINT) div _n"
                )
                - F.col("expected_ppm")
            ).alias("dev_ppm"),
        )
    )


_BENFORD_SPINE = " UNION ALL ".join(
    f"SELECT {d} AS digit, CAST({p} AS BIGINT) AS expected_ppm"
    for d, p in BENFORD_PPM.items()
)

BENFORD_SQL = f"""
WITH spine AS ({_BENFORD_SPINE}),
obs AS (
  SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS INTEGER)
           AS digit,
         count(*) AS n_obs
  FROM (SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        FROM orders) t
  WHERE cents > 0
  GROUP BY 1
),
tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS _n FROM obs)
SELECT s.digit,
       CAST(coalesce(o.n_obs, 0) AS BIGINT) AS n_obs,
       s.expected_ppm,
       CAST(1000000 * coalesce(o.n_obs, 0) AS BIGINT) // t._n AS obs_ppm,
       CAST(1000000 * coalesce(o.n_obs, 0) AS BIGINT) // t._n
         - s.expected_ppm AS dev_ppm
FROM spine s LEFT JOIN obs o ON s.digit = o.digit CROSS JOIN tot t
"""


# --- two-sample Kolmogorov-Smirnov drift test --------------------------

KS_SPLIT = "2024-01-16"  # sample A: before; sample B: at/after
# c(0.05)^2 for the two-sample KS rejection threshold
# D > c * sqrt((na+nb)/(na*nb)), pre-scaled by 1e4 so the alpha=0.05
# decision is a pure-INTEGER comparison (10^4 * d_num^2 vs
# 18447 * (na+nb) * na * nb) in 128-bit on both engines — no float64
# rounding at the boundary anywhere (round-9 ADVICE).
KS_C2_005_X1E4 = 18447


def ks_drift_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift between two periods, per event type, as an
    exact two-sample Kolmogorov-Smirnov statistic.

    D = max_x |F_A(x) - F_B(x)| is computed INTEGER-exactly: values
    quantized to cents, per-value counts cumulated with a window, and
    the sup taken over |cum_a * n_b - cum_b * n_a| (the cross-
    multiplied numerator, so no per-row float division anywhere).
    Exported as d_num + ks_ppm (floor-scaled) + the alpha=0.05
    rejection decision — the epoch-over-epoch feature-drift gate a
    training pipeline runs before trusting new data.

    Scale posture (100 TB): one groupBy (event_type, cents) collapses
    the stream to distinct values BEFORE the window (map-side partial
    aggs); the cumulative window partitions by event_type — at most
    |distinct cents| rows per partition, no global sort. The KS sup
    and totals ride the same partitioning; output is 5 rows.

    Overflow contract (the chi-square 128-bit contract,
    event_drift_chisq above): d_num <= n_a * n_b stays in int64 up to
    ~3e9 rows per type per side; its SQUARE (the alpha=0.05 decision)
    would wrap int64 already at n_a * n_b > ~3e9, so the quadratic
    runs in 128-bit on BOTH engines (Spark DECIMAL(38,0), DuckDB
    HUGEINT). The threshold constant is pre-scaled to the integer
    18447 = 10^4 * c(0.05)^2, so the decision is an EXACT integer
    comparison (10^4 * d_num^2 > 18447 * (n_a+n_b) * n_a * n_b) —
    no float64 promotion at the boundary (round-9 ADVICE; the earlier
    form multiplied by the double 1.8447, which silently demoted the
    decision to 53-bit). Exactness bound: 10^4 * (n_a*n_b)^2 must fit
    DECIMAL(38,0)/HUGEINT, i.e. n_a * n_b <= ~1e17 — ~3e8 rows per
    type per side when balanced; past that, shard the window by value
    range and take the max of per-shard sups (same algebra), or
    bucket the CDF. ks_ppm's numerator d_num * 1e6 keeps int64
    headroom to n_a * n_b ~9.2e12; past that, move the ppm into
    128-bit the same way. greatest(n_a * n_b, 1) guards the
    empty-side division identically in both engines (Spark div would
    return NULL, DuckDB // would raise — an engine divergence
    otherwise).
    """
    mid = F.lit(KS_SPLIT).cast("timestamp")
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        (F.col("ts") >= mid).cast("long").alias("is_b"),
    )
    # NULL value is not a measurement (NULL-vintage policy): without
    # the filter the NULL-cents histogram row rides the cumulative
    # window, whose NULL ordering differs across engines (Spark
    # NULLS FIRST, DuckDB NULLS LAST)
    ev = ev.filter(F.col("cents").isNotNull())
    per_val = ev.groupBy("event_type", "cents").agg(
        F.sum(1 - F.col("is_b")).alias("da"),
        F.sum("is_b").alias("db"),
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    stepped = per_val.select(
        "event_type",
        F.sum("da").over(w_cum).alias("cum_a"),
        F.sum("db").over(w_cum).alias("cum_b"),
        F.sum("da").over(w_all).alias("n_a"),
        F.sum("db").over(w_all).alias("n_b"),
    )
    return (
        stepped.groupBy("event_type")
        .agg(
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.max(
                F.abs(
                    F.col("cum_a") * F.col("n_b")
                    - F.col("cum_b") * F.col("n_a")
                )
            ).alias("d_num"),
        )
        .select(
            "event_type",
            "n_a",
            "n_b",
            "d_num",
            F.expr(
                "d_num * 1000000 div greatest(n_a * n_b, 1)"
            ).alias("ks_ppm"),
            F.expr(
                "CAST(d_num AS DECIMAL(38,0)) * d_num * 10000 > "
                f"CAST({KS_C2_005_X1E4} AS DECIMAL(38,0))"
                " * (n_a + n_b) * n_a * n_b"
            ).alias("drift_at_005"),
        )
    )


KS_DRIFT_SQL = f"""
WITH ev AS (
  SELECT event_type,
         CAST(round(value * 100, 0) AS BIGINT) AS cents,
         CASE WHEN ts >= TIMESTAMP '{KS_SPLIT}' THEN 1 ELSE 0 END AS is_b
  FROM events
  WHERE value IS NOT NULL
),
per_val AS (
  SELECT event_type, cents,
         sum(1 - is_b) AS da, sum(is_b) AS db
  FROM ev GROUP BY event_type, cents
),
stepped AS (
  SELECT event_type,
         sum(da) OVER (PARTITION BY event_type ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_a,
         sum(db) OVER (PARTITION BY event_type ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_b,
         sum(da) OVER (PARTITION BY event_type) AS n_a,
         sum(db) OVER (PARTITION BY event_type) AS n_b
  FROM per_val
)
SELECT event_type,
       CAST(max(n_a) AS BIGINT) AS n_a,
       CAST(max(n_b) AS BIGINT) AS n_b,
       CAST(max(abs(cum_a * n_b - cum_b * n_a)) AS BIGINT) AS d_num,
       CAST(max(abs(cum_a * n_b - cum_b * n_a)) * 1000000
            // greatest(max(n_a) * max(n_b), 1) AS BIGINT) AS ks_ppm,
       CAST(max(abs(cum_a * n_b - cum_b * n_a)) AS HUGEINT)
         * max(abs(cum_a * n_b - cum_b * n_a)) * 10000
         > CAST({KS_C2_005_X1E4} AS HUGEINT)
           * (max(n_a) + max(n_b)) * max(n_a) * max(n_b)
         AS drift_at_005
FROM stepped GROUP BY event_type
"""


# --- ROC AUC of the quality classifier (round 9) -----------------------

# "Curated" sources: the positive class for the classifier-calibration
# audit below (the curated-vs-crawled split every quality-filter
# pipeline validates its scorer against).
AUC_CURATED_SOURCES = ("src0", "src1", "src2", "src3", "src4")


def roc_auc_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC, per language, of the document quality score as a
    classifier for curated-source membership — the calibration audit a
    training pipeline runs before trusting a quality scorer as a
    filter gate ("does the score actually rank curated docs above
    crawled ones, and does that hold per language?").

    AUC is the Mann-Whitney U statistic with the standard tie
    correction, computed INTEGER-exactly at histogram granularity:
    quality quantized once to ppm (the oracle-pinned quality_score
    double, same quantization as quality_quantile_normalize), then
    per (lang, score value) the positive/negative counts; wins =
    sum(pos * negatives-strictly-below), ties = sum(pos * neg) at the
    same value, U2 = 2*wins + ties, and
    auc_ppm = U2 * 500000 div (n_pos * n_neg) — no float anywhere
    past the already-pinned score, so both engines agree bit for bit.

    Scale posture (100 TB): identical to ks_drift_by_event_type — one
    groupBy (lang, q_ppm) collapses the corpus map-side to <= 1e6+1
    distinct score values per language, the cumulative-negatives
    window slides over that bounded histogram (never a per-doc rank),
    and the final rollup rides the same partitioning. Output is one
    row per language. Overflow: U2 <= 2 * n_pos * n_neg per lang and
    auc_ppm's numerator U2 * 5e5 stays in int64 up to
    n_pos * n_neg ~ 9e12 (~3e6 docs per class per lang); past that,
    lift U2 into DECIMAL(38,0)/HUGEINT exactly like the ks_drift
    alpha decision.
    """
    from .textstats import quality_score

    q = quality_score(spark, sf_dir).select(
        "doc_id",
        F.round(F.col("quality") * 1_000_000, 0).cast("long").alias("_qp"),
    ).filter(F.col("_qp").isNotNull())
    meta = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.col("source").isin(*AUC_CURATED_SOURCES).cast("long").alias("_pos"),
    ).filter(
        # scorer-audit membership needs lang AND source defined, and
        # the Spark isin(NULL) -> NULL vs SQL CASE-ELSE-0 asymmetry
        # never fires (NULL-vintage policy)
        F.col("lang").isNotNull() & F.col("source").isNotNull()
    )
    per_val = (
        q.join(meta, "doc_id")
        .groupBy("lang", "_qp")
        .agg(
            F.sum("_pos").alias("_p"),
            F.sum(1 - F.col("_pos")).alias("_n"),
        )
    )
    w_below = (
        Window.partitionBy("lang")
        .orderBy("_qp")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    stepped = per_val.select(
        "lang",
        "_p",
        "_n",
        F.coalesce(F.sum("_n").over(w_below), F.lit(0)).alias("_neg_below"),
    )
    return (
        stepped.groupBy("lang")
        .agg(
            F.sum("_p").alias("n_pos"),
            F.sum("_n").alias("n_neg"),
            F.sum(
                F.col("_p") * (2 * F.col("_neg_below") + F.col("_n"))
            ).alias("u2"),
        )
        .select(
            "lang",
            "n_pos",
            "n_neg",
            "u2",
            F.expr(
                "u2 * 500000 div greatest(n_pos * n_neg, 1)"
            ).alias("auc_ppm"),
        )
    )


def _roc_auc_sql() -> str:
    from .textstats import QUALITY_SQL

    curated = ", ".join(f"'{s}'" for s in AUC_CURATED_SOURCES)
    return f"""
WITH q AS ({QUALITY_SQL}),
qm AS (
  SELECT q.doc_id, d.lang,
         CAST(round(q.quality * 1000000, 0) AS BIGINT) AS _qp,
         CASE WHEN d.source IN ({curated}) THEN 1 ELSE 0 END AS _pos
  FROM q JOIN documents d ON q.doc_id = d.doc_id
  WHERE d.lang IS NOT NULL AND d.source IS NOT NULL
    AND q.quality IS NOT NULL
),
per_val AS (
  SELECT lang, _qp, sum(_pos) AS _p, sum(1 - _pos) AS _n
  FROM qm GROUP BY lang, _qp
),
stepped AS (
  SELECT lang, _p, _n,
         coalesce(sum(_n) OVER (PARTITION BY lang ORDER BY _qp
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS _neg_below
  FROM per_val
)
SELECT lang,
       CAST(sum(_p) AS BIGINT) AS n_pos,
       CAST(sum(_n) AS BIGINT) AS n_neg,
       CAST(sum(_p * (2 * _neg_below + _n)) AS BIGINT) AS u2,
       CAST(sum(_p * (2 * _neg_below + _n)) * 500000
            // greatest(sum(_p) * sum(_n), 1) AS BIGINT) AS auc_ppm
FROM stepped GROUP BY lang
"""


ROC_AUC_SQL = _roc_auc_sql()


# --- CUSUM sequential changepoint scan (round-10 queue) -----------------


def cusum_drift_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential (online-style) changepoint detection per event type:
    the one-sided CUSUM statistics of the value stream in time order —
    where ks_drift_by_event_type compares two FIXED periods, CUSUM
    scans every prefix boundary at once and reports how large the
    worst upward / downward mean shift is and WHEN it peaks (the
    monitoring gate that pages before a scheduled two-sample test
    would run).

    Integer-exact via the prefix-extremum identity: with x_t the
    cents stream and dev_t = n*x_t - tot (deviation from the mean
    scaled by n, so no division anywhere), P_t = cumsum(dev_t),
    S+_t = P_t - min(0, min_{s<=t} P_s) and
    S-_t = max(0, max_{s<=t} P_s) - P_t — the classic recursive
    max(0, S+ + dev) CUSUM unrolled into two windowed extrema.
    Exported: sup S+ (and its first peak timestamp), sup S-, all in
    n-scaled cents (divide by n for cents units); engines agree bit
    for bit because every step is int64 (event ordering is made
    deterministic by the (ts, event_id) tiebreak).

    Scale posture (100 TB): two ordered windows per event_type
    partition — strata scan in parallel; within a type this is the
    same one-ordered-pass caveat as pps_systematic_sample (at extreme
    per-type cardinality you shard the stream by time range, compute
    per-shard (sum, min-prefix, max-prefix) and combine with the
    standard segment-tree prefix algebra — the window form is the
    oracle-exact statement). Overflow: |P_t| <= n * sum|cents|, int64
    to ~3e6 rows per type at cents ~1e5; past that, the same
    DECIMAL(38,0)/HUGEINT lift as the KS alpha decision.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    w_all = Window.partitionBy("event_type")
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    stepped = (
        ev.withColumn("n", F.count("*").over(w_all))
        .withColumn("tot", F.sum("cents").over(w_all))
        .withColumn(
            "p",
            F.col("n") * F.sum("cents").over(w_cum)
            - F.row_number().over(
                Window.partitionBy("event_type").orderBy("ts_us", "event_id")
            )
            * F.col("tot"),
        )
        .withColumn(
            "s_up", F.col("p") - F.least(F.lit(0), F.min("p").over(w_cum))
        )
        .withColumn(
            "s_dn", F.greatest(F.lit(0), F.max("p").over(w_cum)) - F.col("p")
        )
    )
    w_peak = Window.partitionBy("event_type").orderBy(
        F.desc("s_up"), F.asc("ts_us"), F.asc("event_id")
    )
    return (
        stepped.withColumn("_r", F.row_number().over(w_peak))
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.max("s_up").alias("cusum_up_max"),
            F.max(F.when(F.col("_r") == 1, F.col("ts_us"))).alias(
                "peak_ts_us"
            ),
            F.max("s_dn").alias("cusum_down_max"),
        )
    )


CUSUM_DRIFT_SQL = """
WITH ev AS (
  SELECT event_type, event_id, epoch_us(ts) AS ts_us,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events
),
stepped AS (
  SELECT event_type, event_id, ts_us,
         count(*) OVER (PARTITION BY event_type) AS n,
         sum(cents) OVER (PARTITION BY event_type) AS tot,
         sum(cents) OVER (PARTITION BY event_type ORDER BY ts_us, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_x,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts_us, event_id) AS t
  FROM ev
),
paths AS (
  SELECT event_type, ts_us, event_id,
         n * cum_x - t * tot AS p, n
  FROM stepped
),
scans AS (
  SELECT event_type, ts_us, event_id, n, p,
         p - least(0, min(p) OVER (PARTITION BY event_type
                     ORDER BY ts_us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
           AS s_up,
         greatest(0, max(p) OVER (PARTITION BY event_type
                     ORDER BY ts_us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) - p
           AS s_dn
  FROM paths
),
peaks AS (
  SELECT event_type, ts_us, event_id, n, s_up, s_dn,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY s_up DESC, ts_us ASC, event_id ASC)
           AS _r
  FROM scans
)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n,
       CAST(max(s_up) AS BIGINT) AS cusum_up_max,
       CAST(max(CASE WHEN _r = 1 THEN ts_us END) AS BIGINT) AS peak_ts_us,
       CAST(max(s_dn) AS BIGINT) AS cusum_down_max
FROM peaks GROUP BY event_type
"""


# --- NDCG@k of the quality ranking (round-11 queue) ---------------------

NDCG_K = 10
# log2 discounts quantized ONCE at module load: disc_micro[r] =
# round(1e6 / log2(r+1)) — compile-time Python constants embedded as
# literals in BOTH engines' plans, so no runtime transcendental at all
# (the bm25 idf3 idiom taken to its limit: k is tiny, precompute).
_NDCG_DISC_MICRO = [
    round(1_000_000 / __import__("math").log2(r + 1))
    for r in range(1, NDCG_K + 1)
]
_NDCG_IDCG_MICRO = [0]
for _d in _NDCG_DISC_MICRO:
    _NDCG_IDCG_MICRO.append(_NDCG_IDCG_MICRO[-1] + _d)


def ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10, per language, of the quality-score ranking against
    curated-source membership as the relevance label — the ranking-
    quality twin of roc_auc_by_lang: AUC asks "does the score order
    the classes", NDCG asks "are the relevant docs at the TOP of the
    ranking", which is what a filter gate that keeps only the best
    slice actually needs.

    Integer-exact end to end: ranking order is (quality ppm DESC,
    doc_id ASC) — already-pinned score, integer compares; the log2
    position discounts are module-load-time constants embedded as
    micro-unit literals in both plans (no runtime log anywhere);
    DCG = sum(gain * disc[rank]) over the top k; IDCG comes from the
    literal prefix-sum table indexed by least(n_pos, k); and
    ndcg_ppm = dcg * 1e6 div idcg.

    Scale posture (100 TB): the only per-doc window is the bounded
    top-k, which plans as WindowGroupLimit (map-side per-partition
    top-k BEFORE the lang exchange — the domain_cap_survivors
    invariant); n_pos rides a separate window-FREE rollup straight
    off the metadata scan, and the two per-lang aggregates join on
    the tiny lang key. Output is one row per language.
    """
    from pyspark.sql import Window

    from .textstats import quality_score

    disc = F.array(*[F.lit(d) for d in _NDCG_DISC_MICRO])
    idcg_tab = F.array(*[F.lit(v) for v in _NDCG_IDCG_MICRO])

    q = quality_score(spark, sf_dir).select(
        "doc_id",
        F.round(F.col("quality") * 1_000_000, 0).cast("long").alias("_qp"),
    )
    meta = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.col("source").isin(*AUC_CURATED_SOURCES).cast("long").alias("_g"),
    )
    pos_totals = meta.groupBy("lang").agg(F.sum("_g").alias("n_pos"))
    w = Window.partitionBy("lang").orderBy(F.desc("_qp"), F.asc("doc_id"))
    topk = (
        meta.join(q, "doc_id")
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= NDCG_K)
    )
    dcg = topk.groupBy("lang").agg(
        F.sum(F.col("_g") * F.element_at(disc, F.col("_r"))).alias(
            "dcg_micro"
        )
    )
    return pos_totals.join(dcg, "lang").select(
        "lang",
        "n_pos",
        "dcg_micro",
        F.element_at(
            idcg_tab, F.least(F.col("n_pos"), F.lit(NDCG_K)).cast("int") + 1
        ).alias("idcg_micro"),
        F.expr(
            "dcg_micro * 1000000 div greatest(element_at("
            f"array({', '.join(str(v) for v in _NDCG_IDCG_MICRO)}), "
            f"CAST(least(n_pos, {NDCG_K}) AS INT) + 1), 1)"
        ).alias("ndcg_ppm"),
    )


def _ndcg_sql() -> str:
    from .textstats import QUALITY_SQL

    curated = ", ".join(f"'{s}'" for s in AUC_CURATED_SOURCES)
    disc = ", ".join(str(d) for d in _NDCG_DISC_MICRO)
    idcg = ", ".join(str(v) for v in _NDCG_IDCG_MICRO)
    return f"""
WITH q AS ({QUALITY_SQL}),
meta AS (
  SELECT d.doc_id, d.lang,
         CASE WHEN d.source IN ({curated}) THEN 1 ELSE 0 END AS _g,
         CAST(round(q.quality * 1000000, 0) AS BIGINT) AS _qp
  FROM documents d JOIN q ON d.doc_id = q.doc_id
),
pos_totals AS (
  SELECT lang, CAST(sum(_g) AS BIGINT) AS n_pos FROM meta GROUP BY lang
),
ranked AS (
  SELECT lang, _g,
         row_number() OVER (PARTITION BY lang
                            ORDER BY _qp DESC, doc_id ASC) AS _r
  FROM meta
),
dcg AS (
  SELECT lang, CAST(sum(_g * ([{disc}])[_r]) AS BIGINT) AS dcg_micro
  FROM ranked WHERE _r <= {NDCG_K} GROUP BY lang
)
SELECT p.lang, p.n_pos, d.dcg_micro,
       CAST(([{idcg}])[CAST(least(p.n_pos, {NDCG_K}) AS INT) + 1]
            AS BIGINT) AS idcg_micro,
       CAST(d.dcg_micro * 1000000
            // greatest(([{idcg}])[CAST(least(p.n_pos, {NDCG_K}) AS INT)
                                   + 1], 1) AS BIGINT) AS ndcg_ppm
FROM pos_totals p JOIN dcg d ON p.lang = d.lang
"""


NDCG_AT_K_SQL = _ndcg_sql()


# --- expected calibration error of the quality score (round-11 queue) ---

ECE_BINS = 10


def quality_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected Calibration Error, per language, of the quality score
    read as a probability of curated-source membership — the third leg
    of the scorer-audit tripod: roc_auc_by_lang asks "does the score
    ORDER the classes", ndcg_at_k asks "are the relevant docs at the
    TOP", ECE asks "is the score's VALUE honest" (a doc scored 0.8
    should be curated ~80% of the time), which is what you need before
    using the raw score as a sampling weight or a threshold picked on
    one corpus and applied to another.

    Standard 10-equal-width-bin ECE, computed INTEGER-exactly: quality
    quantized once to ppm (the oracle-pinned quality_score double, the
    roc_auc quantization), bin = least(_qp div 100000, 9); per
    (lang, bin) the doc count, positive count, and ppm sum; then
    n_b * |acc_b - conf_b| telescopes to |pos_b * 1e6 - sum_qp_b| so
    ece_ppm = sum_b |pos_b * 1e6 - sum_qp_b| div n — no float anywhere
    past the already-pinned score. max_bin_gap_ppm (the worst single
    bin, the reliability-diagram sup) rides the same aggregates.

    Scale posture (100 TB): one groupBy (lang, bin) collapses the
    corpus map-side to <= 10 rows per language (partial aggs do the
    heavy lifting before the exchange); the per-lang rollup rides the
    same tiny frame. No window, no join wider than doc_id-to-doc_id
    metadata. Output is one row per language. Overflow: sum_qp_b and
    pos_b * 1e6 are both <= n_b * 1e6, so the gap sum stays in int64
    up to ~9.2e12 docs per language.
    """
    from .textstats import quality_score

    q = quality_score(spark, sf_dir).select(
        "doc_id",
        F.round(F.col("quality") * 1_000_000, 0).cast("long").alias("_qp"),
    )
    meta = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.col("source").isin(*AUC_CURATED_SOURCES).cast("long").alias("_pos"),
    )
    per_bin = (
        q.join(meta, "doc_id")
        .select(
            "lang",
            "_pos",
            "_qp",
            F.expr(f"least(_qp div 100000, {ECE_BINS - 1})").alias("_bin"),
        )
        .groupBy("lang", "_bin")
        .agg(
            F.count(F.lit(1)).alias("_nb"),
            F.sum("_pos").alias("_pb"),
            F.sum("_qp").alias("_qb"),
        )
    )
    return (
        per_bin.groupBy("lang")
        .agg(
            F.sum("_nb").alias("n"),
            F.count(F.lit(1)).alias("n_bins"),
            F.sum(F.abs(F.col("_pb") * 1_000_000 - F.col("_qb"))).alias(
                "_gap"
            ),
            F.max(
                F.expr("abs(_pb * 1000000 - _qb) div _nb")
            ).alias("max_bin_gap_ppm"),
        )
        .select(
            "lang",
            "n",
            "n_bins",
            F.expr("_gap div n").alias("ece_ppm"),
            "max_bin_gap_ppm",
        )
    )


def _ece_sql() -> str:
    from .textstats import QUALITY_SQL

    curated = ", ".join(f"'{s}'" for s in AUC_CURATED_SOURCES)
    return f"""
WITH q AS ({QUALITY_SQL}),
qm AS (
  SELECT d.lang,
         CASE WHEN d.source IN ({curated}) THEN 1 ELSE 0 END AS _pos,
         CAST(round(q.quality * 1000000, 0) AS BIGINT) AS _qp
  FROM q JOIN documents d ON q.doc_id = d.doc_id
),
per_bin AS (
  SELECT lang, least(_qp // 100000, {ECE_BINS - 1}) AS _bin,
         CAST(count(*) AS BIGINT) AS _nb,
         CAST(sum(_pos) AS BIGINT) AS _pb,
         CAST(sum(_qp) AS BIGINT) AS _qb
  FROM qm GROUP BY lang, least(_qp // 100000, {ECE_BINS - 1})
)
SELECT lang,
       CAST(sum(_nb) AS BIGINT) AS n,
       CAST(count(*) AS BIGINT) AS n_bins,
       CAST(sum(abs(_pb * 1000000 - _qb)) // sum(_nb) AS BIGINT) AS ece_ppm,
       CAST(max(abs(_pb * 1000000 - _qb) // _nb) AS BIGINT)
         AS max_bin_gap_ppm
FROM per_bin GROUP BY lang
"""


QUALITY_CALIBRATION_ECE_SQL = _ece_sql()


# --- Mann-Whitney rank drift between epochs (round-12 queue) ------------

# z(0.025)^2 = 1.959964^2 = 3.8415, pre-scaled for the integer decision
# 2000 * n(n-1) * (u_x2 - na*nb)^2  >  2561 * na*nb * ((n+1)n(n-1) - T)
# (= 3e4 vs 38415 reduced by gcd 15), all in DECIMAL(38,0)/HUGEINT.
MWU_Z2_005_NUM = 2561
MWU_Z2_005_DEN = 2000


def _mwu_rolled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared per-type MWU scaffold: tie-averaged doubled rank sums
    off the (event_type, cents) value histogram. Returns one row per
    event type with n_a, n_b, _ra_x2 (doubled rank-sum of epoch A)
    and _t (the tie-correction sum of c^3 - c, DECIMAL(38,0)).
    mann_whitney_drift and bh_fdr_drift_control both ride this —
    identical exchanges, identical integer contract."""
    mid = F.lit(KS_SPLIT).cast("timestamp")
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        (F.col("ts") >= mid).cast("long").alias("is_b"),
    )
    # NULL value is not a measurement (NULL-vintage policy): without
    # the filter the NULL-cents histogram row rides the cumulative
    # window, whose NULL ordering differs across engines (Spark
    # NULLS FIRST, DuckDB NULLS LAST)
    ev = ev.filter(F.col("cents").isNotNull())
    per_val = ev.groupBy("event_type", "cents").agg(
        F.sum(1 - F.col("is_b")).alias("da"),
        F.sum("is_b").alias("db"),
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    stepped = per_val.select(
        "event_type",
        "da",
        "db",
        (F.col("da") + F.col("db")).alias("_c"),
        F.coalesce(
            F.sum(F.col("da") + F.col("db")).over(w_cum), F.lit(0)
        ).alias("_m"),
    )
    return stepped.groupBy("event_type").agg(
        F.sum("da").alias("n_a"),
        F.sum("db").alias("n_b"),
        F.sum(F.col("da") * (2 * F.col("_m") + F.col("_c") + 1)).alias(
            "_ra_x2"
        ),
        F.sum(
            F.expr("CAST(_c AS DECIMAL(38,0)) * _c * _c - _c")
        ).alias("_t"),
    )


def mann_whitney_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney / Wilcoxon rank-sum drift between the two epochs,
    per event type — the rank-based member of the drift family (KS:
    sup of CDF gap; chi-square: binned frequencies; CUSUM: sequential
    scan; MWU: "did the VALUES stochastically shift up or down"),
    robust to the heavy-tailed outliers that dominate a mean test.

    INTEGER-exact with the standard tie handling: values quantized to
    cents, per-(event_type, cents) counts da/db, and tie-averaged
    DOUBLED ranks from the histogram (a tie group of size c after m
    predecessors contributes 2m + c + 1 per member — the mid-rank x2,
    an integer). Then u_a_x2 = sum(da * (2m+c+1)) - n_a*(n_a+1) is
    twice the U statistic, cles_ppm = u_a_x2 * 5e5 div (n_a*n_b) the
    common-language effect size (P(A>B) + half-ties; 500000 = no
    shift), and the alpha=0.05 two-sided normal-approximation
    decision with the tie-corrected variance runs as one integer
    comparison: 2000*n(n-1)*(u_a_x2 - n_a*n_b)^2 >
    2561*n_a*n_b*((n+1)n(n-1) - T), T = sum(c^3 - c) — evaluated in
    DECIMAL(38,0)/HUGEINT on both engines (the ks_drift alpha-decision
    idiom). Exactness bound: the LHS needs ~2e3*n^6 <= 1e38, i.e.
    n <= ~7e5 rows per event type; past that, pre-aggregate epochs to
    a coarser value grid or shard the comparison — the U statistic
    itself (int64 to n_a*n_b ~ 4.6e18) survives far longer.

    Scale posture (100 TB): the ks_drift shape — one groupBy
    (event_type, cents) collapses the stream map-side to the value
    histogram, the cumulative window slides over distinct cents only
    (never a per-row rank), and the rollup rides the same
    partitioning. Output is one row per event type.
    """
    rolled = _mwu_rolled(spark, sf_dir)
    return rolled.select(
        "event_type",
        "n_a",
        "n_b",
        (F.col("_ra_x2") - F.col("n_a") * (F.col("n_a") + 1)).alias(
            "u_a_x2"
        ),
        F.expr(
            "(_ra_x2 - n_a * (n_a + 1)) * 500000"
            " div greatest(n_a * n_b, 1)"
        ).alias("cles_ppm"),
        F.expr(
            f"{MWU_Z2_005_DEN} * (CAST(n_a AS DECIMAL(38,0)) + n_b)"
            " * (n_a + n_b - 1)"
            " * (CAST(_ra_x2 - n_a * (n_a + 1) - n_a * n_b"
            "    AS DECIMAL(38,0)))"
            " * (_ra_x2 - n_a * (n_a + 1) - n_a * n_b)"
            f" > {MWU_Z2_005_NUM} * CAST(n_a AS DECIMAL(38,0)) * n_b"
            " * ((CAST(n_a AS DECIMAL(38,0)) + n_b + 1)"
            "    * (n_a + n_b) * (n_a + n_b - 1) - _t)"
        ).alias("drift_at_005"),
    )


MANN_WHITNEY_SQL = f"""
WITH ev AS (
  SELECT event_type,
         CAST(round(value * 100, 0) AS BIGINT) AS cents,
         CASE WHEN ts >= TIMESTAMP '{KS_SPLIT}' THEN 1 ELSE 0 END AS is_b
  FROM events
  WHERE value IS NOT NULL
),
per_val AS (
  SELECT event_type, cents,
         CAST(sum(1 - is_b) AS BIGINT) AS da,
         CAST(sum(is_b) AS BIGINT) AS db
  FROM ev GROUP BY event_type, cents
),
stepped AS (
  SELECT event_type, da, db, da + db AS _c,
         coalesce(sum(da + db) OVER (PARTITION BY event_type ORDER BY cents
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS _m
  FROM per_val
),
rolled AS (
  SELECT event_type,
         CAST(sum(da) AS BIGINT) AS n_a,
         CAST(sum(db) AS BIGINT) AS n_b,
         CAST(sum(da * (2 * _m + _c + 1)) AS BIGINT) AS _ra_x2,
         CAST(sum(CAST(_c AS HUGEINT) * _c * _c - _c) AS HUGEINT) AS _t
  FROM stepped GROUP BY event_type
)
SELECT event_type, n_a, n_b,
       _ra_x2 - n_a * (n_a + 1) AS u_a_x2,
       CAST((_ra_x2 - n_a * (n_a + 1)) * 500000
            // greatest(n_a * n_b, 1) AS BIGINT) AS cles_ppm,
       {MWU_Z2_005_DEN} * (CAST(n_a AS HUGEINT) + n_b) * (n_a + n_b - 1)
         * CAST(_ra_x2 - n_a * (n_a + 1) - n_a * n_b AS HUGEINT)
         * (_ra_x2 - n_a * (n_a + 1) - n_a * n_b)
       > {MWU_Z2_005_NUM} * CAST(n_a AS HUGEINT) * n_b
         * ((CAST(n_a AS HUGEINT) + n_b + 1) * (n_a + n_b)
            * (n_a + n_b - 1) - _t)
         AS drift_at_005
FROM rolled
"""


# --- Spearman rank correlation: quality vs length (round-12 queue) ------


def spearman_quality_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation, per language, between the quality
    score and document length — the monotone-association audit behind
    every "filter by quality" gate: if quality is mostly a length
    proxy (rho -> 1), a quality threshold silently becomes a length
    threshold and the filtered corpus skews long. Rank-based, so it
    sees through the score's nonlinearities where Pearson would not.

    Tie-averaged DOUBLED mid-ranks keep the sums integer (the
    mann_whitney idiom): rank maps are built per DISTINCT value from
    the marginal histograms (2m + c + 1 per tie group), then applied
    to the JOINT (quality, length) histogram — every aggregate is
    over value cells, never documents, and cell counts weight the
    sums. num = n*Sxy - Sx*Sy and the two variance legs d1, d2 run in
    DECIMAL(38,0)/HUGEINT (exact to n ~ 1e9 docs per language); the
    single final division is float64: rho_ppm = floor(1e6 * num /
    (sqrt(d1) * sqrt(d2))), clamped to [-1e6, 1e6] (at rho = +/-1 the
    sqrt product can undershoot d by an ulp and push the quotient a
    hair past 1). The decision path is engine-identical,
    not exact-at-the-boundary: num/d1/d2 are bit-equal integers on
    both engines, int->double conversion is exact below 2^53 (d =
    4n^3 stays under it only to n ~ 1.3e5 docs per language) and
    IEEE correctly-rounded beyond — the contract never needs the
    exact window, only that both engines perform the SAME
    correctly-rounded conversion; sqrt/mul/div are correctly rounded —
    identical inputs give identical doubles, hence identical floors
    (the ks_drift ADVICE wording, applied honestly from the start).
    NULL when either marginal is constant (rho undefined).

    Scale posture (100 TB): three histogram groupBys (joint + two
    marginals), a cumulative window over each marginal's DISTINCT
    values, two cell-to-marginal equi-joins keyed (lang, value), and
    a one-row-per-lang rollup. Nothing ranks, sorts, or shuffles
    per document.
    """
    from .textstats import quality_score

    q = quality_score(spark, sf_dir).select(
        "doc_id",
        F.round(F.col("quality") * 1_000_000, 0).cast("long").alias("_qp"),
    )
    meta = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").alias("_nc")
    )
    # (r13: caching this joint histogram was A/B'd and rejected — it
    # is nearly one row per doc at ppm granularity, so the
    # materialization cost matched the recompute saved.)
    joint = (
        q.join(meta, "doc_id")
        .groupBy("lang", "_qp", "_nc")
        .agg(F.count(F.lit(1)).alias("_cj"))
    )

    def _rank_map(df: DataFrame, col: str, out: str) -> DataFrame:
        marg = df.groupBy("lang", col).agg(F.sum("_cj").alias("_c"))
        w_cum = (
            Window.partitionBy("lang")
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return marg.select(
            "lang",
            col,
            (
                2 * F.coalesce(F.sum("_c").over(w_cum), F.lit(0))
                + F.col("_c")
                + 1
            ).alias(out),
        )

    cells = joint.join(_rank_map(joint, "_qp", "_rx2"), ["lang", "_qp"]).join(
        _rank_map(joint, "_nc", "_ry2"), ["lang", "_nc"]
    )
    rolled = cells.groupBy("lang").agg(
        F.sum("_cj").alias("n"),
        F.sum(F.expr("CAST(_cj AS DECIMAL(38,0)) * _rx2")).alias("_sx"),
        F.sum(F.expr("CAST(_cj AS DECIMAL(38,0)) * _ry2")).alias("_sy"),
        F.sum(
            F.expr("CAST(_cj AS DECIMAL(38,0)) * _rx2 * _ry2")
        ).alias("_sxy"),
        F.sum(
            F.expr("CAST(_cj AS DECIMAL(38,0)) * _rx2 * _rx2")
        ).alias("_sx2"),
        F.sum(
            F.expr("CAST(_cj AS DECIMAL(38,0)) * _ry2 * _ry2")
        ).alias("_sy2"),
    )
    return rolled.select(
        "lang",
        "n",
        F.expr(
            "CAST(CASE WHEN (n * _sx2 - _sx * _sx) > 0"
            " AND (n * _sy2 - _sy * _sy) > 0 THEN"
            " GREATEST(-1000000, LEAST(1000000,"
            " FLOOR(1000000.0 * CAST(n * _sxy - _sx * _sy AS DOUBLE)"
            " / (SQRT(CAST(n * _sx2 - _sx * _sx AS DOUBLE))"
            " * SQRT(CAST(n * _sy2 - _sy * _sy AS DOUBLE))))))"
            " END AS BIGINT)"
        ).alias("rho_ppm"),
    )


def _spearman_sql() -> str:
    from .textstats import QUALITY_SQL

    return f"""
WITH q AS ({QUALITY_SQL}),
base AS (
  SELECT d.lang,
         CAST(round(q.quality * 1000000, 0) AS BIGINT) AS _qp,
         d.n_chars AS _nc
  FROM q JOIN documents d ON q.doc_id = d.doc_id
),
joint AS (
  SELECT lang, _qp, _nc, CAST(count(*) AS BIGINT) AS _cj
  FROM base GROUP BY lang, _qp, _nc
),
xmarg AS (
  SELECT lang, _qp, CAST(sum(_cj) AS BIGINT) AS _c FROM joint
  GROUP BY lang, _qp
),
xmap AS (
  SELECT lang, _qp,
         2 * coalesce(sum(_c) OVER (PARTITION BY lang ORDER BY _qp
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + _c + 1 AS _rx2
  FROM xmarg
),
ymarg AS (
  SELECT lang, _nc, CAST(sum(_cj) AS BIGINT) AS _c FROM joint
  GROUP BY lang, _nc
),
ymap AS (
  SELECT lang, _nc,
         2 * coalesce(sum(_c) OVER (PARTITION BY lang ORDER BY _nc
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + _c + 1 AS _ry2
  FROM ymarg
),
cells AS (
  SELECT j.lang, j._cj, x._rx2, y._ry2
  FROM joint j
  JOIN xmap x ON j.lang = x.lang AND j._qp = x._qp
  JOIN ymap y ON j.lang = y.lang AND j._nc = y._nc
),
rolled AS (
  SELECT lang,
         CAST(sum(_cj) AS BIGINT) AS n,
         CAST(sum(CAST(_cj AS HUGEINT) * _rx2) AS HUGEINT) AS _sx,
         CAST(sum(CAST(_cj AS HUGEINT) * _ry2) AS HUGEINT) AS _sy,
         CAST(sum(CAST(_cj AS HUGEINT) * _rx2 * _ry2) AS HUGEINT) AS _sxy,
         CAST(sum(CAST(_cj AS HUGEINT) * _rx2 * _rx2) AS HUGEINT) AS _sx2,
         CAST(sum(CAST(_cj AS HUGEINT) * _ry2 * _ry2) AS HUGEINT) AS _sy2
  FROM cells GROUP BY lang
)
SELECT lang, n,
       CAST(CASE WHEN (n * _sx2 - _sx * _sx) > 0
                  AND (n * _sy2 - _sy * _sy) > 0 THEN
              GREATEST(-1000000, LEAST(1000000,
                FLOOR(1000000.0 * CAST(n * _sxy - _sx * _sy AS DOUBLE)
                  / (SQRT(CAST(n * _sx2 - _sx * _sx AS DOUBLE))
                     * SQRT(CAST(n * _sy2 - _sy * _sy AS DOUBLE))))))
            END AS BIGINT) AS rho_ppm
FROM rolled
"""


SPEARMAN_QUALITY_LENGTH_SQL = _spearman_sql()


# --- robust quality outliers via median/MAD (round-13 queue) ------------

# Iglewicz-Hoaglin modified z-score: 0.6745*(x-med)/MAD > 3.5, cleared
# of floats as |x-med| * 1349 > 7000 * MAD (x2000 both sides of
# 0.6745/3.5, reduced by gcd 10).
MAD_Z_NUM = 1349
MAD_Z_DEN = 7000


def quality_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier census of the quality score, per language, via
    median + MAD (median absolute deviation) — the outlier gate that
    still works when the score distribution is skewed or already
    contaminated: mean/stddev move with the outliers they are
    supposed to find, the median/MAD pair does not (50% breakdown).
    Flags the Iglewicz-Hoaglin modified z-score |0.6745*(x-med)/MAD|
    > 3.5, cleared to the pure-integer |x-med|*1349 > 7000*MAD.

    INTEGER-exact at histogram granularity: quality quantized once to
    ppm, per-(lang, value) counts; the LOWER median (type-1 quantile:
    smallest value whose cumulative count reaches ceil(n/2), i.e.
    2*cum >= n) read off the cumulative window — an exact, engine-
    agreed pick, no interpolation; deviations re-histogrammed (two
    values can share one deviation) and MAD read off the same
    machinery; the outlier count folds over the value histogram.

    Scale posture (100 TB): three histogram groupBys (two of them
    per-lang tiny), two cumulative windows over DISTINCT values only,
    and per-lang broadcast-sized joins of the medians back onto the
    histograms. Nothing ranks or sorts per document.
    """
    from .textstats import quality_score

    q = quality_score(spark, sf_dir).select(
        "doc_id",
        F.round(F.col("quality") * 1_000_000, 0).cast("long").alias("_qp"),
    )
    meta = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    # cached: the (lang, value) histogram feeds the median pick, the
    # deviation re-histogram, AND the outlier fold; uncached, the
    # quality-scoring join re-ran per reference (r13). Guide §5.
    hist = (
        q.join(meta, "doc_id")
        .groupBy("lang", "_qp")
        .agg(F.count(F.lit(1)).alias("_c"))
        .transform(stage)
    )

    def _lower_median(h: DataFrame, val: str) -> DataFrame:
        w_cum = (
            Window.partitionBy("lang")
            .orderBy(val)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        w_all = Window.partitionBy("lang")
        return (
            h.select(
                "lang",
                F.col(val).alias("_v"),
                F.sum("_c").over(w_cum).alias("_cum"),
                F.sum("_c").over(w_all).alias("_n"),
            )
            .filter(2 * F.col("_cum") >= F.col("_n"))
            .groupBy("lang")
            .agg(F.min("_v").alias("_med"), F.max("_n").alias("n"))
        )

    med = _lower_median(hist, "_qp")
    dev_hist = (
        hist.join(med.select("lang", "_med"), "lang")
        .select(
            "lang",
            F.abs(F.col("_qp") - F.col("_med")).alias("_dev"),
            "_c",
        )
        .groupBy("lang", "_dev")
        .agg(F.sum("_c").alias("_c"))
    )
    mad = _lower_median(dev_hist, "_dev").select(
        "lang", F.col("_med").alias("_mad")
    )
    flagged = (
        hist.join(med.select("lang", "_med"), "lang")
        .join(mad, "lang")
        .groupBy("lang")
        .agg(
            F.max("_med").alias("median_ppm"),
            F.max("_mad").alias("mad_ppm"),
            F.sum(
                F.when(
                    F.abs(F.col("_qp") - F.col("_med")) * MAD_Z_NUM
                    > MAD_Z_DEN * F.col("_mad"),
                    F.col("_c"),
                ).otherwise(0)
            ).alias("n_outliers"),
            F.sum("_c").alias("n"),
        )
    )
    return flagged.select(
        "lang",
        "n",
        "median_ppm",
        "mad_ppm",
        "n_outliers",
        F.expr("n_outliers * 1000000 div n").alias("outlier_ppm"),
    )


QUALITY_MAD_OUTLIERS_SQL = """
WITH q AS ({quality}),
hist AS (
  SELECT d.lang, CAST(round(q.quality * 1000000, 0) AS BIGINT) AS _qp,
         CAST(count(*) AS BIGINT) AS _c
  FROM q JOIN documents d ON q.doc_id = d.doc_id
  GROUP BY d.lang, CAST(round(q.quality * 1000000, 0) AS BIGINT)
),
medstep AS (
  SELECT lang, _qp AS _v,
         sum(_c) OVER (PARTITION BY lang ORDER BY _qp
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _cum,
         sum(_c) OVER (PARTITION BY lang) AS _n
  FROM hist
),
med AS (
  SELECT lang, CAST(min(_v) AS BIGINT) AS _med,
         CAST(max(_n) AS BIGINT) AS n
  FROM medstep WHERE 2 * _cum >= _n GROUP BY lang
),
dev_hist AS (
  SELECT h.lang, abs(h._qp - m._med) AS _dev,
         CAST(sum(h._c) AS BIGINT) AS _c
  FROM hist h JOIN med m ON h.lang = m.lang
  GROUP BY h.lang, abs(h._qp - m._med)
),
madstep AS (
  SELECT lang, _dev AS _v,
         sum(_c) OVER (PARTITION BY lang ORDER BY _dev
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _cum,
         sum(_c) OVER (PARTITION BY lang) AS _n
  FROM dev_hist
),
mad AS (
  SELECT lang, CAST(min(_v) AS BIGINT) AS _mad
  FROM madstep WHERE 2 * _cum >= _n GROUP BY lang
)
SELECT h.lang,
       CAST(max(m.n) AS BIGINT) AS n,
       CAST(max(m._med) AS BIGINT) AS median_ppm,
       CAST(max(d._mad) AS BIGINT) AS mad_ppm,
       CAST(sum(CASE WHEN abs(h._qp - m._med) * {z_num}
                        > {z_den} * d._mad
                     THEN h._c ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST(sum(CASE WHEN abs(h._qp - m._med) * {z_num}
                        > {z_den} * d._mad
                     THEN h._c ELSE 0 END) * 1000000
            // greatest(max(m.n), 1) AS BIGINT) AS outlier_ppm
FROM hist h
JOIN med m ON h.lang = m.lang
JOIN mad d ON h.lang = d.lang
GROUP BY h.lang
"""


def _mad_sql() -> str:
    from .textstats import QUALITY_SQL

    return QUALITY_MAD_OUTLIERS_SQL.format(
        quality=QUALITY_SQL, z_num=MAD_Z_NUM, z_den=MAD_Z_DEN
    )


QUALITY_MAD_SQL = _mad_sql()


# --- deterministic multiplier-bootstrap CI (round-14 queue) --------------

BOOT_B = 64           # replicates
BOOT_LO_IDX = 4       # 1-based index into the sorted replicate means (~p5)
BOOT_HI_IDX = 61      # ~p95
# affine hash family for the replicate weights: w_b(k) =
# 2 * (((A*(k % MOD) + B*(b+1)) % MOD) % 2) — a frozen literal family
# (the MINHASH_PERMS discipline) shared verbatim by both engines.
BOOT_A = 1203077157
BOOT_B_STEP = 869531133


def bootstrap_ci_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncertainty quantification for an aggregate: a deterministic
    multiplier bootstrap of the mean order value per priority class —
    the error bar a metrics pipeline should publish next to every
    mean, and the class of statistic (resampling-based CI) the rest
    of the registry doesn't cover. Each of the 64 replicates
    reweights rows with w in {0, 2} (mean 1, variance 1 — the
    half-sample multiplier scheme); the CI is the [~p5, ~p95] span of
    the replicate means.

    Deterministic by construction: the weights come from the frozen
    affine hash family (never a PRNG), so both engines build the SAME
    64 resamples, every replicate mean is an int64 cents floor-
    division, and the CI picks are fixed 1-based indexes (4 and 61)
    into the SORTED 64-element replicate array — integer exact, no
    percentile interpolation anywhere.

    Scale posture (100 TB): ONE scan, no explode — all 64 replicate
    (sum w*x, sum w) pairs are columns of a single hash aggregate
    with map-side partials (the fact never multiplies by B), and the
    sort at the end is over a 64-element array per group. Overflow:
    sum(w*cents) <= 2 * total cents per group, int64 to ~4.6e18
    cents (~10^16 USD) per priority class. The hash input folds k
    through % MOD first, so A*(k%MOD) stays under 2^61 for ANY key
    width.
    """
    from ..functions.hashing import HASH_MOD

    # spread=True: the 64-replicate map-side aggregate is the
    # CPU-heavy part and the single-row-group test scan would
    # otherwise run it on one core (r13; the "cheap scan, expensive
    # map" case the flag exists for)
    o = load_table(spark, sf_dir, "orders", spread=True).select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("_c"),
        # _h hoists the replicate-independent product (A * k) % MOD
        # out of the 64 per-replicate weight expressions (r13): each
        # weight is now one add + two mods per row instead of also a
        # ~2^61 multiply. (A*k + off) % MOD == ((A*k) % MOD + off)
        # % MOD since 0 <= off < MOD, so every weight is unchanged.
        F.expr(f"({BOOT_A} * (o_orderkey % {HASH_MOD})) % {HASH_MOD}")
        .alias("_h"),
    )
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("_c").alias("_s"),
    ]
    for b in range(BOOT_B):
        # per-replica offset precomputed in Python: a b-scaled literal
        # product would constant-fold in INT32 and overflow both engines
        off = (BOOT_B_STEP * (b + 1)) % HASH_MOD
        w = f"2 * (((_h + {off}) % {HASH_MOD}) % 2)"
        aggs.append(F.expr(f"sum(({w}) * _c)").alias(f"_wx{b}"))
        aggs.append(F.expr(f"sum({w})").alias(f"_w{b}"))
    rolled = o.groupBy("o_orderpriority").agg(*aggs)
    means = F.array_sort(
        F.array(
            *[
                F.expr(f"_wx{b} div greatest(_w{b}, 1)")
                for b in range(BOOT_B)
            ]
        )
    )
    return rolled.select(
        "o_orderpriority",
        "n",
        F.expr("_s div n").alias("mean_cents"),
        F.element_at(means, BOOT_LO_IDX).alias("ci_lo_cents"),
        F.element_at(means, BOOT_HI_IDX).alias("ci_hi_cents"),
    )


def _bootstrap_sql() -> str:
    from ..functions.hashing import HASH_MOD as MOD

    wx_terms = []
    w_terms = []
    for b in range(BOOT_B):
        off = (BOOT_B_STEP * (b + 1)) % MOD
        w = f"2 * ((({BOOT_A} * _k + {off}) % {MOD}) % 2)"
        wx_terms.append(f"CAST(sum(({w}) * _c) AS BIGINT) AS _wx{b}")
        w_terms.append(f"CAST(sum({w}) AS BIGINT) AS _w{b}")
    mean_list = ", ".join(
        f"_wx{b} // greatest(_w{b}, 1)" for b in range(BOOT_B)
    )
    return f"""
WITH o AS (
  SELECT o_orderpriority,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS _c,
         o_orderkey % {MOD} AS _k
  FROM orders
),
rolled AS (
  SELECT o_orderpriority,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(_c) AS BIGINT) AS _s,
         {", ".join(wx_terms)},
         {", ".join(w_terms)}
  FROM o GROUP BY o_orderpriority
)
SELECT o_orderpriority, n,
       _s // n AS mean_cents,
       list_sort([{mean_list}])[{BOOT_LO_IDX}] AS ci_lo_cents,
       list_sort([{mean_list}])[{BOOT_HI_IDX}] AS ci_hi_cents
FROM rolled
"""


BOOTSTRAP_CI_SQL = _bootstrap_sql()


# --- CUPED variance-reduced A/B readout (round-14 queue) ----------------

# deterministic variant assignment: (A*(u % MOD) + B) % MOD % 2 —
# perms[2] of the frozen MinHash family, disjoint from the bootstrap
# weight family so the two ops can't correlate by construction.
CUPED_A = 941894042
CUPED_B = 796979479


def cuped_ab_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout — the experimentation-
    analytics class: users are deterministically hash-split into two
    variants, the post-period per-user revenue is the metric, and the
    pre-period revenue is the CUPED covariate
    (y_adj = y - theta*(x - x_pool), theta = cov(x,y)/var(x) pooled) —
    the standard trick that removes the between-user variance a raw
    A/B mean comparison wastes power on.

    Everything up to the last step is exact: per-user pre/post cents
    sums, pooled n/Sx/Sy and the cross moments Sxy/Sx2 in
    DECIMAL(38,0)/HUGEINT, per-variant n/Sx/Sy in int64. theta and
    the adjusted means are float64 with a FIXED operation order
    (division -> subtraction -> multiplication -> floor to milli),
    so both engines round identically at every step (the
    spearman_quality_length contract: engine-identical, exact-integer
    operands below 2^53 — ~9e12 cents of revenue — convert exactly).
    NULL theta when the pre-period is constant (var(x) = 0).

    Scale posture (100 TB): one groupBy(user) with map-side partials
    collapses the event stream to per-user rows; the pooled moments
    are a 1-row aggregate broadcast back over the TWO-row per-variant
    frame. Nothing joins or windows per event.
    """
    from ..functions.hashing import HASH_MOD

    mid = F.lit(KS_SPLIT).cast("timestamp")
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("_c"),
        (F.col("ts") >= mid).cast("long").alias("_post"),
    )
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.col("_c") * (1 - F.col("_post"))).alias("_x"),
        F.sum(F.col("_c") * F.col("_post")).alias("_y"),
    ).select(
        F.expr(
            f"(({CUPED_A} * (user_id % {HASH_MOD}) + {CUPED_B})"
            f" % {HASH_MOD}) % 2"
        ).alias("variant"),
        "_x",
        "_y",
    )
    pooled = per_user.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.expr("CAST(_x AS DECIMAL(38,0)) * _y")).alias("_sxy"),
        F.sum(F.expr("CAST(_x AS DECIMAL(38,0)) * _x")).alias("_sx2"),
    )
    per_variant = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("_x").alias("_sxv"),
        F.sum("_y").alias("_syv"),
    )
    theta = (
        "CAST(_n * _sxy - CAST(_sx AS DECIMAL(38,0)) * _sy AS DOUBLE)"
        " / CAST(_n * _sx2 - CAST(_sx AS DECIMAL(38,0)) * _sx AS DOUBLE)"
    )
    var_ok = "(_n * _sx2 - CAST(_sx AS DECIMAL(38,0)) * _sx) > 0"
    adj = (
        "(CAST(_syv AS DOUBLE) / n_users)"
        f" - ({theta}) * ((CAST(_sxv AS DOUBLE) / n_users)"
        " - (CAST(_sx AS DOUBLE) / _n))"
    )
    return per_variant.crossJoin(F.broadcast(pooled)).select(
        "variant",
        "n_users",
        F.expr("_syv div n_users").alias("mean_post_cents"),
        F.expr(
            f"CAST(CASE WHEN {var_ok} THEN FLOOR(1000.0 * ({theta}))"
            " END AS BIGINT)"
        ).alias("theta_milli"),
        F.expr(
            f"CAST(CASE WHEN {var_ok} THEN FLOOR(1000.0 * ({adj}))"
            " END AS BIGINT)"
        ).alias("adj_mean_milli"),
    )


def _cuped_sql() -> str:
    from ..functions.hashing import HASH_MOD as MOD

    theta = (
        "CAST(_n * _sxy - CAST(_sx AS HUGEINT) * _sy AS DOUBLE)"
        " / CAST(_n * _sx2 - CAST(_sx AS HUGEINT) * _sx AS DOUBLE)"
    )
    var_ok = "(_n * _sx2 - CAST(_sx AS HUGEINT) * _sx) > 0"
    adj = (
        "(CAST(_syv AS DOUBLE) / n_users)"
        f" - ({theta}) * ((CAST(_sxv AS DOUBLE) / n_users)"
        " - (CAST(_sx AS DOUBLE) / _n))"
    )
    return f"""
WITH ev AS (
  SELECT user_id,
         CAST(round(value * 100, 0) AS BIGINT) AS _c,
         CASE WHEN ts >= TIMESTAMP '{KS_SPLIT}' THEN 1 ELSE 0 END AS _post
  FROM events
),
per_user AS (
  SELECT (({CUPED_A} * (user_id % {MOD}) + {CUPED_B}) % {MOD}) % 2
           AS variant,
         CAST(sum(_c * (1 - _post)) AS BIGINT) AS _x,
         CAST(sum(_c * _post) AS BIGINT) AS _y
  FROM ev GROUP BY user_id
),
pooled AS (
  SELECT CAST(count(*) AS BIGINT) AS _n,
         CAST(sum(_x) AS BIGINT) AS _sx,
         CAST(sum(_y) AS BIGINT) AS _sy,
         CAST(sum(CAST(_x AS HUGEINT) * _y) AS HUGEINT) AS _sxy,
         CAST(sum(CAST(_x AS HUGEINT) * _x) AS HUGEINT) AS _sx2
  FROM per_user
),
per_variant AS (
  SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(_x) AS BIGINT) AS _sxv,
         CAST(sum(_y) AS BIGINT) AS _syv
  FROM per_user GROUP BY variant
)
SELECT variant, n_users,
       _syv // n_users AS mean_post_cents,
       CAST(CASE WHEN {var_ok} THEN FLOOR(1000.0 * ({theta}))
            END AS BIGINT) AS theta_milli,
       CAST(CASE WHEN {var_ok} THEN FLOOR(1000.0 * ({adj}))
            END AS BIGINT) AS adj_mean_milli
FROM per_variant, pooled
"""


CUPED_AB_SQL = _cuped_sql()


# --- split-conformal prediction interval (round-15 queue) ---------------

CONF_ALPHA_PPM = 100_000  # target miss rate 10% -> 90% intervals
# user-hash three-way split: FIT (h%4 in 0,1), CAL (2), TEST (3) —
# perms[5] of the frozen family, disjoint from bootstrap and CUPED.
CONF_A = 1109849646
CONF_B = 246979837


def conformal_event_value_interval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Split-conformal prediction interval for event values, per event
    type — distribution-free uncertainty for a point predictor: fit a
    predictor on FIT, take the ceil((n+1)*0.9)-th smallest absolute
    residual on CAL as the interval half-width q, and MEASURE the
    coverage on held-out TEST. The conformal guarantee (coverage >=
    90% in expectation, no distributional assumptions) is exactly the
    kind of promise a data pipeline can certify engine-independently
    — and the TEST-side coverage_ppm exported here is the audit.

    Deterministic and integer-exact end to end: the three-way user
    split is the frozen affine hash family (FIT 50% / CAL 25% /
    TEST 25%); the predictor is the FIT-set per-type mean in cents
    (int64 floor-division); residuals are integer cents; the
    conformal quantile is an ORDER STATISTIC read off the residual
    histogram's cumulative window (rank k = (n_cal+1)*0.9 rounded up
    via integer ceil: (9*(n_cal+1) + 9) div 10 — never interpolated);
    coverage is an exact integer count ratio. NULL q when CAL is
    empty (no guarantee exists — exported honestly rather than as 0).

    Scale posture (100 TB): one groupBy(event_type) each for FIT
    means (map-side partials), the CAL residual HISTOGRAM (bounded by
    distinct cents values), and TEST coverage counts; the cumulative
    window slides over distinct residual values only; everything
    joins on the tiny event_type key.
    """
    from ..functions.hashing import HASH_MOD

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("_c"),
        F.expr(
            f"(({CONF_A} * (user_id % {HASH_MOD}) + {CONF_B})"
            f" % {HASH_MOD}) % 4"
        ).alias("_h"),
    )
    # NULL value is not a measurement (NULL-vintage policy)
    ev = ev.filter(F.col("_c").isNotNull())
    # cached: the tiny per-type prediction frame feeds the CAL
    # residual join AND the TEST coverage join (r13, the
    # conformal_alpha_sweep fix). Guide §5.
    fit = ev.filter(F.col("_h") <= 1).groupBy("event_type").agg(
        F.expr("sum(_c) div count(1)").alias("_pred"),
        F.count(F.lit(1)).alias("n_fit"),
    ).transform(stage)
    cal = (
        ev.filter(F.col("_h") == 2)
        .join(fit.select("event_type", "_pred"), "event_type")
        .select(
            "event_type", F.abs(F.col("_c") - F.col("_pred")).alias("_r")
        )
    )
    cal_hist = cal.groupBy("event_type", "_r").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("_r")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("event_type")
    stepped = cal_hist.select(
        "event_type",
        "_r",
        F.sum("_cnt").over(w_cum).alias("_cum"),
        F.sum("_cnt").over(w_all).alias("_ncal"),
    )
    # rank k = ceil((n_cal + 1) * (1 - alpha)) = ceil(9*(n_cal+1)/10),
    # clamped to n_cal (the standard finite-sample convention)
    q = (
        stepped.filter(
            F.col("_cum")
            >= F.expr("least((9 * (_ncal + 1) + 9) div 10, _ncal)")
        )
        .groupBy("event_type")
        .agg(F.min("_r").alias("q_resid"), F.max("_ncal").alias("n_cal"))
    )
    test = (
        ev.filter(F.col("_h") == 3)
        .join(fit.select("event_type", "_pred"), "event_type")
        .join(q.select("event_type", "q_resid"), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(
                (
                    F.abs(F.col("_c") - F.col("_pred")) <= F.col("q_resid")
                ).cast("long")
            ).alias("_hits"),
        )
    )
    return (
        fit.join(q, "event_type")
        .join(test, "event_type")
        .select(
            "event_type",
            "n_fit",
            "n_cal",
            "n_test",
            F.col("_pred").alias("pred_cents"),
            "q_resid",
            F.expr("_hits * 1000000 div greatest(n_test, 1)").alias(
                "coverage_ppm"
            ),
        )
    )


def _conformal_sql() -> str:
    from ..functions.hashing import HASH_MOD as MOD

    return f"""
WITH ev AS (
  SELECT event_type,
         CAST(round(value * 100, 0) AS BIGINT) AS _c,
         (({CONF_A} * (user_id % {MOD}) + {CONF_B}) % {MOD}) % 4 AS _h
  FROM events
  WHERE value IS NOT NULL
),
fit AS (
  SELECT event_type, sum(_c) // count(*) AS _pred,
         CAST(count(*) AS BIGINT) AS n_fit
  FROM ev WHERE _h <= 1 GROUP BY event_type
),
cal_hist AS (
  SELECT e.event_type, abs(e._c - f._pred) AS _r,
         CAST(count(*) AS BIGINT) AS _cnt
  FROM ev e JOIN fit f ON e.event_type = f.event_type
  WHERE e._h = 2 GROUP BY e.event_type, abs(e._c - f._pred)
),
stepped AS (
  SELECT event_type, _r,
         sum(_cnt) OVER (PARTITION BY event_type ORDER BY _r
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _cum,
         sum(_cnt) OVER (PARTITION BY event_type) AS _ncal
  FROM cal_hist
),
q AS (
  SELECT event_type, CAST(min(_r) AS BIGINT) AS q_resid,
         CAST(max(_ncal) AS BIGINT) AS n_cal
  FROM stepped
  WHERE _cum >= least((9 * (_ncal + 1) + 9) // 10, _ncal)
  GROUP BY event_type
),
test AS (
  SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_test,
         CAST(sum(CASE WHEN abs(e._c - f._pred) <= q.q_resid
                       THEN 1 ELSE 0 END) AS BIGINT) AS _hits
  FROM ev e
  JOIN fit f ON e.event_type = f.event_type
  JOIN q ON e.event_type = q.event_type
  WHERE e._h = 3
  GROUP BY e.event_type
)
SELECT f.event_type, f.n_fit, q.n_cal, t.n_test,
       CAST(f._pred AS BIGINT) AS pred_cents,
       q.q_resid,
       CAST(t._hits * 1000000 // greatest(t.n_test, 1) AS BIGINT)
         AS coverage_ppm
FROM fit f JOIN q ON f.event_type = q.event_type
JOIN test t ON f.event_type = t.event_type
"""


CONFORMAL_SQL = _conformal_sql()


# --- A/A-test calibration of the drift machinery (round-16 queue) --------

# pseudo-variant split: perms[7] of the frozen family — disjoint from
# the bootstrap (perms[0]-derived), CUPED (perms[2]) and conformal
# (perms[5]) splits so no two audits share a partition.
AA_A = 1666787001
AA_B = 405747345


def aa_test_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/A calibration of the rank-sum drift test — the negative
    control every experimentation/monitoring stack needs: split each
    event type's rows into two pseudo-variants by EVENT-ID hash
    (both halves sample the same distribution by construction), run
    the exact tie-corrected Mann-Whitney machinery between them, and
    report what fires. A drift detector that rejects its own A/A
    split is miscalibrated no matter how good its power looks; at
    alpha = 0.05 the expected false-positive count over the event
    types is ~0.05 x |types|.

    The algebra is mann_whitney_drift's verbatim (tie-averaged
    doubled mid-ranks off the value histogram, cles_ppm effect size,
    the 128-bit integer alpha decision) with the epoch split replaced
    by the frozen-hash pseudo-variant split — same exactness
    contracts, same scale posture (histogram-granular, one row per
    event type), plus the 1-row rollup a dashboard would alert on
    (n_types, n_false_positives). The halves need not be equal-sized
    (at tiny scales the affine walk can resonate with a type's
    event-id striding — 2:1 at sf0.001 — while balancing out at any
    real volume; the rank-sum test is size-agnostic either way, and
    the decision threshold carries each side's n exactly).
    """
    from ..functions.hashing import HASH_MOD

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        F.expr(
            f"(({AA_A} * (event_id % {HASH_MOD}) + {AA_B})"
            f" % {HASH_MOD}) % 2"
        ).alias("is_b"),
    )
    # NULL value is not a measurement (NULL-vintage policy)
    ev = ev.filter(F.col("cents").isNotNull())
    per_val = ev.groupBy("event_type", "cents").agg(
        F.sum(1 - F.col("is_b")).alias("da"),
        F.sum("is_b").alias("db"),
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    stepped = per_val.select(
        "event_type",
        "da",
        "db",
        (F.col("da") + F.col("db")).alias("_c"),
        F.coalesce(
            F.sum(F.col("da") + F.col("db")).over(w_cum), F.lit(0)
        ).alias("_m"),
    )
    rolled = stepped.groupBy("event_type").agg(
        F.sum("da").alias("n_a"),
        F.sum("db").alias("n_b"),
        F.sum(F.col("da") * (2 * F.col("_m") + F.col("_c") + 1)).alias(
            "_ra_x2"
        ),
        F.sum(
            F.expr("CAST(_c AS DECIMAL(38,0)) * _c * _c - _c")
        ).alias("_t"),
    )
    per_type = rolled.select(
        "event_type",
        "n_a",
        "n_b",
        F.expr(
            "(_ra_x2 - n_a * (n_a + 1)) * 500000"
            " div greatest(n_a * n_b, 1)"
        ).alias("cles_ppm"),
        F.expr(
            f"{MWU_Z2_005_DEN} * (CAST(n_a AS DECIMAL(38,0)) + n_b)"
            " * (n_a + n_b - 1)"
            " * (CAST(_ra_x2 - n_a * (n_a + 1) - n_a * n_b"
            "    AS DECIMAL(38,0)))"
            " * (_ra_x2 - n_a * (n_a + 1) - n_a * n_b)"
            f" > {MWU_Z2_005_NUM} * CAST(n_a AS DECIMAL(38,0)) * n_b"
            " * ((CAST(n_a AS DECIMAL(38,0)) + n_b + 1)"
            "    * (n_a + n_b) * (n_a + n_b - 1) - _t)"
        ).alias("false_positive"),
    )
    totals = per_type.agg(
        F.count(F.lit(1)).alias("_nt"),
        F.sum(F.col("false_positive").cast("long")).alias("_nfp"),
    )
    return per_type.crossJoin(F.broadcast(totals)).select(
        "event_type",
        "n_a",
        "n_b",
        "cles_ppm",
        "false_positive",
        F.col("_nt").alias("n_types"),
        F.col("_nfp").alias("n_false_positives"),
    )


def _aa_sql() -> str:
    from ..functions.hashing import HASH_MOD as MOD

    return f"""
WITH ev AS (
  SELECT event_type,
         CAST(round(value * 100, 0) AS BIGINT) AS cents,
         (({AA_A} * (event_id % {MOD}) + {AA_B}) % {MOD}) % 2 AS is_b
  FROM events
  WHERE value IS NOT NULL
),
per_val AS (
  SELECT event_type, cents,
         CAST(sum(1 - is_b) AS BIGINT) AS da,
         CAST(sum(is_b) AS BIGINT) AS db
  FROM ev GROUP BY event_type, cents
),
stepped AS (
  SELECT event_type, da, db, da + db AS _c,
         coalesce(sum(da + db) OVER (PARTITION BY event_type ORDER BY cents
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS _m
  FROM per_val
),
rolled AS (
  SELECT event_type,
         CAST(sum(da) AS BIGINT) AS n_a,
         CAST(sum(db) AS BIGINT) AS n_b,
         CAST(sum(da * (2 * _m + _c + 1)) AS BIGINT) AS _ra_x2,
         CAST(sum(CAST(_c AS HUGEINT) * _c * _c - _c) AS HUGEINT) AS _t
  FROM stepped GROUP BY event_type
),
per_type AS (
  SELECT event_type, n_a, n_b,
         CAST((_ra_x2 - n_a * (n_a + 1)) * 500000
              // greatest(n_a * n_b, 1) AS BIGINT) AS cles_ppm,
         {MWU_Z2_005_DEN} * (CAST(n_a AS HUGEINT) + n_b) * (n_a + n_b - 1)
           * CAST(_ra_x2 - n_a * (n_a + 1) - n_a * n_b AS HUGEINT)
           * (_ra_x2 - n_a * (n_a + 1) - n_a * n_b)
         > {MWU_Z2_005_NUM} * CAST(n_a AS HUGEINT) * n_b
           * ((CAST(n_a AS HUGEINT) + n_b + 1) * (n_a + n_b)
              * (n_a + n_b - 1) - _t)
           AS false_positive
  FROM rolled
),
totals AS (
  SELECT CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(CASE WHEN false_positive THEN 1 ELSE 0 END) AS BIGINT)
           AS n_false_positives
  FROM per_type
)
SELECT p.event_type, p.n_a, p.n_b, p.cles_ppm, p.false_positive,
       t.n_types, t.n_false_positives
FROM per_type p, totals t
"""


AA_TEST_SQL = _aa_sql()


# --- PSI drift scan (round-11 queue, built round 10) ----------------------

PSI_BIN_CENTS = 2500  # $25-wide equal-width value bins
PSI_N_BINS = 20
PSI_ALERT_MICRO = 200_000  # the industry 0.2 "significant shift" line


def psi_drift_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the two epochs, per event
    type — the binned member of the drift family (ks_drift: sup CDF
    gap; mann_whitney: rank shift; cusum: sequential scan; PSI is
    the number model-monitoring dashboards actually report, with the
    conventional 0.1 / 0.2 action lines).

    PSI = sum_i (q_i - p_i) * ln(q_i / p_i): p = reference (pre-
    KS_SPLIT) bin share, q = current share, over PSI_N_BINS fixed
    equal-width cent bins (data-independent edges, so both epochs bin
    in the same single map pass; reference-decile edges would add an
    order-statistics pass without changing the drift decision at this
    granularity), Laplace-smoothed (+1 per bin) so empty bins stay
    finite.

    Engine parity: counts are exact int64; each bin's contribution is
    quantized round((q - p) * ln(q/p) * 1e6) -> int64 and psi_micro
    is the SUM OF QUANTIZED TERMS (the bigram_pmi/tfidf_top_terms
    idiom — divisions are IEEE correctly rounded and identical, ln
    agrees at micro granularity after rounding), so the export is
    integer-identical across engines, and the alert flag is a pure
    integer comparison on it.

    Scale posture (100 TB): ONE groupBy(event_type, bin) collapses
    the stream map-side to <= |types| * PSI_N_BINS cells; the bin
    spine is a literal explode off the |types|-row totals frame.
    Nothing ranks, sorts, or shuffles per event.
    """
    mid = F.lit(KS_SPLIT).cast("timestamp")
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.least(
            F.expr(
                f"CAST(round(value * 100, 0) AS BIGINT)"
                f" div {PSI_BIN_CENTS}"
            ),
            F.lit(PSI_N_BINS - 1).cast("long"),
        ).alias("bin"),
        (F.col("ts") >= mid).cast("long").alias("is_b"),
    )
    cells = ev.groupBy("event_type", "bin").agg(
        F.sum(1 - F.col("is_b")).alias("ref_n"),
        F.sum("is_b").alias("cur_n"),
    )
    return _psi_from_cells(cells)


def _psi_from_cells(cells: DataFrame) -> DataFrame:
    """PSI rollup from a (event_type, bin, ref_n, cur_n) cell frame —
    shared by the batch entry above and the streaming monitor
    (streaming/psi_stream.py), so the two can never drift apart in
    arithmetic."""
    totals = cells.groupBy("event_type").agg(
        F.sum("ref_n").alias("ref_total"),
        F.sum("cur_n").alias("cur_total"),
    )
    spine = totals.select(
        "event_type",
        "ref_total",
        "cur_total",
        F.explode(F.expr(f"sequence(0, {PSI_N_BINS - 1})")).alias("bin"),
    )
    filled = spine.join(cells, ["event_type", "bin"], "left").select(
        "event_type",
        "ref_total",
        "cur_total",
        F.coalesce("ref_n", F.lit(0).cast("long")).alias("ref_n"),
        F.coalesce("cur_n", F.lit(0).cast("long")).alias("cur_n"),
    )
    p = (F.col("ref_n") + 1) / (
        F.col("ref_total") + F.lit(PSI_N_BINS)
    ).cast("double")
    q = (F.col("cur_n") + 1) / (
        F.col("cur_total") + F.lit(PSI_N_BINS)
    ).cast("double")
    term = F.round((q - p) * F.log(q / p) * 1_000_000, 0).cast("long")
    return (
        filled.withColumn("_term", term)
        .groupBy("event_type")
        .agg(
            F.max("ref_total").alias("n_ref"),
            F.max("cur_total").alias("n_cur"),
            F.sum("_term").alias("psi_micro"),
        )
        .select(
            "event_type",
            "n_ref",
            "n_cur",
            "psi_micro",
            (F.col("psi_micro") > F.lit(PSI_ALERT_MICRO)).alias("drifted"),
        )
    )


PSI_DRIFT_SQL = f"""
WITH ev AS (
  SELECT event_type,
         least(CAST(round(value * 100, 0) AS BIGINT) // {PSI_BIN_CENTS},
               {PSI_N_BINS - 1}) AS bin,
         CASE WHEN ts >= TIMESTAMP '{KS_SPLIT}' THEN 1 ELSE 0 END AS is_b
  FROM events
),
cells AS (
  SELECT event_type, bin,
         CAST(sum(1 - is_b) AS BIGINT) AS ref_n,
         CAST(sum(is_b) AS BIGINT) AS cur_n
  FROM ev GROUP BY event_type, bin
),
totals AS (
  SELECT event_type,
         CAST(sum(ref_n) AS BIGINT) AS ref_total,
         CAST(sum(cur_n) AS BIGINT) AS cur_total
  FROM cells GROUP BY event_type
),
spine AS (
  SELECT event_type, ref_total, cur_total, CAST(b.bin AS BIGINT) AS bin
  FROM totals, (SELECT unnest(range(0, {PSI_N_BINS})) AS bin) b
),
filled AS (
  SELECT s.event_type, s.ref_total, s.cur_total, s.bin,
         COALESCE(c.ref_n, 0) AS ref_n, COALESCE(c.cur_n, 0) AS cur_n
  FROM spine s LEFT JOIN cells c
    ON c.event_type = s.event_type AND c.bin = s.bin
),
terms AS (
  SELECT event_type, ref_total, cur_total,
         CAST(round(
           ((cur_n + 1) / CAST(cur_total + {PSI_N_BINS} AS DOUBLE)
            - (ref_n + 1) / CAST(ref_total + {PSI_N_BINS} AS DOUBLE))
           * ln(((cur_n + 1) / CAST(cur_total + {PSI_N_BINS} AS DOUBLE))
                / ((ref_n + 1) / CAST(ref_total + {PSI_N_BINS} AS DOUBLE)))
           * 1000000, 0) AS BIGINT) AS term
  FROM filled
)
SELECT event_type,
       CAST(max(ref_total) AS BIGINT) AS n_ref,
       CAST(max(cur_total) AS BIGINT) AS n_cur,
       CAST(sum(term) AS BIGINT) AS psi_micro,
       CAST(sum(term) AS BIGINT) > {PSI_ALERT_MICRO} AS drifted
FROM terms GROUP BY event_type
"""


# --- trimmed/winsorized means (round-12 queue, built round 10) -------------

TRIM_PCT_NUM = 1  # trim fraction numerator: 10%
TRIM_PCT_DEN = 10


def trimmed_mean_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-trimmed mean order value per market segment — the robust
    location estimate between the mean (outlier-hostile) and the
    median (throws away 98% of the data). Reported with the two cut
    points (the k+1-th and n-k-th order statistics) so the trim is
    auditable, all INTEGER-exact.

    Histogram order statistics, never per-row ranks: per
    (segment, cents) counts, one cumulative window over DISTINCT
    values, and each cell contributes kept = max(0,
    min(cum_before + cnt, n - k) - max(cum_before, k)) members to the
    trimmed sum — the overlap of the cell's rank interval with
    [k+1, n-k]. k = n div 10; the mean rounds half-up in pure int64
    ((2s + m) div (2m), the training_manifest idiom).

    Scale posture (100 TB): one groupBy(segment, cents) collapses
    orders map-side to the value histogram; the window slides over
    distinct cents per segment; the rollup is |segments| rows.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").alias("cents")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    vals = orders.join(cust, "o_custkey").groupBy("segment", "cents").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_cum = (
        Window.partitionBy("segment")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy("segment")
    stepped = vals.select(
        "segment",
        "cents",
        "cnt",
        F.coalesce(F.sum("cnt").over(w_cum), F.lit(0).cast("long")).alias(
            "cb"
        ),
        F.sum("cnt").over(w_tot).alias("n"),
    ).withColumn("k", F.expr(f"n * {TRIM_PCT_NUM} div {TRIM_PCT_DEN}"))
    kept = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("cb") + F.col("cnt"), F.col("n") - F.col("k"))
        - F.greatest(F.col("cb"), F.col("k")),
    )
    scored = stepped.select(
        "segment",
        "n",
        "k",
        kept.alias("kept"),
        (kept * F.col("cents")).alias("ks"),
        # the cut points: cell covering rank k+1 / rank n-k
        F.when(
            (F.col("cb") < F.col("k") + 1)
            & (F.col("cb") + F.col("cnt") >= F.col("k") + 1),
            F.col("cents"),
        ).alias("lo"),
        F.when(
            (F.col("cb") < F.col("n") - F.col("k"))
            & (F.col("cb") + F.col("cnt") >= F.col("n") - F.col("k")),
            F.col("cents"),
        ).alias("hi"),
    )
    return scored.groupBy("segment").agg(
        F.max("n").alias("n_orders"),
        F.max("lo").alias("cut_low_cents"),
        F.max("hi").alias("cut_high_cents"),
        F.expr(
            "CASE WHEN sum(kept) = 0 THEN NULL"
            " ELSE (2 * sum(ks) + sum(kept)) div (2 * sum(kept)) END"
        ).alias("trimmed_mean_cents"),
    )


TRIMMED_MEAN_SQL = f"""
WITH vals AS (
  SELECT c.c_mktsegment AS segment,
         CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS cents,
         CAST(count(*) AS BIGINT) AS cnt
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY segment, cents
),
stepped AS (
  SELECT segment, cents, cnt,
         COALESCE(CAST(sum(cnt) OVER (PARTITION BY segment ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
           0) AS cb,
         CAST(sum(cnt) OVER (PARTITION BY segment) AS BIGINT) AS n
  FROM vals
),
ked AS (
  SELECT *, n * {TRIM_PCT_NUM} // {TRIM_PCT_DEN} AS k FROM stepped
),
scored AS (
  SELECT segment, n, k,
         greatest(CAST(0 AS BIGINT),
                  least(cb + cnt, n - k) - greatest(cb, k)) AS kept,
         greatest(CAST(0 AS BIGINT),
                  least(cb + cnt, n - k) - greatest(cb, k)) * cents AS ks,
         CASE WHEN cb < k + 1 AND cb + cnt >= k + 1
              THEN cents END AS lo,
         CASE WHEN cb < n - k AND cb + cnt >= n - k
              THEN cents END AS hi
  FROM ked
)
SELECT segment,
       max(n) AS n_orders,
       max(lo) AS cut_low_cents,
       max(hi) AS cut_high_cents,
       CASE WHEN sum(kept) = 0 THEN NULL
            ELSE CAST((2 * sum(ks) + sum(kept))
                      // (2 * sum(kept)) AS BIGINT)
       END AS trimmed_mean_cents
FROM scored GROUP BY segment
"""


# --- multi-model attribution compare (round-15 queue, built round 10) -------

ATTRIB_WINDOW_MIN = 1440  # 24 h: the cross-session consideration window
ATTRIB_POS_CAP = 5  # positions 5+ share a bucket


def attribution_model_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch vs last-touch vs linear attribution over the SAME
    (purchase, preceding-views-within-24h) touch sets, in one pass
    — the comparison a marketing-analytics migration actually runs
    before switching models (purchase_attribution ships one model;
    arguing about models needs them side by side on identical
    touches). Output: per (model, touch position bucket), touches
    and credited micro-conversions; positions cap at
    {ATTRIB_POS_CAP}+ so the frame is bounded.

    INTEGER-exact credit: each converting purchase distributes
    exactly 1e6 micro-credits under every model. Linear uses the
    telescoping split credit_i = floor(1e6*i/n) - floor(1e6*(i-1)/n)
    — deterministic, sums to exactly 1e6 regardless of n, no
    largest-remainder tie rules to diverge on. First/last are
    1e6 at position 1 / n. The per-model totals equaling
    n_converting_purchases * 1e6 is a driver-hash-pinned invariant.

    Scale posture (100 TB): the interval join shuffles once per side
    on user_id (the stream-stream join's batch shape); the position
    window partitions by purchase (frames bounded by touches within
    a 24-hour window, never corpus-sized); models are an explode
    of a 3-struct literal; the rollup is <= 3 * {ATTRIB_POS_CAP}
    rows.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.unix_micros("ts").alias("p_us"),
        F.col("event_id").alias("p_id"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.unix_micros("ts").alias("v_us"),
        F.col("event_id").alias("v_id"),
    )
    # precomputed in Python: a literal*literal product in SQL text
    # constant-folds in INT32 on both engines (the round-9 gotcha)
    win_us = ATTRIB_WINDOW_MIN * 60 * 1_000_000
    touches = p.join(
        v,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_us") >= F.col("p_us") - F.lit(win_us))
        & (F.col("v_us") <= F.col("p_us")),
    ).select("p_id", "v_us", "v_id")
    w = Window.partitionBy("p_id").orderBy("v_us", "v_id")
    wn = Window.partitionBy("p_id")
    ranked = touches.select(
        "p_id",
        F.row_number().over(w).alias("pos"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    lin = F.expr("(1000000 * pos) div n - (1000000 * (pos - 1)) div n")
    first = F.when(F.col("pos") == 1, 1_000_000).otherwise(0).cast("long")
    last = F.when(F.col("pos") == F.col("n"), 1_000_000).otherwise(0).cast(
        "long"
    )
    models = F.array(
        F.struct(F.lit("first_touch").alias("model"), first.alias("credit")),
        F.struct(F.lit("last_touch").alias("model"), last.alias("credit")),
        F.struct(F.lit("linear").alias("model"), lin.alias("credit")),
    )
    exploded = ranked.select(
        F.least(F.col("pos"), F.lit(ATTRIB_POS_CAP)).alias("position"),
        F.explode(models).alias("m"),
    ).select("position", F.col("m.model").alias("model"), F.col("m.credit"))
    return exploded.groupBy("model", "position").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.sum("credit").alias("credit_micro"),
    )


ATTRIBUTION_COMPARE_SQL = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us, event_id, event_type FROM events
),
p AS (SELECT user_id, us AS p_us, event_id AS p_id FROM ev
      WHERE event_type = 'purchase'),
v AS (SELECT user_id, us AS v_us, event_id AS v_id FROM ev
      WHERE event_type = 'view'),
touches AS (
  SELECT p.p_id, v.v_us, v.v_id
  FROM p JOIN v ON v.user_id = p.user_id
   AND v.v_us >= p.p_us - {ATTRIB_WINDOW_MIN * 60 * 1_000_000}
   AND v.v_us <= p.p_us
),
ranked AS (
  SELECT p_id,
         row_number() OVER (PARTITION BY p_id ORDER BY v_us, v_id) AS pos,
         count(*) OVER (PARTITION BY p_id) AS n
  FROM touches
),
exploded AS (
  SELECT least(pos, {ATTRIB_POS_CAP}) AS position, m.model,
         CASE m.model
           WHEN 'first_touch' THEN CASE WHEN pos = 1
                                        THEN CAST(1000000 AS BIGINT)
                                        ELSE 0 END
           WHEN 'last_touch' THEN CASE WHEN pos = n
                                       THEN CAST(1000000 AS BIGINT)
                                       ELSE 0 END
           ELSE CAST((1000000 * pos) // n
                     - (1000000 * (pos - 1)) // n AS BIGINT)
         END AS credit
  FROM ranked,
       (SELECT unnest(['first_touch', 'last_touch', 'linear']) AS model) m
)
SELECT model, CAST(position AS BIGINT) AS position,
       CAST(count(*) AS BIGINT) AS n_touches,
       CAST(sum(credit) AS BIGINT) AS credit_micro
FROM exploded GROUP BY model, position
"""


# --- single-split changepoint (round-16 queue, built round 10) --------------


def changepoint_binary_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-segmentation changepoint localization on the gap-filled
    hourly count series, per event type: the single split k that
    maximizes the between-segment sum of squares — WHERE the level
    shifted and by how much, where cusum_drift_scan reports THAT a
    shift exists and its peak. The first step of the standard binary
    segmentation recursion, run at hour granularity.

    Integer-exact selection: with prefix sums S_k over the dense
    hourly series, the split score S_k^2*(n-k) + (S-S_k)^2*k over
    k*(n-k) is compared in ppm fixed point — score_k = (num_k * 1e12)
    div (k*(n-k)) in DECIMAL(38,0)/HUGEINT — and the argmax resolves
    ties to the SMALLEST k via a struct max on (score, -k), so both
    engines pick the identical split. Reported: the split's first
    post-segment hour, the two segment means (half-up integer milli),
    and gain_ppm — the variance fraction the split explains:
    (n*num_k - k*(n-k)*S^2) over (k*(n-k)*(n*Q - S^2)), all exact
    128-bit integers, one floored ppm ratio. NULL gain when the
    series is constant.

    Scale posture (100 TB): the burstiness/seasonality spine (one
    map-side-partial (type, hour) groupBy, generated hour spine); the
    prefix window and the argmax run over the per-type HOUR series
    (~8.8k rows/type/year), never events.
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
        "_h0",
        ((F.col("_h1") - F.col("_h0")) + 1).alias("n"),
        F.explode(F.sequence(F.col("_h0"), F.col("_h1"), F.lit(1))).alias(
            "_h"
        ),
    )
    filled = spine.join(counts, ["event_type", "_h"], "left").select(
        "event_type",
        "_h0",
        "n",
        (F.col("_h") - F.col("_h0") + 1).alias("k"),
        F.coalesce(F.col("_y"), F.lit(0).cast("long")).alias("_y"),
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    stepped = filled.select(
        "event_type",
        "_h0",
        "n",
        "k",
        F.sum("_y").over(w_cum).alias("sk"),
        F.sum("_y").over(w_all).alias("s"),
        F.sum(F.col("_y") * F.col("_y")).over(w_all).alias("q"),
    ).filter(F.col("k") < F.col("n"))
    num = F.expr(
        "CAST(sk AS DECIMAL(38,0)) * sk * (n - k)"
        " + CAST(s - sk AS DECIMAL(38,0)) * (s - sk) * k"
    )
    score = F.expr(
        "(CAST(sk AS DECIMAL(38,0)) * sk * (n - k)"
        " + CAST(s - sk AS DECIMAL(38,0)) * (s - sk) * k)"
        " * 1000000000000"
        " div (CAST(k AS DECIMAL(38,0)) * (n - k))"
    )
    best = (
        stepped.withColumn("_num", num)
        .withColumn("_score", score)
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n_hours"),
            F.max("_h0").alias("_h0"),
            F.max("s").alias("n_events"),
            F.max("q").alias("_q"),
            F.max(
                F.struct(
                    F.col("_score").alias("sc"),
                    (-F.col("k")).alias("nk"),
                    F.col("sk").alias("sk"),
                    F.col("_num").alias("nm"),
                )
            ).alias("_b"),
        )
    )
    k_ = -F.col("_b.nk")
    gain_den = F.expr(
        "CAST(-_b.nk AS DECIMAL(38,0)) * (n_hours + _b.nk)"
        " * (CAST(n_hours AS DECIMAL(38,0)) * _q"
        "    - CAST(n_events AS DECIMAL(38,0)) * n_events)"
    )
    return best.select(
        "event_type",
        "n_hours",
        "n_events",
        (F.col("_h0") + k_).alias("split_hour"),
        F.expr("(2 * 1000 * _b.sk + (-_b.nk)) div (2 * (-_b.nk))").alias(
            "mean_before_milli"
        ),
        F.expr(
            "(2 * 1000 * (n_events - _b.sk) + (n_hours + _b.nk))"
            " div (2 * (n_hours + _b.nk))"
        ).alias("mean_after_milli"),
        F.when(gain_den == 0, F.lit(None).cast("long"))
        .otherwise(
            F.expr(
                # div (integer division), never decimal '/' + cast:
                # Spark's decimal divide ROUNDS at the result scale
                # while DuckDB's integer // truncates — a boundary
                # quotient could straddle engines
                "CAST((1000000 * (CAST(n_hours AS DECIMAL(38,0)) * _b.nm"
                " - CAST(-_b.nk AS DECIMAL(38,0)) * (n_hours + _b.nk)"
                " * CAST(n_events AS DECIMAL(38,0)) * n_events))"
                " div (CAST(-_b.nk AS DECIMAL(38,0)) * (n_hours + _b.nk)"
                " * (CAST(n_hours AS DECIMAL(38,0)) * _q"
                "    - CAST(n_events AS DECIMAL(38,0)) * n_events))"
                " AS BIGINT)"
            )
        )
        .alias("gain_ppm"),
    )


CHANGEPOINT_SPLIT_SQL = """
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
  SELECT event_type, _h0, (_h1 - _h0) + 1 AS n,
         unnest(range(_h0, _h1 + 1)) AS _h
  FROM bounds
),
filled AS (
  SELECT s.event_type, s._h0, s.n, s._h - s._h0 + 1 AS k,
         COALESCE(c._y, 0) AS _y
  FROM spine s LEFT JOIN counts c
    ON c.event_type = s.event_type AND c._h = s._h
),
stepped AS (
  SELECT event_type, _h0, n, k,
         CAST(sum(_y) OVER (PARTITION BY event_type ORDER BY k
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS sk,
         CAST(sum(_y) OVER (PARTITION BY event_type) AS BIGINT) AS s,
         CAST(sum(_y * _y) OVER (PARTITION BY event_type) AS BIGINT) AS q
  FROM filled
),
scored AS (
  SELECT *,
         CAST(sk AS HUGEINT) * sk * (n - k)
           + CAST(s - sk AS HUGEINT) * (s - sk) * k AS _num,
         (CAST(sk AS HUGEINT) * sk * (n - k)
           + CAST(s - sk AS HUGEINT) * (s - sk) * k)
           * 1000000000000
           // (CAST(k AS HUGEINT) * (n - k)) AS _score
  FROM stepped WHERE k < n
),
best AS (
  SELECT event_type,
         max(n) AS n_hours,
         max(_h0) AS _h0,
         max(s) AS n_events,
         max(q) AS _q,
         max(struct_pack(sc := _score, nk := -k, sk := sk, nm := _num))
           AS _b
  FROM scored GROUP BY event_type
)
SELECT event_type, n_hours, n_events,
       _h0 + (-(_b.nk)) AS split_hour,
       CAST((2 * 1000 * _b.sk + (-(_b.nk)))
            // (2 * (-(_b.nk))) AS BIGINT) AS mean_before_milli,
       CAST((2 * 1000 * (n_events - _b.sk) + (n_hours + _b.nk))
            // (2 * (n_hours + _b.nk)) AS BIGINT) AS mean_after_milli,
       CASE WHEN CAST(-(_b.nk) AS HUGEINT) * (n_hours + _b.nk)
                 * (CAST(n_hours AS HUGEINT) * _q
                    - CAST(n_events AS HUGEINT) * n_events) = 0 THEN NULL
            ELSE CAST((1000000 *
                   (CAST(n_hours AS HUGEINT) * _b.nm
                    - CAST(-(_b.nk) AS HUGEINT) * (n_hours + _b.nk)
                      * CAST(n_events AS HUGEINT) * n_events))
                 // (CAST(-(_b.nk) AS HUGEINT) * (n_hours + _b.nk)
                     * (CAST(n_hours AS HUGEINT) * _q
                        - CAST(n_events AS HUGEINT) * n_events))
                 AS BIGINT)
       END AS gain_ppm
FROM best
"""


# --- conformal alpha sweep (round-17 queue, built round 10) -----------------

CONF_TARGETS_PPM = (900_000, 950_000, 990_000)


def conformal_alpha_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The conformal interval at THREE coverage targets (90/95/99%)
    off ONE calibration pass — the sensitivity sweep of
    conformal_event_value_interval (which ships alpha = 0.1): the
    width-vs-coverage trade IS the decision an interval consumer
    makes, and all three quantiles are order statistics on the same
    CAL residual histogram, so sweeping them costs three rank
    thresholds, not three passes.

    Same exactness contract as the parent: frozen affine-hash FIT/
    CAL/TEST split, integer-cents residuals, rank k = least(
    ceil(target*(n_cal+1)), n_cal) read off the cumulative window
    over DISTINCT residual values, exact integer coverage ratio on
    TEST. The conformal guarantee (coverage >= target in
    expectation) is the physics the exported table exhibits.

    Scale posture (100 TB): identical to the parent plus a 3-row
    target spine joined against the histogram — no extra pass over
    events.
    """
    from ..functions.hashing import HASH_MOD

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("_c"),
        F.expr(
            f"(({CONF_A} * (user_id % {HASH_MOD}) + {CONF_B})"
            f" % {HASH_MOD}) % 4"
        ).alias("_h"),
    )
    # NULL value is not a measurement (NULL-vintage policy)
    ev = ev.filter(F.col("_c").isNotNull())
    # cached: the tiny per-type prediction frame feeds the CAL
    # residual join AND the TEST coverage join; uncached, the events
    # scan + fit aggregate re-ran per reference (12 parquet scans /
    # 30 Exchanges in the r13 plan audit). Guide §5.
    fit = ev.filter(F.col("_h") <= 1).groupBy("event_type").agg(
        F.expr("sum(_c) div count(1)").alias("_pred"),
        F.count(F.lit(1)).alias("n_fit"),
    ).transform(stage)
    cal = (
        ev.filter(F.col("_h") == 2)
        .join(fit.select("event_type", "_pred"), "event_type")
        .select(
            "event_type", F.abs(F.col("_c") - F.col("_pred")).alias("_r")
        )
    )
    cal_hist = cal.groupBy("event_type", "_r").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("_r")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("event_type")
    stepped = cal_hist.select(
        "event_type",
        "_r",
        F.sum("_cnt").over(w_cum).alias("_cum"),
        F.sum("_cnt").over(w_all).alias("_ncal"),
    )
    targets = spark.createDataFrame(
        [(t,) for t in CONF_TARGETS_PPM], "target_ppm BIGINT"
    )
    ranked = stepped.crossJoin(F.broadcast(targets)).filter(
        F.col("_cum")
        >= F.expr(
            "least((target_ppm * (_ncal + 1) + 999999) div 1000000,"
            " _ncal)"
        )
    )
    q = ranked.groupBy("event_type", "target_ppm").agg(
        F.min("_r").alias("q_resid"), F.max("_ncal").alias("n_cal")
    )
    test = (
        ev.filter(F.col("_h") == 3)
        .join(fit.select("event_type", "_pred"), "event_type")
        .join(
            q.select("event_type", "target_ppm", "q_resid"),
            "event_type",
        )
        .groupBy("event_type", "target_ppm")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(
                (
                    F.abs(F.col("_c") - F.col("_pred")) <= F.col("q_resid")
                ).cast("long")
            ).alias("_hits"),
        )
    )
    return (
        q.join(test, ["event_type", "target_ppm"])
        .select(
            "event_type",
            "target_ppm",
            "n_cal",
            "n_test",
            "q_resid",
            F.expr("_hits * 1000000 div greatest(n_test, 1)").alias(
                "coverage_ppm"
            ),
        )
    )


def _conformal_sweep_sql() -> str:
    from ..functions.hashing import HASH_MOD as MOD

    ts = ", ".join(str(t) for t in CONF_TARGETS_PPM)
    return f"""
WITH ev AS (
  SELECT event_type,
         CAST(round(value * 100, 0) AS BIGINT) AS _c,
         (({CONF_A} * (user_id % {MOD}) + {CONF_B}) % {MOD}) % 4 AS _h
  FROM events
  WHERE value IS NOT NULL
),
fit AS (
  SELECT event_type, CAST(sum(_c) // count(*) AS BIGINT) AS _pred,
         CAST(count(*) AS BIGINT) AS n_fit
  FROM ev WHERE _h <= 1 GROUP BY event_type
),
cal AS (
  SELECT e.event_type, abs(e._c - f._pred) AS _r
  FROM ev e JOIN fit f USING (event_type) WHERE e._h = 2
),
cal_hist AS (
  SELECT event_type, _r, CAST(count(*) AS BIGINT) AS _cnt
  FROM cal GROUP BY event_type, _r
),
stepped AS (
  SELECT event_type, _r,
         CAST(sum(_cnt) OVER (PARTITION BY event_type ORDER BY _r
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS _cum,
         CAST(sum(_cnt) OVER (PARTITION BY event_type) AS BIGINT)
           AS _ncal
  FROM cal_hist
),
targets AS (SELECT CAST(unnest([{ts}]) AS BIGINT) AS target_ppm),
q AS (
  SELECT event_type, target_ppm,
         CAST(min(_r) AS BIGINT) AS q_resid,
         CAST(max(_ncal) AS BIGINT) AS n_cal
  FROM stepped, targets
  WHERE _cum >= least((target_ppm * (_ncal + 1) + 999999) // 1000000,
                      _ncal)
  GROUP BY event_type, target_ppm
),
test AS (
  SELECT e.event_type, qq.target_ppm,
         CAST(count(*) AS BIGINT) AS n_test,
         CAST(sum(CASE WHEN abs(e._c - f._pred) <= qq.q_resid
                       THEN 1 ELSE 0 END) AS BIGINT) AS _hits
  FROM ev e
  JOIN fit f USING (event_type)
  JOIN q qq ON qq.event_type = e.event_type
  WHERE e._h = 3
  GROUP BY e.event_type, qq.target_ppm
)
SELECT q.event_type, q.target_ppm, q.n_cal, t.n_test, q.q_resid,
       CAST(t._hits * 1000000 // greatest(t.n_test, 1) AS BIGINT)
         AS coverage_ppm
FROM q JOIN test t
  ON t.event_type = q.event_type AND t.target_ppm = q.target_ppm
"""


CONFORMAL_SWEEP_ORACLE = _conformal_sweep_sql()


# --- Benjamini-Hochberg FDR control over the drift family (r12 queue) ----

# BH step-up at FDR q = 0.05 needs, for family size m and rank k, the
# two-sided normal critical value z_c = Phi^-1(1 - (k*q/m)/2). Neither
# engine has a correctly-rounded probit, so the critical values are
# PRECOMPUTED here (stdlib NormalDist, one deterministic literal grid
# baked identically into the Spark plan and the oracle SQL) as
# t_num = round(2000 * z_c^2): the per-type decision is then the pure
# 128-bit integer comparison 2000*z2_num >= t_num*z2_den, the
# ks_drift/mann_whitney alpha-decision idiom generalized to a grid.
BH_FDR_Q = 0.05
# Grid headroom: far above any realistic event-type domain (5 here).
# Families LARGER than this have no grid rows at all, so every rank's
# t_num is NULL and the operator exports zero discoveries — loud in
# any downstream consumer, conservative for FDR, and documented below.
BH_FDR_MAX_M = 64


def _bh_grid() -> list[tuple[int, int, int]]:
    from statistics import NormalDist

    nd = NormalDist()
    rows = []
    for m in range(1, BH_FDR_MAX_M + 1):
        for k in range(1, m + 1):
            z = nd.inv_cdf(1.0 - (k * BH_FDR_Q / m) / 2.0)
            rows.append((m, k, round(2000 * z * z)))
    return rows


def bh_fdr_drift_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control across the per-event-type MWU
    drift tests — the multiple-testing layer the drift family was
    missing: running |types| tests at alpha = 0.05 each inflates the
    family-wise false-alarm rate (5 independent nulls alarm ~23% of
    the time); BH step-up bounds the expected FALSE DISCOVERY rate at
    q = 0.05 while keeping far more power than Bonferroni.

    Procedure, fully integer: per type, the tie-corrected MWU z^2 as
    the exact rational z2_num/z2_den (z2_num = 3n(n-1)(u2-n_a*n_b)^2,
    z2_den = n_a*n_b*((n+1)n(n-1) - T), both DECIMAL(38,0)/HUGEINT,
    off the shared _mwu_rolled scaffold); types ranked by evidence
    via the engine-identical proxy z2_milli = (1000*z2_num) div
    z2_den descending (tie -> event_type; BOTH engines rank by the
    same quantized integer, so parity holds even when two exact z^2
    differ within 1e-3); rank r passes iff 2000*z2_num >=
    t_num[m][r]*z2_den against the precomputed grid; discoveries =
    every rank <= the LARGEST passing rank (the step-up). Types with
    z2_den = 0 (an epoch empty, or all values tied) are untestable:
    excluded from the family size m, exported with NULL rank and
    discovery = false.

    Exactness bound: 2000*z2_num <= 375*n^6 needs n <= ~7e5 rows per
    event type inside DECIMAL(38,0) — the documented mann_whitney
    bound; past that, pre-aggregate to a coarser value grid. The
    precomputed grid covers family sizes m <= BH_FDR_MAX_M (64); a
    LARGER family matches no grid row at any rank (the join keys on
    m_tests), so t_num is NULL everywhere and the operator exports
    ZERO discoveries — conservative (BH can only under-discover,
    never inflate FDR) but blunt: widen BH_FDR_MAX_M if the
    event-type domain ever approaches it.

    Scale posture (100 TB): everything up to the per-type rollup is
    the mann_whitney plan (histogram groupBy + cumulative window over
    distinct cents). The BH step itself runs on the |types|-row
    frame: one broadcast grid join, one |types|-row window. Output is
    one row per event type.
    """
    rolled = _mwu_rolled(spark, sf_dir)
    base = rolled.select(
        "event_type",
        "n_a",
        "n_b",
        F.expr(
            "CAST(3 AS DECIMAL(38,0)) * (n_a + n_b) * (n_a + n_b - 1)"
            " * (_ra_x2 - n_a * (n_a + 1) - n_a * n_b)"
            " * (_ra_x2 - n_a * (n_a + 1) - n_a * n_b)"
        ).alias("_z2num"),
        F.expr(
            "CAST(n_a AS DECIMAL(38,0)) * n_b"
            " * ((CAST(n_a AS DECIMAL(38,0)) + n_b + 1) * (n_a + n_b)"
            "    * (n_a + n_b - 1) - _t)"
        ).alias("_z2den"),
    )
    # cached: one row per event type; testable/rest/m_fr/ranked all
    # re-ran the _mwu_rolled histogram scaffold per reference before
    # (8 parquet scans / 28 Exchanges in the r13 plan audit)
    base = base.transform(stage)
    testable = base.filter(F.col("_z2den") > 0)
    rest = base.filter(
        (F.col("_z2den") <= 0) | F.col("_z2den").isNull()
    )
    m_fr = testable.agg(F.count(F.lit(1)).alias("m_tests"))
    grid = spark.createDataFrame(
        _bh_grid(), "m_tests INT, bh_rank INT, t_num BIGINT"
    )
    w_rank = Window.orderBy(F.desc("z2_milli"), F.asc("event_type"))
    w_all = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = (
        testable.withColumn(
            "z2_milli",
            F.expr("CAST((1000 * _z2num) div _z2den AS BIGINT)"),
        )
        .crossJoin(F.broadcast(m_fr))
        .withColumn("bh_rank", F.row_number().over(w_rank))
        .join(F.broadcast(grid), ["m_tests", "bh_rank"], "left")
        .withColumn(
            "_pass",
            F.expr("2000 * _z2num >= t_num * _z2den"),
        )
        .withColumn(
            "_max_pass",
            F.max(F.when(F.col("_pass"), F.col("bh_rank"))).over(w_all),
        )
        .select(
            "event_type",
            "n_a",
            "n_b",
            "z2_milli",
            F.col("m_tests").cast("long").alias("m_tests"),
            F.col("bh_rank").cast("long").alias("bh_rank"),
            F.coalesce(
                F.col("bh_rank") <= F.col("_max_pass"), F.lit(False)
            ).alias("discovery"),
        )
    )
    rest_out = rest.crossJoin(F.broadcast(m_fr)).select(
        "event_type",
        "n_a",
        "n_b",
        F.lit(None).cast("long").alias("z2_milli"),
        F.col("m_tests").cast("long").alias("m_tests"),
        F.lit(None).cast("long").alias("bh_rank"),
        F.lit(False).alias("discovery"),
    )
    return ranked.unionByName(rest_out)


def _bh_fdr_sql() -> str:
    grid_values = ",\n    ".join(
        f"({m}, {k}, {t})" for m, k, t in _bh_grid()
    )
    return f"""
WITH ev AS (
  SELECT event_type,
         CAST(round(value * 100, 0) AS BIGINT) AS cents,
         CASE WHEN ts >= TIMESTAMP '{KS_SPLIT}' THEN 1 ELSE 0 END AS is_b
  FROM events
  WHERE value IS NOT NULL
),
per_val AS (
  SELECT event_type, cents,
         CAST(sum(1 - is_b) AS BIGINT) AS da,
         CAST(sum(is_b) AS BIGINT) AS db
  FROM ev GROUP BY event_type, cents
),
stepped AS (
  SELECT event_type, da, db, da + db AS _c,
         coalesce(sum(da + db) OVER (PARTITION BY event_type ORDER BY cents
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS _m
  FROM per_val
),
rolled AS (
  SELECT event_type,
         CAST(sum(da) AS BIGINT) AS n_a,
         CAST(sum(db) AS BIGINT) AS n_b,
         CAST(sum(da * (2 * _m + _c + 1)) AS BIGINT) AS _ra_x2,
         CAST(sum(CAST(_c AS HUGEINT) * _c * _c - _c) AS HUGEINT) AS _t
  FROM stepped GROUP BY event_type
),
base AS (
  SELECT event_type, n_a, n_b,
         CAST(3 AS HUGEINT) * (n_a + n_b) * (n_a + n_b - 1)
           * (_ra_x2 - n_a * (n_a + 1) - n_a * n_b)
           * (_ra_x2 - n_a * (n_a + 1) - n_a * n_b) AS _z2num,
         CAST(n_a AS HUGEINT) * n_b
           * ((CAST(n_a AS HUGEINT) + n_b + 1) * (n_a + n_b)
              * (n_a + n_b - 1) - _t) AS _z2den
  FROM rolled
),
grid(m_tests, bh_rank, t_num) AS (
  VALUES {grid_values}
),
m_fr AS (
  SELECT CAST(count(*) AS BIGINT) AS m_tests FROM base WHERE _z2den > 0
),
ranked AS (
  SELECT event_type, n_a, n_b, _z2num, _z2den,
         CAST((1000 * _z2num) // _z2den AS BIGINT) AS z2_milli,
         row_number() OVER (
           ORDER BY CAST((1000 * _z2num) // _z2den AS BIGINT) DESC,
                    event_type ASC) AS bh_rank
  FROM base WHERE _z2den > 0
),
passed AS (
  SELECT r.*, m.m_tests,
         2000 * r._z2num >= g.t_num * r._z2den AS _pass
  FROM ranked r
  CROSS JOIN m_fr m
  LEFT JOIN grid g
    ON g.m_tests = m.m_tests AND g.bh_rank = r.bh_rank
),
flagged AS (
  SELECT event_type, n_a, n_b, z2_milli,
         CAST(m_tests AS BIGINT) AS m_tests,
         CAST(bh_rank AS BIGINT) AS bh_rank,
         coalesce(bh_rank <= max(CASE WHEN _pass THEN bh_rank END)
                              OVER (), FALSE) AS discovery
  FROM passed
)
SELECT * FROM flagged
UNION ALL
SELECT b.event_type, b.n_a, b.n_b,
       CAST(NULL AS BIGINT) AS z2_milli,
       CAST(m.m_tests AS BIGINT) AS m_tests,
       CAST(NULL AS BIGINT) AS bh_rank,
       FALSE AS discovery
FROM base b CROSS JOIN m_fr m
WHERE NOT (b._z2den > 0)
"""


BH_FDR_SQL = _bh_fdr_sql()


# --- rank-biased overlap: quality vs length top lists (r12 queue) --------

# Truncated RBO at depth K with persistence p: (1-p) * sum_{d=1..K}
# p^(d-1) * |A_d ^ B_d| / d. The per-depth weights are PRECOMPUTED as
# e-12-scaled integer literals (one deterministic grid in both
# engines), and the depth sum telescopes per overlapping doc into ONE
# suffix-weight lookup: a doc entering both lists at depth
# mr = max(rank_A, rank_B) contributes c_d to every d >= mr, so
# rbo_e12 = sum over overlapping docs of W[mr], W[r] = sum_{d=r..K}
# c_d — no depth spine, no explode, pure int64.
RBO_K = 20
RBO_P = 0.9


def _rbo_weights() -> tuple[list[int], int]:
    c = [
        round((1.0 - RBO_P) * RBO_P ** (d - 1) / d * 1_000_000_000_000)
        for d in range(1, RBO_K + 1)
    ]
    suffix = [sum(c[r:]) for r in range(RBO_K)]  # W[r+1] = suffix[r]
    max_e12 = sum(cd * d for d, cd in enumerate(c, start=1))
    return suffix, max_e12


def rbo_quality_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber et al.'s top-weighted list-overlap
    measure) between the top-20 documents by QUALITY and the top-20
    by LENGTH, per language — the top-of-list complement to
    spearman_quality_length: Spearman weights every rank equally, so
    a quality gate that agrees with length exactly where it matters
    (the head picks a curator actually keeps) can hide behind a
    modest whole-distribution rho. RBO's geometric weighting (p=0.9)
    answers "do the two orderings surface the SAME top documents?".

    Truncated (no extrapolation): rbo_e12 is the exact integer
    sum of precomputed e-12 weights over docs in BOTH top-20s,
    rbo_norm_ppm normalizes against the full-depth-20 maximum (a
    literal), so 1e6 = identical top-20s. Rankings tiebreak on doc_id
    after the ppm-quantized quality / n_chars keys — engine-identical
    total orders, so the top-20 sets match by construction.

    Scale posture (100 TB): the ONLY per-document work is two
    rank<=20 filters over row_number windows, which Spark plans as
    WindowGroupLimit — each partition keeps 20 rows per lang before
    the exchange, nothing global-sorts. Everything after runs on
    <= 20-row-per-lang frames (one equi-join, one groupBy).
    """
    from .textstats import quality_score

    suffix, max_e12 = _rbo_weights()
    q = quality_score(spark, sf_dir).select(
        "doc_id",
        F.round(F.col("quality") * 1_000_000, 0).cast("long").alias("_qp"),
    )
    meta = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").alias("_nc")
    )
    j = q.join(meta, "doc_id").select("lang", "doc_id", "_qp", "_nc")
    wa = Window.partitionBy("lang").orderBy(F.desc("_qp"), F.asc("doc_id"))
    wb = Window.partitionBy("lang").orderBy(F.desc("_nc"), F.asc("doc_id"))
    top_a = (
        j.withColumn("ra", F.row_number().over(wa))
        .filter(F.col("ra") <= RBO_K)
        .select("lang", "doc_id", "ra")
    )
    top_b = (
        j.withColumn("rb", F.row_number().over(wb))
        .filter(F.col("rb") <= RBO_K)
        .select("lang", "doc_id", "rb")
    )
    sizes = top_a.groupBy("lang").agg(F.count(F.lit(1)).alias("n_top"))
    w_arr = f"array({', '.join(str(w) for w in suffix)})"
    overlap = (
        top_a.join(top_b, ["lang", "doc_id"])
        .select(
            "lang",
            F.expr(f"element_at({w_arr}, greatest(ra, rb))").alias("_w"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_joint"),
            F.sum("_w").alias("rbo_e12"),
        )
    )
    return sizes.join(overlap, "lang", "left").select(
        "lang",
        "n_top",
        F.coalesce("n_joint", F.lit(0)).alias("n_joint"),
        F.coalesce("rbo_e12", F.lit(0)).alias("rbo_e12"),
        F.expr(
            f"coalesce(rbo_e12, 0) * 1000000 div {max_e12}"
        ).alias("rbo_norm_ppm"),
    )


def _rbo_sql() -> str:
    from .textstats import QUALITY_SQL

    suffix, max_e12 = _rbo_weights()
    w_values = ", ".join(
        f"({r}, {w})" for r, w in enumerate(suffix, start=1)
    )
    return f"""
WITH q AS ({QUALITY_SQL}),
j AS (
  SELECT d.lang, d.doc_id,
         CAST(round(q.quality * 1000000, 0) AS BIGINT) AS _qp,
         d.n_chars AS _nc
  FROM q JOIN documents d ON q.doc_id = d.doc_id
),
ta AS (
  SELECT lang, doc_id, ra FROM (
    SELECT lang, doc_id,
           row_number() OVER (PARTITION BY lang
                              ORDER BY _qp DESC, doc_id ASC) AS ra
    FROM j) t WHERE ra <= {RBO_K}
),
tb AS (
  SELECT lang, doc_id, rb FROM (
    SELECT lang, doc_id,
           row_number() OVER (PARTITION BY lang
                              ORDER BY _nc DESC, doc_id ASC) AS rb
    FROM j) t WHERE rb <= {RBO_K}
),
sizes AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_top FROM ta GROUP BY lang
),
wt(mr, w) AS (VALUES {w_values}),
overlap AS (
  SELECT a.lang,
         CAST(count(*) AS BIGINT) AS n_joint,
         CAST(sum(wt.w) AS BIGINT) AS rbo_e12
  FROM ta a
  JOIN tb b ON a.lang = b.lang AND a.doc_id = b.doc_id
  JOIN wt ON wt.mr = greatest(a.ra, b.rb)
  GROUP BY a.lang
)
SELECT s.lang, s.n_top,
       coalesce(o.n_joint, 0) AS n_joint,
       coalesce(o.rbo_e12, 0) AS rbo_e12,
       CAST(coalesce(o.rbo_e12, 0) * 1000000 // {max_e12} AS BIGINT)
         AS rbo_norm_ppm
FROM sizes s LEFT JOIN overlap o ON s.lang = o.lang
"""


RBO_QUALITY_LENGTH_SQL = _rbo_sql()


# --- Hill tail-index estimator (r12 queue, batch 2) -----------------------

# Order statistics used per event type: the top HILL_K positive
# values (the classic bias/variance compromise for the Hill plot's
# stable region at these row counts).
HILL_K = 100


def hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the power-law tail index of `value` per
    event type — the tail-risk member of the distribution family:
    moments and percentiles say where the bulk sits; the Hill index
    alpha says how fast P(X > x) decays (alpha <= 2 means infinite
    variance — winsorization thresholds and revenue projections off
    sample moments silently break, and this is the operator that
    says so).

    hill_mean = (1/(k-1)) * sum_{i<k} ln(x_(i)/x_(k)) over the
    descending order statistics x_(1) >= ... >= x_(k) of the
    cents-quantized positive values; alpha = 1/hill_mean. Each ln of
    an exact integer ratio is quantized to MICRO-NATS before the sum
    (the bigram_pmi idiom), the mean is the pure-int64 half-up
    division, and alpha_milli = 1e9 div hill_mean_micronats is one
    more integer division. Types with fewer than 2 positive values —
    or a degenerate tail (x_(1) = x_(k), hill_mean = 0) — export
    NULL. Ties at the k-th value are value-identical, so the
    row_number cut is order-stable by construction (event_id
    tiebreak pins the rows too).

    Scale posture (100 TB): the rank <= k filter plans as
    WindowGroupLimit (per-partition top-k per type before one
    exchange); everything after runs on <= k rows per type (one
    broadcast-sized tail-ref join, one rollup).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    ).filter(F.col("cents") > 0)
    w_top = Window.partitionBy("event_type").orderBy(
        F.desc("cents"), F.asc("event_id")
    )
    topk = ev.withColumn("rn", F.row_number().over(w_top)).filter(
        F.col("rn") <= HILL_K
    )
    tails = topk.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k_used"),
        F.min("cents").alias("x_tail_cents"),
    )
    terms = topk.join(F.broadcast(tails), "event_type").select(
        "event_type",
        "k_used",
        "x_tail_cents",
        F.when(
            F.col("rn") < F.col("k_used"),
            F.round(
                F.log(
                    F.col("cents") / F.col("x_tail_cents").cast("double")
                )
                * 1_000_000,
                0,
            ).cast("long"),
        ).alias("_t"),
    )
    rolled = terms.groupBy("event_type").agg(
        F.max("k_used").alias("k_used"),
        F.max("x_tail_cents").alias("x_tail_cents"),
        F.sum("_t").alias("_s"),
    )
    return rolled.select(
        "event_type",
        "k_used",
        "x_tail_cents",
        F.when(
            F.col("k_used") >= 2,
            F.expr("(2 * _s + (k_used - 1)) div (2 * (k_used - 1))"),
        ).alias("hill_mean_micronats"),
        F.when(
            (F.col("k_used") >= 2)
            & (F.expr("(2 * _s + (k_used - 1)) div (2 * (k_used - 1))") > 0),
            F.expr(
                "1000000000 div ((2 * _s + (k_used - 1))"
                " div (2 * (k_used - 1)))"
            ),
        ).alias("alpha_milli"),
    )


HILL_TAIL_SQL = f"""
WITH ev AS (
  SELECT event_type, event_id,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events
  WHERE CAST(round(value * 100, 0) AS BIGINT) > 0
),
topk AS (
  SELECT event_type, cents, rn FROM (
    SELECT event_type, cents,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY cents DESC, event_id ASC) AS rn
    FROM ev) t WHERE rn <= {HILL_K}
),
tails AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS k_used,
         min(cents) AS x_tail_cents
  FROM topk GROUP BY event_type
),
terms AS (
  SELECT t.event_type, ta.k_used, ta.x_tail_cents,
         CASE WHEN t.rn < ta.k_used THEN
           CAST(round(ln(t.cents / CAST(ta.x_tail_cents AS DOUBLE))
                      * 1000000, 0) AS BIGINT)
         END AS _t
  FROM topk t JOIN tails ta USING (event_type)
),
rolled AS (
  SELECT event_type,
         max(k_used) AS k_used,
         max(x_tail_cents) AS x_tail_cents,
         CAST(sum(_t) AS BIGINT) AS _s
  FROM terms GROUP BY event_type
)
SELECT event_type, k_used, x_tail_cents,
       CASE WHEN k_used >= 2
            THEN (2 * _s + (k_used - 1)) // (2 * (k_used - 1)) END
         AS hill_mean_micronats,
       CASE WHEN k_used >= 2
             AND (2 * _s + (k_used - 1)) // (2 * (k_used - 1)) > 0
            THEN 1000000000
                 // ((2 * _s + (k_used - 1)) // (2 * (k_used - 1)))
       END AS alpha_milli
FROM rolled
"""


# --- average precision / PR-AUC per language (r12 queue, batch 3) ---------


def pr_auc_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (step-interpolated PR-AUC), per language, of
    the quality score as a curated-source classifier — the
    class-imbalance-honest companion to roc_auc_by_lang: ROC AUC
    barely moves when negatives flood in (it conditions on the
    negative class), while precision collapses; AP is what a curation
    gate actually experiences when curated docs are 1-in-100.

    Tie-group step convention, INTEGER-exact at histogram
    granularity: per (lang, ppm-quantized score) positive/negative
    counts; walking thresholds DESCENDING, TP and PP are inclusive
    cumulative sums over the value histogram; each tie group
    contributes delta_TP * precision, quantized per term to
    micro-units via term = (1e6 * _p * TP) div PP (identical floor
    on both engines), and ap_ppm = sum(term) div n_pos. The random-
    ranker baseline prevalence_ppm = (1e6 * n_pos) div n rides the
    same rollup — AP is only meaningful against it. NULL when a
    language has no positives.

    Scale posture (100 TB): the roc_auc plan — one groupBy
    (lang, q_ppm) collapses the corpus map-side to <= 1e6+1 distinct
    values per language, one cumulative window over that histogram,
    one rollup. Overflow: 1e6 * _p * TP <= 1e6 * n_pos^2 stays in
    int64 to ~3e6 positives per language; lift to DECIMAL(38,0) past
    that (the roc_auc wording).
    """
    from .textstats import quality_score

    q = quality_score(spark, sf_dir).select(
        "doc_id",
        F.round(F.col("quality") * 1_000_000, 0).cast("long").alias("_qp"),
    ).filter(F.col("_qp").isNotNull())
    meta = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.col("source").isin(*AUC_CURATED_SOURCES).cast("long").alias("_pos"),
    ).filter(
        # scorer-audit membership needs lang AND source defined, and
        # the Spark isin(NULL) -> NULL vs SQL CASE-ELSE-0 asymmetry
        # never fires (NULL-vintage policy)
        F.col("lang").isNotNull() & F.col("source").isNotNull()
    )
    per_val = (
        q.join(meta, "doc_id")
        .groupBy("lang", "_qp")
        .agg(
            F.sum("_pos").alias("_p"),
            F.sum(1 - F.col("_pos")).alias("_n"),
        )
    )
    w_desc = (
        Window.partitionBy("lang")
        .orderBy(F.desc("_qp"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    stepped = per_val.select(
        "lang",
        "_p",
        "_n",
        F.sum("_p").over(w_desc).alias("_tp"),
        F.sum(F.col("_p") + F.col("_n")).over(w_desc).alias("_pp"),
    )
    rolled = stepped.groupBy("lang").agg(
        F.sum("_p").alias("n_pos"),
        F.sum("_n").alias("n_neg"),
        F.sum(F.expr("(1000000 * _p * _tp) div _pp")).alias("_ap_sum"),
    )
    return rolled.select(
        "lang",
        "n_pos",
        "n_neg",
        F.when(
            F.col("n_pos") > 0,
            F.expr("_ap_sum div n_pos"),
        ).alias("ap_ppm"),
        F.expr("(1000000 * n_pos) div (n_pos + n_neg)").alias(
            "prevalence_ppm"
        ),
    )


def _pr_auc_sql() -> str:
    from .textstats import QUALITY_SQL

    sources = ", ".join(f"'{s}'" for s in AUC_CURATED_SOURCES)
    return f"""
WITH q AS ({QUALITY_SQL}),
base AS (
  SELECT d.lang,
         CAST(round(q.quality * 1000000, 0) AS BIGINT) AS _qp,
         CASE WHEN d.source IN ({sources}) THEN 1 ELSE 0 END AS _pos
  FROM q JOIN documents d ON q.doc_id = d.doc_id
  WHERE d.lang IS NOT NULL AND d.source IS NOT NULL
    AND q.quality IS NOT NULL
),
per_val AS (
  SELECT lang, _qp,
         CAST(sum(_pos) AS BIGINT) AS _p,
         CAST(sum(1 - _pos) AS BIGINT) AS _n
  FROM base GROUP BY lang, _qp
),
stepped AS (
  SELECT lang, _p, _n,
         CAST(sum(_p) OVER (PARTITION BY lang ORDER BY _qp DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS _tp,
         CAST(sum(_p + _n) OVER (PARTITION BY lang ORDER BY _qp DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS _pp
  FROM per_val
),
rolled AS (
  SELECT lang,
         CAST(sum(_p) AS BIGINT) AS n_pos,
         CAST(sum(_n) AS BIGINT) AS n_neg,
         CAST(sum((1000000 * _p * _tp) // _pp) AS BIGINT) AS _ap_sum
  FROM stepped GROUP BY lang
)
SELECT lang, n_pos, n_neg,
       CASE WHEN n_pos > 0 THEN _ap_sum // n_pos END AS ap_ppm,
       (1000000 * n_pos) // (n_pos + n_neg) AS prevalence_ppm
FROM rolled
"""


PR_AUC_SQL = _pr_auc_sql()


# --- Brier decomposition per language (r12 queue, batch 3) -----------------


def brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score, per language, of the
    quality score read as a curated-membership probability — the
    diagnosis behind quality_calibration_ece's single number: Brier =
    reliability - resolution + uncertainty separates "the score's
    values are dishonest" (reliability, fixable by recalibration)
    from "the score can't tell the classes apart" (low resolution,
    NOT fixable by recalibration) from the data's intrinsic base-rate
    noise (uncertainty). Two scorers with equal ECE can differ
    entirely in resolution — this is the operator that shows it.

    All four quantities in e-12 probability^2 units, INTEGER-exact
    past the ppm score quantization: the Brier directly off the
    (lang, q_ppm, label) cells (sum of cnt*(q - 1e6*y)^2 div N);
    reliability/resolution off the ECE's 10-bin aggregates with
    cross-multiplied integer identities — n_b*(conf_b - acc_b)^2 =
    (s_b - 1e6*o_b)^2 / n_b and n_b*(acc_b - base)^2 =
    (o_b*N - O*n_b)^2 / (n_b*N^2) — each term floor-divided
    identically on both engines before the sum (DECIMAL(38,0)/
    HUGEINT); uncertainty = (1e12*O*(N-O)) div N^2. The identity
    holds up to the per-term floors AND the 10-bin coarsening (the
    within-bin-variance residual every binned decomposition carries —
    documented, not pinned).

    Scale posture (100 TB): the ECE plan — one groupBy (lang, bin)
    to <= 10 rows per language plus one (lang, q_ppm, label)
    histogram groupBy; no window, no join wider than the doc_id
    metadata join. Output is one row per language.

    Exactness bound (ADVICE r11, matching the MWU/PR-AUC sibling
    convention): the resolution term computes `1e12 * _res_sum div
    N^3` in DECIMAL(38,0), and _res_sum = sum((o_b*N - O*n_b)^2 /
    n_b) grows like N^3 — the product stays under 38 digits only
    while N <= ~3e8 docs per language (Spark would null, DuckDB
    error, past it). At that volume, pre-divide by N per bin (one
    extra floor, documented residual) or widen to a two-step
    HUGEINT-style split.
    """
    from .textstats import quality_score

    q = quality_score(spark, sf_dir).select(
        "doc_id",
        F.round(F.col("quality") * 1_000_000, 0).cast("long").alias("_qp"),
    ).filter(F.col("_qp").isNotNull())
    meta = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.col("source").isin(*AUC_CURATED_SOURCES).cast("long").alias("_pos"),
    ).filter(
        # scorer-audit membership needs lang AND source defined, and
        # the Spark isin(NULL) -> NULL vs SQL CASE-ELSE-0 asymmetry
        # never fires (NULL-vintage policy)
        F.col("lang").isNotNull() & F.col("source").isNotNull()
    )
    j = q.join(meta, "doc_id")
    # cached: the (lang, q_ppm, label) histogram feeds the Brier
    # rollup AND the bin frame (and `brier` itself is referenced
    # twice more); uncached, the quality-scoring scan re-ran per
    # reference (12 parquet scans in the r13 before-plan, 1.22 s
    # isolated). Guide §5.
    cells = j.groupBy("lang", "_qp", "_pos").agg(
        F.count(F.lit(1)).alias("_c")
    ).transform(stage)
    brier = cells.groupBy("lang").agg(
        F.sum("_c").alias("_n"),
        F.sum(F.col("_c") * F.col("_pos")).alias("_o"),
        F.sum(
            F.expr(
                "CAST(_c AS DECIMAL(38,0)) * (_qp - 1000000 * _pos)"
                " * (_qp - 1000000 * _pos)"
            )
        ).alias("_bsum"),
    )
    # the bin frame rolls up from the value-cell histogram already
    # built for the Brier — the corpus scoring pass runs ONCE
    bins = (
        cells.select(
            "lang",
            "_c",
            "_pos",
            "_qp",
            F.expr(f"least(_qp div 100000, {ECE_BINS - 1})").alias("_bin"),
        )
        .groupBy("lang", "_bin")
        .agg(
            F.sum("_c").alias("_nb"),
            F.sum(F.col("_c") * F.col("_pos")).alias("_ob"),
            F.sum(F.col("_c") * F.col("_qp")).alias("_sb"),
        )
    )
    binrolled = bins.join(
        brier.select("lang", "_n", "_o"), "lang"
    ).groupBy("lang").agg(
        F.sum(
            F.expr(
                "(CAST(_sb AS DECIMAL(38,0)) - 1000000 * _ob)"
                " * (_sb - 1000000 * _ob) div _nb"
            )
        ).alias("_rel_sum"),
        F.sum(
            F.expr(
                "(CAST(_ob AS DECIMAL(38,0)) * _n - CAST(_o AS"
                " DECIMAL(38,0)) * _nb) * (CAST(_ob AS DECIMAL(38,0))"
                " * _n - CAST(_o AS DECIMAL(38,0)) * _nb) div _nb"
            )
        ).alias("_res_sum"),
    )
    return brier.join(binrolled, "lang").select(
        "lang",
        F.col("_n").alias("n_docs"),
        F.col("_o").alias("n_pos"),
        F.expr("CAST(_bsum div _n AS BIGINT)").alias("brier_e12"),
        F.expr("CAST(_rel_sum div _n AS BIGINT)").alias("reliability_e12"),
        F.expr(
            "CAST((1000000000000 * _res_sum)"
            " div (CAST(_n AS DECIMAL(38,0)) * _n * _n) AS BIGINT)"
        ).alias("resolution_e12"),
        F.expr(
            "CAST((1000000000000 * CAST(_o AS DECIMAL(38,0)) * (_n - _o))"
            " div (CAST(_n AS DECIMAL(38,0)) * _n) AS BIGINT)"
        ).alias("uncertainty_e12"),
    )


def _brier_sql() -> str:
    from .textstats import QUALITY_SQL

    sources = ", ".join(f"'{s}'" for s in AUC_CURATED_SOURCES)
    return f"""
WITH q AS ({QUALITY_SQL}),
base AS (
  SELECT d.lang,
         CAST(round(q.quality * 1000000, 0) AS BIGINT) AS _qp,
         CASE WHEN d.source IN ({sources}) THEN 1 ELSE 0 END AS _pos
  FROM q JOIN documents d ON q.doc_id = d.doc_id
  WHERE d.lang IS NOT NULL AND d.source IS NOT NULL
    AND q.quality IS NOT NULL
),
cells AS (
  SELECT lang, _qp, _pos, CAST(count(*) AS BIGINT) AS _c
  FROM base GROUP BY lang, _qp, _pos
),
brier AS (
  SELECT lang,
         CAST(sum(_c) AS BIGINT) AS _n,
         CAST(sum(_c * _pos) AS BIGINT) AS _o,
         CAST(sum(CAST(_c AS HUGEINT) * (_qp - 1000000 * _pos)
                  * (_qp - 1000000 * _pos)) AS HUGEINT) AS _bsum
  FROM cells GROUP BY lang
),
bins AS (
  SELECT lang, least(_qp // 100000, {ECE_BINS - 1}) AS _bin,
         CAST(sum(_c) AS BIGINT) AS _nb,
         CAST(sum(_c * _pos) AS BIGINT) AS _ob,
         CAST(sum(_c * _qp) AS BIGINT) AS _sb
  FROM cells GROUP BY lang, least(_qp // 100000, {ECE_BINS - 1})
),
binrolled AS (
  SELECT b.lang,
         CAST(sum((CAST(b._sb AS HUGEINT) - 1000000 * b._ob)
                  * (b._sb - 1000000 * b._ob) // b._nb) AS HUGEINT)
           AS _rel_sum,
         CAST(sum((CAST(b._ob AS HUGEINT) * r._n
                   - CAST(r._o AS HUGEINT) * b._nb)
                  * (CAST(b._ob AS HUGEINT) * r._n
                     - CAST(r._o AS HUGEINT) * b._nb) // b._nb)
              AS HUGEINT) AS _res_sum
  FROM bins b JOIN brier r ON b.lang = r.lang
  GROUP BY b.lang
)
SELECT r.lang,
       r._n AS n_docs,
       r._o AS n_pos,
       CAST(r._bsum // r._n AS BIGINT) AS brier_e12,
       CAST(br._rel_sum // r._n AS BIGINT) AS reliability_e12,
       CAST((1000000000000 * br._res_sum)
            // (CAST(r._n AS HUGEINT) * r._n * r._n) AS BIGINT)
         AS resolution_e12,
       CAST((1000000000000 * CAST(r._o AS HUGEINT) * (r._n - r._o))
            // (CAST(r._n AS HUGEINT) * r._n) AS BIGINT)
         AS uncertainty_e12
FROM brier r JOIN binrolled br ON r.lang = br.lang
"""


BRIER_DECOMP_SQL = _brier_sql()


# --- Cliff's delta of quality, each source vs the rest ----------------------


def cliffs_delta_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta of the quality score, each source against the
    rest of the corpus — the ORDINAL effect size the drift family
    reports nowhere: MWU's CLES answers the paired question between
    two fixed epochs, trimmed/winsorized means still live on the
    value scale; Cliff's delta = P(x > y) - P(x < y) is the
    scale-free "does this source's quality dominate the rest" number
    a mix designer reads before weighting a source up or down, robust
    to any monotone rescoring of quality.

    INTEGER-exact at permille granularity: quality quantized to
    permille (domain-BOUNDED spine <= 1001 values — the t-closeness
    lesson: quantization choice IS the scale posture), per-(source,
    value) histogram densified against the global value spine, and
    the pair counts from cumulative windows over the histogram:
    greater = sum_v c_s(v) * rest(<v), less = n_s*n_rest -
    sum_v c_s(v) * rest(<=v) — never a doc-level pair join. The
    quotient delta_ppm = 1e6*(greater-less)/(n_s*n_rest) can be
    NEGATIVE, so it runs through the shifted nonnegative quotient
    (+1e6*den before the div, -1e6 after; the theil_sen idiom) — a
    CONVENTION pinning floor semantics for signed quotients on two
    truncate-toward-zero engines (Spark div and DuckDB BIGINT/
    HUGEINT `//` both truncate; verified, see the dbscan_core_cells
    note in clustering.py), all
    in DECIMAL(38,0)/HUGEINT (1e6 * n_s * n_rest clears int64 only
    to ~3e6 docs per side). NULL delta when a source IS the corpus
    (no rest) — undefined, not zero.

    Scale posture (100 TB): one (source, permille) groupBy collapses
    the corpus map-side to <= |sources| x 1001 cells; the dense
    spine is a |sources| x |values| cross join of two tiny distinct
    frames; two cumulative windows slide per source over <= 1001
    rows. Output is one row per source.
    """
    from .textstats import quality_score

    q = quality_score(spark, sf_dir).select(
        "doc_id",
        F.round(F.col("quality") * 1000, 0).cast("long").alias("_qm"),
    )
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    base = q.join(src, "doc_id")
    # cached: the <= |sources| x 1001-row histogram feeds the global
    # spine, the source list, AND the densify join; uncached, the
    # quality-scoring scan re-ran per reference (12 parquet scans in
    # the r13 before-plan, 1.40 s isolated). Guide §5.
    hist = base.groupBy("source", "_qm").agg(
        F.count(F.lit(1)).alias("_c")
    ).transform(stage)
    ghist = hist.groupBy("_qm").agg(F.sum("_c").alias("_g"))
    srcs = hist.select("source").distinct()
    dense = (
        # both sides are tiny (|sources| x <= 1001 permille values);
        # broadcasting the value spine keeps the densify off the
        # CartesianProduct path at any corpus size
        srcs.crossJoin(F.broadcast(ghist))
        .join(hist, ["source", "_qm"], "left")
        .select(
            "source",
            "_qm",
            "_g",
            F.coalesce("_c", F.lit(0).cast("long")).alias("_c"),
        )
    )
    w_lt = (
        Window.partitionBy("source")
        .orderBy("_qm")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    stepped = dense.select(
        "source",
        "_c",
        "_g",
        (
            F.coalesce(F.sum("_g").over(w_lt), F.lit(0))
            - F.coalesce(F.sum("_c").over(w_lt), F.lit(0))
        ).alias("_rest_lt"),
    ).select(
        "source",
        "_c",
        "_g",
        "_rest_lt",
        (F.col("_rest_lt") + F.col("_g") - F.col("_c")).alias("_rest_le"),
    )
    rolled = stepped.groupBy("source").agg(
        F.sum("_c").alias("_ns"),
        F.sum("_g").alias("_n"),
        F.sum(F.col("_c") * F.col("_rest_lt")).alias("_gt"),
        F.sum(F.col("_c") * F.col("_rest_le")).alias("_sle"),
    )
    return rolled.select(
        "source",
        F.col("_ns").alias("n_source"),
        (F.col("_n") - F.col("_ns")).alias("n_rest"),
        F.col("_gt").alias("greater_pairs"),
        ((F.col("_n") - F.col("_ns")) * F.col("_ns") - F.col("_sle")).alias(
            "less_pairs"
        ),
        F.expr(
            "CAST(CASE WHEN _ns * (_n - _ns) > 0 THEN"
            " CAST((1000000 * (CAST(_gt AS DECIMAL(38,0))"
            " - ((_n - _ns) * _ns - _sle))"
            " + 1000000 * CAST(_ns AS DECIMAL(38,0)) * (_n - _ns))"
            " div (CAST(_ns AS DECIMAL(38,0)) * (_n - _ns)) AS BIGINT)"
            " - 1000000 END AS BIGINT)"
        ).alias("cliffs_delta_ppm"),
    )


def _cliffs_delta_sql() -> str:
    from .textstats import QUALITY_SQL

    return f"""
WITH q AS ({QUALITY_SQL}),
base AS (
  SELECT d.source, CAST(round(q.quality * 1000, 0) AS BIGINT) AS _qm
  FROM q JOIN documents d ON q.doc_id = d.doc_id
),
hist AS (
  SELECT source, _qm, CAST(count(*) AS BIGINT) AS _c
  FROM base GROUP BY source, _qm
),
ghist AS (SELECT _qm, CAST(sum(_c) AS BIGINT) AS _g FROM hist GROUP BY _qm),
srcs AS (SELECT DISTINCT source FROM hist),
dense AS (
  SELECT s.source, g._qm, g._g, coalesce(h._c, 0) AS _c
  FROM srcs s CROSS JOIN ghist g
  LEFT JOIN hist h ON h.source = s.source AND h._qm = g._qm
),
stepped AS (
  SELECT source, _c, _g,
         CAST(coalesce(sum(_g) OVER w, 0) - coalesce(sum(_c) OVER w, 0)
              AS BIGINT) AS _rest_lt
  FROM dense
  WINDOW w AS (PARTITION BY source ORDER BY _qm
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
rolled AS (
  SELECT source,
         CAST(sum(_c) AS BIGINT) AS _ns,
         CAST(sum(_g) AS BIGINT) AS _n,
         CAST(sum(_c * _rest_lt) AS BIGINT) AS _gt,
         CAST(sum(_c * (_rest_lt + _g - _c)) AS BIGINT) AS _sle
  FROM stepped GROUP BY source
)
SELECT source,
       _ns AS n_source,
       _n - _ns AS n_rest,
       _gt AS greater_pairs,
       (_n - _ns) * _ns - _sle AS less_pairs,
       CAST(CASE WHEN _ns * (_n - _ns) > 0 THEN
         CAST((1000000 * (CAST(_gt AS HUGEINT) - ((_n - _ns) * _ns - _sle))
               + 1000000 * CAST(_ns AS HUGEINT) * (_n - _ns))
              // (CAST(_ns AS HUGEINT) * (_n - _ns)) AS BIGINT)
         - 1000000 END AS BIGINT) AS cliffs_delta_ppm
FROM rolled
"""


CLIFFS_DELTA_SQL = _cliffs_delta_sql()


# --- Kendall tau-b between quality and length, per language -----------------

KENDALL_BUCKETS = 10


def kendall_tau_quality_length(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Kendall tau-b rank correlation between the quality score and
    document length, per language — the concordance twin of
    spearman_quality_length: Spearman squares rank gaps (one wild
    pair moves it a lot), tau counts pair ORDER AGREEMENTS (every
    pair votes once), so the two disagreeing is itself a signal that
    a few extreme documents, not a monotone trend, drive the
    correlation. Computed on the decile-bucketed contingency table
    with the tie-corrected tau-b, the right form when bucketing
    creates heavy ties by construction.

    INTEGER-exact: both axes quantized to at most 10 equal-width
    buckets (quality permille and n_chars against their per-lang
    min/max via the domain-bounded integer formula (v - lo) * B div
    (hi - lo + 1)), the contingency cells counted in one groupBy,
    and concordant/discordant/tie pair counts from the CELL-PAIR
    join (<= C(B^2, 2) ~ 5k cell pairs per lang — bounded by the
    grid, never by the corpus): C = sum n1*n2 over cell pairs with
    both axes strictly greater, D = both axes opposed. tau_b =
    (C - D)/sqrt((T0 - Tx)(T0 - Ty)) reports as tau_b_milli via one
    floor(sqrt()) on an identical DECIMAL product (the cramers_v
    sqrt contract) with the sign carried separately (sqrt eats it),
    via the shifted-quotient floor-division idiom for the signed
    numerator. NULL when either axis is constant.

    Scale posture (100 TB): one (lang, qb, lb) groupBy collapses the
    corpus map-side to <= |langs| x 100 cells; the pair join runs on
    that cell frame (self-join bounded by the grid); marginal tie
    sums are two tiny rollups. Output is one row per language.
    """
    from .textstats import quality_score

    B = KENDALL_BUCKETS
    q = quality_score(spark, sf_dir).select(
        "doc_id",
        F.round(F.col("quality") * 1000, 0).cast("long").alias("_qm"),
    )
    meta = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    base = q.join(meta, "doc_id")
    lims = base.groupBy("lang").agg(
        F.min("_qm").alias("_qlo"),
        F.max("_qm").alias("_qhi"),
        F.min("n_chars").alias("_llo"),
        F.max("n_chars").alias("_lhi"),
    )
    bucketed = base.join(F.broadcast(lims), "lang").select(
        "lang",
        F.expr(
            f"((_qm - _qlo) * {B}) div (_qhi - _qlo + 1)"
        ).alias("_qb"),
        F.expr(
            f"((n_chars - _llo) * {B}) div (_lhi - _llo + 1)"
        ).alias("_lb"),
    )
    # cached: the <= |langs| x B^2-row cell frame feeds FIVE branches
    # (both sides of the pair join, the marginal rollup, and the two
    # tie sums); uncached, the whole quality-scoring scan + bucketing
    # re-ran per reference (40 parquet scans / 84 Exchanges in the
    # r13 before-plan, 1.43 s isolated). Guide §5.
    cells = bucketed.groupBy("lang", "_qb", "_lb").agg(
        F.count(F.lit(1)).alias("_n")
    ).transform(stage)
    a, b = cells.alias("a"), cells.alias("b")
    pair_counts = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (
                (F.col("a._qb") < F.col("b._qb"))
                | (
                    (F.col("a._qb") == F.col("b._qb"))
                    & (F.col("a._lb") < F.col("b._lb"))
                )
            ),
        )
        .groupBy(F.col("a.lang").alias("lang"))
        .agg(
            F.sum(
                F.when(
                    (F.col("a._qb") < F.col("b._qb"))
                    & (F.col("a._lb") < F.col("b._lb")),
                    F.col("a._n") * F.col("b._n"),
                ).otherwise(F.lit(0))
            ).alias("_conc"),
            F.sum(
                F.when(
                    (F.col("a._qb") < F.col("b._qb"))
                    & (F.col("a._lb") > F.col("b._lb")),
                    F.col("a._n") * F.col("b._n"),
                ).otherwise(F.lit(0))
            ).alias("_disc"),
        )
    )
    marg = cells.groupBy("lang").agg(F.sum("_n").alias("_nn"))
    tx = (
        cells.groupBy("lang", "_qb")
        .agg(F.sum("_n").alias("_m"))
        .groupBy("lang")
        .agg(
            F.sum(F.expr("CAST(_m AS DECIMAL(38,0)) * (_m - 1)")).alias(
                "_tx"
            )
        )
    )
    ty = (
        cells.groupBy("lang", "_lb")
        .agg(F.sum("_n").alias("_m"))
        .groupBy("lang")
        .agg(
            F.sum(F.expr("CAST(_m AS DECIMAL(38,0)) * (_m - 1)")).alias(
                "_ty"
            )
        )
    )
    joined = (
        marg.join(pair_counts, "lang", "left")
        .join(tx, "lang")
        .join(ty, "lang")
        .select(
            "lang",
            F.col("_nn").alias("n_docs"),
            F.coalesce("_conc", F.lit(0).cast("long")).alias("concordant"),
            F.coalesce("_disc", F.lit(0).cast("long")).alias("discordant"),
            "_tx",
            "_ty",
        )
    )
    # tau_b = (C - D) / sqrt((T0 - Tx) * (T0 - Ty)), T0 = n(n-1)/2 and
    # Tx/Ty the per-axis tie pair sums (both doubled here — the /2
    # cancels). Signed milli quantization: |C-D| through the floored
    # sqrt of the exact DECIMAL denominator product, sign re-applied.
    return joined.select(
        "lang",
        "n_docs",
        "concordant",
        "discordant",
        F.expr(
            "CAST(CASE WHEN"
            " (CAST(n_docs AS DECIMAL(38,0)) * (n_docs - 1) - _tx) > 0"
            " AND (CAST(n_docs AS DECIMAL(38,0)) * (n_docs - 1) - _ty) > 0"
            " THEN CASE WHEN concordant >= discordant THEN 1 ELSE -1 END"
            " * CAST(floor(2000 * (concordant - discordant)"
            " * CASE WHEN concordant >= discordant THEN 1 ELSE -1 END"
            " / sqrt(CAST((CAST(n_docs AS DECIMAL(38,0)) * (n_docs - 1)"
            " - _tx) * (CAST(n_docs AS DECIMAL(38,0)) * (n_docs - 1) - _ty)"
            " AS DOUBLE))) AS BIGINT) END AS BIGINT)"
        ).alias("tau_b_milli"),
    )


def _kendall_sql() -> str:
    from .textstats import QUALITY_SQL

    B = KENDALL_BUCKETS
    return f"""
WITH q AS ({QUALITY_SQL}),
base AS (
  SELECT d.lang, CAST(round(q.quality * 1000, 0) AS BIGINT) AS _qm,
         d.n_chars
  FROM q JOIN documents d ON q.doc_id = d.doc_id
),
lims AS (
  SELECT lang, min(_qm) AS _qlo, max(_qm) AS _qhi,
         min(n_chars) AS _llo, max(n_chars) AS _lhi
  FROM base GROUP BY lang
),
bucketed AS (
  SELECT b.lang,
         ((b._qm - l._qlo) * {B}) // (l._qhi - l._qlo + 1) AS _qb,
         ((b.n_chars - l._llo) * {B}) // (l._lhi - l._llo + 1) AS _lb
  FROM base b JOIN lims l ON b.lang = l.lang
),
cells AS (
  SELECT lang, _qb, _lb, CAST(count(*) AS BIGINT) AS _n
  FROM bucketed GROUP BY lang, _qb, _lb
),
pair_counts AS (
  SELECT a.lang,
         CAST(sum(CASE WHEN a._qb < b._qb AND a._lb < b._lb
                  THEN a._n * b._n ELSE 0 END) AS BIGINT) AS _conc,
         CAST(sum(CASE WHEN a._qb < b._qb AND a._lb > b._lb
                  THEN a._n * b._n ELSE 0 END) AS BIGINT) AS _disc
  FROM cells a JOIN cells b
    ON a.lang = b.lang
   AND (a._qb < b._qb OR (a._qb = b._qb AND a._lb < b._lb))
  GROUP BY a.lang
),
marg AS (
  SELECT lang, CAST(sum(_n) AS BIGINT) AS _nn
  FROM cells GROUP BY lang
),
tx AS (
  SELECT lang, CAST(sum(CAST(_m AS HUGEINT) * (_m - 1)) AS HUGEINT) AS _tx
  FROM (SELECT lang, _qb, CAST(sum(_n) AS BIGINT) AS _m
        FROM cells GROUP BY lang, _qb) GROUP BY lang
),
ty AS (
  SELECT lang, CAST(sum(CAST(_m AS HUGEINT) * (_m - 1)) AS HUGEINT) AS _ty
  FROM (SELECT lang, _lb, CAST(sum(_n) AS BIGINT) AS _m
        FROM cells GROUP BY lang, _lb) GROUP BY lang
)
SELECT m.lang, m._nn AS n_docs,
       CAST(coalesce(p._conc, 0) AS BIGINT) AS concordant,
       CAST(coalesce(p._disc, 0) AS BIGINT) AS discordant,
       CAST(CASE WHEN (CAST(m._nn AS HUGEINT) * (m._nn - 1) - t1._tx) > 0
                  AND (CAST(m._nn AS HUGEINT) * (m._nn - 1) - t2._ty) > 0
         THEN CASE WHEN coalesce(p._conc, 0) >= coalesce(p._disc, 0)
                   THEN 1 ELSE -1 END
           * CAST(floor(2000 * (coalesce(p._conc, 0) - coalesce(p._disc, 0))
             * CASE WHEN coalesce(p._conc, 0) >= coalesce(p._disc, 0)
                    THEN 1 ELSE -1 END
             / sqrt(CAST((CAST(m._nn AS HUGEINT) * (m._nn - 1) - t1._tx)
               * (CAST(m._nn AS HUGEINT) * (m._nn - 1) - t2._ty)
               AS DOUBLE))) AS BIGINT) END AS BIGINT) AS tau_b_milli
FROM marg m
LEFT JOIN pair_counts p ON m.lang = p.lang
JOIN tx t1 ON m.lang = t1.lang
JOIN ty t2 ON m.lang = t2.lang
"""


KENDALL_TAU_SQL = _kendall_sql()


# --- multi-touch purchase attribution (round-14 queue) ------------------

# Touch types credited by the attribution models. 'error' events are
# diagnostics, not marketing touches; 'purchase' rows are the
# conversions being attributed.
ATTRIB_TOUCH_TYPES = ("view", "click", "signup")


def multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch conversion attribution: split each purchase's value
    across the user's preceding touch events (views/clicks/signups
    since their previous purchase) under the three standard credit
    models, rolled up per touch type — first-touch, last-touch, and
    linear. purchase_attribution (relational.py) answers "what was
    the last purchase before this event"; this answers the reverse
    marketing question, "which events get credit FOR the purchase".

    Attribution windows without a doubled scan: one pass assigns
    every event its running purchase count (cum_p); a touch with
    cum_p = k belongs to the window of the (k+1)-th purchase, and the
    purchase row itself closes window cum_p - 1 — so windows fall out
    of ONE cumulative window function, no self-join on time ranges.
    First/last per window via row_number over (ts, event_id)
    (event_id breaks timestamp ties — the lineitem tiebreak lesson).
    Linear credit is floor(cents * 1000 / n_touches) MILLI-cents per
    touch (remainder < n milli-cents per purchase stays unassigned —
    exact, associative, engine-identical); purchases with no touches
    in window earn no credit rows (reported by the models as the
    direct-conversion gap between credited and total cents).

    Scale posture (100 TB): two exchanges on user_id (the cumulative
    window, then the per-window rollup via groupBy) and a final
    |touch types|-row aggregate. Window state is per-user event
    history — the sessionize partition discipline; nothing joins on
    time ranges or explodes pairs.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum_p = F.sum(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    ).over(w)
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        (
            cum_p
            - F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("win"),
    )
    purchases = tagged.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "win",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    touches = tagged.filter(
        F.col("event_type").isin(*ATTRIB_TOUCH_TYPES)
    ).select("user_id", "win", "ts", "event_id", "event_type")
    tw = Window.partitionBy("user_id", "win")
    ranked = touches.select(
        "user_id",
        "win",
        "event_type",
        F.row_number()
        .over(tw.orderBy("ts", "event_id"))
        .alias("_rn_first"),
        F.row_number()
        .over(tw.orderBy(F.desc("ts"), F.desc("event_id")))
        .alias("_rn_last"),
        F.count(F.lit(1)).over(tw).alias("_n"),
    )
    credited = ranked.join(purchases, ["user_id", "win"]).select(
        "event_type",
        F.when(F.col("_rn_first") == 1, F.col("cents"))
        .otherwise(0)
        .alias("_first"),
        F.when(F.col("_rn_last") == 1, F.col("cents"))
        .otherwise(0)
        .alias("_last"),
        F.expr("cents * 1000 div _n").alias("_linear_milli"),
    )
    return credited.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_touches_credited"),
        F.sum("_first").alias("first_touch_cents"),
        F.sum("_last").alias("last_touch_cents"),
        F.sum("_linear_milli").alias("linear_milli_cents"),
    )


MULTITOUCH_SQL = f"""
WITH tagged AS (
  SELECT user_id, ts, event_id, event_type, value,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id)
         - CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS win
  FROM events
),
purchases AS (
  SELECT user_id, win,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM tagged WHERE event_type = 'purchase'
),
touches AS (
  SELECT user_id, win, ts, event_id, event_type
  FROM tagged
  WHERE event_type IN {tuple(ATTRIB_TOUCH_TYPES)!r}
),
ranked AS (
  SELECT user_id, win, event_type,
         row_number() OVER (PARTITION BY user_id, win
                            ORDER BY ts, event_id) AS _rn_first,
         row_number() OVER (PARTITION BY user_id, win
                            ORDER BY ts DESC, event_id DESC) AS _rn_last,
         count(*) OVER (PARTITION BY user_id, win) AS _n
  FROM touches
),
credited AS (
  SELECT r.event_type,
         CASE WHEN r._rn_first = 1 THEN p.cents ELSE 0 END AS _first,
         CASE WHEN r._rn_last = 1 THEN p.cents ELSE 0 END AS _last,
         p.cents * 1000 // r._n AS _linear_milli
  FROM ranked r JOIN purchases p
    ON r.user_id = p.user_id AND r.win = p.win
)
SELECT event_type,
       count(*) AS n_touches_credited,
       CAST(sum(_first) AS BIGINT) AS first_touch_cents,
       CAST(sum(_last) AS BIGINT) AS last_touch_cents,
       CAST(sum(_linear_milli) AS BIGINT) AS linear_milli_cents
FROM credited GROUP BY event_type
"""
