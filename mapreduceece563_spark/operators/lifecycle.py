"""Customer-lifecycle analytics: RFM segmentation, churn labeling,
and day-weighted revenue allocation across calendar quarters.

The reference engine has no relational-analytics surface (SURVEY.md
§0 — it is a word-count engine); these extend the engine the way the
other analytics operators do, each with a DuckDB oracle and a plan
shaped for the 100 TB posture:

- **RFM** aggregates once per customer (one shuffle on the natural
  key), then scores the tiny per-customer frame with three ntile
  windows. Same stated scale caveat as customer_balance_deciles: an
  exact global ntile serializes through one task; at 100 TB you'd
  band-join against percentile_approx boundaries — the exact form
  exists because the oracle needs the exact answer and a per-customer
  aggregate is dim-sized (1.5M rows at SF100), not fact-sized.
- **Churn** is one groupBy(custkey) plus a broadcast 1-row global
  max-date frame — no second scan of orders, no window.
- **Quarter overlap** is the range-join-without-a-range-join pattern:
  each (orderdate, shipdate] interval explodes to the calendar
  quarters it covers (bounded fan-out: the order book spans ~27
  quarters) and aggregates by quarter — an equi-shuffle on the bin
  key instead of the O(n·m) inequality join the oracle writes.
  Allocation arithmetic is pure int64 (cents x days div total-days),
  so cross-engine totals cannot drift on a double tie.

Determinism contracts: money in int64 cents (relational._cents),
ratios via the pure-int64 half-up idiom, ntile orderings carry a
unique custkey tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .relational import _cents, _cents_sql

# Fixed analysis date: one day past the last order date in the
# dataset (TESTDATA.md: o_orderdate spans 1995-01-01..2001-08-01).
# A constant, not max(o_orderdate), so "recency" is stable across
# subsets of the data and both engines agree by construction.
RFM_REF_DATE = "2001-08-02"
CHURN_WINDOW_DAYS = 365


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers scored into quartiles on Recency / Frequency /
    Monetary, rolled up to one row per (r, f, m) segment with the
    customer count and half-up average spend.

    r=1 is the most recently active quartile; f=1 / m=1 the most
    frequent / highest-spend quartiles (ORDER BY ... DESC for f and
    m). Only customers with >= 1 order appear — recency is undefined
    for the rest.

    Scale caveat (same trade as customer_balance_deciles): the three
    unpartitioned ntiles funnel the per-customer aggregate through
    one task — exact global quartiles serialize by nature. The input
    is already collapsed to one row per customer (never the order
    facts), which bounds it to dim scale; at 10^8+ customers you'd
    compute approximate quartile cutoffs (percentile_approx on
    r/f/m, one pass, mergeable) and band-join customers to them.
    The exact form stays because the oracle needs the exact
    answer."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", _cents(F.col("o_totalprice")).alias("_tc")
    )
    per_cust = orders.groupBy("o_custkey").agg(
        F.datediff(
            F.lit(RFM_REF_DATE).cast("date"),
            F.max(F.col("o_orderdate").cast("date")),
        ).alias("r_days"),
        F.count("*").alias("f_orders"),
        F.sum("_tc").alias("m_cents"),
    )
    scored = per_cust.select(
        "m_cents",
        F.ntile(4)
        .over(Window.orderBy(F.asc("r_days"), F.asc("o_custkey")))
        .alias("r_score"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("f_orders"), F.asc("o_custkey")))
        .alias("f_score"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("m_cents"), F.asc("o_custkey")))
        .alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("m_cents").alias("_s"),
        )
        .select(
            "r_score",
            "f_score",
            "m_score",
            "n_customers",
            (
                F.expr("(2 * _s + n_customers) div (2 * n_customers)")
                / 100.0
            ).alias("avg_spend"),
        )
    )


RFM_SEGMENTS_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey,
         date_diff('day', CAST(max(o_orderdate) AS DATE),
                   DATE '{RFM_REF_DATE}') AS r_days,
         count(*) AS f_orders,
         sum({_cents_sql('o_totalprice')}) AS m_cents
  FROM orders GROUP BY o_custkey
),
scored AS (
  SELECT m_cents,
         ntile(4) OVER (ORDER BY r_days ASC, o_custkey ASC) AS r_score,
         ntile(4) OVER (ORDER BY f_orders DESC, o_custkey ASC) AS f_score,
         ntile(4) OVER (ORDER BY m_cents DESC, o_custkey ASC) AS m_score
  FROM per_cust
)
SELECT r_score, f_score, m_score,
       count(*) AS n_customers,
       ((2 * sum(m_cents) + count(*)) // (2 * count(*))) / 100.0 AS avg_spend
FROM scored GROUP BY r_score, f_score, m_score
"""


def churn_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per market segment: ordered-customer count, how many have gone
    quiet (no order within CHURN_WINDOW_DAYS of the dataset's last
    order date), and the churn rate in ppm.

    One shuffle on o_custkey for last-order; the global max date is a
    1-row aggregate attached by broadcast cross join (never a second
    scan); the customer dim joins on the same custkey key. Customers
    who never ordered are out of scope (no last-order date to judge
    churn by)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("od")
    )
    last = orders.groupBy("o_custkey").agg(F.max("od").alias("last_od"))
    global_max = orders.agg(F.max("od").alias("max_od"))
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    lab = (
        last.crossJoin(F.broadcast(global_max))
        .join(cust, last["o_custkey"] == cust["c_custkey"])
        .select(
            "c_mktsegment",
            F.when(
                F.datediff(F.col("max_od"), F.col("last_od"))
                > CHURN_WINDOW_DAYS,
                1,
            )
            .otherwise(0)
            .alias("churned"),
        )
    )
    return (
        lab.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("churned").alias("n_churned"),
        )
        .select(
            "c_mktsegment",
            "n_customers",
            "n_churned",
            (
                F.expr(
                    "(2 * 1000000 * n_churned + n_customers)"
                    " div (2 * n_customers)"
                )
                / 1e6
            ).alias("churn_rate"),
        )
    )


CHURN_BY_SEGMENT_SQL = f"""
WITH last AS (
  SELECT o_custkey, CAST(max(o_orderdate) AS DATE) AS last_od
  FROM orders GROUP BY o_custkey
),
gm AS (SELECT CAST(max(o_orderdate) AS DATE) AS max_od FROM orders),
lab AS (
  SELECT c.c_mktsegment,
         CASE WHEN date_diff('day', l.last_od, gm.max_od)
                   > {CHURN_WINDOW_DAYS}
              THEN 1 ELSE 0 END AS churned
  FROM last l CROSS JOIN gm JOIN customer c ON l.o_custkey = c.c_custkey
)
SELECT c_mktsegment, count(*) AS n_customers,
       CAST(sum(churned) AS BIGINT) AS n_churned,
       ((2 * 1000000 * sum(churned) + count(*)) // (2 * count(*))) / 1e6
         AS churn_rate
FROM lab GROUP BY c_mktsegment
"""


# Quarter spine covers the full order book (TESTDATA.md date range)
# with slack; a fixed literal so both engines bin identically.
QTR_FIRST = "1995-01-01"


def quarter_revenue_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-weighted allocation of each line item's discounted revenue
    across the calendar quarters its order-to-ship interval covers.

    The oracle formulates this as an interval/spine inequality join —
    the textbook range join that degenerates to all-pairs at scale.
    The Spark plan decomposes it to an EQUI key: explode each
    interval into the quarters it overlaps (sequence() of quarter
    starts — bounded fan-out, the order book spans ~27 quarters) and
    aggregate by quarter-start. Allocation is pure int64:
    alloc = rev_cents * overlap_days div interval_days, remainder
    deliberately dropped (documented, identical in both engines).

    Data hygiene, stated: the synthetic tables do NOT respect the
    TPC-H shipdate >= orderdate invariant (about half the rows invert
    it), so the interval endpoints are normalized with least/greatest
    in BOTH engines rather than assumed ordered."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        _cents(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).alias("rev_c"),
        F.col("l_shipdate").cast("date").alias("_ship"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("_od")
    )
    iv = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        "rev_c",
        F.least("_od", "_ship").alias("od"),
        F.greatest("_od", "_ship").alias("ship"),
    ).select(
        "rev_c",
        "od",
        "ship",
        (F.datediff("ship", "od") + 1).alias("len_days"),
    )
    # The quarter fan-out runs as an INTEGER sequence over quarter
    # indices (year*4 + quarter) with one make_date per emitted row,
    # not a date sequence stepped by `interval 3 months` — the
    # interval-stepped date sequence walks month arithmetic per
    # element and measured ~2.5x slower at sf0.1 (r13 optimization;
    # same emitted quarter starts).
    q = iv.select(
        "rev_c",
        "od",
        "ship",
        "len_days",
        F.explode(
            F.sequence(
                F.year("od") * 4 + F.quarter("od") - 1,
                F.year("ship") * 4 + F.quarter("ship") - 1,
            )
        ).alias("_qi"),
    ).select(
        "rev_c",
        "od",
        "ship",
        "len_days",
        F.make_date(
            F.expr("_qi div 4"), (F.col("_qi") % 4) * 3 + 1, F.lit(1)
        ).alias("q_start"),
    )
    alloc = q.select(
        "q_start",
        F.expr(
            "rev_c * (datediff(least(ship, date_sub(add_months(q_start, 3), 1)),"
            " greatest(od, q_start)) + 1) div len_days"
        ).alias("alloc_c"),
    )
    return (
        alloc.groupBy("q_start")
        .agg(
            F.count("*").alias("n_allocations"),
            F.sum("alloc_c").alias("_s"),
        )
        .select(
            "q_start",
            "n_allocations",
            (F.col("_s") / 100.0).alias("revenue"),
        )
    )


QUARTER_REVENUE_OVERLAP_SQL = f"""
WITH iv0 AS (
  SELECT {_cents_sql('l_extendedprice * (1 - l_discount)')} AS rev_c,
         least(CAST(o.o_orderdate AS DATE),
               CAST(l.l_shipdate AS DATE)) AS od,
         greatest(CAST(o.o_orderdate AS DATE),
                  CAST(l.l_shipdate AS DATE)) AS ship
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
iv AS (
  SELECT rev_c, od, ship,
         date_diff('day', od, ship) + 1 AS len_days
  FROM iv0
),
spine AS (
  SELECT CAST(q AS DATE) AS q_start
  FROM (SELECT unnest(generate_series(DATE '{QTR_FIRST}',
                                      DATE '2002-12-31',
                                      INTERVAL 3 MONTH)) AS q)
),
alloc AS (
  SELECT s.q_start,
         iv.rev_c * (date_diff('day',
             greatest(iv.od, s.q_start),
             least(iv.ship, s.q_start + INTERVAL 3 MONTH - INTERVAL 1 DAY))
             + 1) // iv.len_days AS alloc_c
  FROM iv JOIN spine s
    ON s.q_start <= iv.ship
   AND s.q_start + INTERVAL 3 MONTH - INTERVAL 1 DAY >= iv.od
)
SELECT q_start, count(*) AS n_allocations,
       sum(alloc_c) / 100.0 AS revenue
FROM alloc GROUP BY q_start
"""


# --- customer value concentration (round-14 queue, built round 10) ----------


def customer_value_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer lifetime order value within each
    market segment — the revenue-concentration audit next to the RFM
    segmentation: a segment whose revenue is carried by a few whale
    accounts (gini -> 1) needs different retention/churn treatment
    than one with even spend, even at identical totals. The
    token_gini_by_source identity, applied to money.

    INTEGER-exact at histogram granularity: per-customer lifetime
    cents (one exact groupBy), then per (segment, cents) counts, the
    cumulative window over DISTINCT lifetime values only, the tied-
    group identity tok*(2*c*m + c*(c+1)) for twice the rank-weighted
    sum, and gini_ppm = (w2 - (n+1)*s) * 1e6 div (n*s) in
    DECIMAL(38,0)/HUGEINT on both engines.

    Scale posture (100 TB): one groupBy(custkey) collapses orders
    map-side to customer lifetime values, one groupBy(segment, cents)
    collapses those to the value histogram, the window slides over
    distinct values per segment, and the rollup is |segments| rows.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").alias("_c"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    ltv = (
        orders.groupBy("o_custkey")
        .agg(F.sum("_c").alias("_v"))
        .join(cust, "o_custkey")
    )
    per_val = ltv.groupBy("segment", "_v").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    w_cum = (
        Window.partitionBy("segment")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    stepped = per_val.select(
        "segment",
        "_v",
        "_cnt",
        F.coalesce(F.sum("_cnt").over(w_cum), F.lit(0)).alias("_m"),
    )
    return (
        stepped.groupBy("segment")
        .agg(
            F.sum("_cnt").alias("n_customers"),
            F.sum(F.col("_v") * F.col("_cnt")).alias("total_cents"),
            F.sum(
                F.expr(
                    "CAST(_v AS DECIMAL(38,0))"
                    " * (2 * _cnt * _m + _cnt * (_cnt + 1))"
                )
            ).alias("_w2"),
        )
        .select(
            "segment",
            "n_customers",
            "total_cents",
            F.expr(
                "CAST((_w2 - (CAST(n_customers AS DECIMAL(38,0)) + 1)"
                " * total_cents) * 1000000 div"
                " greatest(CAST(n_customers AS DECIMAL(38,0))"
                " * total_cents, 1) AS BIGINT)"
            ).alias("gini_ppm"),
        )
    )


CUSTOMER_VALUE_GINI_SQL = """
WITH ltv AS (
  SELECT c.c_mktsegment AS segment,
         CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS _v
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY o.o_custkey, c.c_mktsegment
),
per_val AS (
  SELECT segment, _v, CAST(count(*) AS BIGINT) AS _cnt
  FROM ltv GROUP BY segment, _v
),
stepped AS (
  SELECT segment, _v, _cnt,
         COALESCE(CAST(sum(_cnt) OVER (PARTITION BY segment ORDER BY _v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
           0) AS _m
  FROM per_val
),
agg AS (
  SELECT segment,
         CAST(sum(_cnt) AS BIGINT) AS n_customers,
         CAST(sum(_v * _cnt) AS BIGINT) AS total_cents,
         sum(CAST(_v AS HUGEINT) * (2 * _cnt * _m + _cnt * (_cnt + 1)))
           AS _w2
  FROM stepped GROUP BY segment
)
SELECT segment, n_customers, total_cents,
       CAST((_w2 - (CAST(n_customers AS HUGEINT) + 1) * total_cents)
            * 1000000
            // greatest(CAST(n_customers AS HUGEINT) * total_cents, 1)
            AS BIGINT) AS gini_ppm
FROM agg
"""


# --- Kaplan-Meier churn survival (r12 queue) ------------------------------

# Probe horizons (days since first order) at which the cumulative
# log-survival is read out.
KM_PROBE_DAYS = (365, 730, 1095, 1460)


def km_survival_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier churn-survival readout per market segment — the
    right-censoring-aware member of the lifecycle family: churn_by_
    segment's raw rate silently treats recently-acquired customers as
    survivors, biasing retention UP for growing segments. The KM
    product-limit estimator counts a customer only while observable.

    Time axis: days since first order. A customer churns (event) at
    t = days(first -> last order) + CHURN_WINDOW_DAYS (365) — the day
    the quiet window completes — iff their last order predates the
    fixed horizon (RFM_REF_DATE, 2001-08-02) by more than the window;
    otherwise they are right-censored at t = days(first -> horizon),
    still alive when observation ends. Event time <= censor time by
    construction.

    Integer contract: event/censor times are exact day counts; at
    each death time n_t (at risk: everyone with time >= t, the
    standard censored-after-deaths tie rule) and d_t are exact int64;
    each KM factor ln((n_t - d_t)/n_t) is quantized to MICRO-NATS
    before the sum (the bigram_pmi idiom: identical exact integer
    ratios -> identical correctly-rounded doubles -> identical
    rounded terms), so log_surv_micronats is an exact integer sum and
    S(t) = exp(log_surv_micronats / 1e6) is the reader's one float.
    If a segment's risk set empties at a death time <= the probe
    (n_t = d_t, S -> 0, log -> -inf), the readout is NULL — explicit,
    engine-identical.

    Scale posture (100 TB): one groupBy(o_custkey) collapses orders
    map-side, one dim join, then a groupBy(segment, t) histogram —
    everything after (the cumulative at-risk window, the 4-probe
    fan-out, the rollup) runs on <= |segments| x |distinct day
    counts| cells, never per customer.
    """
    horizon = F.lit(RFM_REF_DATE).cast("date")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("od")
    )
    per_cust = orders.groupBy("o_custkey").agg(
        F.min("od").alias("first_od"), F.max("od").alias("last_od")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    timed = per_cust.join(
        cust, per_cust["o_custkey"] == cust["c_custkey"]
    ).select(
        "c_mktsegment",
        F.when(
            F.datediff(horizon, F.col("last_od")) > CHURN_WINDOW_DAYS,
            F.datediff(F.col("last_od"), F.col("first_od"))
            + CHURN_WINDOW_DAYS,
        )
        .otherwise(F.datediff(horizon, F.col("first_od")))
        .alias("t"),
        F.when(
            F.datediff(horizon, F.col("last_od")) > CHURN_WINDOW_DAYS, 1
        )
        .otherwise(0)
        .alias("is_event"),
    )
    cells = timed.groupBy("c_mktsegment", "t").agg(
        F.sum("is_event").alias("d"),
        F.sum(1 - F.col("is_event")).alias("c"),
    )
    w_risk = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.desc("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risked = cells.select(
        "c_mktsegment",
        "t",
        "d",
        "c",
        F.sum(F.col("d") + F.col("c")).over(w_risk).alias("n_t"),
    ).select(
        "c_mktsegment",
        "t",
        "d",
        "c",
        "n_t",
        F.when(
            (F.col("d") > 0) & (F.col("n_t") > F.col("d")),
            F.round(
                F.log(
                    (F.col("n_t") - F.col("d"))
                    / F.col("n_t").cast("double")
                )
                * 1_000_000,
                0,
            ).cast("long"),
        ).alias("term"),
        ((F.col("d") > 0) & (F.col("n_t") == F.col("d")))
        .cast("long")
        .alias("zeroed"),
    )
    probes = F.explode(
        F.array(*[F.lit(p) for p in KM_PROBE_DAYS])
    ).alias("probe_days")
    fanned = risked.select("*", probes)
    rolled = fanned.groupBy("c_mktsegment", "probe_days").agg(
        F.sum(F.col("d") + F.col("c")).alias("n_customers"),
        F.sum("d").alias("n_churned"),
        F.sum(
            F.when(F.col("t") >= F.col("probe_days"), F.col("d") + F.col("c"))
        ).alias("_ar"),
        F.sum(
            F.when(F.col("t") <= F.col("probe_days"), F.col("term"))
        ).alias("_ls"),
        F.max(
            F.when(F.col("t") <= F.col("probe_days"), F.col("zeroed"))
        ).alias("_z"),
    )
    return rolled.select(
        "c_mktsegment",
        F.col("probe_days").cast("long").alias("probe_days"),
        "n_customers",
        "n_churned",
        F.coalesce("_ar", F.lit(0)).alias("at_risk"),
        F.when(
            F.coalesce("_z", F.lit(0)) == 1, F.lit(None).cast("long")
        )
        .otherwise(F.coalesce("_ls", F.lit(0)))
        .alias("log_surv_micronats"),
    )


def _km_sql() -> str:
    probe_values = ", ".join(f"({p})" for p in KM_PROBE_DAYS)
    return f"""
WITH per_cust AS (
  SELECT o_custkey,
         CAST(min(o_orderdate) AS DATE) AS first_od,
         CAST(max(o_orderdate) AS DATE) AS last_od
  FROM orders GROUP BY o_custkey
),
timed AS (
  SELECT c.c_mktsegment,
         CASE WHEN date_diff('day', p.last_od, DATE '{RFM_REF_DATE}')
                   > {CHURN_WINDOW_DAYS}
              THEN date_diff('day', p.first_od, p.last_od)
                   + {CHURN_WINDOW_DAYS}
              ELSE date_diff('day', p.first_od, DATE '{RFM_REF_DATE}')
         END AS t,
         CASE WHEN date_diff('day', p.last_od, DATE '{RFM_REF_DATE}')
                   > {CHURN_WINDOW_DAYS}
              THEN 1 ELSE 0 END AS is_event
  FROM per_cust p JOIN customer c ON p.o_custkey = c.c_custkey
),
cells AS (
  SELECT c_mktsegment, t,
         CAST(sum(is_event) AS BIGINT) AS d,
         CAST(sum(1 - is_event) AS BIGINT) AS c
  FROM timed GROUP BY c_mktsegment, t
),
risked AS (
  SELECT c_mktsegment, t, d, c,
         CAST(sum(d + c) OVER (PARTITION BY c_mktsegment ORDER BY t DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS n_t
  FROM cells
),
termed AS (
  SELECT c_mktsegment, t, d, c, n_t,
         CASE WHEN d > 0 AND n_t > d
              THEN CAST(round(ln((n_t - d) / CAST(n_t AS DOUBLE))
                              * 1000000, 0) AS BIGINT)
         END AS term,
         CASE WHEN d > 0 AND n_t = d THEN 1 ELSE 0 END AS zeroed
  FROM risked
),
probes(probe_days) AS (VALUES {probe_values}),
rolled AS (
  SELECT c_mktsegment, probe_days,
         CAST(sum(d + c) AS BIGINT) AS n_customers,
         CAST(sum(d) AS BIGINT) AS n_churned,
         CAST(sum(CASE WHEN t >= probe_days THEN d + c END) AS BIGINT)
           AS _ar,
         CAST(sum(CASE WHEN t <= probe_days THEN term END) AS BIGINT)
           AS _ls,
         max(CASE WHEN t <= probe_days THEN zeroed END) AS _z
  FROM termed CROSS JOIN probes
  GROUP BY c_mktsegment, probe_days
)
SELECT c_mktsegment,
       CAST(probe_days AS BIGINT) AS probe_days,
       n_customers, n_churned,
       coalesce(_ar, 0) AS at_risk,
       CASE WHEN coalesce(_z, 0) = 1 THEN NULL
            ELSE coalesce(_ls, 0) END AS log_surv_micronats
FROM rolled
"""


KM_SURVIVAL_SQL = _km_sql()
