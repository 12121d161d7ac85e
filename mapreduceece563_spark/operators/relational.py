"""Relational operator coverage: scans, filters, joins (broadcast /
shuffle / semi / anti), hash + sort aggregations, windows, rollup,
pivot, set ops — the operator classes the reference lacks entirely
(SURVEY.md §2.5: "None implemented") that Spark provides natively.
These queries exercise each one TPC-H-style over the driver tables.

Scale discipline (100 TB posture):
* Small dimensions (region 5, nation 25, supplier ~1e2) are joined
  with explicit ``F.broadcast`` — no shuffle of the fact table for
  dim enrichment; AQE would also auto-convert, the hint makes it
  unconditional.
* Fact-fact joins (orders ⋈ lineitem) shuffle on the join key once;
  grouping that follows reuses the exchange where keys align.
* Window functions partition by a key (never a global window without
  PARTITION BY, which would serialize on one task).
* Top-k uses orderBy().limit(k) → TakeOrderedAndProject: per-partition
  k + driver merge, no global sort.

Float determinism (oracle contract): every money/measure aggregate is
converted to integer cents per row BEFORE summing (``round(x*100)``
→ long). Integer sums are exact and associative, so Spark's partial
aggregation order can never diverge from DuckDB's sequential fold —
results are bit-identical, not approximately equal. Division back to
doubles happens once, after aggregation, identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..cachemgr import stage
from ..sources.catalog import load_table


def _cents(col: Column) -> Column:
    return F.round(col * 100, 0).cast("long")


def _cents_sql(expr: str) -> str:
    return f"CAST(round(({expr}) * 100, 0) AS BIGINT)"


# --- Q1: single-table hash aggregation (TPC-H Q1 shape) ---------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_shipdate",
    )
    li = li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("_sq"),
        F.sum(_cents(F.col("l_extendedprice"))).alias("_sbp"),
        F.sum(_cents(disc_price)).alias("_sdp"),
        F.sum(_cents(charge)).alias("_sc"),
        F.sum(_cents(F.col("l_discount"))).alias("_sd"),
        F.count("*").alias("count_order"),
    )
    n = F.col("count_order")
    return agg.select(
        "l_returnflag", "l_linestatus",
        F.col("_sq").cast("double").alias("sum_qty"),
        (F.col("_sbp") / 100.0).alias("sum_base_price"),
        (F.col("_sdp") / 100.0).alias("sum_disc_price"),
        (F.col("_sc") / 100.0).alias("sum_charge"),
        (F.col("_sq") / n).alias("avg_qty"),
        (F.col("_sbp") / 100.0 / n).alias("avg_price"),
        (F.col("_sd") / 100.0 / n).alias("avg_disc"),
        "count_order",
    )


Q1_SQL = f"""
WITH agg AS (
  SELECT l_returnflag, l_linestatus,
         sum(CAST(l_quantity AS BIGINT)) AS _sq,
         sum({_cents_sql('l_extendedprice')}) AS _sbp,
         sum({_cents_sql('l_extendedprice * (1 - l_discount)')}) AS _sdp,
         sum({_cents_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')}) AS _sc,
         sum({_cents_sql('l_discount')}) AS _sd,
         count(*) AS count_order
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-09-02'
  GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus,
       CAST(_sq AS DOUBLE) AS sum_qty,
       _sbp / 100.0 AS sum_base_price,
       _sdp / 100.0 AS sum_disc_price,
       _sc / 100.0 AS sum_charge,
       _sq / CAST(count_order AS DOUBLE) AS avg_qty,
       _sbp / 100.0 / count_order AS avg_price,
       _sd / 100.0 / count_order AS avg_disc,
       count_order
FROM agg
"""


# --- Q3: 3-way join + agg + deterministic top-k -----------------------

def q3_top_unshipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"
    )
    cutoff = F.lit("1998-01-01").cast("timestamp")
    joined = (
        li.filter(F.col("l_shipdate") > cutoff)
        .join(orders.filter(F.col("o_orderdate") < cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust.filter(F.col("c_mktsegment") == "BUILDING"), F.col("o_custkey") == F.col("c_custkey"))
    )
    rev = joined.groupBy("o_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("_rc")
    )
    return (
        rev.select("o_orderkey", (F.col("_rc") / 100.0).alias("revenue"),
                   "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


Q3_SQL = f"""
SELECT o_orderkey,
       sum({_cents_sql('l_extendedprice * (1 - l_discount)')}) / 100.0 AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


# --- Q5: 6-way join with broadcast dims -------------------------------

def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1997-01-01").cast("timestamp")
    joined = (
        li.join(orders.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp),
              (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.groupBy("n_name")
        .agg(F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("_rc"))
        .select("n_name", (F.col("_rc") / 100.0).alias("revenue"))
    )


Q5_SQL = f"""
SELECT n_name,
       sum({_cents_sql('l_extendedprice * (1 - l_discount)')}) / 100.0 AS revenue
FROM region
JOIN nation ON n_regionkey = r_regionkey
JOIN supplier ON s_nationkey = n_nationkey
JOIN customer ON c_nationkey = s_nationkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey AND l_suppkey = s_suppkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


# --- windows ----------------------------------------------------------

def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by order revenue within each nation.

    row_number (not rank) with a full tie-break (revenue desc,
    custkey asc) keeps the result deterministic; revenue is exact
    integer cents so ordering is stable across engines."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        orders.groupBy("o_custkey").agg(F.sum(_cents(F.col("o_totalprice"))).alias("_rc"))
    )
    joined = (
        cust.join(rev, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("_rc"), F.asc("c_custkey"))
    return (
        joined.withColumn("rank_in_nation", F.row_number().over(w))
        .filter(F.col("rank_in_nation") <= 3)
        .select("n_name", "c_custkey", "c_name",
                (F.col("_rc") / 100.0).alias("revenue"), "rank_in_nation")
    )


TOP_CUSTOMERS_SQL = f"""
WITH rev AS (
  SELECT o_custkey, sum({_cents_sql('o_totalprice')}) AS _rc
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT n_name, c_custkey, c_name, _rc,
         row_number() OVER (PARTITION BY n_name ORDER BY _rc DESC, c_custkey ASC)
           AS rank_in_nation
  FROM customer
  JOIN rev ON c_custkey = o_custkey
  JOIN nation ON c_nationkey = n_nationkey
)
SELECT n_name, c_custkey, c_name, _rc / 100.0 AS revenue, rank_in_nation
FROM ranked WHERE rank_in_nation <= 3
"""


def orders_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running revenue (ordered cumulative window sum).
    Integer-cents accumulation keeps the running value exact at any
    prefix, so both engines agree at every row."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    ).filter(F.col("o_custkey") <= 200)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey", "o_orderkey", "o_orderdate",
        (F.sum(_cents(F.col("o_totalprice"))).over(w) / 100.0).alias("running_total"),
    )


RUNNING_TOTAL_SQL = f"""
SELECT o_custkey, o_orderkey, o_orderdate,
       sum({_cents_sql('o_totalprice')}) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) / 100.0 AS running_total
FROM orders WHERE o_custkey <= 200
"""


# --- semi / anti joins ------------------------------------------------

def customers_inactive_1995(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no order in 1995 — left_anti join (NOT EXISTS)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    o95 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    return cust.join(o95, cust.c_custkey == o95.o_custkey, "left_anti")


CUSTOMERS_INACTIVE_SQL = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= TIMESTAMP '1995-01-01'
    AND o.o_orderdate < TIMESTAMP '1996-01-01'
)
"""


def suppliers_with_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi join (EXISTS)."""
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey")
    return supp.join(li, supp.s_suppkey == li.l_suppkey, "left_semi")


SUPPLIERS_WITH_SALES_SQL = """
SELECT s_suppkey, s_name FROM supplier s
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey)
"""


# --- set operations ---------------------------------------------------

def parts_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct set difference)."""
    part = load_table(spark, sf_dir, "part").select(F.col("p_partkey").alias("partkey"))
    li = load_table(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("partkey"))
    return part.exceptAll(li.distinct()).distinct()


PARTS_NEVER_ORDERED_SQL = """
SELECT p_partkey AS partkey FROM part
EXCEPT
SELECT l_partkey AS partkey FROM lineitem
"""


def nation_presence_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of per-side aggregates (customer vs supplier counts
    per nation)."""
    cust = load_table(spark, sf_dir, "customer").groupBy("c_nationkey").agg(
        F.count("*").alias("n_members")
    ).select(F.lit("customer").alias("side"),
             F.col("c_nationkey").alias("nationkey"), "n_members")
    supp = load_table(spark, sf_dir, "supplier").groupBy("s_nationkey").agg(
        F.count("*").alias("n_members")
    ).select(F.lit("supplier").alias("side"),
             F.col("s_nationkey").alias("nationkey"), "n_members")
    return cust.unionAll(supp)


NATION_PRESENCE_SQL = """
SELECT 'customer' AS side, c_nationkey AS nationkey, count(*) AS n_members
FROM customer GROUP BY c_nationkey
UNION ALL
SELECT 'supplier' AS side, s_nationkey AS nationkey, count(*) AS n_members
FROM supplier GROUP BY s_nationkey
"""


# --- rollup / pivot ---------------------------------------------------

def nation_customer_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(region, nation): hierarchical subtotals + grand total."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    joined = (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_customers"),
             F.sum(_cents(F.col("c_acctbal"))).alias("_bc"))
        .select("r_name", "n_name", "n_customers",
                (F.col("_bc") / 100.0).alias("total_acctbal"))
    )


NATION_ROLLUP_SQL = f"""
SELECT r_name, n_name, count(*) AS n_customers,
       sum({_cents_sql('c_acctbal')}) / 100.0 AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def orders_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order counts by status — expressed as conditional
    aggregation (portable to ANSI SQL; Spark's .pivot() produces the
    same plan)."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderpriority", "o_orderstatus")
    return orders.groupBy("o_orderpriority").agg(
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("cnt_open"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("cnt_finished"),
        F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).alias("cnt_partial"),
    )


ORDERS_PIVOT_SQL = """
SELECT o_orderpriority,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_open,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_finished,
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_partial
FROM orders GROUP BY o_orderpriority
"""


# --- events: time + JSON ----------------------------------------------

def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-hour aggregation over the event stream table (batch
    form of the Structured Streaming window query)."""
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    return (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.sum(_cents(F.col("value"))).alias("_vc"))
        .select("hour", "event_type", "n_events",
                (F.col("_vc") / 100.0).alias("value_sum"))
    )


EVENTS_HOURLY_SQL = f"""
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n_events,
       sum({_cents_sql('value')}) / 100.0 AS value_sum
FROM events GROUP BY date_trunc('hour', ts), event_type
"""


def events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the props column (semi-structured path)."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "props")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(k).alias("k_sum"),
        F.min(k).alias("k_min"),
        F.max(k).alias("k_max"),
    )


EVENTS_JSON_SQL = """
SELECT event_type, count(*) AS n_events,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
FROM events GROUP BY event_type
"""


def segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-aggregate with count distinct."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_nationkey", "c_acctbal"
    )
    return (
        cust.groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"),
             F.countDistinct("c_nationkey").alias("n_nations"),
             F.sum(_cents(F.col("c_acctbal"))).alias("_bc"),
             F.max(_cents(F.col("c_acctbal"))).alias("_mx"))
        .select("c_mktsegment", "n_customers", "n_nations",
                (F.col("_bc") / 100.0).alias("total_acctbal"),
                (F.col("_mx") / 100.0).alias("max_acctbal"))
    )


SEGMENT_STATS_SQL = f"""
SELECT c_mktsegment, count(*) AS n_customers,
       count(DISTINCT c_nationkey) AS n_nations,
       sum({_cents_sql('c_acctbal')}) / 100.0 AS total_acctbal,
       max({_cents_sql('c_acctbal')}) / 100.0 AS max_acctbal
FROM customer GROUP BY c_mktsegment
"""


# --- date/time breakdown ----------------------------------------------

def orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar breakdown with date part extraction."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(F.count("*").alias("n_orders"),
             F.sum(_cents(F.col("o_totalprice"))).alias("_tc"))
        .select("order_year", "order_month", "n_orders",
                (F.col("_tc") / 100.0).alias("total_price"))
    )


ORDERS_BY_MONTH_SQL = f"""
SELECT CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(month(o_orderdate) AS INT) AS order_month,
       count(*) AS n_orders,
       sum({_cents_sql('o_totalprice')}) / 100.0 AS total_price
FROM orders GROUP BY 1, 2
"""


# --- CUBE --------------------------------------------------------------

def lineitem_flags_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all grouping-set combos."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity"
    )
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_items"),
             F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
    )


LINEITEM_CUBE_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n_items,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# --- percentiles -------------------------------------------------------

def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles over integer cents per order
    priority. Spark `percentile` and DuckDB `quantile_cont` share the
    linear-interpolation definition; inputs are exact int64 cents so
    the interpolation arithmetic is identical."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    cents = _cents(F.col("o_totalprice"))
    agg = orders.groupBy("o_orderpriority").agg(
        F.expr(
            "percentile(CAST(round(o_totalprice * 100, 0) AS BIGINT), 0.5)"
        ).alias("_p50"),
        F.expr(
            "percentile(CAST(round(o_totalprice * 100, 0) AS BIGINT), 0.95)"
        ).alias("_p95"),
        F.count("*").alias("n_orders"),
    )
    return agg.select(
        "o_orderpriority",
        F.round(F.col("_p50") / 100.0, 4).alias("p50_price"),
        F.round(F.col("_p95") / 100.0, 4).alias("p95_price"),
        "n_orders",
    )


PRICE_PERCENTILES_SQL = f"""
SELECT o_orderpriority,
       round(quantile_cont({_cents_sql('o_totalprice')}, 0.5) / 100.0, 4)
         AS p50_price,
       round(quantile_cont({_cents_sql('o_totalprice')}, 0.95) / 100.0, 4)
         AS p95_price,
       count(*) AS n_orders
FROM orders GROUP BY o_orderpriority
"""


# --- TPC-H derived: q6 / q10 / q14 / q18 ------------------------------

def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight scan-side filters, single global sum.
    Every predicate pushes to the parquet scan; the aggregate is one
    partial+final sum of int64 cents."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_discount", "l_quantity", "l_extendedprice"
    )
    filtered = li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    rc = F.round(F.col("l_extendedprice") * F.col("l_discount") * 100, 0).cast("long")
    return filtered.agg(
        F.count("*").alias("n_items"),
        (F.sum(rc) / 100.0).alias("revenue"),
    )


Q6_SQL = """
SELECT count(*) AS n_items,
       sum(CAST(round(l_extendedprice * l_discount * 100, 0) AS BIGINT)) / 100.0
         AS revenue
FROM lineitem
WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: fact-fact join on orderkey, then broadcast
    dims (customer at real scale is big — it shuffles; nation
    broadcasts). Top 20 by lost revenue, keyed tie-break."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    ).filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    ).filter(
        (F.col("o_orderdate") >= "1995-10-01")
        & (F.col("o_orderdate") < "1996-01-01")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rc = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rc).alias("_rc"))
        .select(
            "c_custkey", "c_name", "n_name",
            (F.col("_rc") / 100.0).alias("revenue"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT))
         / 100.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= '1995-10-01' AND o_orderdate < '1996-01-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: one-month lineitem slice joined to part,
    conditional aggregation for the promo revenue share."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_extendedprice", "l_discount"
    ).filter(
        (F.col("l_shipdate") >= "1996-09-01")
        & (F.col("l_shipdate") < "1996-10-01")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rc = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    joined = li.join(part, li.l_partkey == part.p_partkey).select(
        F.col("p_type"), rc.alias("_rc")
    )
    agg = joined.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", F.col("_rc")).otherwise(0)).alias("_promo"),
        F.sum("_rc").alias("_total"),
    )
    return agg.select(
        F.round(100.0 * F.col("_promo") / F.col("_total"), 6).alias("promo_share_pct"),
        (F.col("_promo") / 100.0).alias("promo_revenue"),
        (F.col("_total") / 100.0).alias("total_revenue"),
    )


Q14_SQL = """
WITH j AS (
  SELECT p_type,
         CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT) AS _rc
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= '1996-09-01' AND l_shipdate < '1996-10-01'
),
agg AS (
  SELECT sum(CASE WHEN p_type = 'PROMO' THEN _rc ELSE 0 END) AS _promo,
         sum(_rc) AS _total
  FROM j
)
SELECT round(100.0 * _promo / _total, 6) AS promo_share_pct,
       _promo / 100.0 AS promo_revenue,
       _total / 100.0 AS total_revenue
FROM agg
"""

Q18_MIN_QTY = 300


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: groupBy-HAVING on the fact table picks the
    few large orders, then joins pull in order/customer detail — the
    having-filter runs BEFORE the joins, so only qualifying orderkeys
    shuffle into them."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .filter(F.col("sum_qty") > Q18_MIN_QTY)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            F.round(F.col("o_totalprice"), 2).alias("o_totalprice"),
            "sum_qty",
        )
    )


Q18_SQL = f"""
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       round(o_totalprice, 2) AS o_totalprice, sum_qty
FROM (
  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum_qty > {Q18_MIN_QTY}
) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# --- GROUPING SETS -----------------------------------------------------

def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (finer than cube/rollup): per-priority
    totals, per-status totals, and the grand total in one pass."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderstatus", "o_totalprice"
    )
    gs = orders.groupingSets(
        [["o_orderpriority"], ["o_orderstatus"], []],
        "o_orderpriority",
        "o_orderstatus",
    )
    return gs.agg(
        F.count("*").alias("n_orders"),
        F.sum(_cents(F.col("o_totalprice"))).alias("_tc"),
    ).select(
        "o_orderpriority", "o_orderstatus", "n_orders",
        (F.col("_tc") / 100.0).alias("total_price"),
    )


ORDERS_GROUPING_SETS_SQL = f"""
SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
       sum({_cents_sql('o_totalprice')}) / 100.0 AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
"""


# --- ntile deciles -----------------------------------------------------

def customer_balance_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Account-balance deciles (ntile over a deterministic total
    order), rolled up to per-decile stats.

    Scale caveat, stated on purpose: an unpartitioned ntile funnels
    every row through ONE task — exact global ranking fundamentally
    serializes. At 100 TB you'd compute approximate decile boundaries
    (percentile_approx, one pass, mergeable sketches) and band-join
    rows to them; this exact form exists because the oracle needs the
    exact answer and customer-scale dims fit one partition easily."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    w = Window.orderBy(F.asc(_cents(F.col("c_acctbal"))), F.asc("c_custkey"))
    tiles = cust.select(
        "c_custkey",
        _cents(F.col("c_acctbal")).alias("_bc"),
        F.ntile(10).over(w).alias("decile"),
    )
    return (
        tiles.groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            F.min(F.col("_bc")).alias("_lo"),
            F.max(F.col("_bc")).alias("_hi"),
        )
        .select(
            "decile", "n_customers",
            (F.col("_lo") / 100.0).alias("min_acctbal"),
            (F.col("_hi") / 100.0).alias("max_acctbal"),
        )
    )


CUSTOMER_DECILES_SQL = f"""
WITH tiles AS (
  SELECT c_custkey, {_cents_sql('c_acctbal')} AS _bc,
         ntile(10) OVER (ORDER BY {_cents_sql('c_acctbal')} ASC,
                         c_custkey ASC) AS decile
  FROM customer
)
SELECT decile, count(*) AS n_customers,
       min(_bc) / 100.0 AS min_acctbal,
       max(_bc) / 100.0 AS max_acctbal
FROM tiles GROUP BY decile
"""


# --- sorted array aggregation -----------------------------------------

def region_nations_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-region sorted list of nation names, emitted as a
    '|'-joined STRING (deterministic collect: sort after
    collect_list, never rely on arrival order).

    The top-level column is a scalar string, not array<string>: the
    driver harness canonicalizes results via pandas sort_values,
    which cannot hash list-typed cells (the one red row of round 3).
    Same contract as inverted_index's posting-list column — registry
    outputs are scalar-only, enforced by tests/test_output_schemas.py."""
    nation = load_table(spark, sf_dir, "nation").select("n_name", "n_regionkey")
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list("n_name")), "|"
            ).alias("nations"),
            F.count("*").alias("n_nations"),
        )
    )


REGION_NATIONS_SQL = """
SELECT r_name, string_agg(n_name, '|' ORDER BY n_name) AS nations,
       count(*) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# --- INTERSECT ---------------------------------------------------------

def brands_all_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brands appearing in BOTH small-part and large-part catalogs
    (set INTERSECT — dedup + co-partitioned merge in one operator)."""
    part = load_table(spark, sf_dir, "part").select("p_brand", "p_size")
    small = part.filter(F.col("p_size") < 25).select("p_brand")
    large = part.filter(F.col("p_size") >= 25).select("p_brand")
    return small.intersect(large)


BRANDS_ALL_SIZES_SQL = """
SELECT p_brand FROM part WHERE p_size < 25
INTERSECT
SELECT p_brand FROM part WHERE p_size >= 25
"""


# --- TPC-H Q7: volume shipping ----------------------------------------

def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: fact joined to BOTH a supplier-side and a
    customer-side nation (the same broadcast dim used twice under
    different aliases), grouped by the ordered nation pair and ship
    year. Only pairs between two fixed nations qualify."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = nation.select(
        F.col("n_nationkey").alias("_sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("_cn_key"), F.col("n_name").alias("cust_nation")
    )
    rc = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(F.sum(rc).alias("_rc"), F.count("*").alias("n_items"))
        .select(
            "supp_nation", "cust_nation", "ship_year",
            (F.col("_rc") / 100.0).alias("volume"), "n_items",
        )
    )


Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS ship_year,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT))
         / 100.0 AS volume,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
"""


# --- correlated scalar subquery via the SQL surface -------------------

def sql_supplier_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Richest supplier per nation, written as a correlated scalar
    subquery through ``spark.sql`` over registered views — the SQL
    entrance to the engine. Catalyst decorrelates this into the same
    aggregate+join plan the DataFrame argmax (window) form produces;
    ties broken by taking the lowest suppkey among maxima."""
    from ..sources.catalog import register_views

    register_views(spark, sf_dir, only=("supplier",))
    return spark.sql(
        """
        SELECT s_nationkey, min(s_suppkey) AS richest_suppkey,
               round(max(s_acctbal), 2) AS max_acctbal
        FROM supplier s
        WHERE s_acctbal = (
          SELECT max(s2.s_acctbal) FROM supplier s2
          WHERE s2.s_nationkey = s.s_nationkey
        )
        GROUP BY s_nationkey
        """
    )


SQL_SUPPLIER_ARGMAX_SQL = """
SELECT s_nationkey, min(s_suppkey) AS richest_suppkey,
       round(max(s_acctbal), 2) AS max_acctbal
FROM supplier s
WHERE s_acctbal = (
  SELECT max(s2.s_acctbal) FROM supplier s2
  WHERE s2.s_nationkey = s.s_nationkey
)
GROUP BY s_nationkey
"""


# --- RANGE-frame window (time-based trailing aggregate) ---------------

TRAILING_WINDOW_S = 3600


def user_trailing_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event: the user's exact trailing-1-hour value sum — a
    RANGE frame over event-time seconds (every row whose timestamp is
    within the preceding hour contributes, however many rows that
    is). One shuffle on user_id; integer-cents sums."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    secs = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(secs)
        .rangeBetween(-TRAILING_WINDOW_S * 1_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        (
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).over(w) / 100.0
        ).alias("trailing_1h_value"),
    )


USER_TRAILING_SQL = f"""
SELECT event_id, user_id,
       sum(CAST(round(value * 100, 0) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY epoch_us(ts)
         RANGE BETWEEN {TRAILING_WINDOW_S * 1_000_000} PRECEDING AND CURRENT ROW
       ) / 100.0 AS trailing_1h_value
FROM events
"""


# --- z-score anomaly over hourly counts -------------------------------

ZSCORE_THRESHOLD = 2.0


def events_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hours whose event count deviates >= 2 sigma from that type's
    mean hourly count. Two aggregations (hourly rollup, then per-type
    moments from integer sums) + a broadcast-size join back; variance
    is computed explicitly from (sum, sumsq, n) in a fixed expression
    order so both engines produce the identical double."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts")
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count("*").alias("n_events"))
    )
    moments = hourly.groupBy("event_type").agg(
        F.sum("n_events").alias("_s"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("_sq"),
        F.count("*").alias("_n"),
    )
    mean = F.col("_s") / F.col("_n").cast("double")
    var = F.col("_sq") / F.col("_n").cast("double") - mean * mean
    stats = moments.select(
        "event_type", mean.alias("_mean"), F.sqrt(var).alias("_std")
    )
    z = (F.col("n_events") - F.col("_mean")) / F.col("_std")
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .filter(F.col("_std") > 0)
        .select(
            "event_type", "hour", "n_events", F.round(z, 4).alias("zscore")
        )
        .filter(F.abs(F.col("zscore")) >= ZSCORE_THRESHOLD)
    )


EVENTS_ANOMALY_SQL = f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n_events
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
moments AS (
  SELECT event_type, sum(n_events) AS _s,
         sum(n_events * n_events) AS _sq, count(*) AS _n
  FROM hourly GROUP BY event_type
),
stats AS (
  SELECT event_type, _s / CAST(_n AS DOUBLE) AS _mean,
         sqrt(_sq / CAST(_n AS DOUBLE)
              - (_s / CAST(_n AS DOUBLE)) * (_s / CAST(_n AS DOUBLE))) AS _std
  FROM moments
)
SELECT event_type, hour, n_events,
       round((n_events - _mean) / _std, 4) AS zscore
FROM hourly JOIN stats USING (event_type)
WHERE _std > 0
  AND abs(round((n_events - _mean) / _std, 4)) >= {ZSCORE_THRESHOLD}
"""


# --- TPC-H Q8: national market share ----------------------------------

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: the deepest join tree in the registry (7-way —
    fact x part x orders x customer x supplier, nation twice, region),
    then a conditional-share aggregate by year. Dims broadcast; the
    only big exchanges are lineitem-orders and orders-customer."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    ).filter(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    cn = nation.select(
        F.col("n_nationkey").alias("_cnk"), F.col("n_regionkey").alias("_crk")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation")
    )
    rc = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    joined = (
        li.join(F.broadcast(part.filter(F.col("p_type") == "PROMO")),
                li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("_cnk"))
        .join(F.broadcast(region.filter(F.col("r_name") == "ASIA")),
              F.col("_crk") == F.col("r_regionkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("_snk"))
    )
    agg = joined.groupBy(
        F.year("o_orderdate").cast("int").alias("order_year")
    ).agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_1", rc).otherwise(0)).alias("_nat"),
        F.sum(rc).alias("_tot"),
    )
    return agg.select(
        "order_year",
        F.round(F.col("_nat") / F.col("_tot").cast("double"), 6).alias("mkt_share"),
        (F.col("_tot") / 100.0).alias("total_volume"),
    )


Q8_SQL = """
WITH j AS (
  SELECT year(o_orderdate) AS order_year, n2.n_name AS supp_nation,
         CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT) AS _rc
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE p_type = 'PROMO' AND r_name = 'ASIA'
    AND o_orderdate >= '1995-01-01' AND o_orderdate < '1997-01-01'
)
SELECT CAST(order_year AS INT) AS order_year,
       round(sum(CASE WHEN supp_nation = 'NATION_1' THEN _rc ELSE 0 END)
             / CAST(sum(_rc) AS DOUBLE), 6) AS mkt_share,
       sum(_rc) / 100.0 AS total_volume
FROM j GROUP BY order_year
"""


# --- TPC-H-style q4: priority counts via EXISTS semi join -------------

def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (semi join): orders in a quarter that have at
    least one lineitem shipped after the order date, counted per
    priority. The schema has no commit/receipt dates, so 'late line'
    is l_shipdate > o_orderdate (same EXISTS structure as the
    original). Spark plans a LEFT SEMI hash join — each order emits at
    most once regardless of how many lineitems match; the date filter
    on orders is pushed to the scan before the join."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    orders = orders.filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate),
        "leftsemi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
"""


# --- TPC-H q13: customer order-count distribution ---------------------

def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: LEFT join customers to orders, count orders per
    customer (zero-order customers kept), then the distribution of
    those counts. Two aggregations; the first keys on c_custkey (high
    cardinality, no skew), the second on the tiny count domain —
    fine because its input is already one row per customer."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) per_cust
GROUP BY c_count
"""


# --- TPC-H q15: top supplier over a revenue view ----------------------

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: per-supplier revenue over one quarter (the 'revenue
    view'), then the supplier(s) achieving the max. Revenue sums are
    int64 cents so the max-equality join is exact. The 1-row max
    aggregate is broadcast; ties would all be returned (as in the
    spec) deterministically."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    li = li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .alias("_rc")
    )
    mx = rev.agg(F.max("_rc").alias("_mx"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev._rc == mx._mx)
        .join(supp, rev.l_suppkey == supp.s_suppkey)
        .select(
            "s_suppkey", "s_name",
            (F.col("_rc") / 100.0).alias("total_revenue"),
        )
    )


Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey,
         sum({_cents_sql('l_extendedprice * (1 - l_discount)')}) AS _rc
  FROM lineitem
  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, _rc / 100.0 AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE _rc = (SELECT max(_rc) FROM rev)
"""


# --- TPC-H q17: small-quantity-order revenue (correlated avg) ---------

def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lineitems of one brand whose
    quantity is below 20% of that part's average quantity. The
    correlated scalar avg decorrelates to a per-part aggregate that is
    BROADCAST back onto the fact scan (part and the 1-row-per-part
    aggregate are both dimension-sized). avg is computed as
    exact-int sum / count so the threshold is bit-identical across
    engines."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avgq = li.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast("long"))
            / F.count("*")
        ).alias("_avg_qty")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    part = part.filter(F.col("p_brand") == "Brand#12")
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(avgq), "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("_avg_qty"))
    )
    return joined.agg(
        (F.sum(_cents(F.col("l_extendedprice"))) / 100.0 / 7.0)
        .alias("avg_yearly")
    )


Q17_SQL = f"""
SELECT sum({_cents_sql('l_extendedprice')}) / 100.0 / 7.0 AS avg_yearly
FROM lineitem l
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#12'
  AND l_quantity < (
    SELECT 0.2 * (CAST(sum(CAST(l2.l_quantity AS BIGINT)) AS BIGINT)
                  / count(*))
    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
  )
"""


# --- TPC-H q19: disjunctive predicate pushdown ------------------------

def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of three (brand, size,
    quantity-band) conjunctions. The point of the operator is that the
    disjunction SPLITS across the join: the part-only conjuncts
    (brand, size) filter the broadcast dimension and the lineitem-only
    conjuncts (quantity bands) filter the fact scan, with the full OR
    re-checked after the join — Catalyst derives both partial filters
    from the disjunction automatically (CNF extraction)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(cond).agg(
        (
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            / 100.0
        ).alias("revenue")
    )


Q19_SQL = f"""
SELECT sum({_cents_sql('l_extendedprice * (1 - l_discount)')}) / 100.0
         AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""


# --- TPC-H q22: rich inactive customers (anti join + scalar avg) ------

Q22_RECENT_CUTOFF = "1999-01-01"


def q22_inactive_rich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average (positive)
    balance and no RECENT orders (none since 1999 — this dataset's
    customers nearly all have SOME order, so the original's
    no-orders-ever predicate selects nothing), grouped by market
    segment. Anti join on custkey against the date-filtered orders
    scan (filter pushed below the anti join); the global average is a
    broadcast 1-row aggregate. The threshold compare is long-cents vs
    (exact-int sum / count) — both engines evaluate the identical
    expression."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(_cents(F.col("c_acctbal"))) / F.count("*"))
            .alias("_avg_cents")
        )
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate"
    )
    orders = orders.filter(F.col("o_orderdate") >= Q22_RECENT_CUTOFF).select(
        "o_custkey"
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(
        _cents(F.col("c_acctbal")) > F.col("_avg_cents")
    )
    inactive = rich.join(
        orders, rich.c_custkey == orders.o_custkey, "left_anti"
    )
    return inactive.groupBy("c_mktsegment").agg(
        F.count("*").alias("numcust"),
        (F.sum(_cents(F.col("c_acctbal"))) / 100.0).alias("totacctbal"),
    )


Q22_SQL = f"""
SELECT c_mktsegment, count(*) AS numcust,
       sum({_cents_sql('c_acctbal')}) / 100.0 AS totacctbal
FROM customer c
WHERE {_cents_sql('c_acctbal')} > (
    SELECT CAST(sum({_cents_sql('c_acctbal')}) AS BIGINT) / count(*)
    FROM customer WHERE c_acctbal > 0.0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c.c_custkey AND o_orderdate >= '{Q22_RECENT_CUTOFF}'
  )
GROUP BY c_mktsegment
"""


# --- TPC-H q9 (adapted): profit by supplier nation and year -----------

def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit grouped by supplier nation and order
    year. This schema has no partsupp, so unit cost is the part's
    retail price (profit = revenue - p_retailprice * qty); the join
    tree and aggregation match the original. lineitem-orders shuffle
    once on orderkey; part, supplier, and nation broadcast. Profit is
    int64 cents end to end."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    profit = _cents(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ) - _cents(F.col("p_retailprice") * F.col("l_quantity"))
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    )
    return (
        j.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            profit.alias("_pc"),
        )
        .groupBy("nation", "o_year")
        .agg((F.sum("_pc") / 100.0).alias("profit"))
    )


Q9_SQL = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       sum({_cents_sql('l_extendedprice * (1 - l_discount)')}
           - {_cents_sql('p_retailprice * l_quantity')}) / 100.0 AS profit
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name, year(o_orderdate)
"""


# --- TPC-H q2 (adapted): cheapest supplier per part (argmin join-back)

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each part in a (size, type) slice, the
    supplier(s) from one region offering the minimum cost, with the
    original's ordering and top-100 cut. No partsupp table in this
    schema, so unit cost derives from the lineitem association:
    min(extendedprice / quantity) per (part, supplier), quantized to
    int64 cents so the min-equality join-back is exact.

    Scale shape: the correlated min subquery decorrelates to a
    per-part aggregate joined back on equality (two aggregations, one
    shuffle each on partkey-family keys); part/supplier/nation/region
    are all broadcast dims. The top-100 is TakeOrderedAndProject with
    a full deterministic tie-break chain."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    # zero-quantity lines (possible in real feeds even though TPC-H
    # generates qty >= 1) have no defined unit cost: NULL on both
    # engines — DuckDB's float division already yields NULL at /0
    # while Spark's ANSI division raises (adversarial-vintage audit
    # #2, round 12); min() then skips the row identically
    unit_cents = F.when(
        F.col("l_quantity") != 0,
        F.round(
            F.col("l_extendedprice") / F.col("l_quantity") * 100, 0
        ).cast("long"),
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_size", "p_type"
    )
    part = part.filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").select(
        "r_regionkey", "r_name"
    ).filter(F.col("r_name") == "EUROPE")
    sn = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(unit_cents).alias("_cost"))
    )
    min_cost = (
        cost.groupBy("l_partkey")
        .agg(F.min("_cost").alias("_min_cost"))
        .withColumnRenamed("l_partkey", "_mk")
    )
    best = cost.join(
        F.broadcast(min_cost),
        (F.col("l_partkey") == F.col("_mk"))
        & (F.col("_cost") == F.col("_min_cost")),
    ).select(F.col("l_partkey").alias("p_partkey"), "l_suppkey", "_cost")
    return (
        best.join(F.broadcast(sn), best.l_suppkey == sn.s_suppkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey",
            (F.col("_cost") / 100.0).alias("min_cost"),
        )
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"),
            F.asc("p_partkey"),
        )
        .limit(100)
    )


Q2_SQL = """
WITH sn AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
cost AS (
  SELECT l_partkey, l_suppkey,
         min(CASE WHEN l_quantity <> 0 THEN
               CAST(round(l_extendedprice / l_quantity * 100, 0) AS BIGINT)
             END) AS _cost
  FROM lineitem
  JOIN (SELECT p_partkey FROM part
        WHERE p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD') p
    ON l_partkey = p_partkey
  JOIN sn ON l_suppkey = s_suppkey
  GROUP BY l_partkey, l_suppkey
)
SELECT s_acctbal, s_name, n_name, c.l_partkey AS p_partkey,
       _cost / 100.0 AS min_cost
FROM cost c
JOIN sn ON c.l_suppkey = sn.s_suppkey
WHERE _cost = (SELECT min(_cost) FROM cost c2
               WHERE c2.l_partkey = c.l_partkey)
ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
LIMIT 100
"""


# --- TPC-H q11 (adapted): important parts by one nation's volume ------

Q11_NATION = "NATION_7"
Q11_FRACTION = 0.001


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value restricted to one nation's
    suppliers, keeping parts whose value exceeds a fixed fraction of
    the nation's TOTAL value — a group-by filtered against a global
    scalar subquery. The scalar total is a 1-row broadcast; the
    group-by shuffles once on partkey. Values are int64 cents so the
    threshold compare (long > double) is bit-identical cross-engine."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    ).filter(F.col("n_name") == Q11_NATION)
    sn = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey")
    filtered = li.join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
    per_part = filtered.groupBy("l_partkey").agg(
        F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .alias("_vc")
    )
    total = per_part.agg(F.sum("_vc").alias("_tc"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("_vc") > Q11_FRACTION * F.col("_tc"))
        .select("l_partkey", (F.col("_vc") / 100.0).alias("part_value"))
    )


Q11_SQL = f"""
WITH filtered AS (
  SELECT l_partkey,
         {_cents_sql('l_extendedprice * (1 - l_discount)')} AS _c
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = '{Q11_NATION}'
),
per_part AS (
  SELECT l_partkey, CAST(sum(_c) AS BIGINT) AS _vc
  FROM filtered GROUP BY l_partkey
)
SELECT l_partkey, _vc / 100.0 AS part_value
FROM per_part
WHERE _vc > {Q11_FRACTION} * (SELECT CAST(sum(_vc) AS BIGINT) FROM per_part)
"""


# --- TPC-H q12 (adapted): shipping-delay buckets x order priority -----

def q12_shipping_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional aggregation of order priorities
    per shipping class. No l_shipmode/commitdate in this schema, so
    the class is the ship delay bucket (days between order and ship
    date — timestamps are midnight-aligned, so datediff equals
    DuckDB's day-boundary date_diff). One orderkey-join shuffle, one
    tiny group-by; the CASE sums are the same map-side-combinable
    conditional counts as the original."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay <= 30, "1-fast")
        .when(delay <= 365, "2-normal")
        .otherwise("3-slow")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.select(
            bucket.alias("delay_bucket"),
            F.when(high, 1).otherwise(0).alias("_h"),
        )
        .groupBy("delay_bucket")
        .agg(
            F.sum("_h").alias("high_line_count"),
            F.sum(1 - F.col("_h")).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30
            THEN '1-fast'
            WHEN date_diff('day', o_orderdate, l_shipdate) <= 365
            THEN '2-normal'
            ELSE '3-slow' END AS delay_bucket,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


# --- TPC-H q16 (adapted): supplier counts by part attribute ----------

Q16_SIZES = (1, 9, 14, 19, 23, 36, 45, 49)


def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type,
    size) over the part-supplier association, excluding one brand, a
    NOT-LIKE type slice, and 'complaint' suppliers (negative balance
    stands in for the original's comment-text predicate) via anti
    join. The association is distinct (l_partkey, l_suppkey) — at
    scale that dedup is the only wide shuffle; part is a broadcast
    dim and the excluded-supplier list is a broadcast anti join.
    count(DISTINCT) expands to Spark's standard two-phase distinct
    aggregate."""
    assoc = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_type", "p_size"
    )
    part = part.filter(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(*Q16_SIZES)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_acctbal"
    ).filter(F.col("s_acctbal") < 0.0).select("s_suppkey")
    return (
        assoc.join(F.broadcast(part), assoc.l_partkey == part.p_partkey)
        .join(
            F.broadcast(bad_supp),
            assoc.l_suppkey == bad_supp.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


Q16_SQL = f"""
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) assoc
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN {Q16_SIZES}
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
"""


# --- TPC-H q20 (adapted): dominant suppliers of a part slice ---------

def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: a semi-join chain — suppliers selected by an
    IN subquery that itself nests a part-name IN subquery and a
    correlated quantity threshold. Adapted to this schema: suppliers
    who shipped more than half of a 'red%' part's total 1995 volume
    (no partsupp/availqty here). The correlated scalar decorrelates
    to a per-part total joined back (broadcast — the part slice is
    dim-sized); the supplier filter is a LEFT SEMI join, so supplier
    rows are emitted once regardless of how many parts qualify."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    li95 = li.filter(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1996-01-01")
    )
    red_parts = (
        load_table(spark, sf_dir, "part")
        .select("p_partkey", "p_name")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li_red = li95.join(
        F.broadcast(red_parts), li95.l_partkey == red_parts.p_partkey
    )
    per_ps = li_red.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("_q")
    )
    per_part = per_ps.groupBy("l_partkey").agg(F.sum("_q").alias("_tq"))
    dominant = (
        per_ps.join(F.broadcast(per_part), "l_partkey")
        .filter(F.col("_q") > 0.5 * F.col("_tq"))
        .select("l_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal"
    )
    return (
        supp.join(dominant, supp.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
    )


Q20_SQL = """
WITH per_ps AS (
  SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS BIGINT)) AS _q
  FROM lineitem
  WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1996-01-01'
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
  GROUP BY l_partkey, l_suppkey
)
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM per_ps p
  WHERE _q > 0.5 * (SELECT CAST(sum(_q) AS BIGINT) FROM per_ps p2
                    WHERE p2.l_partkey = p.l_partkey)
)
"""


# --- TPC-H q21 (adapted): suppliers who alone shipped late -----------

Q21_NATION = "NATION_3"
Q21_LATE_DAYS = 90


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: per-supplier count of finished multi-supplier
    orders where that supplier was the ONLY late one — EXISTS (another
    supplier's line in the order) plus NOT EXISTS (another supplier's
    LATE line). 'Late' adapts to ship > 90 days after order date
    (no receipt/commit dates in this schema).

    Spark plan: the two correlated predicates collapse into ONE
    per-order aggregate (distinct suppliers, distinct late suppliers
    — EXISTS ⇔ n_supp ≥ 2, NOT EXISTS ⇔ n_late = 1), computed in a
    single shuffle on orderkey that the late-line join then reuses;
    the count preserves one row per qualifying late line, exactly the
    EXISTS semantics of the oracle's correlated form."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderdate", "o_orderstatus")
        .filter(F.col("o_orderstatus") == "F")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    # cached: the line-order join feeds the per-order profile AND the
    # late-line probe; uncached it re-ran per reference (12 parquet
    # scans / 16 Exchanges in the r13 plan audit)
    lo = li.join(orders, li.l_orderkey == orders.o_orderkey).transform(stage)
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {Q21_LATE_DAYS} DAYS"
    )
    order_prof = lo.groupBy("o_orderkey").agg(
        F.count_distinct("l_suppkey").alias("_n_supp"),
        F.count_distinct(F.when(late, F.col("l_suppkey"))).alias("_n_late"),
    )
    late_lines = lo.filter(late).select("o_orderkey", "l_suppkey")
    qualifying = (
        late_lines.join(order_prof, "o_orderkey")
        .filter((F.col("_n_supp") >= 2) & (F.col("_n_late") == 1))
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    ).filter(F.col("n_name") == Q21_NATION)
    sn = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", "s_name")
    return (
        qualifying.join(F.broadcast(sn), qualifying.l_suppkey == sn.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


Q21_SQL = f"""
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND n_name = '{Q21_NATION}'
  AND l1.l_shipdate > o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 100
"""


# --- referential-integrity audit / profiling / partial-agg merge ------

def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan audit over the star schema's FK edges: one bounded row
    per relationship with total child rows and dangling-key count.

    Each edge is an anti-join (child minus matching parent keys) —
    Spark broadcasts the parent when small and AQE picks shuffle-hash
    at scale; either way the output is one row, so the audit runs on
    every load with no materialization cost. NOT EXISTS semantics (an
    anti-join), not NOT IN, so a null parent key can never vacuously
    empty the result."""
    edges = [
        ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ]
    out = None
    for label, child_t, ckey, parent_t, pkey in edges:
        child = load_table(spark, sf_dir, child_t).select(ckey)
        parent = load_table(spark, sf_dir, parent_t).select(pkey)
        n_child = child.agg(F.count("*").alias("n_child"))
        n_orphans = child.join(
            parent, child[ckey] == parent[pkey], "left_anti"
        ).agg(F.count("*").alias("n_orphans"))
        row = (
            n_child.crossJoin(F.broadcast(n_orphans))
            .select(
                F.lit(label).alias("fk_edge"), "n_child", "n_orphans"
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


FK_INTEGRITY_SQL = """
SELECT 'orders->customer' AS fk_edge,
       (SELECT count(*) FROM orders) AS n_child,
       (SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)) AS n_orphans
UNION ALL
SELECT 'lineitem->orders',
       (SELECT count(*) FROM lineitem),
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))
UNION ALL
SELECT 'customer->nation',
       (SELECT count(*) FROM customer),
       (SELECT count(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM nation n
                          WHERE n.n_nationkey = c.c_nationkey))
"""


_PROFILE_COLS = ("event_id", "user_id", "event_type", "value", "props")


def events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profile of the events table: null count and
    exact distinct count per column.

    All five count-distincts run in ONE aggregate — Catalyst plans
    multi-distinct via an Expand (each input row fans out once per
    distinct column, then one shuffle). That is a deliberate scale
    trade: one pass with a 5x expand beats five scans of a 100 TB
    table; for approximate profiling swap count_distinct for
    approx_count_distinct and the Expand disappears."""
    ev = load_table(spark, sf_dir, "events").select(*_PROFILE_COLS)
    aggs = [F.count("*").alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append(
            F.sum(
                F.when(F.col(c).isNull(), 1).otherwise(0)
            ).cast("long").alias(f"_nn_{c}")
        )
        aggs.append(F.count_distinct(F.col(c)).alias(f"_nd_{c}"))
    wide = ev.agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', _nn_{c}, _nd_{c}" for c in _PROFILE_COLS
    )
    return wide.select(
        "n_rows",
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_expr}) "
            "AS (col_name, n_nulls, n_distinct)"
        ),
    ).select("col_name", "n_rows", "n_nulls", "n_distinct")


EVENTS_PROFILE_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name,
       (SELECT count(*) FROM events) AS n_rows,
       CAST((SELECT count(*) FROM events WHERE {c} IS NULL) AS BIGINT)
         AS n_nulls,
       CAST((SELECT count(DISTINCT {c}) FROM events) AS BIGINT)
         AS n_distinct"""
    for c in _PROFILE_COLS
)


def events_hourly_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event counts computed as a MERGE of two partial
    aggregates (first half-month and the rest) — the incremental-view
    maintenance law: agg(A union B) == merge(agg(A), agg(B)) for any
    associative aggregate. This is the batch statement of what the
    streaming entries do per micro-batch, and what a warehouse's
    incremental rollup does per load; the oracle computes the rollup
    flat, so the equality IS the check."""
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type")
    hour = F.date_trunc("hour", F.col("ts")).alias("hour")
    split = F.lit("2024-01-15")
    old = (
        ev.filter(F.col("ts") < split)
        .groupBy(hour, "event_type")
        .agg(F.count("*").alias("n"))
    )
    new = (
        ev.filter(F.col("ts") >= split)
        .groupBy(hour, "event_type")
        .agg(F.count("*").alias("n"))
    )
    return (
        old.unionByName(new)
        .groupBy("hour", "event_type")
        .agg(F.sum("n").alias("n_events"))
    )


EVENTS_HOURLY_INCR_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n_events
FROM events GROUP BY date_trunc('hour', ts), event_type
"""


# --- skyline / forward-fill window patterns ---------------------------

def part_price_size_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of parts minimizing (retail price, size) — the
    2D skyline via the sorted-running-min trick, NOT a quadratic
    dominance self-join.

    Shape: collapse the fact table to one row per distinct price
    (groupBy price -> min size), run the strict-predecessor running
    min over THAT bounded table (a global window, but over distinct
    prices only — never the facts), then semi-join survivors back.
    A part survives iff it has the min size at its price and every
    strictly cheaper price has a strictly larger min size. Money is
    integer cents throughout."""
    parts = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_retailprice", "p_size"
    )
    parts = parts.withColumn("_pc", _cents(F.col("p_retailprice")))
    per_price = parts.groupBy("_pc").agg(F.min("p_size").alias("_msz"))
    w = Window.orderBy("_pc").rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier = (
        per_price.withColumn("_prev", F.min("_msz").over(w))
        .filter(
            F.col("_prev").isNull() | (F.col("_msz") < F.col("_prev"))
        )
        .select("_pc", "_msz")
    )
    return (
        parts.join(
            frontier,
            (parts["_pc"] == frontier["_pc"])
            & (parts["p_size"] == frontier["_msz"]),
            "left_semi",
        )
        .select(
            "p_partkey",
            "p_name",
            (F.col("_pc") / 100.0).alias("price"),
            F.col("p_size").cast("long").alias("size"),
        )
    )


PART_SKYLINE_SQL = f"""
WITH p AS (
  SELECT p_partkey, p_name, p_size,
         {_cents_sql('p_retailprice')} AS pc
  FROM part
),
per_price AS (SELECT pc, min(p_size) AS msz FROM p GROUP BY pc),
frontier AS (
  SELECT pc, msz FROM (
    SELECT pc, msz,
           min(msz) OVER (ORDER BY pc
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS prev
    FROM per_price
  ) WHERE prev IS NULL OR msz < prev
)
SELECT p.p_partkey, p.p_name, p.pc / 100.0 AS price,
       CAST(p.p_size AS BIGINT) AS size
FROM p
WHERE EXISTS (SELECT 1 FROM frontier f
              WHERE f.pc = p.pc AND f.msz = p.p_size)
"""


def purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill (gap-fill) attribution: every event carries the
    value of the user's most recent preceding purchase; summarized per
    user so the output stays bounded.

    The fill is last(ignorenulls) over a running frame — the standard
    sparse-to-dense window pattern (sensor backfill, SCD current-value
    propagation). One exchange on user_id; cents-exact sums."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    purchase_val = F.when(
        F.col("event_type") == "purchase", _cents(F.col("value"))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    filled = ev.withColumn(
        "_last_pc", F.last(purchase_val, ignorenulls=True).over(w)
    )
    return filled.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(
            F.when(F.col("_last_pc").isNotNull(), 1).otherwise(0)
        ).cast("long").alias("n_attributed"),
        (F.sum("_last_pc") / 100.0).alias("attributed_value_sum"),
    )


PURCHASE_ATTRIBUTION_SQL = f"""
WITH filled AS (
  SELECT user_id,
         last_value(CASE WHEN event_type = 'purchase'
                         THEN {_cents_sql('value')} END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS last_pc
  FROM events
)
SELECT user_id, count(*) AS n_events,
       CAST(sum(CASE WHEN last_pc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_attributed,
       CAST(sum(last_pc) AS BIGINT) / 100.0 AS attributed_value_sum
FROM filled GROUP BY user_id
"""


# --- FULL OUTER reconciliation ---------------------------------------

def order_lineitem_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided reconciliation of the orders header against the
    lineitem detail — the snapshot-vs-snapshot audit a warehouse runs
    after every load. A FULL OUTER join of per-order lineitem revenue
    onto order headers classifies every key into: header with no
    detail rows, detail with no header (both directions at once —
    fk_integrity_audit's anti-joins each see only one), and matched
    keys split by whether the header total is within 2x of summed
    detail revenue (the synthetic data prices the two independently,
    so a wide band keeps the check data-driven but stable).

    Scale posture: the detail side pre-aggregates to one row per
    order BEFORE the join (the aggregate-before-join rewrite — the
    full outer then joins two order-cardinality sides on their shared
    key, one co-partitioned exchange each, instead of joining raw
    6x-larger lineitem); the classification aggregate is 4 rows."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", _cents(F.col("o_totalprice")).alias("_oc")
    )
    detail = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", _cents(F.col("l_extendedprice")).alias("_lc"))
        .groupBy("l_orderkey")
        .agg(F.sum("_lc").alias("_dc"))
    )
    j = orders.join(
        detail, orders.o_orderkey == detail.l_orderkey, "full_outer"
    )
    category = (
        F.when(F.col("l_orderkey").isNull(), F.lit("header_only"))
        .when(F.col("o_orderkey").isNull(), F.lit("detail_only"))
        .when(
            (F.col("_oc") <= 2 * F.col("_dc"))
            & (F.col("_dc") <= 2 * F.col("_oc")),
            F.lit("matched_within_band"),
        )
        .otherwise(F.lit("matched_out_of_band"))
    )
    return (
        j.select(category.alias("category"))
        .groupBy("category")
        .agg(F.count("*").alias("n_orders"))
    )


ORDER_LINEITEM_RECONCILIATION_SQL = f"""
WITH detail AS (
  SELECT l_orderkey,
         CAST(sum({_cents_sql('l_extendedprice')}) AS BIGINT) AS _dc
  FROM lineitem GROUP BY l_orderkey
),
j AS (
  SELECT o.o_orderkey, d.l_orderkey,
         {_cents_sql('o.o_totalprice')} AS _oc, d._dc
  FROM orders o FULL OUTER JOIN detail d ON o.o_orderkey = d.l_orderkey
)
SELECT CASE WHEN l_orderkey IS NULL THEN 'header_only'
            WHEN o_orderkey IS NULL THEN 'detail_only'
            WHEN _oc <= 2 * _dc AND _dc <= 2 * _oc
              THEN 'matched_within_band'
            ELSE 'matched_out_of_band'
       END AS category,
       count(*) AS n_orders
FROM j GROUP BY category
"""


def orders_status_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshape with the native ``DataFrame.unpivot``
    (melt) operator — the inverse of orders_priority_pivot: revenue
    per order priority is first laid out wide (one int64-cents column
    per order status, computed in a single conditional-aggregation
    pass over orders), then unpivoted back to (priority, status,
    revenue) rows.

    One exchange total (the groupBy); unpivot itself is a map-side
    Expand — 3x fan-out of a 5-row frame. Money stays int64 cents
    through the wide columns (unpivot requires one common value type)
    and converts once after the melt."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderstatus",
        _cents(F.col("o_totalprice")).alias("_tc"),
    )
    wide = orders.groupBy("o_orderpriority").agg(
        *[
            F.sum(
                F.when(F.col("o_orderstatus") == s, F.col("_tc")).otherwise(0)
            ).alias(s)
            for s in ("O", "F", "P")
        ]
    )
    long = wide.unpivot(
        ids=["o_orderpriority"],
        values=["O", "F", "P"],
        variableColumnName="o_orderstatus",
        valueColumnName="_rc",
    )
    return long.select(
        "o_orderpriority",
        "o_orderstatus",
        (F.col("_rc") / 100.0).alias("revenue"),
    )


ORDERS_UNPIVOT_SQL = f"""
WITH wide AS (
  SELECT o_orderpriority,
         sum(CASE WHEN o_orderstatus = 'O'
                  THEN {_cents_sql('o_totalprice')} ELSE 0 END) AS rev_o,
         sum(CASE WHEN o_orderstatus = 'F'
                  THEN {_cents_sql('o_totalprice')} ELSE 0 END) AS rev_f,
         sum(CASE WHEN o_orderstatus = 'P'
                  THEN {_cents_sql('o_totalprice')} ELSE 0 END) AS rev_p
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, 'O' AS o_orderstatus, rev_o / 100.0 AS revenue
FROM wide
UNION ALL
SELECT o_orderpriority, 'F' AS o_orderstatus, rev_f / 100.0 AS revenue
FROM wide
UNION ALL
SELECT o_orderpriority, 'P' AS o_orderstatus, rev_p / 100.0 AS revenue
FROM wide
"""


def customer_order_window_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Window-frame breadth in one oracle-checked query: per ordered
    customer — their first order's value (``first_value``), their
    third order's value (``nth_value(3)``, NULL for customers with
    fewer), order count, and where their total spend sits within
    their nation (``cume_dist``, tie-broken by custkey so the ratio
    is a deterministic count quotient).

    Two window passes, each on its natural partition key (custkey for
    the order-sequence frame — explicit UNBOUNDED/UNBOUNDED rows
    frame, identical in the oracle, because the default frame stops
    at CURRENT ROW and would NULL nth_value until row 3 — and
    nationkey for the distribution pass over the per-customer
    aggregate, which is dim-sized). Money stays int64 cents until the
    final projection."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("_od"),
        _cents(F.col("o_totalprice")).alias("_tc"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("_od"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    per_order = orders.select(
        "o_custkey",
        "_tc",
        F.first("_tc").over(w).alias("_first"),
        F.nth_value("_tc", 3).over(w).alias("_third"),
    )
    per_cust = per_order.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.max("_first").alias("_fv"),
        F.max("_third").alias("_tv"),
        F.sum("_tc").alias("_tot"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    joined = per_cust.join(
        cust, per_cust["o_custkey"] == cust["c_custkey"]
    )
    w2 = Window.partitionBy("c_nationkey").orderBy(
        F.asc("_tot"), F.asc("o_custkey")
    )
    return joined.select(
        F.col("o_custkey").alias("custkey"),
        "n_orders",
        (F.col("_fv") / 100.0).alias("first_order_value"),
        (F.col("_tv") / 100.0).alias("third_order_value"),
        F.cume_dist().over(w2).alias("nation_spend_cume_dist"),
    )


CUSTOMER_WINDOW_PROFILE_SQL = f"""
WITH per_order AS (
  SELECT o_custkey,
         {_cents_sql('o_totalprice')} AS tc,
         first_value({_cents_sql('o_totalprice')}) OVER w AS fv,
         nth_value({_cents_sql('o_totalprice')}, 3) OVER w AS tv
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey
               ORDER BY CAST(o_orderdate AS DATE) ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
),
per_cust AS (
  SELECT o_custkey, count(*) AS n_orders,
         max(fv) AS fv, max(tv) AS tv, sum(tc) AS tot
  FROM per_order GROUP BY o_custkey
)
SELECT p.o_custkey AS custkey, n_orders,
       fv / 100.0 AS first_order_value,
       tv / 100.0 AS third_order_value,
       cume_dist() OVER (PARTITION BY c.c_nationkey
                         ORDER BY tot ASC, p.o_custkey ASC)
         AS nation_spend_cume_dist
FROM per_cust p JOIN customer c ON p.o_custkey = c.c_custkey
"""


def collation_distinct_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 COLLATION support: distinct part-name cardinality under
    binary vs case-insensitive (UTF8_LCASE) collation, per brand —
    the dedup question ("are 'STEEL' and 'steel' one value?") that
    collations answer in the engine instead of via lower() rewrites.

    The oracle expresses the same semantics with lower() — which is
    exactly the equivalence this entry certifies: a collation-aware
    distinct must equal the normalize-then-distinct plan. Both are
    one groupBy; the collated comparison stays JVM-native.

    ORACLE CONTRACT IS ASCII-ONLY: UTF8_LCASE == lower()-rewrite
    holds for the ASCII part names in this data but NOT under full
    Unicode case folding (ς/σ fold together, Turkish İ lowercases to
    i̇), so a non-ASCII data vintage would surface as a hash mismatch
    here, not a Spark bug. If p_name ever grows non-ASCII values,
    guard the column (e.g. filter p_name RLIKE '^[\\x00-\\x7F]*$' on
    both sides) or switch the oracle to ICU casefolding."""
    part = load_table(spark, sf_dir, "part").select("p_brand", "p_name")
    return part.groupBy("p_brand").agg(
        F.count_distinct(F.col("p_name")).alias("n_binary_distinct"),
        F.count_distinct(
            F.collate(F.col("p_name"), "UTF8_LCASE")
        ).alias("n_lcase_distinct"),
    )


COLLATION_DISTINCT_SQL = """
SELECT p_brand,
       count(DISTINCT p_name) AS n_binary_distinct,
       count(DISTINCT lower(p_name)) AS n_lcase_distinct
FROM part GROUP BY p_brand
"""


def ship_rate_try_divide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic with the ``try_`` function family:
    revenue-per-day-to-ship where same-day lines make the denominator
    ZERO — ``try_divide`` yields NULL instead of either raising
    (ANSI) or silently producing Inf (legacy), and the aggregate
    reports the null rate explicitly. The per-line ratio is quantized
    to int64 micro-units before the sum (sign-aware half-up mean);
    day counts can be negative in this dataset (the synthetic tables
    invert the TPC-H ship>=order invariant about half the time), so
    the mean idiom must handle both signs."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_returnflag",
        F.col("l_shipdate").cast("date").alias("_ship"),
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
        )
        .cast("long")
        .alias("_rc"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("_od")
    )
    rated = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        "l_returnflag",
        F.round(
            F.try_divide(
                F.col("_rc"), F.datediff("_ship", "_od")
            )
            * 1000,
            0,
        )
        .cast("long")
        .alias("_r_milli"),
    )
    return (
        rated.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(
                F.when(F.col("_r_milli").isNull(), 1).otherwise(0)
            ).alias("n_same_day"),
            F.sum("_r_milli").alias("_s"),
            F.count("_r_milli").alias("_nr"),
        )
        .select(
            "l_returnflag",
            "n_lines",
            "n_same_day",
            (
                # _nr = 0 guard (a group whose lines ALL shipped
                # same-day): Spark's non-ANSI div would return NULL
                # silently while DuckDB's // raises — make the NULL
                # explicit in BOTH engines so they cannot diverge.
                F.expr(
                    "CASE WHEN _nr = 0 THEN NULL"
                    " WHEN _s >= 0 THEN (2 * _s + _nr) div (2 * _nr)"
                    " ELSE -((2 * (-_s) + _nr) div (2 * _nr)) END"
                )
                / 1000.0
            ).alias("mean_cents_per_day"),
        )
    )


SHIP_RATE_TRY_DIVIDE_SQL = """
WITH rated AS (
  SELECT l.l_returnflag,
         CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                             CAST(l.l_shipdate AS DATE)) = 0 THEN NULL
              ELSE CAST(round(
                     CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                * 100, 0) AS BIGINT)
                     / date_diff('day', CAST(o.o_orderdate AS DATE),
                                 CAST(l.l_shipdate AS DATE)) * 1000, 0)
                   AS BIGINT)
         END AS r_milli
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT l_returnflag, count(*) AS n_lines,
       CAST(sum(CASE WHEN r_milli IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_same_day,
       (CASE WHEN count(r_milli) = 0 THEN NULL
             WHEN sum(r_milli) >= 0
             THEN (2 * sum(r_milli) + count(r_milli))
                    // (2 * count(r_milli))
             ELSE -((2 * (-sum(r_milli)) + count(r_milli))
                    // (2 * count(r_milli))) END) / 1000.0
         AS mean_cents_per_day
FROM rated GROUP BY l_returnflag
"""
