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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..cachemgr import stage
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


# --- salted hot-key join ---------------------------------------------

SALT_BUCKETS = 16


def events_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key JOIN through an explicit salting rewrite: per event,
    join to its type's (n, sum) profile and count events whose value
    is above the type mean.

    ``event_type`` has ~5 values, so a shuffled join on it alone
    funnels each type's entire fact stream through one partition — the
    textbook skew cliff at 100 TB (AQE's skew-join split handles sort-
    merge cases at runtime; this is the explicit rewrite you use when
    the dim side is too big to broadcast and you want the plan shape
    guaranteed). Rewrite: the fact side gets
    ``salt = pmod(hash(event_id), 16)``; the dim side is exploded x16
    (dim rows are few — the explosion is bounded); the join key
    becomes (event_type, salt), spreading each hot key over 16
    partitions. ``shuffle_hash`` hint keeps Spark from broadcasting
    the small test dim so the demonstrated plan is the at-scale one.

    Above-mean test uses ``vc * n > sum_vc`` (exact int64 products) —
    no division, so no float or integer-division-semantics drift
    between engines."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    fact = ev.select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("vc"),
        F.pmod(F.hash("event_id"), F.lit(SALT_BUCKETS)).alias("salt"),
    )
    dim = fact.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("vc").alias("sum_vc")
    )
    salts = spark.range(SALT_BUCKETS).select(
        F.col("id").cast("int").alias("salt")
    )
    dim_salted = dim.crossJoin(salts)  # bounded: |dim| x 16 rows
    joined = fact.join(
        dim_salted.hint("shuffle_hash"), ["event_type", "salt"]
    )
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(
            F.when(F.col("vc") * F.col("n") > F.col("sum_vc"), 1).otherwise(0)
        ).alias("n_above_mean"),
    )


EVENTS_SALTED_JOIN_SQL = """
WITH f AS (
  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS vc
  FROM events
),
d AS (
  SELECT event_type, count(*) AS n, sum(vc) AS sum_vc
  FROM f GROUP BY event_type
)
SELECT f.event_type, count(*) AS n_events,
       CAST(sum(CASE WHEN f.vc * d.n > d.sum_vc THEN 1 ELSE 0 END)
            AS BIGINT) AS n_above_mean
FROM f JOIN d ON f.event_type = d.event_type
GROUP BY f.event_type
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
    sketches are fixed-size and merge map-side, one pass.

    Oracle contract (VERDICT r5 ask #7): the raw sketch value is
    engine-specific, so it never appears in the output. Instead the
    query SELF-CERTIFIES — it computes the sketch AND the exact count
    in one Spark aggregate and exports ``sketch_ok`` = "sketch within
    APPROX_TOL of exact". DuckDB never computes a sketch (the ADVICE
    r1 hazard was comparing two engines' independent sketches); its
    oracle emits the exact count plus a constant TRUE, so a Spark
    sketch drifting out of tolerance hash-mismatches the driver row.
    The exact tier here exists only for certification; the 100 TB
    deployment runs the sketch alone (see approx_distinct_users for
    the exact tier's own entry)."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("_n_approx"),
        F.countDistinct("user_id").alias("n_exact"),
    )
    return agg.select(
        "event_type",
        "n_exact",
        (
            F.abs(F.col("_n_approx") - F.col("n_exact"))
            <= F.col("n_exact") * F.lit(APPROX_TOL)
        ).alias("sketch_ok"),
    )


APPROX_DISTINCT_SKETCH_SQL = """
SELECT event_type,
       count(DISTINCT user_id) AS n_exact,
       TRUE AS sketch_ok
FROM events GROUP BY event_type
"""


def events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 heaviest users by event count with their share of all
    events — the key-frequency diagnostic you run BEFORE choosing a
    partitioning/salting strategy for a user-keyed join or agg.

    Plan shape: one groupBy(user_id) with map-side partial agg, a
    1-row total broadcast back (no second scan of events), and the
    top-10 via sort+limit, which Spark plans as TakeOrderedAndProject
    — per-partition heaps plus a driver merge of 10-row tops, never a
    global sort. Ties break on user_id so the cut is deterministic in
    both engines."""
    cnt = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )
    tot = cnt.agg(F.sum("n_events").alias("_t"))
    # Share rounded half-up in PURE int64 — (2*10^6*n + t) div (2t) —
    # then ONE exact division by 1e6. round() after a double division
    # can land a decimal tie on opposite sides per engine (Spark
    # rounds the binary expansion via BigDecimal, DuckDB re-rounds
    # x*10^d) — the training_manifest / doc_lm_surprisal contract.
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "n_events",
            (
                F.expr(
                    "(2 * 1000000 * n_events + _t) div (2 * _t)"
                ).cast("double")
                / 1e6
            ).alias("share"),
        )
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(10)
    )


EVENTS_HEAVY_HITTERS_SQL = """
WITH cnt AS (
  SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
),
tot AS (SELECT sum(n_events) AS _t FROM cnt)
SELECT user_id, n_events,
       ((2 * 1000000 * n_events + _t) // (2 * _t)) / 1000000.0 AS share
FROM cnt, tot
ORDER BY n_events DESC, user_id ASC
LIMIT 10
"""


def price_percentiles_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketched p50/p95 per order priority — the 100 TB percentile
    path, mirroring approx_distinct_sketch's relationship to the exact
    tier (operators/relational.py price_percentiles).

    Exact `percentile` buffers and sorts every group value on one
    reducer per group; `approx_percentile` (t-digest-style quantile
    summary) is fixed-size and merges map-side, one pass, no sort.

    Oracle contract (VERDICT r5 ask #7): same self-certification shape
    as approx_distinct_sketch — the raw sketched quantiles are
    engine-specific and never exported; the query computes sketch and
    exact percentiles in one Spark aggregate and exports per-quantile
    within-APPROX_PCT_TOL booleans, which the DuckDB oracle pins to
    TRUE. A sketch drifting out of tolerance hash-mismatches the
    driver row instead of hiding behind a rows-only check."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    agg = orders.groupBy("o_orderpriority").agg(
        F.expr(
            "approx_percentile(o_totalprice, array(0.5, 0.95), 10000)"
        ).alias("_a"),
        F.expr("percentile(o_totalprice, array(0.5, 0.95))").alias("_e"),
        F.count("*").alias("n_orders"),
    )
    return agg.select(
        "o_orderpriority",
        "n_orders",
        (
            F.abs(F.col("_a")[0] - F.col("_e")[0])
            <= F.col("_e")[0] * F.lit(APPROX_PCT_TOL)
        ).alias("p50_ok"),
        (
            F.abs(F.col("_a")[1] - F.col("_e")[1])
            <= F.col("_e")[1] * F.lit(APPROX_PCT_TOL)
        ).alias("p95_ok"),
    )


PRICE_PERCENTILES_SKETCH_SQL = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       TRUE AS p50_ok,
       TRUE AS p95_ok
FROM orders GROUP BY o_orderpriority
"""


APPROX_PCT_TOL = 0.02  # sketched percentile within 2% of exact


PREFILTER_BUCKETS = 4096


def bucket_prefilter_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective dim⨝fact join with an EXPLICIT runtime pre-filter:
    monthly shipped revenue for 1995 urgent orders. The dim side
    (urgent 1995 orders) keeps ~3% of orders, but a plain join still
    shuffles (or broadcast-probes) every lineitem row. This plan
    makes the runtime-filter pattern explicit and engine-visible:

    1. the filtered dim's keys hash into a 4096-bucket
       membership set (a distinct-aggregate, tiny by construction —
       at most 4096 rows regardless of corpus size);
    2. the fact scan inner-joins that broadcast set on its own bucket
       column — a semi-join-shaped pre-filter that drops most fact
       rows BEFORE the real join does any work;
    3. the surviving rows join the dim exactly; bucket-collision
       false positives fall out here, so the result equals the plain
       join the oracle writes by construction, for ANY hash.

    This is precisely what Spark's InjectRuntimeFilter /
    bloom-filter join does adaptively; spelling it out keeps the
    rewrite available when the optimizer declines (e.g. a non-equi
    pre-aggregated dim) and pins its correctness contract. Both
    joins broadcast; the only wide exchange is the final monthly
    aggregate (12 rows)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    dim = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.year("o_orderdate") == 1995)
    ).select("o_orderkey")
    buckets = dim.select(
        F.pmod(F.xxhash64("o_orderkey"), F.lit(PREFILTER_BUCKETS)).alias(
            "_bucket"
        )
    ).distinct()
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.month("l_shipdate").alias("ship_month"),
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
        )
        .cast("long")
        .alias("_rc"),
    )
    prefiltered = li.withColumn(
        "_bucket", F.pmod(F.xxhash64("l_orderkey"), F.lit(PREFILTER_BUCKETS))
    ).join(F.broadcast(buckets), "_bucket")
    joined = prefiltered.join(
        F.broadcast(dim), prefiltered["l_orderkey"] == dim["o_orderkey"]
    )
    return (
        joined.groupBy("ship_month")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("_rc").alias("_s"),
        )
        .select(
            "ship_month", "n_items", (F.col("_s") / 100.0).alias("revenue")
        )
    )


BUCKET_PREFILTER_SQL = """
WITH dim AS (
  SELECT o_orderkey FROM orders
  WHERE o_orderpriority = '1-URGENT'
    AND year(CAST(o_orderdate AS DATE)) = 1995
)
SELECT month(CAST(l.l_shipdate AS DATE)) AS ship_month,
       count(*) AS n_items,
       sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                AS BIGINT)) / 100.0 AS revenue
FROM lineitem l JOIN dim d ON l.l_orderkey = d.o_orderkey
GROUP BY 1
"""


HLL_TOL = 0.10  # weekly union estimate within 10% of exact


def hll_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: per-day HLL sketches of active users,
    UNIONED up to per-week estimates — the re-aggregation pattern that
    makes sketches the 100 TB cardinality path (daily sketches are a
    few KB each; the weekly/monthly rollup unions sketches instead of
    re-scanning the lake, which exact distinct counts cannot do).

    Two aggregate levels: groupBy(week, day) builds the daily
    sketches map-side; groupBy(week) merges them with hll_union_agg
    and estimates. Self-certified like the other sketch tiers
    (VERDICT r5 ask #7): the exact weekly distinct count is computed
    alongside and only the within-HLL_TOL boolean is exported — the
    sketch blob and estimate are engine-specific and never leave the
    query."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
        F.to_date("ts").alias("day"),
        "user_id",
    )
    daily = ev.groupBy("week", "day").agg(
        F.hll_sketch_agg("user_id").alias("_sk")
    )
    weekly_est = daily.groupBy("week").agg(
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("_est"),
        F.count("*").alias("n_days"),
    )
    weekly_exact = ev.groupBy("week").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return weekly_est.join(weekly_exact, "week").select(
        "week",
        "n_days",
        "n_exact",
        (
            F.abs(F.col("_est") - F.col("n_exact"))
            <= F.col("n_exact") * F.lit(HLL_TOL)
        ).alias("sketch_ok"),
    )


HLL_UNION_ROLLUP_SQL = """
SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
       count(DISTINCT CAST(ts AS DATE)) AS n_days,
       count(DISTINCT user_id) AS n_exact,
       TRUE AS sketch_ok
FROM events GROUP BY 1
"""


# ----------------------------------------------------------------------
# Round-7 queue (implemented + tested ahead of registration; the
# round-6 freeze arithmetic left zero slots — see
# coverage_highwater.json and SURVEY.md "Round-7 queue").
# ----------------------------------------------------------------------

CM_ROWS = 4  # depth d: rows 0..3 of the frozen MINHASH_PERMS family
CM_WIDTH = 512  # width w: buckets per row


def _cm_perms():
    from ..functions.hashing import HASH_MOD, MINHASH_PERMS

    return HASH_MOD, MINHASH_PERMS[:CM_ROWS]


def cmsketch_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch estimates for the top-10 heaviest users,
    built as per-day sketches MERGED cell-wise — the second mergeable
    sketch kind next to HLL (`hll_union_rollup`), and unlike HLL it
    is engine-portable: the hash family is the frozen affine
    MINHASH_PERMS over int64, so DuckDB reproduces the sketch cell
    for cell and the driver hash-checks the ESTIMATES themselves, not
    a tolerance boolean.

    Shape: events explode x CM_ROWS -> groupBy(day, row, bucket)
    count (map-side partial agg; cells bounded at days x 4 x 512
    regardless of user cardinality) -> groupBy(row, bucket) sum is
    the merge (count-min is linear, the property this entry pins).
    The top-10 exact counts come from one groupBy(user_id) +
    TakeOrderedAndProject; their estimates look up 4 cells each via a
    broadcast join against the ~2k-row merged sketch. At 100 TB the
    sketch build is one pass with fixed-size state per partition and
    the merge moves 2 KB per day — the exact twin here exists only
    for certification (overcount >= 0 is the CM invariant).
    """
    mod, perms = _cm_perms()
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    cells_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                (
                    (F.lit(a) * F.col("user_id") + F.lit(b)) % mod % CM_WIDTH
                ).alias("bucket"),
            )
            for i, (a, b) in enumerate(perms)
        ]
    )
    daily = (
        ev.select("day", F.explode(cells_arr).alias("c"))
        .groupBy("day", "c.row", "c.bucket")
        .agg(F.count("*").alias("cnt"))
    )
    merged = daily.groupBy("row", "bucket").agg(F.sum("cnt").alias("cell"))

    top = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_exact"))
        .orderBy(F.desc("n_exact"), F.asc("user_id"))
        .limit(10)
    )
    probes = top.select(
        "user_id", "n_exact", F.explode(cells_arr).alias("c")
    ).select("user_id", "n_exact", "c.row", "c.bucket")
    est = (
        probes.join(F.broadcast(merged), ["row", "bucket"])
        .groupBy("user_id", "n_exact")
        .agg(F.min("cell").alias("cm_estimate"))
    )
    return est.select(
        "user_id",
        "n_exact",
        "cm_estimate",
        (F.col("cm_estimate") - F.col("n_exact")).alias("overcount"),
    )


def _cm_perm_values() -> str:
    mod, perms = _cm_perms()
    rows = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(perms))
    return f"(VALUES {rows}) AS perms(i, a, b)"


def _cm_sql() -> str:
    from ..functions.hashing import HASH_MOD

    # The oracle builds the GLOBAL cells directly — equal to the
    # merged per-day sketches exactly because count-min is linear,
    # which is the property the cross-engine hash certifies.
    return f"""
WITH perms AS (SELECT * FROM {_cm_perm_values()}),
cells AS (
  SELECT p.i, (p.a * e.user_id + p.b) % {HASH_MOD} % {CM_WIDTH} AS bucket,
         count(*) AS cell
  FROM events e CROSS JOIN perms p GROUP BY 1, 2
),
top10 AS (
  SELECT user_id, count(*) AS n_exact FROM events GROUP BY 1
  ORDER BY n_exact DESC, user_id LIMIT 10
)
SELECT t.user_id, t.n_exact,
       CAST(min(c.cell) AS BIGINT) AS cm_estimate,
       CAST(min(c.cell) AS BIGINT) - t.n_exact AS overcount
FROM top10 t
JOIN perms p ON TRUE
JOIN cells c
  ON c.i = p.i
 AND c.bucket = (p.a * t.user_id + p.b) % {HASH_MOD} % {CM_WIDTH}
GROUP BY 1, 2
"""


BLOOM_BITS = 63_488  # 1024 words x 62 usable bits
BLOOM_HASHES = 3  # perms 4..6 of MINHASH_PERMS
BLOOM_WORD_BITS = 62  # stay clear of the int64 sign bit in BOTH engines


def _bloom_perms():
    from ..functions.hashing import HASH_MOD, MINHASH_PERMS

    return HASH_MOD, MINHASH_PERMS[4 : 4 + BLOOM_HASHES]


def bloom_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning: build a 63 Kbit filter over
    urgent-1995 order keys, probe every lineitem row through it
    BEFORE the join, and account exactly what the filter did —
    the runtime-filter mechanic (Spark's InjectRuntimeFilter /
    row-level runtime filtering) reconstructed from first principles
    with the engine-portable hash family so the DuckDB oracle
    reproduces the bitmap bit for bit.

    Build: distinct build keys explode x 3 hashes -> (word, bit) ->
    groupBy(word) bit_or(1 << bit) — a ~1024-row bitmap relation.
    Probe: three BROADCAST joins of the fact against the bitmap on
    the three word indexes (no fact-side shuffle, no explode of the
    fact), pass = all three probed bits set. Certification: exact
    membership via one broadcast semi-join-style left join; the
    output pins n_pass >= n_match (no false negatives — a Bloom
    filter's contract) and counts the false positives the 62-bit/key
    budget leaves. At 100 TB the bitmap stays KBs regardless of fact
    size and the probe is map-only — the filter drops non-matching
    rows before they reach the join exchange."""
    mod, perms = _bloom_perms()
    build = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.year("o_orderdate") == 1995)
        )
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )
    pos = [
        ((F.lit(a) * F.col("k") + F.lit(b)) % mod % BLOOM_BITS)
        for (a, b) in perms
    ]
    sets_arr = F.array(
        *[
            F.struct(
                (p / BLOOM_WORD_BITS).cast("long").alias("word"),
                (p % BLOOM_WORD_BITS).cast("int").alias("bit"),
            )
            for p in pos
        ]
    )
    bitmap = (
        build.select(F.explode(sets_arr).alias("s"))
        .select("s.word", "s.bit")
        .groupBy("word")
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), bit)")
            ).alias("bits")
        )
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k")
    )
    probe = li
    for j, (a, b) in enumerate(perms):
        p = (F.lit(a) * F.col("k") + F.lit(b)) % mod % BLOOM_BITS
        probe = probe.withColumn(
            f"_w{j}", (p / BLOOM_WORD_BITS).cast("long")
        ).withColumn(f"_b{j}", (p % BLOOM_WORD_BITS).cast("int"))
    for j in range(len(perms)):
        bm = F.broadcast(
            bitmap.select(
                F.col("word").alias(f"_w{j}"),
                F.col("bits").alias(f"_bits{j}"),
            )
        )
        probe = probe.join(bm, f"_w{j}", "left")
    passed = None
    for j in range(len(perms)):
        hit = (
            F.coalesce(F.col(f"_bits{j}"), F.lit(0))
            .bitwiseAND(F.expr(f"shiftleft(CAST(1 AS BIGINT), _b{j})"))
            != 0
        )
        passed = hit if passed is None else (passed & hit)
    probe = probe.withColumn("_pass", passed)

    truth = build.select("k", F.lit(True).alias("_match"))
    joined = probe.join(F.broadcast(truth), "k", "left").select(
        "_pass", F.coalesce("_match", F.lit(False)).alias("_match")
    )
    return joined.agg(
        F.count("*").alias("n_probe_rows"),
        F.sum(F.col("_pass").cast("long")).alias("n_bloom_pass"),
        F.sum(F.col("_match").cast("long")).alias("n_true_match"),
        F.sum(
            (F.col("_pass") & ~F.col("_match")).cast("long")
        ).alias("n_false_positive"),
        (
            F.sum((F.col("_match") & ~F.col("_pass")).cast("long")) == 0
        ).alias("no_false_negatives"),
    )


def _bloom_sql() -> str:
    from ..functions.hashing import HASH_MOD

    _, perms = _bloom_perms()
    perm_rows = ", ".join(f"({a}, {b})" for (a, b) in perms)
    return f"""
WITH build AS (
  SELECT DISTINCT o_orderkey AS k FROM orders
  WHERE o_orderpriority = '1-URGENT'
    AND year(CAST(o_orderdate AS DATE)) = 1995
),
perms AS (SELECT * FROM (VALUES {perm_rows}) AS p(a, b)),
bitmap AS (
  SELECT ((p.a * b.k + p.b) % {HASH_MOD} % {BLOOM_BITS})
           // {BLOOM_WORD_BITS} AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(
           ((p.a * b.k + p.b) % {HASH_MOD} % {BLOOM_BITS})
             % {BLOOM_WORD_BITS} AS INTEGER)) AS bits
  FROM build b CROSS JOIN perms p
  GROUP BY 1
),
probe AS (
  SELECT l.l_orderkey AS k,
         (SELECT count(*) FROM perms p
          WHERE coalesce((SELECT bits FROM bitmap m
                          WHERE m.word = ((p.a * l.l_orderkey + p.b)
                            % {HASH_MOD} % {BLOOM_BITS}) // {BLOOM_WORD_BITS}),
                         0)
                & (CAST(1 AS BIGINT) << CAST(((p.a * l.l_orderkey + p.b)
                    % {HASH_MOD} % {BLOOM_BITS}) % {BLOOM_WORD_BITS}
                    AS INTEGER)) <> 0
         ) = {BLOOM_HASHES} AS pass,
         EXISTS (SELECT 1 FROM build b WHERE b.k = l.l_orderkey) AS match
  FROM lineitem l
)
SELECT count(*) AS n_probe_rows,
       CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bloom_pass,
       CAST(sum(CASE WHEN match THEN 1 ELSE 0 END) AS BIGINT)
         AS n_true_match,
       CAST(sum(CASE WHEN pass AND NOT match THEN 1 ELSE 0 END) AS BIGINT)
         AS n_false_positive,
       sum(CASE WHEN match AND NOT pass THEN 1 ELSE 0 END) = 0
         AS no_false_negatives
FROM probe
"""


# --- KMV (k-minimum-values) distinct sketch + union merge -------------

KMV_K = 64
KMV_A = 1_103_515_245   # affine hash h(u) = (a*u + b) % HASH_MOD
KMV_B = 12_345
_KMV_MOD = 1_000_000_007  # = functions.hashing.HASH_MOD


def kmv_distinct_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct sketch per event type, PLUS the
    sketch-merge path: the '__union__' row estimates distinct users
    across ALL types from only the per-type bottom-k hash sets (5k
    values), never rescanning the events — the mergeability that
    makes KMV (like HLL) a lake-rollup primitive. Unlike the HLL
    entries, which self-certify against an exact twin because the
    JVM sketch is engine-specific, KMV over the engine-portable
    affine hash is EXACTLY reproducible in DuckDB: the estimate
    itself is oracle-pinned, bit for bit.

    Estimator: with h_(k) the k-th smallest distinct hash over a
    space of size M, D ≈ (k-1) * M / h_(k) (Bar-Yossef et al. 2002),
    floor-divided in int64; groups with fewer than k distinct hashes
    report the exact count (the sketch IS the distinct set there).

    Scale posture (100 TB): the certification tier computes exact
    distincts (test scale only). The sketch path shuffles DISTINCT
    (type, hash) pairs — map-side partial dedup first — then a
    per-type window over distinct hashes takes the bottom k. In
    production the pre-aggregation is per-partition bottom-k (a
    k-row state per task, merged associatively), so the shuffle
    carries k rows per (task, type) instead of the distinct set;
    the estimator and merge rule are unchanged — that swap is the
    same partial-agg discipline as the HLL rollup entry."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        ((F.col("user_id") * KMV_A + KMV_B) % _KMV_MOD).alias("h"),
        "user_id",
    )
    distinct_h = ev.select("event_type", "h").distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    kept = distinct_h.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= KMV_K
    )

    def _estimate(grouped: DataFrame) -> DataFrame:
        return grouped.agg(
            F.count("*").alias("n_kept"), F.max("h").alias("hk")
        ).select(
            "scope",
            F.when(F.col("n_kept") < KMV_K, F.col("n_kept"))
            .otherwise(
                F.expr(f"({KMV_K} - 1) * CAST({_KMV_MOD} AS BIGINT) div hk")
            )
            .alias("kmv_estimate"),
        )

    per_type = _estimate(
        kept.groupBy(F.col("event_type").alias("scope"))
    )
    # merge: union the per-type bottom-k sets, re-take the bottom k
    merged_kept = (
        kept.select("h")
        .distinct()
        .withColumn("rn", F.row_number().over(Window.orderBy("h")))
        .filter(F.col("rn") <= KMV_K)
        .withColumn("scope", F.lit("__union__"))
    )
    merged = _estimate(merged_kept.groupBy("scope"))

    exact_per_type = ev.groupBy(F.col("event_type").alias("scope")).agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    exact_all = ev.agg(
        F.countDistinct("user_id").alias("n_exact")
    ).withColumn("scope", F.lit("__union__"))

    est = per_type.unionByName(merged)
    exact = exact_per_type.unionByName(
        exact_all.select("scope", "n_exact")
    )
    return est.join(exact, "scope").select(
        "scope",
        "n_exact",
        "kmv_estimate",
        F.expr(
            "abs(kmv_estimate - n_exact) * 1000000 div n_exact"
        ).alias("err_ppm"),
    )


KMV_DISTINCT_UNION_SQL = f"""
WITH ev AS (
  SELECT event_type,
         (user_id * {KMV_A} + {KMV_B}) % {_KMV_MOD} AS h,
         user_id
  FROM events
),
dh AS (SELECT DISTINCT event_type, h FROM ev),
kept AS (
  SELECT event_type AS scope, h FROM (
    SELECT event_type, h,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM dh
  ) WHERE rn <= {KMV_K}
),
merged_kept AS (
  SELECT '__union__' AS scope, h FROM (
    SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
    FROM (SELECT DISTINCT h FROM kept)
  ) WHERE rn <= {KMV_K}
),
est AS (
  SELECT scope,
         CASE WHEN count(*) < {KMV_K} THEN count(*)
              ELSE ({KMV_K} - 1) * CAST({_KMV_MOD} AS BIGINT) // max(h)
         END AS kmv_estimate
  FROM (SELECT * FROM kept UNION ALL SELECT * FROM merged_kept)
  GROUP BY scope
),
exact AS (
  SELECT event_type AS scope, count(DISTINCT user_id) AS n_exact
  FROM ev GROUP BY event_type
  UNION ALL
  SELECT '__union__', count(DISTINCT user_id) FROM ev
)
SELECT e.scope,
       CAST(x.n_exact AS BIGINT) AS n_exact,
       CAST(e.kmv_estimate AS BIGINT) AS kmv_estimate,
       CAST(abs(e.kmv_estimate - x.n_exact) * 1000000 // x.n_exact
            AS BIGINT) AS err_ppm
FROM est e JOIN exact x ON e.scope = x.scope
"""


# --- KMV sketch intersection: join-cardinality estimation -------------

KMV_JOIN_K = 128
KMV_A_CUTOFF = "1996-01-01"   # side A: custkeys ordering after this
KMV_B_MIN_BAL = 5000          # side B: customers above this balance


def kmv_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimate a join's key overlap from two KMV sketches WITHOUT
    touching the full key sets together — the statistic a planner
    needs to size a semi-join or pick a broadcast side when the two
    inputs live in different tables (or different systems; KMV
    sketches of both can meet on one node, the tables never do).

    Algebra (Beyer et al. 2007): with bottom-k sketches S_A and S_B,
    tau = k-th smallest of the merged sketch, the union cardinality
    is (k-1)*M/tau and the Jaccard estimate is |{h in S_A ∩ S_B :
    h <= tau}| / k; their product estimates |A ∩ B|. Under the
    engine-portable affine hash every step is int64 arithmetic, so
    the ESTIMATE is oracle-pinned bit-for-bit (the exact tier rides
    along for the error accounting, test-scale only).

    Scale posture (100 TB): each side's sketch is a bottom-k over
    DISTINCT hashes — at scale a per-partition bottom-k partial
    merged associatively (the kmv_distinct_union posture); the
    intersection math then runs on two k-row frames, broadcast-sized
    regardless of table size."""
    a_keys = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate") >= F.lit(KMV_A_CUTOFF).cast("timestamp")
        )
        .select(F.col("o_custkey").alias("key"))
    )
    b_keys = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > KMV_B_MIN_BAL)
        .select(F.col("c_custkey").alias("key"))
    )

    def _sketch(df: DataFrame, tag: str) -> DataFrame:
        h = ((F.col("key") * KMV_A + KMV_B) % _KMV_MOD).alias("h")
        dh = df.select(h).distinct()
        w = Window.orderBy("h")
        return (
            dh.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= KMV_JOIN_K)
            .select("h", F.lit(tag).alias("side"))
        )

    sa = _sketch(a_keys, "a")
    sb = _sketch(b_keys, "b")
    both = sa.unionByName(sb)
    merged = (
        both.select("h")
        .distinct()
        .withColumn("rn", F.row_number().over(Window.orderBy("h")))
    )
    tau_f = merged.agg(
        F.max(F.when(F.col("rn") <= KMV_JOIN_K, F.col("h"))).alias("tau"),
        F.count("*").alias("n_union_kept"),
    )
    common = (
        sa.select("h")
        .join(sb.select("h"), "h")
        .crossJoin(F.broadcast(tau_f))
        .filter(F.col("h") <= F.col("tau"))
        .agg(F.count("*").alias("n_common"))
    )
    exact = (
        a_keys.distinct()
        .join(b_keys.distinct(), "key")
        .agg(F.count("*").alias("n_intersect_exact"))
    )
    counts = (
        a_keys.agg(F.countDistinct("key").alias("n_a"))
        .crossJoin(
            F.broadcast(b_keys.agg(F.countDistinct("key").alias("n_b")))
        )
    )
    return (
        tau_f.crossJoin(F.broadcast(common))
        .crossJoin(F.broadcast(exact))
        .crossJoin(F.broadcast(counts))
        .select(
            "n_a",
            "n_b",
            "n_intersect_exact",
            F.when(
                F.col("n_union_kept") < KMV_JOIN_K, F.col("n_common")
            )
            .otherwise(
                F.expr(
                    f"n_common * (({KMV_JOIN_K} - 1)"
                    f" * CAST({_KMV_MOD} AS BIGINT) div tau)"
                    f" div {KMV_JOIN_K}"
                )
            )
            .alias("intersect_est"),
        )
        .select(
            "n_a",
            "n_b",
            "n_intersect_exact",
            "intersect_est",
            F.expr(
                "abs(intersect_est - n_intersect_exact) * 1000000"
                " div greatest(n_intersect_exact, 1)"
            ).alias("err_ppm"),
        )
    )


KMV_JOIN_CARDINALITY_SQL = f"""
WITH a_keys AS (
  SELECT o_custkey AS key FROM orders
  WHERE o_orderdate >= TIMESTAMP '{KMV_A_CUTOFF}'
),
b_keys AS (
  SELECT c_custkey AS key FROM customer WHERE c_acctbal > {KMV_B_MIN_BAL}
),
sa AS (
  SELECT h FROM (
    SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM (
      SELECT DISTINCT (key * {KMV_A} + {KMV_B}) % {_KMV_MOD} AS h
      FROM a_keys)
  ) WHERE rn <= {KMV_JOIN_K}
),
sb AS (
  SELECT h FROM (
    SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM (
      SELECT DISTINCT (key * {KMV_A} + {KMV_B}) % {_KMV_MOD} AS h
      FROM b_keys)
  ) WHERE rn <= {KMV_JOIN_K}
),
merged AS (
  SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
  FROM (SELECT h FROM sa UNION SELECT h FROM sb)
),
tau_f AS (
  SELECT max(CASE WHEN rn <= {KMV_JOIN_K} THEN h END) AS tau,
         count(*) AS n_union_kept
  FROM merged
),
common AS (
  SELECT count(*) AS n_common
  FROM sa JOIN sb ON sa.h = sb.h, tau_f
  WHERE sa.h <= tau_f.tau
),
exact AS (
  SELECT count(*) AS n_intersect_exact FROM
    (SELECT DISTINCT key FROM a_keys) a
    JOIN (SELECT DISTINCT key FROM b_keys) b ON a.key = b.key
),
counts AS (
  SELECT (SELECT count(DISTINCT key) FROM a_keys) AS n_a,
         (SELECT count(DISTINCT key) FROM b_keys) AS n_b
),
est AS (
  SELECT n_a, n_b, n_intersect_exact,
         CASE WHEN n_union_kept < {KMV_JOIN_K} THEN n_common
              ELSE n_common * (({KMV_JOIN_K} - 1)
                   * CAST({_KMV_MOD} AS BIGINT) // tau) // {KMV_JOIN_K}
         END AS intersect_est
  FROM tau_f, common, exact, counts
)
SELECT CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       CAST(n_intersect_exact AS BIGINT) AS n_intersect_exact,
       CAST(intersect_est AS BIGINT) AS intersect_est,
       CAST(abs(intersect_est - n_intersect_exact) * 1000000
            // greatest(n_intersect_exact, 1) AS BIGINT) AS err_ppm
FROM est
"""


# --- salt-plan advisor (round-18 queue) ----------------------------------

SALT_TARGET_ROWS = 1000   # target rows per (key, salt) partition slice
SALT_PLAN_CAP = 4096      # advisor never recommends more salts than this


def salt_plan_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The planning step in front of every salting rewrite
    (events_salted_join uses a FIXED 16 salts; this computes what
    each key actually NEEDS): per join key, the frequency, the salt
    count that brings its largest partition slice under the target
    (ceil(freq / SALT_TARGET_ROWS), capped), the resulting worst
    slice, and the dim-side replication cost the salts buy — the
    numbers that decide between broadcast, AQE skew-split, and an
    explicit salted rewrite at 100 TB.

    Pure integer planning: frequencies are one map-side-partial
    groupBy; ceil is the (a + b - 1) div b idiom; the worst slice
    after salting is ceil(freq / salts) again — and the op certifies
    its own arithmetic by exporting worst_slice <= target for every
    uncapped key (the oracle hash makes that a driver-checked
    invariant, not a comment).

    Scale posture (100 TB): one groupBy(event_type) — the advisor
    reads a |keys|-row frame no matter the fact size; in a real
    pipeline the input is the key histogram the shuffle already
    computes (or a count-min sketch for unbounded key spaces —
    cmsketch_heavy_hitters is the estimator tier).
    """
    ev = load_table(spark, sf_dir, "events").select("event_type")
    freq = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("freq"))
    return freq.select(
        "event_type",
        "freq",
        F.expr(
            f"least((freq + {SALT_TARGET_ROWS - 1})"
            f" div {SALT_TARGET_ROWS}, {SALT_PLAN_CAP})"
        ).alias("salts_needed"),
        F.expr(
            f"(freq + least((freq + {SALT_TARGET_ROWS - 1})"
            f" div {SALT_TARGET_ROWS}, {SALT_PLAN_CAP}) - 1)"
            f" div least((freq + {SALT_TARGET_ROWS - 1})"
            f" div {SALT_TARGET_ROWS}, {SALT_PLAN_CAP})"
        ).alias("worst_slice_rows"),
        F.expr(
            f"least((freq + {SALT_TARGET_ROWS - 1})"
            f" div {SALT_TARGET_ROWS}, {SALT_PLAN_CAP}) - 1"
        ).alias("dim_replication_extra"),
    )


SALT_PLAN_SQL = f"""
WITH freq AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS freq
  FROM events GROUP BY event_type
),
plan AS (
  SELECT event_type, freq,
         least((freq + {SALT_TARGET_ROWS - 1}) // {SALT_TARGET_ROWS},
               {SALT_PLAN_CAP}) AS salts_needed
  FROM freq
)
SELECT event_type, freq,
       CAST(salts_needed AS BIGINT) AS salts_needed,
       CAST((freq + salts_needed - 1) // salts_needed AS BIGINT)
         AS worst_slice_rows,
       CAST(salts_needed - 1 AS BIGINT) AS dim_replication_extra
FROM plan
"""


# --- Bloom-filter plan advisor -------------------------------------------

# (m_bits, k_hashes) candidate configurations; the measured-FPP grid.
BLOOM_GRID = ((16384, 2), (16384, 4), (65536, 2), (65536, 4), (65536, 6))
# position hash: ((key % P1) * KNUTH + seed * STEP) % P2 % m — the
# train_test_split overflow discipline (inner mod keeps every product
# far under 2^63 for any int64 key; both engines evaluate identically)
BLOOM_P1 = 100_003
BLOOM_KNUTH = 2_654_435_761
BLOOM_STEP = 40_503
BLOOM_P2 = 999_999_937
BLOOM_PROBE_OFFSET = 1_000_000_007  # shifts probes outside the id domain


def bloom_filter_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter sizing advisor for the events user-id set — the
    engineering-plan member next to salt_plan_advisor and
    lsh_band_plan: before shipping a Bloom filter to prune a
    semi-join (the bloom_join_prune pattern) you pick (bits, hashes)
    from a table like this one, and the honest way to pick is to
    MEASURE the false-positive rate of each candidate against a
    disjoint probe set rather than trust the asymptotic formula
    (which assumes independent ideal hashes that a real double-hash
    scheme only approximates).

    Fully deterministic and engine-exact: member keys are the
    distinct user_ids; for each grid config every key sets k
    positions via the pure-integer double-hash ((key % P1) * KNUTH +
    seed * STEP) % P2 % m (the train_test_split overflow discipline —
    no product can leave int64, DuckDB would raise rather than wrap);
    probe keys are the same ids shifted by 1e9+7 (guaranteed disjoint
    from the member set, same distribution class). A probe false-
    positives iff ALL k of its positions are occupied — counted by
    joining probe positions against the distinct set-bit frame and
    requiring k hits. occupancy_ppm and measured_fpp_ppm are exact
    int64 floor divisions.

    Scale posture (100 TB): the corpus collapses to the distinct-key
    frame first (one groupBy); everything after is keys x k x |grid|
    rows — key-granular, never corpus-granular. The positions join
    is hashed on (config, position); set-bit frames are at most
    m bits per config. Output is one row per grid config.
    """
    # cached: the distinct-key frame feeds BOTH the member and probe
    # position builds (8 parquet scans / 30 Exchanges in the r13
    # plan audit before staging)
    keys = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .transform(stage)
    )
    grid = spark.createDataFrame(
        [(m, k) for m, k in BLOOM_GRID], "m_bits BIGINT, k_hashes BIGINT"
    )
    seeds = F.explode(
        F.sequence(F.lit(0), F.col("k_hashes") - 1)
    ).alias("_j")

    def positions(df: DataFrame, key_expr: str) -> DataFrame:
        return (
            df.crossJoin(F.broadcast(grid))
            .select(
                "m_bits",
                "k_hashes",
                F.col("user_id").alias("_key"),
                seeds,
            )
            .select(
                "m_bits",
                "k_hashes",
                "_key",
                F.expr(
                    f"((({key_expr} % {BLOOM_P1}) * {BLOOM_KNUTH}"
                    f" + _j * {BLOOM_STEP}) % {BLOOM_P2}) % m_bits"
                ).alias("_pos"),
            )
        )

    member_pos = positions(keys, "_key")
    bits = member_pos.select("m_bits", "k_hashes", "_pos").distinct()
    probe_pos = positions(keys, f"(_key + {BLOOM_PROBE_OFFSET})")
    probe_hits = (
        probe_pos.join(bits, ["m_bits", "k_hashes", "_pos"], "left_semi")
        .groupBy("m_bits", "k_hashes", "_key")
        .agg(F.count(F.lit(1)).alias("_hits"))
    )
    fp = probe_hits.groupBy("m_bits", "k_hashes").agg(
        F.sum(
            F.when(F.col("_hits") == F.col("k_hashes"), 1).otherwise(0)
        ).alias("_fp")
    )
    occ = bits.groupBy("m_bits", "k_hashes").agg(
        F.count(F.lit(1)).alias("_set")
    )
    n = keys.agg(F.count(F.lit(1)).alias("_n"))
    return (
        occ.join(fp, ["m_bits", "k_hashes"], "left")
        .crossJoin(F.broadcast(n))
        .select(
            "m_bits",
            "k_hashes",
            F.col("_n").alias("n_keys"),
            F.col("_set").alias("bits_set"),
            F.expr("CAST((1000000 * _set) div m_bits AS BIGINT)").alias(
                "occupancy_ppm"
            ),
            F.expr(
                "CAST((1000000 * coalesce(_fp, 0)) div _n AS BIGINT)"
            ).alias("measured_fpp_ppm"),
        )
    )


def _bloom_grid_sql() -> str:
    rows = ", ".join(f"({m}, {k})" for m, k in BLOOM_GRID)
    return f"(VALUES {rows}) AS grid(m_bits, k_hashes)"


BLOOM_PLAN_SQL = f"""
WITH keys AS (SELECT DISTINCT user_id AS _key FROM events),
grid AS (SELECT CAST(m_bits AS BIGINT) AS m_bits,
                CAST(k_hashes AS BIGINT) AS k_hashes
         FROM {_bloom_grid_sql()}),
member_pos AS (
  SELECT g.m_bits, g.k_hashes, k._key,
         (((k._key % {BLOOM_P1}) * {BLOOM_KNUTH} + j._j * {BLOOM_STEP})
          % {BLOOM_P2}) % g.m_bits AS _pos
  FROM keys k CROSS JOIN grid g
  JOIN (SELECT unnest(range(0, 6)) AS _j) j ON j._j < g.k_hashes
),
bits AS (
  SELECT DISTINCT m_bits, k_hashes, _pos FROM member_pos
),
probe_pos AS (
  SELECT g.m_bits, g.k_hashes, k._key,
         ((((k._key + {BLOOM_PROBE_OFFSET}) % {BLOOM_P1}) * {BLOOM_KNUTH}
           + j._j * {BLOOM_STEP}) % {BLOOM_P2}) % g.m_bits AS _pos
  FROM keys k CROSS JOIN grid g
  JOIN (SELECT unnest(range(0, 6)) AS _j) j ON j._j < g.k_hashes
),
probe_hits AS (
  SELECT p.m_bits, p.k_hashes, p._key, CAST(count(*) AS BIGINT) AS _hits
  FROM probe_pos p
  WHERE EXISTS (SELECT 1 FROM bits b
                WHERE b.m_bits = p.m_bits AND b.k_hashes = p.k_hashes
                  AND b._pos = p._pos)
  GROUP BY p.m_bits, p.k_hashes, p._key
),
fp AS (
  SELECT m_bits, k_hashes,
         CAST(sum(CASE WHEN _hits = k_hashes THEN 1 ELSE 0 END) AS BIGINT)
           AS _fp
  FROM probe_hits GROUP BY m_bits, k_hashes
),
occ AS (
  SELECT m_bits, k_hashes, CAST(count(*) AS BIGINT) AS _set
  FROM bits GROUP BY m_bits, k_hashes
),
n AS (SELECT CAST(count(*) AS BIGINT) AS _n FROM keys)
SELECT o.m_bits, o.k_hashes,
       n._n AS n_keys,
       o._set AS bits_set,
       CAST((1000000 * o._set) // o.m_bits AS BIGINT) AS occupancy_ppm,
       CAST((1000000 * coalesce(f._fp, 0)) // n._n AS BIGINT)
         AS measured_fpp_ppm
FROM occ o LEFT JOIN fp f
  ON o.m_bits = f.m_bits AND o.k_hashes = f.k_hashes
CROSS JOIN n
"""


# --- broadcast-threshold join advisor (round-14 queue) ------------------

# Serialized-size threshold below which a join side should broadcast.
# Spark's spark.sql.autoBroadcastJoinThreshold defaults to 10 MB; the
# advisor reports against that number directly — at test SF most dims
# come out broadcastable, at 100 TB customer/part stop fitting, which
# is exactly the decision the plan surfaces.
BROADCAST_THRESHOLD_BYTES = 10 * 1024 * 1024
# charged per row on top of measured string bytes: numeric columns
# (8 B each, counted per table below) + tungsten row header/offsets
BROADCAST_ROW_OVERHEAD = 16


def broadcast_threshold_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy advisor over the five dimension tables: measured
    in-memory size estimate per table (string payload bytes + fixed
    per-row numeric/header overhead), rows, and the resulting
    strategy call — 'broadcast' when the estimate fits
    {BROADCAST_THRESHOLD_BYTES} (Spark's autoBroadcastJoinThreshold
    default), else 'shuffle'. The hint every fact-dim join in this
    package hard-codes (F.broadcast(nation), ...) is this decision
    made by eye; the advisor computes it from the data so a 100 TB
    deployment can re-make it per scale instead of trusting test-SF
    intuition.

    Size model: per-row bytes = sum(strlen of the VARCHAR columns) +
    8 B per numeric column + {BROADCAST_ROW_OVERHEAD} B row overhead —
    both engines compute the identical integer. (Tungsten's actual
    UnsafeRow layout pads strings to 8 B words; the model
    under-counts by a bounded constant factor that never flips a
    decision at the 10 MB cliff's usual orders of magnitude.)

    Scale posture (100 TB): five map-side-partial single-row
    aggregates UNION'd — no join, no window, output five rows. Each
    scan reads only the string columns it measures (column pruning
    does the rest).
    """
    specs = [
        ("region", ["r_name"], 1),        # r_regionkey
        ("nation", ["n_name"], 2),        # n_nationkey, n_regionkey
        ("supplier", ["s_name"], 3),      # s_suppkey, s_nationkey, s_acctbal
        ("customer", ["c_name", "c_mktsegment"], 3),
        ("part", ["p_name", "p_brand", "p_type"], 3),
    ]
    frames = []
    for name, str_cols, n_numeric in specs:
        t = load_table(spark, sf_dir, name)
        row_bytes = sum(
            (F.octet_length(c) for c in str_cols),
            F.lit(8 * n_numeric + BROADCAST_ROW_OVERHEAD),
        ).cast("long")
        frames.append(
            t.select(row_bytes.alias("_b")).agg(
                F.lit(name).alias("table_name"),
                F.count(F.lit(1)).alias("n_rows"),
                F.coalesce(F.sum("_b"), F.lit(0).cast("long")).alias(
                    "est_bytes"
                ),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.select(
        "table_name",
        "n_rows",
        "est_bytes",
        (F.col("est_bytes") <= BROADCAST_THRESHOLD_BYTES).alias(
            "broadcastable"
        ),
        F.when(
            F.col("est_bytes") <= BROADCAST_THRESHOLD_BYTES,
            F.lit("broadcast"),
        )
        .otherwise(F.lit("shuffle"))
        .alias("strategy"),
    )


def _broadcast_plan_sql() -> str:
    specs = [
        ("region", ["r_name"], 1),
        ("nation", ["n_name"], 2),
        ("supplier", ["s_name"], 3),
        ("customer", ["c_name", "c_mktsegment"], 3),
        ("part", ["p_name", "p_brand", "p_type"], 3),
    ]
    parts = []
    for name, str_cols, n_numeric in specs:
        b = " + ".join([f"strlen({c})" for c in str_cols])
        fixed = 8 * n_numeric + BROADCAST_ROW_OVERHEAD
        parts.append(
            f"SELECT '{name}' AS table_name, count(*) AS n_rows,\n"
            f"       CAST(coalesce(sum({b} + {fixed}), 0) AS BIGINT)"
            f" AS est_bytes\n"
            f"FROM {name}"
        )
    union = "\nUNION ALL\n".join(parts)
    return f"""
WITH sizes AS (
{union}
)
SELECT table_name, n_rows, est_bytes,
       est_bytes <= {BROADCAST_THRESHOLD_BYTES} AS broadcastable,
       CASE WHEN est_bytes <= {BROADCAST_THRESHOLD_BYTES}
            THEN 'broadcast' ELSE 'shuffle' END AS strategy
FROM sizes
"""


BROADCAST_PLAN_SQL = _broadcast_plan_sql()
