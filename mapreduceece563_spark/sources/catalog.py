"""Table catalog over the driver-generated parquet test data.

At 100 TB scale the same call pattern holds: ``spark.read.parquet``
gives vectorized columnar scans with predicate pushdown and column
pruning for free; callers should always ``select`` only the columns
they need so pruning reaches the scan (check ``ReadSchema`` in
``.explain("formatted")``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# (appId, sf_dir, name) -> raw parquet read schema (DDL string). The
# expensive part of spark.read.parquet is the footer schema inference
# over py4j (~0.1 s per table per query build, ~0.5 s of the q9 bench
# number was five of these) — so cache ONLY the schema and rebuild a
# fresh DataFrame per call. Handing every caller the identical
# DataFrame object (rounds 4-5) pinned the file index at first load
# (same-session rewrites served stale data) and turned independent
# loads into same-object self-joins that only worked through Spark's
# DeduplicateRelations (ADVICE r5, medium). Keyed by applicationId so
# fresh test sessions re-infer.
_SCHEMA_CACHE: dict[tuple[str, str, str], str] = {}


def invalidate_table_cache() -> None:
    """Drop every cached schema (call after rewriting a table's
    parquet in place within one session)."""
    _SCHEMA_CACHE.clear()


def load_table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    """Read one catalog table — a FRESH DataFrame per call (fresh
    attribute IDs, fresh file index) over a cached footer schema.

    ``spread=True`` repartitions to the session's default parallelism
    right after the scan. Use it for CPU-heavy downstream pipelines
    (regex tokenization, per-row vector math) reading SMALL inputs:
    the test parquet files are single row-group, so without it the
    whole pipeline runs on one core. At real scale the scan has
    thousands of row-groups and natural parallelism — callers there
    should pass spread=False (the shuffle would be pure cost); the
    flag exists precisely because "cheap scan, expensive map" is the
    one case where an early repartition pays for itself.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    app = spark.sparkContext.applicationId
    # evict entries from other (stopped) applications so dead-JVM keys
    # don't accumulate for the process lifetime (pytest creates many
    # sessions)
    for stale in [k for k in _SCHEMA_CACHE if k[0] != app]:
        del _SCHEMA_CACHE[stale]
    if name == "events":
        df = _load_events(spark, sf_dir)
    else:
        df = _read_with_cached_schema(spark, sf_dir, name)
    if spread:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def _read_with_cached_schema(
    spark: SparkSession, sf_dir: str, name: str
) -> DataFrame:
    app = spark.sparkContext.applicationId
    key = (app, sf_dir, name)
    path = f"{sf_dir}/{name}.parquet"
    ddl = _SCHEMA_CACHE.get(key)
    if ddl is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema.toDDL()
        return df
    return spark.read.schema(ddl).parquet(path)


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize events.ts across test-data vintages to a session-tz
    TIMESTAMP (an instant), which every downstream operator assumes
    (``unix_micros`` rejects TIMESTAMP_NTZ outright):

    - parquet TIMESTAMP(NANOS): Spark's vectorized reader rejects it;
      read as raw int64 nanos (legacy conf) and convert with integer
      division — ns-since-epoch (~1.7e18) exceeds 2^53, so the ns->us
      conversion must never pass through a double.
    - parquet timestamp[us] without timezone: Spark 4 infers
      TIMESTAMP_NTZ; reinterpret the naive wall time as UTC. The
      session pins spark.sql.session.timeZone=UTC (session.py and the
      registry wrapper), so the cast is exact and matches DuckDB's
      ``epoch_us`` on the same naive values.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = _read_with_cached_schema(spark, sf_dir, "events")
    from pyspark.sql import functions as F

    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(
    spark: SparkSession, sf_dir: str, only: tuple[str, ...] | None = None
) -> None:
    """Register tables as temp views for spark.sql queries.

    ``only`` restricts registration to the named tables — queries
    should register exactly what they read (registering all 10,
    including the nanos-timestamp events special path, on every
    invocation was the whole cost of sql_supplier_argmax in r1:
    11.4 s for a one-table query)."""
    for name in only if only is not None else TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
