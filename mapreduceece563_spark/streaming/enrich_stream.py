"""Stream-STATIC broadcast enrichment — the one streaming JOIN shape
not yet covered (join_stream is stream-stream; upsert_stream's merge
joins the sink target, not a dimension).

Enriching a fact stream with a slowly-changing dimension is the
canonical production streaming join: the dimension (customer market
segment) is a bounded batch DataFrame joined into every micro-batch
with a BROADCAST hash join — stateless, no watermark, no join state
store, because only the stream side is unbounded. That statelessness
is the point of the shape: a stream-static join never accumulates
state, so it scales with the micro-batch, not the stream history.
The update-mode segment aggregate downstream then carries exact
int64 cents so the drained result is bit-identical to the batch
oracle (same last-writer-wins batch_id merge as
streaming_events_hourly).

Scale posture (100 TB): the dimension is re-read per micro-batch by
Structured Streaming's contract (picking up dimension updates); at
cluster scale it stays a broadcast as long as the dim fits (segment
dims do), and the fallback is the bucketed shuffle join. The stream
side shuffles once, keyed by the 5-value segment — the aggregate
state is segment-cardinality-bounded forever.

Queue status: round-7 queue (implemented + oracle-tested ahead of
registration; see SURVEY.md "Round-7 queue").
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.relational import _cents
from ..sources.catalog import load_table
from .wordcount_stream import _fresh_workdir, spill_chunks

# (applicationId, sf_dir) -> updates dir of the finished drain
_ENRICH_CACHE: dict[tuple[str, str], str] = {}


def reset_enrich() -> None:
    _ENRICH_CACHE.clear()


def _start_enrich(spark: SparkSession, sf_dir: str):
    """Build the fixture and START the enrichment query without
    awaiting it — the shared round-7 drain (shared_drain.
    drain_round7_streams) starts the four round-7 streaming queries
    concurrently so one registry pass pays max(drain), the same
    consolidation the r4 event entries already ride. Returns
    (query, work dir, sink dir)."""
    work = _fresh_workdir("enrich", sf_dir)
    sink = os.path.join(work, "updates")
    os.makedirs(sink, exist_ok=True)

    # identical fixture tag as the shared event drain: whichever entry
    # runs first in a pass writes the chunk layout once
    ev = load_table(spark, sf_dir, "events").select(
        "ts", "event_type", "user_id", "value"
    )
    src = spill_chunks(ev, sf_dir, "events_shared")

    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )

    stream = (
        spark.readStream.schema("user_id BIGINT, value DOUBLE")
        .option("maxFilesPerTrigger", 4)
        .parquet(src)
    )
    enriched = stream.join(
        F.broadcast(dim), stream["user_id"] == dim["c_custkey"]
    )
    agg = enriched.groupBy(
        F.col("c_mktsegment").alias("segment")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(_cents(F.col("value"))).alias("value_cents"),
    )

    def sink_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(sink, f"batch_id={batch_id}")
        )

    q = (
        agg.writeStream.foreachBatch(sink_batch)
        .outputMode("update")
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    return q, work, sink


def _enrich_drain(spark: SparkSession, sf_dir: str) -> str:
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _ENRICH_CACHE.get(key)
    if hit is not None:
        return hit
    q, work, sink = _start_enrich(spark, sf_dir)
    q.awaitTermination()
    shutil.rmtree(os.path.join(work, "ckpt"), ignore_errors=True)
    _ENRICH_CACHE[key] = sink
    return sink


def streaming_static_enrichment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .shared_drain import drain_round7_streams
    from .wordcount_stream import _partial_files

    drain_round7_streams(spark, sf_dir)
    updates_dir = _enrich_drain(spark, sf_dir)
    if not _partial_files(updates_dir):
        return spark.createDataFrame(
            [], "segment STRING, n_events BIGINT, value_cents BIGINT"
        )
    updates = spark.read.parquet(updates_dir)
    w = Window.partitionBy("segment").orderBy(F.col("batch_id").desc())
    return (
        updates.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("segment", "n_events", "value_cents")
    )


STREAMING_ENRICH_SQL = """
SELECT c.c_mktsegment AS segment,
       count(*) AS n_events,
       CAST(sum(CAST(round(e.value * 100, 0) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
"""
