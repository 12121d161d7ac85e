"""Windowed streaming aggregation with a batch-readable hard signal.

``streaming_events_hourly`` is the windowed counterpart of the
``streaming_wordcount`` registry entry: the tumbling-hour event
aggregation (batch form: ``relational.events_hourly``) computed
through an ACTUAL incremental Structured Streaming run, then
materialized so the external driver can oracle-check it against the
identical batch SQL.

Update-mode merge semantics: each micro-batch emits the CURRENT
value of every (hour, event_type) group the batch touched; a group
spanning several micro-batches is emitted several times, and the
last emission holds the complete aggregate. The sink writes each
batch's updates under a batch_id-keyed path (idempotent on replay —
a retried batch overwrites its own directory, never double-counts),
and the final merge keeps, per group, the row from the highest
batch_id. That last-writer-wins merge is exactly the upsert a
key-value sink (Delta MERGE, HBase put) performs at scale.

No watermark here, deliberately: this is a finite availableNow drain
where dropping "late" rows would diverge from the batch oracle, and
the file source gives no cross-file time ordering. The
watermark/late-data path is exercised by the parity tests over
``wordcount_stream.windowed_event_counts``, where arrival order is
controlled. Unbounded-state posture for a true 24/7 stream is the
same as SCALE.md documents: watermark + update mode bounds state to
open windows.

Aggregation state is int64 cents (``round(value*100)``) — partial
sums stay exact and order-free across micro-batches, so the stream
result is bit-identical to the batch plan's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def streaming_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The update-mode hourly windowed aggregation runs through the
    # shared concurrent drain (shared_drain.drain_event_streams):
    # same operator graph, same per-batch_id idempotent sink — the
    # drain just overlaps the sibling profile/dedup streams so one
    # registry pass pays max(drain) instead of sum(drain).
    from .shared_drain import drain_event_streams
    from .wordcount_stream import _partial_files

    updates_dir = drain_event_streams(spark, sf_dir)["hourly"]
    if not _partial_files(updates_dir):
        # empty source: no foreachBatch invocation ever ran
        return spark.createDataFrame(
            [],
            "hour TIMESTAMP, event_type STRING, n_events BIGINT,"
            " value_sum DOUBLE",
        )
    # reading the root dir (not a batch_id=* glob) lets partition
    # discovery surface batch_id as a column for the merge
    updates = spark.read.parquet(updates_dir)
    w = Window.partitionBy("hour", "event_type").orderBy(
        F.col("batch_id").desc()
    )
    return (
        updates.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("hour", "event_type", "n_events", "value_sum")
    )
