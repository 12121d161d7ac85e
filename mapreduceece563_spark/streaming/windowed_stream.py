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

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.relational import _cents
from ..sources.catalog import load_table
from .wordcount_stream import _fresh_workdir, spill_chunks


def streaming_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    work = _fresh_workdir("ev_hourly")
    updates_dir = os.path.join(work, "updates")
    ckpt = os.path.join(work, "ckpt")

    # One 4-column events spill is shared with streaming_user_profile
    # (parquet column pruning serves each stream its own subset) and
    # memoized across bench passes — the spill is fixture prep, the
    # timed work is the drain + merge.
    ev = load_table(spark, sf_dir, "events").select(
        "ts", "event_type", "user_id", "value"
    )
    src = spill_chunks(ev, sf_dir, "events_shared")

    stream = (
        spark.readStream.schema("ts TIMESTAMP, event_type STRING, value DOUBLE")
        .option("maxFilesPerTrigger", 2)  # force multiple micro-batches
        .parquet(src)
    )
    agg = (
        stream.groupBy(
            F.window("ts", "1 hour").alias("win"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_cents(F.col("value"))).alias("_vc"),
        )
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "n_events",
            (F.col("_vc") / 100.0).alias("value_sum"),
        )
    )

    def sink_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(updates_dir, f"batch_id={batch_id}")
        )

    q = (
        agg.writeStream.foreachBatch(sink_batch)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(ckpt, ignore_errors=True)

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
