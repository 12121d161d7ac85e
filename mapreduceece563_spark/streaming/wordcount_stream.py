"""Structured Streaming analogue of the reference engine.

The reference's execution is deliberately pipelined/incremental —
readers, mappers, and reducers run concurrently over bounded queues
and the reduce side consumes partials before the map side finishes
(reference /root/reference/mpi_mapreduce.c:314-338,480-494; SURVEY.md
§2.9). Structured Streaming is the principled version of that: a
file-source stream of text lines through the SAME transform chain as
the batch pipeline (single source of truth for the §2.7 semantics),
aggregated incrementally with update-mode state.

Scale posture: for an unbounded 100 TB corpus the running-vocabulary
state is itself unbounded, so the default here is ``update`` output
mode (emit changed keys per micro-batch) feeding an idempotent
foreachBatch sink — never ``complete`` mode, which re-emits the whole
state each trigger. Windowed aggregations bound their state with a
watermark, after which expired windows are dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokenize_lines


def streaming_wordcount(spark: SparkSession, input_dir: str) -> DataFrame:
    """Incremental word count over a directory of text files.

    Returns an unbounded aggregating DataFrame; callers pick the sink
    (tests use a memory sink with availableNow trigger; production
    uses update mode + foreachBatch upsert)."""
    lines = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 16)  # backpressure ≙ bounded queue
        .load(input_dir)
        .withColumnRenamed("value", "text")
    )
    words = tokenize_lines(lines)
    return words.groupBy("word").agg(F.count("*").alias("cnt"))


def windowed_event_counts(
    spark: SparkSession,
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling (or sliding) event-time window counts with a
    watermark bounding state for late data."""
    win = (
        F.window("ts", window) if slide is None else F.window("ts", window, slide)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def run_to_completion(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Drain all currently-available input through the stream into an
    in-memory table (availableNow trigger) and return it as a batch
    DataFrame. Used by tests to assert batch/stream parity."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)
