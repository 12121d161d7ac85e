"""Structured Streaming: batch/stream parity for wordcount (SURVEY.md
§2.9 — the reference's pipelined execution restated as a stream) and
watermarked window aggregation over events."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from mapreduceece563_spark.functions.text import tokenize_lines
from mapreduceece563_spark.sources.catalog import load_table
from mapreduceece563_spark.streaming.wordcount_stream import (
    run_to_completion,
    streaming_wordcount,
    windowed_event_counts,
)
from tests.conftest import SF_DIR


@pytest.fixture()
def text_dir(spark):
    """Chunked text files like the reference's file_chunks/ input."""
    tmp = tempfile.mkdtemp(prefix="wc_stream_")
    docs = load_table(spark, SF_DIR, "documents").select("text")
    docs.repartition(4).write.mode("overwrite").text(tmp)
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def test_stream_equals_batch_wordcount(spark, text_dir):
    stream_counts = run_to_completion(
        streaming_wordcount(spark, text_dir), "wc_stream"
    )
    batch_counts = (
        tokenize_lines(
            spark.read.text(text_dir).withColumnRenamed("value", "text")
        )
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    s = {(r["word"], r["cnt"]) for r in stream_counts.collect()}
    b = {(r["word"], r["cnt"]) for r in batch_counts.collect()}
    assert s == b and len(s) > 0


def test_windowed_event_counts_matches_batch(spark):
    events = load_table(spark, SF_DIR, "events")
    # stream the same rows through a file stream
    tmp = tempfile.mkdtemp(prefix="ev_stream_")
    try:
        events.write.mode("overwrite").parquet(tmp)
        schema = spark.read.parquet(tmp).schema
        stream = spark.readStream.schema(schema).parquet(tmp)
        windowed = windowed_event_counts(
            spark, stream, window="1 hour", watermark="2 hours"
        )
        got = run_to_completion(windowed, "ev_win")
        expected = (
            events.groupBy(
                F.date_trunc("hour", "ts").alias("window_start"), "event_type"
            )
            .agg(F.count("*").alias("n_events"))
        )
        g = {
            (r["window_start"], r["event_type"], r["n_events"])
            for r in got.collect()
        }
        e = {
            (r["window_start"], r["event_type"], r["n_events"])
            for r in expected.collect()
        }
        assert g == e and len(g) > 100
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_sliding_window_runs(spark):
    events = load_table(spark, SF_DIR, "events")
    tmp = tempfile.mkdtemp(prefix="ev_slide_")
    try:
        events.write.mode("overwrite").parquet(tmp)
        schema = spark.read.parquet(tmp).schema
        stream = spark.readStream.schema(schema).parquet(tmp)
        windowed = windowed_event_counts(
            spark, stream, window="2 hours", slide="1 hour", watermark="4 hours"
        )
        got = run_to_completion(windowed, "ev_slide")
        # each event lands in exactly 2 sliding windows
        total = got.agg(F.sum("n_events")).collect()[0][0]
        assert total == 2 * events.count()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stateful_running_profile_matches_batch(spark):
    """applyInPandasWithState across multiple micro-batches must end
    at the same totals as the batch aggregate (final state parity)."""
    from mapreduceece563_spark.streaming.stateful import running_user_profile

    events = load_table(spark, SF_DIR, "events")
    tmp = tempfile.mkdtemp(prefix="ev_state_")
    try:
        # 4 files -> maxFilesPerTrigger=1 forces 4 micro-batches, so
        # state genuinely carries across batches
        events.repartition(4).write.mode("overwrite").parquet(tmp)
        schema = spark.read.parquet(tmp).schema
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(tmp)
        q = (
            running_user_profile(stream)
            .writeStream.format("memory")
            .queryName("user_profile")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # update mode emits one row per key per touching batch; the
        # LAST emission per key is the final state
        got_df = spark.sql(
            """
            SELECT user_id, n_events, value_sum FROM (
              SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY n_events DESC) AS rn
              FROM user_profile
            ) WHERE rn = 1
            """
        )
        expected = events.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            (
                F.sum(F.round(F.col("value") * 100, 0).cast("long")) / 100.0
            ).alias("value_sum"),
        )
        g = {(r[0], r[1], r[2]) for r in got_df.collect()}
        e = {(r[0], r[1], r[2]) for r in expected.collect()}
        assert g == e and len(g) == events.select("user_id").distinct().count()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
