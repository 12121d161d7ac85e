"""Reference sink parity: partitioned space-separated text output
(S4) whose concatenation (S5) reproduces the word counts."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from mapreduceece563_spark.operators.wordcount import (
    wordcount,
    wordcount_text_sink,
)
from tests.conftest import SF_DIR


def test_text_sink_roundtrip(spark):
    out = tempfile.mkdtemp(prefix="wc_out_")
    try:
        wordcount_text_sink(spark, SF_DIR, out)
        back = spark.read.text(out).select(
            F.split("value", " ").getItem(0).alias("word"),
            F.split("value", " ").getItem(1).cast("long").alias("cnt"),
        )
        expected = wordcount(spark, SF_DIR)
        got = {(r["word"], r["cnt"]) for r in back.collect()}
        want = {(r["word"], r["cnt"]) for r in expected.collect()}
        assert got == want and len(got) > 0
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_jsonl_roundtrip(spark):
    """JSONL is the lingua franca of LLM training data: documents
    written as JSON lines and read back must survive with schema and
    content intact (including the text column's punctuation/unicode),
    and feed the wordcount pipeline identically."""
    import tempfile as _tf
    from mapreduceece563_spark.functions.text import tokenize_lines
    from mapreduceece563_spark.sources.catalog import load_table

    out = _tf.mkdtemp(prefix="docs_jsonl_")
    try:
        docs = load_table(spark, SF_DIR, "documents").select(
            "doc_id", "text", "lang"
        )
        docs.write.mode("overwrite").json(out)
        back = spark.read.json(out).select("doc_id", "text", "lang")
        assert back.count() == docs.count()
        a = tokenize_lines(docs).groupBy("word").count()
        b = tokenize_lines(back).groupBy("word").count()
        assert {tuple(r) for r in a.collect()} == {
            tuple(r) for r in b.collect()
        }
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_csv_roundtrip(spark):
    """CSV with quoting/escaping: the word counts must survive the
    trip (commas and quotes inside text exercise the quoting path)."""
    import tempfile as _tf
    from mapreduceece563_spark.functions.text import tokenize_lines
    from mapreduceece563_spark.sources.catalog import load_table

    out = _tf.mkdtemp(prefix="docs_csv_")
    try:
        docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
        docs.write.mode("overwrite").option("header", True).option(
            "escape", '"'
        ).csv(out)
        back = (
            spark.read.option("header", True).option("escape", '"')
            .csv(out)
            .select(F.col("doc_id").cast("long"), "text")
        )
        a = tokenize_lines(docs).groupBy("word").count()
        b = tokenize_lines(back).groupBy("word").count()
        assert {tuple(r) for r in a.collect()} == {
            tuple(r) for r in b.collect()
        }
    finally:
        shutil.rmtree(out, ignore_errors=True)
