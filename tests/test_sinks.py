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
