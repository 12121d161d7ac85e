"""Pin SURVEY.md §2.7's normalizeWord semantics exactly (the
parity-critical operator; reference /root/reference/mpi_mapreduce.c:133-161).

Each case is (raw_token, expected_word); expected None means the
token is dropped by the empty or >70-char filter."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduceece563_spark.functions.text import (
    MAX_WORD_LEN,
    normalize_word,
)

CASES = [
    ("Cat", "cat"),
    ("CAT!!", "cat"),
    ('"(Hello,', "hello"),
    ("'tis!", "tis"),
    ("don't", "don't"),
    ("e-Book", "e-book"),
    ("123", "123"),  # all-non-alpha passthrough (rule 3)
    ("---", "---"),
    ("***", "***"),
    ("a", "a"),
    ("''", "''"),
    ("word\r", "word"),  # CRLF artifact stripped as non-alpha
    ("((word))", "word"),  # fixpoint strip (MPI semantic, not prototype)
    ("x" * 71, None),  # >70 chars dropped (F5)
    ("«café»", "caf"),  # non-alpha (incl. non-ASCII) stripped at ends
    ("don't!!", "don't"),
    ("123abc456", "abc"),  # mixed: strip ends to alpha fixpoint
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_normalize_word(spark, raw, expected):
    df = spark.createDataFrame([(raw,)], ["token"])
    out = df.select(normalize_word(F.col("token")).alias("word")).filter(
        (F.col("word") != "") & (F.length("word") <= MAX_WORD_LEN)
    )
    rows = out.collect()
    if expected is None:
        assert rows == []
    else:
        assert len(rows) == 1 and rows[0]["word"] == expected


def test_tokenizer_single_space_only(spark):
    """Tabs are NOT delimiters (reference getWord splits on ' ' only);
    a tab survives inside the token and is stripped only at the ends
    by normalization."""
    from mapreduceece563_spark.functions.text import tokenize_lines

    df = spark.createDataFrame([("a\tb c  d",)], ["text"])
    words = sorted(r["word"] for r in tokenize_lines(df).collect())
    # 'a\tb' is one token; ends are alphabetic so the tab is kept.
    assert words == ["a\tb", "c", "d"]


def test_blank_and_multispace(spark):
    from mapreduceece563_spark.functions.text import tokenize_lines

    df = spark.createDataFrame([("",), ("  x  ",), (None,)], ["text"])
    words = sorted(r["word"] for r in tokenize_lines(df).collect())
    assert words == ["x"]
