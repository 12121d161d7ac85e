"""Three-way parity fuzz for the §2.7-critical pipeline: a pure-Python
model of the C ``normalizeWord``/``getWord`` semantics (transcribed
from the reference, /root/reference/mpi_mapreduce.c:119-161) vs the
Spark native-expression pipeline vs the DuckDB oracle SQL, over a
seeded random printable-ASCII corpus plus known nasties.

ASCII-only on purpose: for non-ASCII the C code (signed-char compares,
no unicode) and Spark/DuckDB (unicode lower()) intentionally diverge —
SURVEY.md §2.7 pins parity for the reference's ASCII corpora, and the
Spark and oracle sides still agree with each other on any input (the
registry check covers that)."""

from __future__ import annotations

import random
from collections import Counter

import duckdb
import pandas as pd

from mapreduceece563_spark.functions.text import (
    MAX_WORD_LEN,
    tokenize_lines,
    words_cte_sql,
)


def c_normalize(tok: str) -> str:
    """Transcription of normalizeWord (mpi_mapreduce.c:133-161)."""
    s = "".join(
        chr(ord(c) + 32) if "A" <= c <= "Z" else c for c in tok
    )
    n = len(s)
    j = sum(1 for c in s if not ("a" <= c <= "z"))
    if j == n:  # entirely non-alphabetic: unchanged (rule 3)
        return s
    while s and not ("a" <= s[0] <= "z"):  # fixpoint strip (rule 4)
        s = s[1:]
    while s and not ("a" <= s[-1] <= "z"):
        s = s[:-1]
    return s


def c_pipeline(lines: list[str]) -> Counter:
    """F1 blank filter -> F2 single-space split -> F4 normalize ->
    F3 empty filter -> F5 length filter."""
    out: Counter = Counter()
    for line in lines:
        if line == "":
            continue
        for tok in line.split(" "):
            w = c_normalize(tok)
            if w != "" and len(w) <= MAX_WORD_LEN:
                out[w] += 1
    return out


def _corpus() -> list[str]:
    rng = random.Random(563)
    # printable ASCII without space (space is the delimiter)
    alphabet = [chr(i) for i in range(33, 127)]
    lines = [
        "",  # F1
        "--- 123 *** don't (hello, 'tis!",
        "A" * 80 + " " + "b" * 71 + " " + "c" * 70,  # F5 boundary
        "  double  spaces  ",
        "(((nested)))   ''quotes''",
        "\t tab\tinside \r",
    ]
    for _ in range(400):
        n_tok = rng.randint(0, 8)
        toks = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
            for _ in range(n_tok)
        ]
        lines.append(" ".join(toks))
    return lines


def test_three_way_parity(spark):
    lines = _corpus()
    expected = c_pipeline(lines)

    sdf = spark.createDataFrame([(l,) for l in lines], ["text"])
    rows = tokenize_lines(sdf).groupBy("word").count().collect()
    got_spark = Counter({r["word"]: r["count"] for r in rows})
    assert got_spark == expected

    duck = duckdb.connect()
    duck.register("documents", pd.DataFrame({"text": lines}))
    sql = f"WITH {words_cte_sql().lstrip()} SELECT word, count(*) AS cnt FROM words_f GROUP BY word"
    got_duck = Counter({w: c for w, c in duck.execute(sql).fetchall()})
    assert got_duck == expected
