"""Model-based fuzz for the substring-dedup tier: a pure-Python
brute-force of the span semantics (every L-gram occurring >= 2 times
corpus-wide marks its start position; maximal runs merge into spans)
vs the Spark operator, over a seeded low-alphabet random corpus plus
the classic suffix-dedup traps (periodic strings, whole-doc repeats,
spans touching the doc boundaries, exactly-L docs).

A two-letter alphabet forces heavy gram collisions — self-overlap
inside one doc, cross-doc sharing, and runs that nearly cover whole
docs — exactly the shapes the islands merge must get right.
"""

from __future__ import annotations

import random
from collections import Counter

from mapreduceece563_spark.operators.dedup import (
    SUBSTR_MIN_LEN,
    substring_dup_spans,
)

L = SUBSTR_MIN_LEN


def py_spans(docs: dict[int, str]) -> dict[int, tuple[int, int, int]]:
    grams: Counter = Counter()
    for t in docs.values():
        for p in range(len(t) - L + 1):
            grams[t[p : p + L]] += 1
    out = {}
    for d, t in docs.items():
        spans: list[list[int]] = []
        for p in range(len(t) - L + 1):
            if grams[t[p : p + L]] < 2:
                continue
            if spans and p == spans[-1][1] + 1:
                spans[-1][1] = p
            else:
                spans.append([p, p])
        if spans:
            out[d] = (
                len(spans),
                sum(e - s + L for s, e in spans),
                max(e - s + L for s, e in spans),
            )
    return out


def test_substring_spans_match_python_model(spark, tmp_path):
    rng = random.Random(8)
    docs: dict[int, str] = {}
    # deterministic traps
    docs[0] = "a" * 100                     # total self-overlap: 1 span of 100
    docs[1] = "ab" * 50                     # periodic: every gram duplicated
    shared = "".join(rng.choice("ab") for _ in range(70))
    docs[2] = shared + "x" * 10             # cross-doc block, span at doc START
    docs[3] = "y" * 10 + shared             # same block, span at doc END
    docs[4] = "".join(rng.choice("abc") for _ in range(L))  # exactly L chars
    docs[5] = "z" * (L - 1)                 # below threshold: never flagged
    # seeded random corpus over a tiny alphabet
    for i in range(6, 40):
        n = rng.randint(0, 120)
        docs[i] = "".join(rng.choice("ab") for _ in range(n))

    df = spark.createDataFrame(
        [(i, t, "en", "fuzz", len(t)) for i, t in docs.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        r["doc_id"]: (r["n_dup_spans"], r["dup_chars"], r["max_span_len"])
        for r in substring_dup_spans(spark, str(tmp_path)).collect()
    }
    expected = py_spans(docs)
    assert got == expected
    # the traps must actually trigger
    assert expected[0] == (1, 100, 100)
    assert expected[1] == (1, 100, 100)
    assert 2 in expected and 3 in expected
    assert 5 not in expected
