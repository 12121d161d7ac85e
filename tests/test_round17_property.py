"""Hypothesis fuzz for the round-17 queue's string machinery — the
two operators whose correctness rests on character-level folds that a
fixture corpus exercises only thinly: CDC boundary determination and
template masking. Properties, not examples: locality of CDC
boundaries under edits, and mask idempotence, across generated
unicode."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from mapreduceece563_spark.functions.hashing import HASH_BASE, HASH_MOD
from mapreduceece563_spark.operators import dedup as dd

TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x4FF),
    max_size=300,
)


def _win_hash(t: str, p: int) -> int:
    acc = 0
    for i in range(p - dd.CDC_WINDOW + 1, p + 1):
        acc = (acc * HASH_BASE + ord(t[i - 1])) % HASH_MOD
    return acc


def _boundaries(t: str) -> list[int]:
    n = len(t)
    if n <= dd.CDC_WINDOW:
        return []
    return [
        p for p in range(dd.CDC_WINDOW, n)
        if _win_hash(t, p) % dd.CDC_MASK == 0
    ]


@given(TEXT, st.integers(min_value=0, max_value=300),
       st.text(alphabet="xyz", min_size=1, max_size=3))
@settings(max_examples=200, deadline=None)
def test_cdc_boundary_locality(t, at, ins):
    """THE CDC contract as a property: an insertion at position `at`
    preserves every boundary strictly before it, and every boundary
    whose trailing window starts after the edit survives shifted by
    exactly the insertion length — only the O(window) neighborhood of
    the edit can change."""
    at = min(at, len(t))
    edited = t[:at] + ins + t[at:]
    before = set(_boundaries(t))
    after = set(_boundaries(edited))
    # prefix boundaries (entirely before the edit) are preserved
    assert {p for p in before if p < at} == {p for p in after if p < at}
    # suffix boundaries shift by exactly len(ins)
    d = len(ins)
    assert {p for p in before if p - dd.CDC_WINDOW + 1 > at} == {
        p - d for p in after if p - d - dd.CDC_WINDOW + 1 > at
    }


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_template_mask_is_idempotent_and_digit_free(t):
    """Masking twice equals masking once, the masked form contains no
    ASCII digits, and masking never changes a digit-free
    single-spaced lowercase string."""
    import re

    def mask(s):
        return re.sub(dd.TEMPLATE_WS_RE, " ",
                      re.sub(dd.TEMPLATE_DIGIT_RE, "#", s.lower()))

    m = mask(t)
    assert mask(m) == m
    assert not any(c.isascii() and c.isdigit() for c in m)
    if not any(c.isascii() and c.isdigit() for c in t) \
            and "\t" not in t and "\r" not in t and "\n" not in t \
            and "  " not in t and t == t.lower():
        assert m == t
