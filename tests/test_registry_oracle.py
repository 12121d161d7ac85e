"""The master parity test: every registered query with an oracle must
match DuckDB on the sf0.001 tables — same check the driver runs at
sf0.01 (row count + schema names + order-insensitive values)."""

from __future__ import annotations

import pytest

from mapreduceece563_spark import registry
from tests.conftest import SF_DIR, assert_frames_match

_ORACLES = registry.oracle_sql()
_QUERIES = registry.queries()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(name, spark, duck):
    sdf = _QUERIES[name](spark, SF_DIR)
    rel = duck.execute(_ORACLES[name])
    assert_frames_match(sdf, rel, ctx=name)


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_query_without_oracle_runs(name, spark):
    sdf = _QUERIES[name](spark, SF_DIR)
    assert sdf.count() >= 0
