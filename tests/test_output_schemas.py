"""Registry-wide output-schema guard: every entry's result schema
must contain ONLY scalar top-level columns.

The driver canonicalizes results with pandas ``sort_values`` before
hashing; a top-level ``array``/``struct``/``map`` column raises
``TypeError: unhashable type`` in that path (round 3's one red row,
``region_nations_agg``). Complex types are fine INSIDE a plan — this
guards the declared output surface only. List-shaped answers must be
emitted through ``array_join`` (see region_nations_agg and
inverted_index) so the contract can never regress silently.

Schema inspection is plan-only (no job runs): building the DataFrame
is lazy, so this sweeps all entries in seconds.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from mapreduceece563_spark import registry
from tests.conftest import SF_DIR

_QUERIES = registry.queries()

_COMPLEX = (T.ArrayType, T.StructType, T.MapType)


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_output_schema_is_scalar_only(name, spark):
    sdf = _QUERIES[name](spark, SF_DIR)
    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in sdf.schema.fields
        if isinstance(f.dataType, _COMPLEX)
    ]
    assert not bad, (
        f"{name}: non-scalar top-level output column(s) {bad} — the "
        "driver's pandas canonicalization cannot hash these; emit via "
        "array_join / to_json instead"
    )
