"""transformWithStateInPandas (Spark 4 typed-state streaming API) —
oracle parity for the unregistered operator in streaming/stateful.py.

The API's driver/state-server protocol imports `google.protobuf`,
which this container does not ship (and installs are forbidden), so
the whole module skips unless protobuf is importable; on an
environment that has it, this is the same hard check the registry
entries get (multi-micro-batch run vs the DuckDB batch aggregate).
"""

from __future__ import annotations

import pytest

pytest.importorskip("google.protobuf")

from mapreduceece563_spark.streaming.stateful import (  # noqa: E402
    STREAMING_TWS_SQL,
    streaming_tws_user_profile,
)
from tests.conftest import SF_DIR, assert_frames_match  # noqa: E402


def test_tws_user_profile_matches_oracle(spark, duck):
    sdf = streaming_tws_user_profile(spark, SF_DIR)
    rel = duck.execute(STREAMING_TWS_SQL)
    assert_frames_match(sdf, rel, ctx="streaming_tws_user_profile")
