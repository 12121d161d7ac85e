"""transformWithStateInPandas (Spark 4 typed-state streaming API) —
oracle parity for the unregistered operator in streaming/stateful.py.

The API's driver/state-server protocol imports `google.protobuf`,
which this container does not ship (and installs are forbidden);
vendor/protoshim.py supplies a minimal clean-room runtime, installed
at stateful.py import. This is the same hard check the registry
entries get (multi-micro-batch run vs the DuckDB batch aggregate),
now UNSKIPPED — it certifies the shim's wire format against the real
JVM state server end to end.
"""

from __future__ import annotations

from mapreduceece563_spark.streaming.stateful import (  # noqa: E402
    STREAMING_TWS_SQL,
    streaming_tws_user_profile,
)
from tests.conftest import SF_DIR, assert_frames_match  # noqa: E402


def test_tws_user_profile_matches_oracle(spark, duck):
    sdf = streaming_tws_user_profile(spark, SF_DIR)
    rel = duck.execute(STREAMING_TWS_SQL)
    assert_frames_match(sdf, rel, ctx="streaming_tws_user_profile")
