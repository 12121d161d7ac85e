"""Custom stateful streaming operator via ``applyInPandasWithState``.

The built-in streaming aggregations (groupBy().agg, window,
session_window) cover most incremental state; this module is the
pattern for state the built-ins can't express — arbitrary per-key
Python state carried across micro-batches with an explicit timeout
contract. The running per-user profile below is deliberately simple
so the harness (state schema, Arrow batch iteration, update-mode
emission, GroupStateTimeout) is the reusable part.

Scale posture: state lives in the state store partitioned by the
grouping key — the same hash partitioning as any shuffle, so 10^9
users spread across executors. Values are a fixed-width tuple (two
int64s), not unbounded collections; anything list-shaped in state is
a red flag at 100 TB. Exact money math: value accumulates integer
cents in state, divides once at emission.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("value_sum", T.DoubleType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), False),
        T.StructField("vc", T.LongType(), False),
    ]
)


def _update_user_profile(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, vc = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # exact cents: round each double once, sum as int64
        vc += int(pdf["value"].mul(100).round(0).astype("int64").sum())
    state.update((n, vc))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "value_sum": [vc / 100.0]}
    )


def running_user_profile(events: DataFrame) -> DataFrame:
    """Per-user running (n_events, exact value_sum) maintained across
    micro-batches; emits the key's current totals whenever the key
    appears in a batch (update-mode semantics)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
