"""The transformWithStateInPandas processor, in its own module so the
protobuf-shim side effect is scoped to the TWS code path.

IMPORT-TIME CONTRACT: importing this module installs the vendored
``google.protobuf`` shim (vendor/protoshim.py) when no real runtime is
present. That covers both processes that need it, and nothing else:

* the driver — ``stateful._tws_drain`` imports this module (lazily)
  right before building the streaming query;
* every worker — unpickling ``TwsUserProfile`` imports this module
  before pyspark's state clients perform their deferred
  ``StateMessage_pb2`` imports.

A plain batch query importing the registry never touches this module,
so ``sys.modules['google.protobuf']`` stays untouched for code that
probes protobuf availability the standard way. A real protobuf
installation always wins inside install() itself.
"""

from __future__ import annotations

import pandas as pd

from ..vendor.protoshim import install as _install_protoshim

_install_protoshim()

from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)


class TwsUserProfile(StatefulProcessor):
    """Per-user running profile on TYPED state primitives: a
    ValueState (n_events, value_cents) plus a MapState of per-type
    counts — both primitive kinds exercised against the RocksDB state
    store; value math stays in int64 cents until the final emit."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._agg = handle.getValueState(
            "agg", "n BIGINT, vc BIGINT, has BIGINT"
        )
        self._types = handle.getMapState("types", "t STRING", "c BIGINT")

    def handleInputRows(self, key, rows, timerValues):
        n, vc, has = (
            self._agg.get() if self._agg.exists() else (0, 0, 0)
        )
        fresh: dict = {}
        for pdf in rows:
            # count(*) semantics for n; the cent sum skips NULL
            # values like SQL sum (a NaN would crash the int64 cast);
            # `has` marks whether any measurement was ever seen so
            # the emit can report NULL instead of a fake 0.0
            n += len(pdf)
            vals = pdf["value"].dropna()
            if len(vals):
                has = 1
                vc += int(vals.mul(100).round(0).astype("int64").sum())
            for t, c in pdf["event_type"].value_counts().items():
                fresh[t] = fresh.get(t, 0) + int(c)
        # State-server chattiness, not row volume, dominates this
        # operator's cost: one paginated iterator() scan of the map
        # replaces a containsKey+getValue round trip per event type,
        # and n_types falls out of the same read instead of a second
        # keys() scan.
        existing = {t: c for (t,), (c,) in self._types.iterator()}
        for t, c in fresh.items():
            self._types.updateValue((t,), (existing.get(t, 0) + c,))
        self._agg.update((n, vc, has))
        n_types = len(existing.keys() | fresh.keys())
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "value_sum": [vc / 100.0 if has else None],
                "n_types": [n_types],
            }
        )

    def close(self) -> None:
        pass
