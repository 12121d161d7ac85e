"""Session cache discipline (optimization guide §5: unpersist when done).

Spark's SQL cache registry (``CacheManager``) is append-only until an
explicit ``unpersist``: entries are NOT reference-counted and the
ContextCleaner never collects them (it cleans RDDs/broadcasts/shuffles,
not ``InMemoryRelation``s). Every ``df.cache()`` inside an operator body
therefore leaks one registry entry per CALL, and every later query
build pays ``lookupCachedData`` — a linear scan over the accumulated
entries with canonicalized-plan comparisons. Across a bench run
(warmup over 343 entries + 3 timed passes + conf sweep) the r13 code
accumulated thousands of stale entries, which is the measured uniform
0.7-0.85x drift on UNTOUCHED entries in the r13 round-over-round
(VERDICT r13 "What's wrong" #1/#2).

Two cache populations with different lifetimes:

- PER-CALL staged frames (``stage(df)``): an entry body caches a frame
  that several branches of its own returned plan consume. The frame is
  dead once the caller's action completes, but the entry never sees
  that action (the caller materializes the returned DataFrame), so the
  unpersist is DEFERRED: the next registered-entry build on the same
  thread sweeps the previous call's stages (registry.py ``_shipped``).
  Unpersisting is always correctness-neutral — the worst case is a
  recompute.

- SESSION MEMO stages (``track_memo(d)``): shared build stages
  memoized per (applicationId, sf_dir) in module-level dicts, reused
  across entries by design. ``release_session_caches()`` unpersists
  and clears these too — bench calls it right after the sf0.001
  warmup so only the sf-under-test memos stay resident; cold probes
  (tools/opt_probe.py --cold) call it between measurements.

Deferral is THREAD-LOCAL: the bench warms entries from a 6-thread
pool, and a global list would let one thread sweep frames another
thread's in-flight query still references (correct but a recompute
storm). Each thread sweeps only its own garbage; anything left behind
by short-lived pool threads is collected by the next
``release_session_caches()``.
"""

from __future__ import annotations

import threading
from typing import Any

from pyspark.sql import DataFrame

_TLS = threading.local()

# Module-level memo dicts whose values hold persisted DataFrames
# (directly, or inside tuples). Registered once at import time.
_MEMO_DICTS: list[dict] = []

# (name, seconds) for memo builds, appended by instrumented builders —
# lets the bench attribute pass-1 cost to the shared stage that paid it.
_BUILD_LOG: list[tuple[str, float]] = []


def _deferred() -> list[DataFrame]:
    lst = getattr(_TLS, "deferred", None)
    if lst is None:
        lst = []
        _TLS.deferred = lst
    return lst


def stage(df: DataFrame) -> DataFrame:
    """``df.cache()`` plus deferred-unpersist registration.

    Use for every per-call multiply-referenced frame; the cache serves
    all references inside the one returned plan, then the next
    registered-entry build sweeps it out of the session's cache
    registry instead of leaking it for the session lifetime."""
    df.cache()
    _deferred().append(df)
    return df


def defer_unpersist(df: DataFrame) -> DataFrame:
    """Register an already-persisted frame for the deferred sweep
    (for call sites that need a non-default storage level)."""
    _deferred().append(df)
    return df


def sweep_deferred() -> int:
    """Unpersist every frame this thread staged since its last sweep.

    Called at the top of every registered-entry build: by then the
    previous entry's action has completed (or its caller abandoned the
    plan), so its staged frames are garbage. Never raises — a frame
    whose SparkContext already stopped is simply skipped."""
    lst = _deferred()
    if not lst:
        return 0
    old, lst[:] = list(lst), []
    n = 0
    for df in old:
        try:
            df.unpersist(False)
            n += 1
        except Exception:
            pass
    return n


def track_memo(d: dict) -> dict:
    """Register a module-level memo dict for release_session_caches()."""
    _MEMO_DICTS.append(d)
    return d


def log_build(name: str, seconds: float) -> None:
    _BUILD_LOG.append((name, round(seconds, 3)))


def build_log() -> list[tuple[str, float]]:
    return list(_BUILD_LOG)


def clear_build_log() -> None:
    _BUILD_LOG.clear()


def _iter_frames(value: Any):
    if isinstance(value, DataFrame):
        yield value
    elif isinstance(value, (tuple, list)):
        for v in value:
            if isinstance(v, DataFrame):
                yield v


def release_session_caches() -> int:
    """Unpersist every tracked frame (this thread's deferred stages +
    all session memos) and clear the memo dicts. Returns the number of
    frames released. Path-valued fixture memos (written parquet
    layouts) are untouched — they are disk state, not cache registry
    entries, and stay valid for the session."""
    n = sweep_deferred()
    for d in _MEMO_DICTS:
        for v in list(d.values()):
            for df in _iter_frames(v):
                try:
                    df.unpersist(False)
                    n += 1
                except Exception:
                    pass
        d.clear()
    return n
