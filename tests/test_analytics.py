"""Analytics + graph operators: semantics fixtures and plan pins.

Oracle parity at sf0.001 is covered registry-wide by
tests/test_registry_oracle.py; here we pin (a) the funnel ordering
semantics the synthetic fixture can't distinguish (strict-after
ordering, same-microsecond ties, steps out of order) and (b) the plan
shapes that matter at 100 TB: the funnel reads the event table ONCE
(the naive per-step formulation scans it once per step), the pivot
runs without a distinct-values pre-scan job, and the posting lists
stay capped.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from mapreduceece563_spark import registry
from mapreduceece563_spark.operators import analytics as an
from mapreduceece563_spark.operators import graph as gph
from mapreduceece563_spark.plans import plan_string
from tests.conftest import SF_DIR

Q = registry.queries()


def _ts(sec: int, micro: int = 0) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 0, 0, sec, micro)


def _funnel_fixture_dir(spark, tmp_path_factory) -> str:
    """events.parquet exercising the orderings the generator data
    can't: step-before-entry, same-microsecond ties, out-of-order
    completion."""
    rows = [
        # user 1: clean view -> click -> purchase (all counted)
        (1, _ts(1), "view"),
        (1, _ts(2), "click"),
        (1, _ts(3), "purchase"),
        # user 2: click BEFORE the first view only -> stops at view
        (2, _ts(1), "click"),
        (2, _ts(2), "view"),
        # user 3: click at the SAME microsecond as the view -> strict
        # 'after' fails -> stops at view
        (3, _ts(5, 7), "view"),
        (3, _ts(5, 7), "click"),
        # user 4: purchase between view and click -> view+click only
        (4, _ts(1), "view"),
        (4, _ts(2), "purchase"),
        (4, _ts(3), "click"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    d = tmp_path_factory.mktemp("funnel_events")
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    return str(d)

def test_funnel_ordering_semantics(spark, tmp_path_factory):
    d = _funnel_fixture_dir(spark, tmp_path_factory)
    row = an.funnel_conversion(spark, d).collect()[0]
    assert row["n_view"] == 4
    assert row["n_view_click"] == 2  # users 1 and 4
    assert row["n_view_click_purchase"] == 1  # user 1


def test_funnel_scans_events_once(spark):
    """One shuffle on user_id, ONE scan of the event table — the
    whole point vs the oracle's 3-CTE shape (3 scans, 3 joins)."""
    plan = plan_string(Q["funnel_conversion"](spark, SF_DIR), "simple")
    assert plan.count("Scan parquet") == 1


def test_cohort_retention_shape(spark):
    rows = Q["cohort_retention"](spark, SF_DIR).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        assert r["week_offset"] >= 0
        assert r["n_users"] > 0
        by_cohort.setdefault(r["cohort_week"], {})[r["week_offset"]] = r[
            "n_users"
        ]
    for offsets in by_cohort.values():
        # week 0 exists (the cohort's own first week) and is the max:
        # retention can only shed users
        assert 0 in offsets
        assert offsets[0] == max(offsets.values())


def test_daily_pivot_row_sums(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    total = ev.count()
    rows = Q["events_daily_pivot"](spark, SF_DIR).collect()
    pivot_total = sum(
        sum(r[f"n_{t}"] for t in an.EVENT_TYPES) for r in rows
    )
    assert pivot_total == total


def test_inverted_index_postings_capped(spark):
    rows = Q["inverted_index"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        ids = [int(x) for x in r["postings"].split(",")]
        assert len(ids) <= gph.POSTINGS_CAP
        assert ids == sorted(ids)
        assert r["df"] >= len(ids)
        if r["df"] < gph.POSTINGS_CAP:
            assert r["df"] == len(ids)


def test_pagerank_fixed_point_properties(spark):
    rows = Q["pagerank_2iter"](spark, SF_DIR).collect()
    assert rows
    words = [r["word"] for r in rows]
    assert len(set(words)) == len(words)
    ranks = [r["rank_scaled"] for r in rows]
    assert all(r > 0 for r in ranks)
    assert ranks == sorted(ranks, reverse=True)
    # fixed-point mass: total rank stays within integer-truncation
    # slack of SCALE (each div drops < 1 unit per node/edge)
    assert sum(ranks) <= gph.PR_SCALE


def test_passage_dedup_invariants(spark):
    rows = Q["passage_dedup"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_docs"] >= 2
        assert r["n_occurrences"] >= r["n_docs"]
