"""Pin the grouped-map ``applyInPandas`` harness via the unregistered
Arrow variant of user_gap_stats: grouping-key handling, Arrow batch
shape, and output-schema contract, checked against the same DuckDB
oracle as the registered native-window entry.

The registered ``user_gap_stats`` is the scale-correct plan (lag
window + percentile, no whole-group materialization); this test keeps
the Arrow path exercised without putting a whole-group grouped-map on
the query surface.
"""

from __future__ import annotations

from mapreduceece563_spark.operators import sessions as ss
from tests.conftest import SF_DIR, assert_frames_match


def test_user_gap_stats_arrow_matches_oracle(spark, duck):
    sdf = ss.user_gap_stats_arrow(spark, SF_DIR)
    rel = duck.execute(ss.USER_GAP_STATS_SQL)
    assert_frames_match(sdf, rel, ctx="user_gap_stats_arrow")


def test_arrow_and_native_agree(spark):
    arrow = ss.user_gap_stats_arrow(spark, SF_DIR)
    native = ss.user_gap_stats(spark, SF_DIR)
    assert sorted(arrow.columns) == sorted(native.columns)
    assert arrow.exceptAll(native).count() == 0
    assert native.exceptAll(arrow).count() == 0
