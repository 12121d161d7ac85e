"""Round-7 QUEUE operators — implemented and oracle-checked ahead of
registration (the round-6 freeze arithmetic left zero registry slots;
see coverage_highwater.json). Each test drives the operator against
its DuckDB oracle exactly the way the driver will once the entry is
registered, plus the semantic pin the oracle compare cannot see.

Threshold note for allpairs_prefix_filter: tau is 0.9, not the
textbook 0.6, because the synthetic corpus is template-generated and
extremely self-similar — at sf0.001 over half of ALL doc pairs clear
cosine 0.6 (histogram: ~72.8k of ~125k pairs), which would make the
"similarity join avoids the cross product" demonstration vacuous.
At 0.9 the result is a sparse 33 pairs and the prefix index prunes
hard."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR, assert_frames_match


def test_cmsketch_matches_oracle_and_never_undercounts(spark, duck):
    from mapreduceece563_spark.operators import skew as sk

    sdf = sk.cmsketch_heavy_hitters(spark, SF_DIR)
    assert_frames_match(
        sdf, duck.execute(sk._cm_sql()), ctx="cmsketch_heavy_hitters"
    )
    rows = sdf.collect()
    assert len(rows) == 10
    # the count-min invariant: estimates never undercount
    assert all(r["overcount"] >= 0 for r in rows)
    assert all(r["cm_estimate"] >= r["n_exact"] for r in rows)


def test_bloom_join_prune_matches_oracle_no_false_negatives(spark, duck):
    from mapreduceece563_spark.operators import skew as sk

    sdf = sk.bloom_join_prune(spark, SF_DIR)
    assert_frames_match(
        sdf, duck.execute(sk._bloom_sql()), ctx="bloom_join_prune"
    )
    row = sdf.collect()[0]
    # a Bloom filter may pass extra rows but can never drop a match
    assert row["no_false_negatives"] is True
    assert row["n_bloom_pass"] >= row["n_true_match"]
    assert (
        row["n_false_positive"] == row["n_bloom_pass"] - row["n_true_match"]
    )


def test_ivm_refresh_equals_full_recompute(spark, duck):
    from mapreduceece563_spark.operators import mining as mn

    mn.reset_ivm()
    sdf = mn.ivm_incremental_agg(spark, SF_DIR)
    assert_frames_match(
        sdf, duck.execute(mn.IVM_INCREMENTAL_SQL), ctx="ivm_incremental_agg"
    )
    # the second refresh must reuse the materialized base view, not
    # rebuild it (the memo is the "stored view" the refresh maintains)
    key = (spark.sparkContext.applicationId, SF_DIR)
    first_path = mn._IVM_VIEW_CACHE[key]
    mn.ivm_incremental_agg(spark, SF_DIR)
    assert mn._IVM_VIEW_CACHE[key] == first_path


def test_session_concurrency_matches_oracle_and_invariants(spark, duck):
    from mapreduceece563_spark.operators import sessions as ss

    sdf = ss.session_concurrency_peak(spark, SF_DIR)
    assert_frames_match(
        sdf,
        duck.execute(ss.SESSION_CONCURRENCY_SQL),
        ctx="session_concurrency_peak",
    )
    rows = sdf.collect()
    assert rows, "no days"
    # peak can never be below the day-start concurrency
    assert all(r["peak_concurrency"] >= r["carry_in"] for r in rows)
    # every session that starts also ends (somewhere): global balance
    tot = sdf.agg(
        F.sum("n_starts").alias("s"), F.sum("n_ends").alias("e")
    ).collect()[0]
    assert tot["s"] == tot["e"]


def test_pps_sample_matches_oracle_one_doc_per_slot(spark, duck):
    from mapreduceece563_spark.operators import trainprep as tp

    sdf = tp.pps_systematic_sample(spark, SF_DIR)
    assert_frames_match(
        sdf, duck.execute(tp.PPS_SYSTEMATIC_SQL), ctx="pps_systematic_sample"
    )
    # each (lang, sample position) is covered by EXACTLY one document:
    # positions are midpoints of equal weight slices and the cumulative
    # intervals partition [0, W)
    n_langs = sdf.select("lang").distinct().count()
    assert sdf.count() == n_langs * tp.PPS_SAMPLES_PER_LANG
    assert (
        sdf.groupBy("lang", "sample_idx").count().filter("count != 1").count()
        == 0
    )


def test_allpairs_prefix_filter_is_exact(spark, duck):
    """The whole point: prefix-filtered candidates + verify equals the
    brute-force similarity join — no false negatives (a dropped pair
    would fail the frame compare)."""
    from mapreduceece563_spark.operators import ngrams as ng

    sql = ng.ALLPAIRS_PREFIX_SQL.format(words_cte=ng._words_cte().lstrip())
    sdf = ng.allpairs_prefix_filter(spark, SF_DIR)
    assert_frames_match(sdf, duck.execute(sql), ctx="allpairs_prefix_filter")
    # and the threshold is honest: every surviving pair clears tau
    assert sdf.filter(F.col("cosine") < 0.9).count() == 0
