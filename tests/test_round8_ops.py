"""Round-8 operator pins beyond the oracle compare.

The driver's hash check proves Spark == DuckDB; these tests pin the
properties the compare cannot see (semantic ground truth on injected
fixtures, fan-out invariants, exactness of the pruned Arrow path).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_substring_dup_spans_injected_ground_truth(spark, tmp_path):
    """Inject documents with a KNOWN shared 60-char substring and
    verify the span accounting exactly: each carrier doc reports one
    span of exactly 60 chars; a doc with no >= 40-char repeat reports
    nothing; a doc repeating a 50-char block INTERNALLY is flagged too
    (suffix-array semantics count any corpus re-occurrence, same-doc
    included)."""
    from mapreduceece563_spark.operators import dedup as dd

    shared = "".join(chr(ord("a") + (i * 7) % 26) for i in range(60))
    internal = "".join(chr(ord("A") + (i * 11) % 26) for i in range(50))
    unique1 = "the quick brown fox jumps over the lazy dog again and again 123"
    docs = [
        # doc 1 and 2 share `shared` at different offsets
        (1, "xx" + shared + "yy" + "0123456789" * 3, "en", "s1"),
        (2, "zzzzz" + shared + "qq", "en", "s1"),
        # doc 3: no >= 40-char substring occurs twice anywhere
        (3, unique1, "en", "s2"),
        # doc 4: internal repeat of a 50-char block
        (4, internal + "-----" + internal, "en", "s2"),
    ]
    df = spark.createDataFrame(
        [(i, t, l, s, len(t)) for i, t, l, s in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = {
        r["doc_id"]: r
        for r in dd.substring_dup_spans(spark, str(tmp_path)).collect()
    }
    assert set(out) == {1, 2, 4}
    for d in (1, 2):
        assert out[d]["n_dup_spans"] == 1
        assert out[d]["max_span_len"] == 60
        assert out[d]["dup_chars"] == 60
    # doc 4: both occurrences of the 50-char block are duplicated
    # spans (the separator breaks the run), 2 spans x 50 chars
    assert out[4]["n_dup_spans"] == 2
    assert out[4]["dup_chars"] == 100
    assert out[4]["max_span_len"] == 50


def test_substring_spans_never_overlap_and_fit_doc(spark):
    """On the real corpus: per-doc spans are maximal, hence disjoint —
    total duplicated chars can never exceed the doc length, and every
    span is at least SUBSTR_MIN_LEN chars."""
    from mapreduceece563_spark.operators import dedup as dd
    from mapreduceece563_spark.sources.catalog import load_table

    spans = dd.substring_dup_spans(spark, SF_DIR)
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.length("text").alias("n")
    )
    joined = spans.join(docs, "doc_id")
    bad = joined.filter(
        (F.col("dup_chars") > F.col("n"))
        | (F.col("max_span_len") < dd.SUBSTR_MIN_LEN)
        | (F.col("max_span_len") > F.col("n"))
    )
    assert bad.count() == 0
    assert spans.count() > 0, "fixture must exercise the operator"


def test_price_band_overlap_fans_out(spark):
    """Overlapping bands are a genuine fan-out: total n_orders across
    bands EXCEEDS the number of banded orders (a 60-150k order counts
    in entry_reach AND core_reach), which is exactly why no disjoint
    CASE rewrite exists for this entry."""
    from mapreduceece563_spark.operators import temporal as tp
    from mapreduceece563_spark.sources.catalog import load_table

    out = tp.orders_price_band_overlap(spark, SF_DIR)
    total_banded_rows = out.agg(F.sum("n_orders")).collect()[0][0]
    lo = min(b[1] for b in tp.OVERLAP_BANDS)
    hi = max(b[2] for b in tp.OVERLAP_BANDS)
    n_orders = (
        load_table(spark, SF_DIR, "orders")
        .filter(
            (F.col("o_totalprice") >= lo) & (F.col("o_totalprice") < hi)
        )
        .count()
    )
    assert total_banded_rows > n_orders, (
        "no order fell into two bands — widen the overlap or the "
        "fixture; the entry would silently degenerate to a disjoint "
        "classification"
    )


def test_disjoint_band_case_matches_former_join_semantics(spark):
    """The CASE rewrite must agree row-for-row with the inequality-
    join formulation it replaced (same bands, same aggregates)."""
    from mapreduceece563_spark.operators import temporal as tp
    from mapreduceece563_spark.sources.catalog import load_table

    via_case = {
        r["band_name"]: (r["n_orders"], r["total_price"])
        for r in tp.orders_price_band(spark, SF_DIR).collect()
    }
    orders = load_table(spark, SF_DIR, "orders").select("o_totalprice")
    bands = spark.createDataFrame(
        list(tp.PRICE_BANDS), "band_name string, lo long, hi long"
    )
    via_join = {
        r["band_name"]: (r["n_orders"], r["total_price"])
        for r in (
            orders.join(
                F.broadcast(bands),
                (F.col("o_totalprice") >= F.col("lo"))
                & (F.col("o_totalprice") < F.col("hi")),
            )
            .groupBy("band_name")
            .agg(
                F.count("*").alias("n_orders"),
                F.sum(
                    F.round(F.col("o_totalprice") * 100, 0).cast("long")
                ).alias("_tc"),
            )
            .select(
                "band_name",
                "n_orders",
                (F.col("_tc") / 100.0).alias("total_price"),
            )
            .collect()
        )
    }
    assert via_case == via_join


def test_knn_pandas_prune_is_exact_vs_brute_force(spark):
    """The native-prune + Arrow-rescore path must reproduce
    knn_brute_force EXACTLY (ids, ranks, rounded cosines) — the prune
    is provably exact because the native and Arrow folds are
    bit-identical, so this must hold at any scale factor, not just
    the driver fixture."""
    from mapreduceece563_spark.operators import similarity as sim

    bf = sorted(
        map(tuple, sim.knn_brute_force(spark, SF_DIR).collect())
    )
    arrow = sorted(
        map(tuple, sim.knn_pandas_udf(spark, SF_DIR).collect())
    )
    assert bf == arrow
