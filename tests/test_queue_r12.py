"""Round-12 registration queue, built and oracle-tested in round 10.

Four operators extending established families along new axes: robust
location (trimmed mean with auditable cut points), per-source corpus
structure (Zipf exponent), packing-budget sensitivity, and
quantization-precision sensitivity. Oracle compare + pure-Python
models + invariant plan pins + empty-table pins, the queue bar.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_DIR, assert_frames_match


# --- trimmed_mean_by_segment ------------------------------------------


def test_trimmed_mean_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import analytics as an

    assert_frames_match(
        an.trimmed_mean_by_segment(spark, SF_DIR),
        duck.execute(an.TRIMMED_MEAN_SQL),
        ctx="trimmed_mean_by_segment",
    )


def test_trimmed_mean_python_model(spark):
    """Sort each segment's cents outright and apply the definition:
    drop k = n div 10 from each end, half-up integer mean of the
    rest; cut points are the (k+1)-th and (n-k)-th order stats."""
    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.sources.catalog import load_table

    orders = load_table(spark, SF_DIR, "orders").select(
        "o_custkey",
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").alias("c"),
    )
    cust = load_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    rows = orders.join(cust, "o_custkey").collect()
    by_seg: dict = {}
    for r in rows:
        by_seg.setdefault(r["c_mktsegment"], []).append(r["c"])
    got = {
        r["segment"]: r
        for r in an.trimmed_mean_by_segment(spark, SF_DIR).collect()
    }
    assert set(got) == set(by_seg)
    for seg, vals in by_seg.items():
        vals.sort()
        n = len(vals)
        k = n // 10
        kept = vals[k : n - k]
        r = got[seg]
        assert r["n_orders"] == n
        assert r["cut_low_cents"] == vals[k]
        assert r["cut_high_cents"] == vals[n - k - 1]
        s, m = sum(kept), len(kept)
        assert r["trimmed_mean_cents"] == (2 * s + m) // (2 * m)
        # the trim is a real robustification: it sits within the
        # untrimmed range and the trimmed range brackets it
        assert vals[k] <= r["trimmed_mean_cents"] <= vals[n - k - 1]


def test_trimmed_mean_is_histogram_granular(spark):
    """Invariant pin: all windows slide over the (segment, cents)
    histogram — every windowspecdefinition partitions by segment."""
    import re

    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(an.trimmed_mean_by_segment(spark, SF_DIR), "simple")
    wspecs = re.findall(r"windowspecdefinition\(([^,#]*)", p)
    assert wspecs and all(k == "segment" for k in wspecs), wspecs


# --- zipf_slope_by_source ---------------------------------------------


def test_zipf_slope_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import ngrams as ng

    assert_frames_match(
        ng.zipf_slope_by_source(spark, SF_DIR),
        duck.execute(ng.ZIPF_SLOPE_ORACLE),
        ctx="zipf_slope_by_source",
    )


def test_zipf_slope_python_model(spark):
    """Recompute every slope from the raw word counts: identical
    ranking, identical micro-nat quantization, identical normal
    equations — then the one float division."""
    from mapreduceece563_spark.operators import ngrams as ng
    from mapreduceece563_spark.sources.catalog import load_table

    words = ng._words_per_doc(spark, SF_DIR).select(
        "doc_id", F.explode("words").alias("word")
    )
    src = {
        r["doc_id"]: r["source"]
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", "source")
        .collect()
    }
    counts: dict = {}
    for r in words.collect():
        key = (src[r["doc_id"]], r["word"])
        counts[key] = counts.get(key, 0) + 1
    by_src: dict = {}
    for (s, wd), c in counts.items():
        by_src.setdefault(s, []).append((wd, c))
    got = {
        r["source"]: r
        for r in ng.zipf_slope_by_source(spark, SF_DIR).collect()
    }
    assert set(got) == set(by_src)
    for s, pairs in by_src.items():
        pairs.sort(key=lambda t: (-t[1], t[0]))
        pairs = pairs[: ng.ZIPF_TOP_RANKS]
        xs = [
            int(round(math.log(i + 1) * 1_000_000))
            for i in range(len(pairs))
        ]
        ys = [int(round(math.log(c) * 1_000_000)) for _, c in pairs]
        n = len(pairs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        den = n * sxx - sx * sx
        r = got[s]
        assert r["n_ranks"] == n
        if den == 0:
            assert r["zipf_slope_micro"] is None
        else:
            want = int(round((n * sxy - sx * sy) / den * 1_000_000))
            assert r["zipf_slope_micro"] == want, s
            # a frequency-ranked list is non-increasing, so the
            # fitted slope can never be positive
            assert r["zipf_slope_micro"] <= 0


def test_zipf_window_is_vocabulary_granular(spark):
    """Invariant pin: the only window partitions by source and ranks
    the vocabulary frame (post-aggregation), never raw tokens."""
    import re

    from mapreduceece563_spark.operators import ngrams as ng
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(ng.zipf_slope_by_source(spark, SF_DIR), "simple")
    wspecs = re.findall(r"windowspecdefinition\(([^,#]*)", p)
    assert wspecs and all(k == "source" for k in wspecs), wspecs


# --- pack_len_sensitivity ---------------------------------------------


def test_pack_sweep_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import trainprep as tr

    assert_frames_match(
        tr.pack_len_sensitivity(spark, SF_DIR),
        duck.execute(tr.PACK_SWEEP_SQL),
        ctx="pack_len_sensitivity",
    )


def test_pack_sweep_agrees_with_token_pack(spark):
    """The sweep's row at the shipped budget must equal token_pack's
    own bin census — bins, tokens, and doc mass."""
    from mapreduceece563_spark.operators import trainprep as tr

    sweep = {
        r["budget"]: r
        for r in tr.pack_len_sensitivity(spark, SF_DIR).collect()
    }
    assert set(sweep) == set(tr.PACK_SWEEP_BUDGETS)
    pack = tr.token_pack(spark, SF_DIR).collect()
    at_shipped = sweep[tr.PACK_BUDGET_TOKENS]
    assert at_shipped["n_bins"] == len(pack)
    assert at_shipped["n_tokens"] == sum(r["n_tokens"] for r in pack)
    # physics: larger budgets never open more bins, and capacity is
    # bins * budget exactly
    budgets = sorted(sweep)
    bins = [sweep[b]["n_bins"] for b in budgets]
    assert bins == sorted(bins, reverse=True)
    for b in budgets:
        assert sweep[b]["capacity_tokens"] == sweep[b]["n_bins"] * b
        assert (
            sweep[b]["fill_ppm"]
            == sweep[b]["n_tokens"] * 1_000_000 // sweep[b]["capacity_tokens"]
        )


def test_pack_sweep_single_cumsum(spark):
    """Invariant pin: ONE per-shard running-sum window feeds every
    budget (all windowspecdefinitions partition by shard); budgets
    enter as an explode, not extra sort passes."""
    import re

    from mapreduceece563_spark.operators import trainprep as tr
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(tr.pack_len_sensitivity(spark, SF_DIR), "simple")
    wspecs = re.findall(r"windowspecdefinition\(([^,#]*)", p)
    assert wspecs and all(k == "shard" for k in wspecs), wspecs
    assert "Generate" in p  # the budget explode


# --- quantization_bits_sweep ------------------------------------------


def test_quant_sweep_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import trainprep as tr

    assert_frames_match(
        tr.quantization_bits_sweep(spark, SF_DIR),
        duck.execute(tr.QUANT_SWEEP_SQL),
        ctx="quantization_bits_sweep",
    )


def test_quant_sweep_python_model(spark):
    """Replay quantize -> dequantize -> cosine in pure Python with
    the identical operation order, and pin the physics: more bits
    never hurts (mean and min cosines are monotone in bits)."""
    from mapreduceece563_spark.operators import trainprep as tr
    from mapreduceece563_spark.sources.catalog import load_table

    emb = [
        [float(x) for x in r["embedding"]]
        for r in load_table(spark, SF_DIR, "embeddings").collect()
    ]
    got = {
        r["bits"]: r
        for r in tr.quantization_bits_sweep(spark, SF_DIR).collect()
    }
    assert set(got) == set(tr.QUANT_SWEEP_BITS)
    for b in tr.QUANT_SWEEP_BITS:
        levels = 2 ** (b - 1) - 1
        cps = []
        for v in emb:
            scale = max(abs(x) for x in v)
            if scale == 0:
                continue
            d = [
                round(x / scale * levels) / levels * scale for x in v
            ]
            num = 0.0
            for x, y in zip(v, d):
                num = num + x * y
            nv = 0.0
            for x in v:
                nv = nv + x * x
            nd = 0.0
            for y in d:
                nd = nd + y * y
            denom = math.sqrt(nv) * math.sqrt(nd)
            if denom == 0:
                continue
            cps.append(int(round(num / denom * 1_000_000)))
        r = got[b]
        assert r["n_vectors"] == len(cps)
        assert r["min_cos_ppm"] == min(cps)
        s, m = sum(cps), len(cps)
        assert r["mean_cos_ppm"] == (2 * s + m) // (2 * m)
    means = [got[b]["mean_cos_ppm"] for b in sorted(got)]
    mins = [got[b]["min_cos_ppm"] for b in sorted(got)]
    assert means == sorted(means) and mins == sorted(mins)


def test_quant_sweep_is_map_only(spark):
    """Invariant pin: no joins beyond the broadcast bits frame, no
    windows — one map pass and a |bits|-row rollup."""
    from mapreduceece563_spark.operators import trainprep as tr
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(tr.quantization_bits_sweep(spark, SF_DIR), "simple")
    assert "Window" not in p
    assert "SortMergeJoin" not in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


# --- empty-table behavior, all four ------------------------------------


def test_queue_r12_on_empty_tables(spark, tmp_path):
    import duckdb
    import pyarrow.parquet as pq

    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.operators import ngrams as ng
    from mapreduceece563_spark.operators import trainprep as tr
    from mapreduceece563_spark.sources.catalog import TABLES

    d = tmp_path / "empty_sf"
    d.mkdir()
    for t in TABLES:
        schema = pq.read_schema(f"{SF_DIR}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")

    for name, fn, sql in [
        (
            "trimmed_mean_by_segment",
            an.trimmed_mean_by_segment,
            an.TRIMMED_MEAN_SQL,
        ),
        ("zipf_slope_by_source", ng.zipf_slope_by_source, ng.ZIPF_SLOPE_ORACLE),
        ("pack_len_sensitivity", tr.pack_len_sensitivity, tr.PACK_SWEEP_SQL),
        (
            "quantization_bits_sweep",
            tr.quantization_bits_sweep,
            tr.QUANT_SWEEP_SQL,
        ),
    ]:
        assert_frames_match(
            fn(spark, str(d)), con.execute(sql), ctx=f"empty:{name}"
        )
