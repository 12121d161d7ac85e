"""Round-16 registration queue, built and oracle-tested in round 10.

Graph transitivity (global clustering coefficient off the shared
oriented-wedge plan), single-split changepoint localization (binary
segmentation step one, hour-granular), the CCNet filter-curve
(surprisal keep-d% thresholds and surviving mass), and the MinHash
width sweep (estimation error vs permutation count).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_DIR, assert_frames_match


# --- global_clustering_coefficient ------------------------------------


def test_gcc_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import graph as gph

    assert_frames_match(
        gph.global_clustering_coefficient(spark, SF_DIR),
        duck.execute(gph.GLOBAL_CLUSTERING_ORACLE),
        ctx="global_clustering_coefficient",
    )


def test_gcc_reconciles_with_triangle_count(spark):
    """The shared plan must give identical censuses, and the wedge
    count must equal sum(deg*(deg-1))/2 computed from the raw edges
    in Python; gcc in [0, 1e6]."""
    from mapreduceece563_spark.operators import graph as gph

    gcc = gph.global_clustering_coefficient(spark, SF_DIR).collect()[0]
    tri = gph.triangle_count(spark, SF_DIR).collect()[0]
    assert (gcc["n_nodes"], gcc["n_edges"], gcc["n_triangles"]) == (
        tri["n_nodes"],
        tri["n_edges"],
        tri["n_triangles"],
    )
    deg: dict = {}
    for r in gph._cooc_edges(spark, SF_DIR).collect():
        deg[r["src"]] = deg.get(r["src"], 0) + 1
    wedges = sum(d * (d - 1) for d in deg.values()) // 2
    assert gcc["n_wedges"] == wedges
    want = (3 * gcc["n_triangles"] * 1_000_000) // wedges if wedges else None
    assert gcc["gcc_ppm"] == want
    assert gcc["gcc_ppm"] is None or 0 <= gcc["gcc_ppm"] <= 1_000_000


# --- changepoint_binary_split ------------------------------------------


def test_changepoint_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import analytics as an

    assert_frames_match(
        an.changepoint_binary_split(spark, SF_DIR),
        duck.execute(an.CHANGEPOINT_SPLIT_SQL),
        ctx="changepoint_binary_split",
    )


def test_changepoint_python_model(spark):
    """Exhaustive replay: score every split of the gap-filled series
    with the identical fixed-point floors, pick the same argmax
    (ties to the smallest k), and verify means and the variance
    fraction; gain in [0, 1e6]."""
    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.sources.catalog import load_table

    rows = load_table(spark, SF_DIR, "events").select(
        "event_type", F.expr("unix_micros(ts) div 3600000000").alias("h")
    ).collect()
    series: dict = {}
    for r in rows:
        series.setdefault(r["event_type"], []).append(r["h"])
    got = {
        r["event_type"]: r
        for r in an.changepoint_binary_split(spark, SF_DIR).collect()
    }
    assert set(got) == set(series)
    for et, hs in series.items():
        lo, hi = min(hs), max(hs)
        y = [0] * (hi - lo + 1)
        for h in hs:
            y[h - lo] += 1
        n, s = len(y), sum(y)
        q = sum(v * v for v in y)
        best = None
        sk = 0
        for k in range(1, n):
            sk += y[k - 1]
            num = sk * sk * (n - k) + (s - sk) * (s - sk) * k
            score = (num * 10**12) // (k * (n - k))
            cand = (score, -k, sk, num)
            if best is None or cand > best:
                best = cand
        score, nk, sk_b, num_b = best
        k_b = -nk
        r = got[et]
        assert (r["n_hours"], r["n_events"]) == (n, s)
        assert r["split_hour"] == lo + k_b, et
        assert r["mean_before_milli"] == (2 * 1000 * sk_b + k_b) // (
            2 * k_b
        )
        assert r["mean_after_milli"] == (
            2 * 1000 * (s - sk_b) + (n - k_b)
        ) // (2 * (n - k_b))
        den = k_b * (n - k_b) * (n * q - s * s)
        if den == 0:
            assert r["gain_ppm"] is None
        else:
            gnum = n * num_b - k_b * (n - k_b) * s * s
            assert r["gain_ppm"] == (1_000_000 * gnum) // den
            assert 0 <= r["gain_ppm"] <= 1_000_000


def test_changepoint_is_hour_granular(spark):
    """Invariant pin: every window partitions by event_type and runs
    over the hour series, never events."""
    import re

    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(an.changepoint_binary_split(spark, SF_DIR), "simple")
    wspecs = re.findall(r"windowspecdefinition\(([^,#]*)", p)
    assert wspecs and all(k == "event_type" for k in wspecs), wspecs


# --- surprisal_filter_curve ----------------------------------------------


def test_surprisal_curve_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import ngrams as ng

    assert_frames_match(
        ng.surprisal_filter_curve(spark, SF_DIR),
        duck.execute(ng.SURPRISAL_CURVE_ORACLE),
        ctx="surprisal_filter_curve",
    )


def test_surprisal_curve_python_model(spark):
    """Replay the order statistics from doc_lm_surprisal's own
    output: per keep-%, the threshold is the smallest score value
    whose cumulative doc count reaches (N*d) div 100, kept counts
    include the whole boundary tie-group, and the curve is monotone
    in every column."""
    from mapreduceece563_spark.operators import ngrams as ng

    docs = [
        (int(round(r["avg_surprisal"] * 1_000_000)), r["n_bigrams"])
        for r in ng.doc_lm_surprisal(spark, SF_DIR).collect()
    ]
    docs.sort()
    N = len(docs)
    T = sum(m for _, m in docs)
    got = {
        r["keep_pct"]: r
        for r in ng.surprisal_filter_curve(spark, SF_DIR).collect()
    }
    expected_pcts = [
        p for p in ng.SURPRISAL_KEEP_PCTS if (N * p) // 100 >= 1
    ]
    assert sorted(got) == expected_pcts
    for pct in expected_pcts:
        rank = (N * pct) // 100
        cd = cm = 0
        i = 0
        while i < len(docs):
            v = docs[i][0]
            while i < len(docs) and docs[i][0] == v:
                cd += 1
                cm += docs[i][1]
                i += 1
            if cd >= rank:
                break
        r = got[pct]
        assert r["threshold_micro"] == v, pct
        assert (r["n_docs_kept"], r["n_bigrams_kept"]) == (cd, cm)
        assert r["mass_share_ppm"] == (cm * 1_000_000) // T
    ordered = [got[p] for p in expected_pcts]
    for col in ("threshold_micro", "n_docs_kept", "n_bigrams_kept"):
        vals = [r[col] for r in ordered]
        assert vals == sorted(vals), col


# --- minhash_perm_sensitivity ------------------------------------------


def test_perm_sweep_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import dedup as dd

    assert_frames_match(
        dd.minhash_perm_sensitivity(spark, SF_DIR),
        duck.execute(dd.MINHASH_PERM_SENSITIVITY_ORACLE),
        ctx="minhash_perm_sensitivity",
    )


def test_perm_sweep_python_model(spark):
    """Replay estimate and exact Jaccard per candidate pair in
    Python; the full 16-slot column must agree with
    minhash_jaccard_estimate's estimator, and error at k=16 is
    never above the k=4 error by more than its resolution step
    (quantization can locally invert, full dominance need not hold —
    the hash pins the exact values)."""
    from mapreduceece563_spark.operators import dedup as dd

    sig = {
        r["doc_id"]: [r[f"mh{i}"] for i in range(len(dd.MINHASH_PERMS))]
        for r in dd.minhash_signatures(spark, SF_DIR).collect()
    }
    sh: dict = {}
    for row in dd.doc_shingle_hashes(spark, SF_DIR).collect():
        sh.setdefault(row["doc_id"], set()).add(row["h0"])
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in dd.dedup_minhash(spark, SF_DIR).select(
            "doc_a", "doc_b"
        ).collect()
    ]
    got = {
        r["k"]: r
        for r in dd.minhash_perm_sensitivity(spark, SF_DIR).collect()
    }
    assert set(got) == set(dd.PERM_SWEEP)
    for k in dd.PERM_SWEEP:
        errs = []
        for a, b in pairs:
            matches = sum(
                1 for i in range(k) if sig[a][i] == sig[b][i]
            )
            est = (matches * 1_000_000) // k
            common = len(sh[a] & sh[b])
            exact = (common * 1_000_000) // (
                len(sh[a]) + len(sh[b]) - common
            )
            errs.append(abs(est - exact))
        r = got[k]
        assert r["n_pairs"] == len(errs)
        assert r["max_abs_err_ppm"] == max(errs)
        se, m = sum(errs), len(errs)
        assert r["mean_abs_err_ppm"] == (2 * se + m) // (2 * m)
        assert r["resolution_ppm"] == 1_000_000 // k


# --- empty-table behavior, all four ----------------------------------------


def test_queue_r16_on_empty_tables(spark, tmp_path):
    import duckdb
    import pyarrow.parquet as pq

    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.operators import dedup as dd
    from mapreduceece563_spark.operators import graph as gph
    from mapreduceece563_spark.operators import ngrams as ng
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
            "global_clustering_coefficient",
            gph.global_clustering_coefficient,
            gph.GLOBAL_CLUSTERING_ORACLE,
        ),
        (
            "changepoint_binary_split",
            an.changepoint_binary_split,
            an.CHANGEPOINT_SPLIT_SQL,
        ),
        (
            "surprisal_filter_curve",
            ng.surprisal_filter_curve,
            ng.SURPRISAL_CURVE_ORACLE,
        ),
        (
            "minhash_perm_sensitivity",
            dd.minhash_perm_sensitivity,
            dd.MINHASH_PERM_SENSITIVITY_ORACLE,
        ),
    ]:
        assert_frames_match(
            fn(spark, str(d)), con.execute(sql), ctx=f"empty:{name}"
        )
