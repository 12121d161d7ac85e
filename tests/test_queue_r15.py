"""Round-15 registration queue, built and oracle-tested in round 10.

Marketing attribution side-by-side (first/last/linear on identical
touch sets, exact micro-credit conservation), hour-of-day seasonality
strength (one-way-ANOVA eta^2, DECIMAL-exact), embedding anisotropy
(mean-unit-vector norm — the expected random-pair cosine), and the
near-dup cluster-size census.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_DIR, assert_frames_match


# --- attribution_model_compare -------------------------------------------


def test_attribution_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import analytics as an

    assert_frames_match(
        an.attribution_model_compare(spark, SF_DIR),
        duck.execute(an.ATTRIBUTION_COMPARE_SQL),
        ctx="attribution_model_compare",
    )


def test_attribution_python_model(spark):
    """Replay the touch sets and all three credit rules in Python;
    beyond equality, pin the conservation law: every model
    distributes exactly n_converting_purchases * 1e6 micro-credits,
    and the three models agree on total touches per position."""
    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.sources.catalog import load_table

    rows = load_table(spark, SF_DIR, "events").select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        "event_id",
        "event_type",
    ).collect()
    purchases = [
        (r["user_id"], r["us"], r["event_id"])
        for r in rows
        if r["event_type"] == "purchase"
    ]
    views: dict = {}
    for r in rows:
        if r["event_type"] == "view":
            views.setdefault(r["user_id"], []).append(
                (r["us"], r["event_id"])
            )
    win = an.ATTRIB_WINDOW_MIN * 60 * 1_000_000
    expected: dict = {}
    n_converting = 0
    for user, p_us, _pid in purchases:
        ts = sorted(
            (v_us, v_id)
            for v_us, v_id in views.get(user, [])
            if p_us - win <= v_us <= p_us
        )
        n = len(ts)
        if n == 0:
            continue
        n_converting += 1
        for pos in range(1, n + 1):
            b = min(pos, an.ATTRIB_POS_CAP)
            credits = {
                "first_touch": 1_000_000 if pos == 1 else 0,
                "last_touch": 1_000_000 if pos == n else 0,
                "linear": (1_000_000 * pos) // n
                - (1_000_000 * (pos - 1)) // n,
            }
            for m, c in credits.items():
                cnt, tot = expected.get((m, b), (0, 0))
                expected[(m, b)] = (cnt + 1, tot + c)
    got = {
        (r["model"], r["position"]): (r["n_touches"], r["credit_micro"])
        for r in an.attribution_model_compare(spark, SF_DIR).collect()
    }
    assert got == expected
    for m in ("first_touch", "last_touch", "linear"):
        total = sum(c for (mm, _), (_, c) in got.items() if mm == m)
        assert total == n_converting * 1_000_000, m


def test_attribution_window_is_per_purchase(spark):
    """Invariant pin: position windows partition by the purchase id —
    frames bounded by a purchase's touch set, never the corpus."""
    import re

    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(an.attribution_model_compare(spark, SF_DIR), "simple")
    wspecs = re.findall(r"windowspecdefinition\(([^,#]*)", p)
    assert wspecs and all(k == "p_id" for k in wspecs), wspecs


# --- seasonality_strength_by_type -----------------------------------------


def test_seasonality_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import temporal as tp

    assert_frames_match(
        tp.seasonality_strength_by_type(spark, SF_DIR),
        duck.execute(tp.SEASONALITY_STRENGTH_SQL),
        ctx="seasonality_strength_by_type",
    )


def test_seasonality_python_model(spark):
    """Exact replay of the gap-filled hour-of-day ANOVA with the
    identical per-group micro floors; eta^2 must land in [0, 1e6]."""
    from mapreduceece563_spark.operators import temporal as tp
    from mapreduceece563_spark.sources.catalog import load_table

    rows = load_table(spark, SF_DIR, "events").select(
        "event_type", F.expr("unix_micros(ts) div 3600000000").alias("h")
    ).collect()
    series: dict = {}
    for r in rows:
        series.setdefault(r["event_type"], []).append(r["h"])
    got = {
        r["event_type"]: r
        for r in tp.seasonality_strength_by_type(spark, SF_DIR).collect()
    }
    assert set(got) == set(series)
    for et, hs in series.items():
        lo, hi = min(hs), max(hs)
        counts = [0] * (hi - lo + 1)
        for h in hs:
            counts[h - lo] += 1
        groups: dict = {}
        for i, c in enumerate(counts):
            hod = (lo + i) % 24
            tg, ng = groups.get(hod, (0, 0))
            groups[hod] = (tg + c, ng + 1)
        n = len(counts)
        s = sum(counts)
        q = sum(c * c for c in counts)
        a = sum((tg * tg * 1_000_000) // ng for tg, ng in groups.values())
        r = got[et]
        assert (r["n_hours"], r["n_events"]) == (n, s)
        den = 1_000_000 * (n * q - s * s)
        if n < 2 or n * q - s * s == 0:
            assert r["eta2_ppm"] is None
        else:
            want = (1_000_000 * (n * a - 1_000_000 * s * s)) // den
            assert r["eta2_ppm"] == want, et
            assert 0 <= r["eta2_ppm"] <= 1_000_000


# --- embedding_anisotropy ---------------------------------------------------


def test_anisotropy_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import similarity as sim

    assert_frames_match(
        sim.embedding_anisotropy(spark, SF_DIR),
        duck.execute(sim.EMBEDDING_ANISOTROPY_SQL),
        ctx="embedding_anisotropy",
    )


def test_anisotropy_python_model(spark):
    """Replay normalize -> micro-quantize -> per-dim sums in Python;
    the score approximates ||mean(u)||^2 (quantization-exact match on
    the exported integers) and sits near 1/n for these near-isotropic
    synthetic embeddings (within 10x — a loose physics pin, the hash
    pins the exact value)."""
    from mapreduceece563_spark.operators import similarity as sim
    from mapreduceece563_spark.sources.catalog import load_table

    emb = [
        [float(x) for x in r["embedding"]]
        for r in load_table(spark, SF_DIR, "embeddings").collect()
    ]
    sums = None
    n = 0
    dom = None
    for v in emb:
        nrm = math.sqrt(sum(x * x for x in v))
        if nrm == 0:
            continue
        u = [int(round(x / nrm * 1_000_000)) for x in v]
        if sums is None:
            sums = [0] * len(u)
        for i, x in enumerate(u):
            sums[i] += x
        n += 1
    ss = sum(s * s for s in sums)
    want = (1_000_000 * ss) // (n * n * 10**12)
    best = max((abs(s), -d) for d, s in enumerate(sums))
    r = sim.embedding_anisotropy(spark, SF_DIR).collect()[0]
    assert r["n_vectors"] == n
    assert r["anisotropy_ppm"] == want
    assert (r["dominant_abs_sum"], r["dominant_dim"]) == (
        best[0],
        -best[1],
    )
    # near-isotropic synthetic cloud: the score should be within an
    # order of magnitude of the 1/n isotropy floor
    assert r["anisotropy_ppm"] < 10 * (1_000_000 // n + 1) * 10


def test_anisotropy_is_map_only(spark):
    from mapreduceece563_spark.operators import similarity as sim
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(sim.embedding_anisotropy(spark, SF_DIR), "simple")
    assert "Window" not in p
    assert "SortMergeJoin" not in p


# --- dedup_cluster_size_histogram -------------------------------------------


def test_cluster_sizes_match_oracle(spark, duck):
    from mapreduceece563_spark.operators import dedup as dd

    assert_frames_match(
        dd.dedup_cluster_size_histogram(spark, SF_DIR),
        duck.execute(dd.DEDUP_CLUSTER_SIZE_SQL),
        ctx="dedup_cluster_size_histogram",
    )


def test_cluster_sizes_reconcile_with_family(spark):
    """The census must add up against its siblings: total docs equal
    dedup_groups' node count, removable docs equal
    dedup_canonical_pick's total removals, every cluster has >= 2
    members."""
    from mapreduceece563_spark.operators import dedup as dd

    hist = dd.dedup_cluster_size_histogram(spark, SF_DIR).collect()
    assert all(r["cluster_size"] >= 2 for r in hist)
    assert all(
        r["n_docs"] == r["cluster_size"] * r["n_clusters"] for r in hist
    )
    n_nodes = dd.dedup_groups(spark, SF_DIR).count()
    assert sum(r["n_docs"] for r in hist) == n_nodes
    picks = dd.dedup_canonical_pick(spark, SF_DIR).collect()
    assert sum(r["n_docs_removable"] for r in hist) == sum(
        p["n_removed"] for p in picks
    )
    assert sum(r["n_clusters"] for r in hist) == len(picks)


# --- empty-table behavior, all four ----------------------------------------


def test_queue_r15_on_empty_tables(spark, tmp_path):
    import duckdb
    import pyarrow.parquet as pq

    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.operators import dedup as dd
    from mapreduceece563_spark.operators import similarity as sim
    from mapreduceece563_spark.operators import temporal as tp
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
            "attribution_model_compare",
            an.attribution_model_compare,
            an.ATTRIBUTION_COMPARE_SQL,
        ),
        (
            "seasonality_strength_by_type",
            tp.seasonality_strength_by_type,
            tp.SEASONALITY_STRENGTH_SQL,
        ),
        (
            "embedding_anisotropy",
            sim.embedding_anisotropy,
            sim.EMBEDDING_ANISOTROPY_SQL,
        ),
        (
            "dedup_cluster_size_histogram",
            dd.dedup_cluster_size_histogram,
            dd.DEDUP_CLUSTER_SIZE_SQL,
        ),
    ]:
        assert_frames_match(
            fn(spark, str(d)), con.execute(sql), ctx=f"empty:{name}"
        )
