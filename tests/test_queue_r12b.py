"""Round-12 registration queue, built and oracle-tested in round 11.

Ten operators covering classes the registry lacked — multiple-
testing control (Benjamini-Hochberg FDR over the drift family),
survival analysis (Kaplan-Meier churn curves with right-censoring),
graph core decomposition (iterative k-core peeling with the
dedup_groups convergence contract), top-weighted rank agreement
(truncated rank-biased overlap), the third privacy rung
(t-closeness via the exact ordered EMD), categorical association
effect size (Cramér's V on the densified contingency table),
heavy-tail risk (the Hill tail-index estimator), the imbalance-
honest ranking audit (tie-group average precision with the
prevalence baseline), calibration decomposition (Murphy reliability/
resolution/uncertainty), and robust trend (Theil-Sen pairwise-slope
median over the gap-filled hourly series). Each gets the driver's
oracle compare, a pure-Python model for the math the hash cannot
see, invariant plan pins, planted-fixture positive controls, and
the empty-table pin.

Registration plan (VERDICT r10 ask #6: growth stays below the
29-entry registration throughput of round 11): these ten register
in round 12, after CORRECTNESS_r11 certifies the round-11 tranche.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_DIR, assert_frames_match


# --- bh_fdr_drift_control -------------------------------------------------


def test_bh_fdr_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import analytics as an

    assert_frames_match(
        an.bh_fdr_drift_control(spark, SF_DIR),
        duck.execute(an.BH_FDR_SQL),
        ctx="bh_fdr_drift_control",
    )


def test_bh_fdr_python_model(spark):
    """Recompute the whole procedure from scratch: exact MWU rank
    sums with tie handling via Fractions, exact z^2 rationals, the
    same literal grid, and the step-up — ranks, z2_milli, and
    discovery flags must all match."""
    import duckdb

    from mapreduceece563_spark.operators import analytics as an

    rows = duckdb.connect().execute(
        f"""SELECT event_type,
                   CAST(round(value * 100, 0) AS BIGINT) AS cents,
                   CASE WHEN ts >= TIMESTAMP '{an.KS_SPLIT}'
                        THEN 1 ELSE 0 END AS is_b
            FROM '{SF_DIR}/events.parquet'"""
    ).fetchall()
    by_type: dict[str, dict[int, list[int]]] = {}
    for et, cents, is_b in rows:
        by_type.setdefault(et, {}).setdefault(cents, [0, 0])[is_b] += 1
    grid = {(m, k): t for m, k, t in an._bh_grid()}
    model = {}
    for et, hist in by_type.items():
        n_a = sum(v[0] for v in hist.values())
        n_b = sum(v[1] for v in hist.values())
        ra_x2, m_prev, t_sum = 0, 0, 0
        for cents in sorted(hist):
            da, db = hist[cents]
            c = da + db
            ra_x2 += da * (2 * m_prev + c + 1)
            t_sum += c**3 - c
            m_prev += c
        n = n_a + n_b
        u2d = ra_x2 - n_a * (n_a + 1) - n_a * n_b
        z2num = 3 * n * (n - 1) * u2d * u2d
        z2den = n_a * n_b * ((n + 1) * n * (n - 1) - t_sum)
        model[et] = (n_a, n_b, z2num, z2den)
    testable = {et: v for et, v in model.items() if v[3] > 0}
    m = len(testable)
    order = sorted(
        testable,
        key=lambda et: (
            -(1000 * testable[et][2] // testable[et][3]),
            et,
        ),
    )
    max_pass = 0
    for r, et in enumerate(order, start=1):
        _, _, z2num, z2den = testable[et]
        if 2000 * z2num >= grid[(m, r)] * z2den:
            max_pass = r
    got = {
        r["event_type"]: r.asDict()
        for r in an.bh_fdr_drift_control(spark, SF_DIR).collect()
    }
    assert set(got) == set(model)
    for r, et in enumerate(order, start=1):
        n_a, n_b, z2num, z2den = testable[et]
        g = got[et]
        assert g["m_tests"] == m
        assert g["bh_rank"] == r
        assert g["z2_milli"] == 1000 * z2num // z2den
        assert g["discovery"] == (r <= max_pass), et
    for et in set(model) - set(testable):
        assert got[et]["bh_rank"] is None
        assert got[et]["discovery"] is False


def test_bh_fdr_grid_is_monotone():
    """Step-up sanity baked into the literals: within a family size m
    the critical z^2 DECREASES with rank (later ranks are easier), and
    rank-1 thresholds grow with m (more tests -> harsher leader)."""
    from mapreduceece563_spark.operators import analytics as an

    grid = {(m, k): t for m, k, t in an._bh_grid()}
    for m in range(1, an.BH_FDR_MAX_M + 1):
        for k in range(2, m + 1):
            assert grid[(m, k)] < grid[(m, k - 1)]
    for m in range(2, an.BH_FDR_MAX_M + 1):
        assert grid[(m, 1)] > grid[(m - 1, 1)]
    # m = 1 degenerates to the single-test alpha = 0.05 critical value
    assert grid[(1, 1)] == 7683  # round(2000 * 1.959964^2)


def test_bh_fdr_positive_control(spark, tmp_path):
    """A planted shift must be discovered and an exchangeable null
    must not: two event types, one with epoch B shifted far up, one
    with A and B identical — BH flags exactly the shifted type."""
    import duckdb

    from mapreduceece563_spark.operators import analytics as an

    d = tmp_path / "bh_sf"
    d.mkdir()
    rows = []
    eid = 0
    for i in range(300):
        for ts, is_b in (("2024-01-10 00:00:00", 0), ("2024-01-20 00:00:00", 1)):
            eid += 1
            rows.append(
                ("shifted", ts, float(i % 50 + (500 if is_b else 0)), eid, f"u{i%7}")
            )
            eid += 1
            rows.append(("nullish", ts, float(i % 50), eid, f"u{i%7}"))
    spark.createDataFrame(
        rows, "event_type string, ts string, value double, event_id long, user_id string"
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(
        str(d / "events.parquet")
    )
    got = {
        r["event_type"]: r["discovery"]
        for r in an.bh_fdr_drift_control(spark, str(d)).collect()
    }
    assert got == {"shifted": True, "nullish": False}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet/*.parquet'"
    )
    assert_frames_match(
        an.bh_fdr_drift_control(spark, str(d)),
        con.execute(an.BH_FDR_SQL),
        ctx="bh_fdr_positive_control",
    )


def test_bh_fdr_plan_invariants(spark):
    """Invariant pin: the probit grid attaches by broadcast (never a
    shuffled join against the ~2k-row literal — _bh_grid() emits
    sum(1..BH_FDR_MAX_M=64) = 2080 rows), the family size rides a
    broadcast 1-row frame, and nothing cartesian-products. The heavy
    part of the plan is the mann_whitney histogram scaffold, pinned
    by that entry's own tests."""
    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(an.bh_fdr_drift_control(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p


# --- rbo_quality_length ---------------------------------------------------


def test_rbo_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import analytics as an

    assert_frames_match(
        an.rbo_quality_length(spark, SF_DIR),
        duck.execute(an.RBO_QUALITY_LENGTH_SQL),
        ctx="rbo_quality_length",
    )


def test_rbo_python_model(spark):
    """Recompute via the DIRECT depth-sum definition (sum over depths
    of c_d * |A_d ^ B_d|) — independent of the suffix-weight
    telescoping the implementation uses."""
    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.operators.textstats import quality_score
    from mapreduceece563_spark.sources.catalog import load_table

    q = {
        r["doc_id"]: round(r["quality"] * 1_000_000)
        for r in quality_score(spark, SF_DIR).collect()
    }
    meta = [
        (r["lang"], r["doc_id"], r["n_chars"])
        for r in load_table(spark, SF_DIR, "documents")
        .select("lang", "doc_id", "n_chars")
        .collect()
    ]
    suffix, max_e12 = an._rbo_weights()
    c = [
        suffix[i] - (suffix[i + 1] if i + 1 < len(suffix) else 0)
        for i in range(len(suffix))
    ]
    langs = sorted({m[0] for m in meta})
    model = {}
    for lang in langs:
        docs = [(did, q[did], nc) for lg, did, nc in meta if lg == lang]
        top_a = [
            d
            for d, _, _ in sorted(docs, key=lambda x: (-x[1], x[0]))[
                : an.RBO_K
            ]
        ]
        top_b = [
            d
            for d, _, _ in sorted(docs, key=lambda x: (-x[2], x[0]))[
                : an.RBO_K
            ]
        ]
        rbo = sum(
            c[d - 1] * len(set(top_a[:d]) & set(top_b[:d]))
            for d in range(1, an.RBO_K + 1)
        )
        model[lang] = (
            len(top_a),
            len(set(top_a) & set(top_b)),
            rbo,
            rbo * 1_000_000 // max_e12,
        )
    got = {
        r["lang"]: (r["n_top"], r["n_joint"], r["rbo_e12"], r["rbo_norm_ppm"])
        for r in an.rbo_quality_length(spark, SF_DIR).collect()
    }
    assert got == model


def test_rbo_plan_uses_window_group_limit(spark):
    """Scale pin: the rank <= 20 filters plan as WindowGroupLimit
    (per-partition bounded top-k before the exchange), and nothing
    cartesian-joins."""
    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(an.rbo_quality_length(spark, SF_DIR), "simple")
    assert "WindowGroupLimit" in p
    assert "CartesianProduct" not in p


def test_rbo_identical_lists_hit_the_ceiling():
    """Weight algebra: full agreement at every depth reaches exactly
    the literal maximum, so rbo_norm_ppm = 1e6 means identical
    top-20s by construction."""
    from mapreduceece563_spark.operators import analytics as an

    suffix, max_e12 = an._rbo_weights()
    c = [
        suffix[i] - (suffix[i + 1] if i + 1 < len(suffix) else 0)
        for i in range(len(suffix))
    ]
    assert sum(cd * d for d, cd in enumerate(c, start=1)) == max_e12
    # telescoping identity: a doc at max-rank r contributes suffix[r-1]
    assert all(
        suffix[r - 1] == sum(c[r - 1 :]) for r in range(1, an.RBO_K + 1)
    )


# --- km_survival_by_segment ----------------------------------------------


def test_km_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import lifecycle as lc

    assert_frames_match(
        lc.km_survival_by_segment(spark, SF_DIR),
        duck.execute(lc.KM_SURVIVAL_SQL),
        ctx="km_survival_by_segment",
    )


def test_km_python_model(spark):
    """Recompute the product-limit estimator directly: per segment,
    sort the (time, is_event) pairs, walk death times with the exact
    at-risk counts, quantize each ln factor to micro-nats, and check
    every probe readout (including at_risk and the counts)."""
    import datetime

    import duckdb

    from mapreduceece563_spark.operators import lifecycle as lc

    rows = duckdb.connect().execute(
        f"""SELECT c.c_mktsegment,
                   CAST(min(o.o_orderdate) AS DATE) AS first_od,
                   CAST(max(o.o_orderdate) AS DATE) AS last_od
            FROM '{SF_DIR}/orders.parquet' o
            JOIN '{SF_DIR}/customer.parquet' c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment, o.o_custkey"""
    ).fetchall()
    horizon = datetime.date.fromisoformat(lc.RFM_REF_DATE)
    by_seg: dict[str, list[tuple[int, int]]] = {}
    for seg, first, last in rows:
        churned = (horizon - last).days > lc.CHURN_WINDOW_DAYS
        t = (
            (last - first).days + lc.CHURN_WINDOW_DAYS
            if churned
            else (horizon - first).days
        )
        by_seg.setdefault(seg, []).append((t, 1 if churned else 0))
    model = {}
    for seg, pairs in by_seg.items():
        n_customers = len(pairs)
        n_churned = sum(e for _, e in pairs)
        for probe in lc.KM_PROBE_DAYS:
            log_s, zeroed = 0, False
            deaths: dict[int, int] = {}
            for t, e in pairs:
                if e:
                    deaths[t] = deaths.get(t, 0) + 1
            for t in sorted(deaths):
                if t > probe:
                    break
                n_t = sum(1 for tt, _ in pairs if tt >= t)
                d_t = deaths[t]
                if n_t == d_t:
                    zeroed = True
                    break
                log_s += round(math.log((n_t - d_t) / n_t) * 1_000_000)
            at_risk = sum(1 for tt, _ in pairs if tt >= probe)
            model[(seg, probe)] = (
                n_customers,
                n_churned,
                at_risk,
                None if zeroed else log_s,
            )
    got = {
        (r["c_mktsegment"], r["probe_days"]): (
            r["n_customers"],
            r["n_churned"],
            r["at_risk"],
            r["log_surv_micronats"],
        )
        for r in lc.km_survival_by_segment(spark, SF_DIR).collect()
    }
    assert got == model


def test_km_survival_monotone_and_bounded(spark):
    """KM invariants: log-survival is <= 0, nonincreasing in the
    probe horizon, and a probe with zero churn so far reads exactly
    0 (S = 1)."""
    from mapreduceece563_spark.operators import lifecycle as lc

    rows = lc.km_survival_by_segment(spark, SF_DIR).collect()
    by_seg: dict[str, list] = {}
    for r in rows:
        by_seg.setdefault(r["c_mktsegment"], []).append(r)
    assert by_seg, "no segments at this SF"
    for seg, rs in by_seg.items():
        rs.sort(key=lambda r: r["probe_days"])
        prev = 0
        for r in rs:
            if r["log_surv_micronats"] is None:
                continue
            assert r["log_surv_micronats"] <= 0
            assert r["log_surv_micronats"] <= prev
            prev = r["log_surv_micronats"]
            assert 0 <= r["n_churned"] <= r["n_customers"]
            assert 0 <= r["at_risk"] <= r["n_customers"]


def test_km_plan_histogram_granular(spark):
    """Invariant pin: the at-risk window partitions by segment over
    the (segment, t) cells — never a per-customer or per-order sort;
    the probe fan-out is a Generate (explode), not a join."""
    from mapreduceece563_spark.operators import lifecycle as lc
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(lc.km_survival_by_segment(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in p
    assert "Generate explode" in p


# --- kcore_decomposition --------------------------------------------------


def test_kcore_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import graph as gph

    assert_frames_match(
        gph.kcore_decomposition(spark, SF_DIR),
        duck.execute(gph.KCORE_SQL),
        ctx="kcore_decomposition",
    )


def test_kcore_python_model(spark):
    """Pure-Python peel over the same edge list: collect the
    co-occurrence arcs once, peel to fixpoint per k, compare node and
    edge counts plus the max in-core degree."""
    from mapreduceece563_spark.operators import graph as gph

    arcs = {
        (r["src"], r["dst"])
        for r in gph._cooc_edges(spark, SF_DIR).collect()
    }
    model = {}
    edges = set(arcs)
    for k in gph.KCORE_KS:
        while True:
            deg: dict[str, int] = {}
            for s, _ in edges:
                deg[s] = deg.get(s, 0) + 1
            keep = {n for n, d in deg.items() if d >= k}
            new_edges = {
                (s, d) for s, d in edges if s in keep and d in keep
            }
            if len(keep) == len(deg):
                break
            edges = new_edges
        deg = {}
        for s, _ in edges:
            deg[s] = deg.get(s, 0) + 1
        model[k] = (
            len(deg),
            len(edges) // 2,
            max(deg.values()) if deg else 0,
        )
    got = {
        r["k"]: (r["core_nodes"], r["core_edges"], r["max_core_degree"])
        for r in gph.kcore_decomposition(spark, SF_DIR).collect()
    }
    assert got == model


def test_kcore_engineered_cascade(spark, tmp_path):
    """The peel must CASCADE, not just filter once: a 6-node chain
    (dissolves at k=2 over three rounds), a 4-cycle (2-core, dies at
    k=3), a K5 clique via an Eulerian circuit (survives through
    k=4), and a pendant off the clique (dies at k=2 without taking
    the clique down). Verified against the oracle AND the known
    closed-form core sizes."""
    import duckdb

    from mapreduceece563_spark.operators import graph as gph

    d = tmp_path / "kcore_sf"
    d.mkdir()
    texts = [
        "ca cb cc cd ce cf",  # chain: peels away entirely at k=2
        "xa xb xc xd xa",  # 4-cycle: exactly a 2-core
        "qq rr ss tt uu qq ss uu rr tt qq",  # Eulerian circuit of K5
        "qq pendant",  # pendant off the clique
    ]
    spark.createDataFrame(
        [
            (i, t, "en", "fixture", len(t))
            for i, t in enumerate(texts, start=1)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(d / "documents.parquet"))
    got = {
        r["k"]: (r["core_nodes"], r["core_edges"], r["max_core_degree"])
        for r in gph.kcore_decomposition(spark, str(d)).collect()
    }
    assert got == {
        2: (9, 14, 4),  # 4-cycle + K5
        3: (5, 10, 4),  # K5 only
        4: (5, 10, 4),  # K5 is a 4-core
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    assert_frames_match(
        gph.kcore_decomposition(spark, str(d)),
        con.execute(gph.KCORE_SQL),
        ctx="kcore_engineered",
    )


def test_kcore_cores_nest(spark):
    """Nesting invariant: core sizes are nonincreasing in k on every
    axis (nodes, edges, max degree)."""
    from mapreduceece563_spark.operators import graph as gph

    rows = sorted(
        gph.kcore_decomposition(spark, SF_DIR).collect(),
        key=lambda r: r["k"],
    )
    for a, b in zip(rows, rows[1:]):
        assert b["core_nodes"] <= a["core_nodes"]
        assert b["core_edges"] <= a["core_edges"]
        assert b["max_core_degree"] <= a["max_core_degree"]


# --- empty-table behavior, all four --------------------------------------


def test_queue_r12b_on_empty_tables(spark, tmp_path):
    import duckdb
    import pyarrow.parquet as pq

    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.operators import graph as gph
    from mapreduceece563_spark.operators import lifecycle as lc
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
        ("bh_fdr_drift_control", an.bh_fdr_drift_control, an.BH_FDR_SQL),
        ("rbo_quality_length", an.rbo_quality_length, an.RBO_QUALITY_LENGTH_SQL),
        ("km_survival_by_segment", lc.km_survival_by_segment, lc.KM_SURVIVAL_SQL),
        ("kcore_decomposition", gph.kcore_decomposition, gph.KCORE_SQL),
    ]:
        assert_frames_match(
            fn(spark, str(d)), con.execute(sql), ctx=f"empty:{name}"
        )


# --- t_closeness_audit (batch 2) ------------------------------------------


def test_t_closeness_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import mining as mn

    assert_frames_match(
        mn.t_closeness_audit(spark, SF_DIR),
        duck.execute(mn.T_CLOSENESS_SQL),
        ctx="t_closeness_audit",
    )


def test_t_closeness_python_model(spark):
    """Recompute the ordered EMD from scratch: per class, walk the
    GLOBAL value spine accumulating |cumP*N - cumQ*n|, divide once —
    worst EMD, violation counts, and class counts must match."""
    import duckdb

    from mapreduceece563_spark.operators import mining as mn

    rows = duckdb.connect().execute(
        f"""SELECT event_type, hour(ts) AS h,
                   CAST(round(value, 0) AS BIGINT) AS units
            FROM '{SF_DIR}/events.parquet'"""
    ).fetchall()
    gl: dict[int, int] = {}
    cls: dict[tuple, dict[int, int]] = {}
    for et, h, c in rows:
        gl[c] = gl.get(c, 0) + 1
        cls.setdefault((et, h), {}).setdefault(c, 0)
        cls[(et, h)][c] += 1
    spine = sorted(gl)
    n_total = sum(gl.values())
    m = len(spine)
    per_type: dict[str, list[tuple[int, int]]] = {}
    for (et, h), hist in cls.items():
        n = sum(hist.values())
        cum_p = cum_q = emd = 0
        for c in spine:
            cum_p += hist.get(c, 0)
            cum_q += gl[c]
            emd += abs(cum_p * n_total - cum_q * n)
        emd_ppm = 1_000_000 * emd // (n * n_total * max(m - 1, 1))
        per_type.setdefault(et, []).append((emd_ppm, n))
    model = {
        et: (
            len(v),
            max(e for e, _ in v),
            sum(1 for e, _ in v if e > mn.T_CLOSENESS_PPM),
            sum(n for e, n in v if e > mn.T_CLOSENESS_PPM),
        )
        for et, v in per_type.items()
    }
    got = {
        r["event_type"]: (
            r["n_classes"],
            r["worst_emd_ppm"],
            r["n_violations"],
            r["n_rows_at_risk"],
        )
        for r in mn.t_closeness_audit(spark, SF_DIR).collect()
    }
    assert got == model


def test_t_closeness_planted_violation(spark, tmp_path):
    """A class whose values sit entirely in the global tail must
    violate t = 0.2; a class sampled like the global mix must not."""
    import duckdb

    from mapreduceece563_spark.operators import mining as mn

    d = tmp_path / "tc_sf"
    d.mkdir()
    rows = []
    eid = 0
    # 'mixed' class at hour 1 mirrors the global mix; 'leaky' class
    # at hour 2 is all-top-value
    for i in range(400):
        eid += 1
        rows.append(("mixed", f"2024-01-15 01:00:{i % 60:02d}", float(i % 100), eid, "u1"))
    for i in range(100):
        eid += 1
        rows.append(("leaky", f"2024-01-15 02:00:{i % 60:02d}", 99.0, eid, "u2"))
    spark.createDataFrame(
        rows,
        "event_type string, ts string, value double, event_id long, user_id string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(
        str(d / "events.parquet")
    )
    got = {
        r["event_type"]: r["n_violations"]
        for r in mn.t_closeness_audit(spark, str(d)).collect()
    }
    assert got["leaky"] == 1
    assert got["mixed"] == 0
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet/*.parquet'"
    )
    assert_frames_match(
        mn.t_closeness_audit(spark, str(d)),
        con.execute(mn.T_CLOSENESS_SQL),
        ctx="t_closeness_planted",
    )


def test_t_closeness_plan_broadcasts_classes(spark):
    """Scale pin: the |classes| x |domain| grid comes from a
    BROADCAST of the tiny class frame (never a shuffled cartesian),
    and the class histograms partial-aggregate before their
    exchange."""
    from mapreduceece563_spark.operators import mining as mn
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(mn.t_closeness_audit(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" in p


# --- cramers_v_assoc (batch 2) ---------------------------------------------


def test_cramers_v_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import mining as mn

    assert_frames_match(
        mn.cramers_v_assoc(spark, SF_DIR),
        duck.execute(mn.CRAMERS_V_SQL),
        ctx="cramers_v_assoc",
    )


def test_cramers_v_python_model(spark):
    """Recompute the densified contingency chi-square with the exact
    per-cell milli floors and both derived statistics."""
    import duckdb

    from mapreduceece563_spark.operators import mining as mn

    rows = duckdb.connect().execute(
        f"SELECT event_type, hour(ts) FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    cells: dict[tuple, int] = {}
    for et, h in rows:
        cells[(et, h)] = cells.get((et, h), 0) + 1
    types = sorted({k[0] for k in cells})
    hours = sorted({k[1] for k in cells})
    n = sum(cells.values())
    chi = 0
    for t in types:
        r = sum(v for (tt, _), v in cells.items() if tt == t)
        for h in hours:
            c = sum(v for (_, hh), v in cells.items() if hh == h)
            o = cells.get((t, h), 0)
            chi += 1000 * (n * o - r * c) ** 2 // (n * r * c)
    k = max(min(len(types), len(hours)) - 1, 1)
    v2_ppm = 1000 * chi // (n * k)
    got = mn.cramers_v_assoc(spark, SF_DIR).collect()
    assert len(got) == 1
    g = got[0]
    assert g["n_rows"] == n
    assert g["n_types"] == len(types)
    assert g["n_hours"] == len(hours)
    assert g["df"] == (len(types) - 1) * (len(hours) - 1)
    assert g["chi2_milli"] == chi
    assert g["v2_ppm"] == v2_ppm
    assert g["v_milli"] == math.floor(math.sqrt(v2_ppm))


def test_cramers_v_bounds(spark):
    """V^2 lives in [0, 1e6] ppm — a value past 1 would mean the
    cross-multiplied identity broke somewhere."""
    from mapreduceece563_spark.operators import mining as mn

    g = mn.cramers_v_assoc(spark, SF_DIR).collect()[0]
    assert 0 <= g["v2_ppm"] <= 1_000_000
    assert 0 <= g["v_milli"] <= 1_000


# --- hill_tail_index (batch 2) ---------------------------------------------


def test_hill_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import analytics as an

    assert_frames_match(
        an.hill_tail_index(spark, SF_DIR),
        duck.execute(an.HILL_TAIL_SQL),
        ctx="hill_tail_index",
    )


def test_hill_python_model(spark):
    """Recompute from the raw order statistics: top-k positive cents
    per type, micro-nat terms against the k-th value, half-up mean,
    reciprocal alpha."""
    import duckdb

    from mapreduceece563_spark.operators import analytics as an

    rows = duckdb.connect().execute(
        f"""SELECT event_type, CAST(round(value * 100, 0) AS BIGINT)
            FROM '{SF_DIR}/events.parquet'
            WHERE CAST(round(value * 100, 0) AS BIGINT) > 0"""
    ).fetchall()
    by_type: dict[str, list[int]] = {}
    for et, c in rows:
        by_type.setdefault(et, []).append(c)
    model = {}
    for et, vals in by_type.items():
        top = sorted(vals, reverse=True)[: an.HILL_K]
        k = len(top)
        x_tail = top[-1]
        if k >= 2:
            # rn < k_used excludes exactly one row; ties at the tail
            # value contribute ln(1) = 0 either way, so summing over
            # top[:-1] matches the implementation's rank cut exactly
            s = sum(
                round(math.log(x / x_tail) * 1_000_000) for x in top[:-1]
            )
            hill = (2 * s + (k - 1)) // (2 * (k - 1))
            alpha = 1_000_000_000 // hill if hill > 0 else None
        else:
            hill, alpha = None, None
        model[et] = (k, x_tail, hill, alpha)
    got = {
        r["event_type"]: (
            r["k_used"],
            r["x_tail_cents"],
            r["hill_mean_micronats"],
            r["alpha_milli"],
        )
        for r in an.hill_tail_index(spark, SF_DIR).collect()
    }
    assert got == model


def test_hill_plan_uses_window_group_limit(spark):
    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(an.hill_tail_index(spark, SF_DIR), "simple")
    assert "WindowGroupLimit" in p
    assert "CartesianProduct" not in p


def test_hill_planted_pareto(spark, tmp_path):
    """A planted exact Pareto(alpha=2) tail must read back alpha ~ 2:
    with x_i = x_tail * (k/i)^(1/2) for i = 1..k the Hill mean is
    (1/(k-1)) sum ln(x_i/x_k) = mean of ln(k/i)/2 — computable in
    closed form, and the operator must land within quantization of
    it."""
    import duckdb

    from mapreduceece563_spark.operators import analytics as an

    k = an.HILL_K
    d = tmp_path / "hill_sf"
    d.mkdir()
    rows = []
    for i in range(1, k + 1):
        cents = round(10000.0 * (k / i) ** 0.5)
        rows.append(
            ("pareto", "2024-01-15 00:00:00", cents / 100.0, i, "u1")
        )
    spark.createDataFrame(
        rows,
        "event_type string, ts string, value double, event_id long, user_id string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(
        str(d / "events.parquet")
    )
    got = an.hill_tail_index(spark, str(d)).collect()[0]
    assert got["k_used"] == k
    expected = sum(
        round(
            math.log(round(10000.0 * (k / i) ** 0.5) / 10000.0) * 1_000_000
        )
        for i in range(1, k)
    )
    expected_mean = (2 * expected + (k - 1)) // (2 * (k - 1))
    assert got["hill_mean_micronats"] == expected_mean
    # alpha = 1/hill_mean ~ 2.0 up to the integer-rounding of the
    # planted values
    assert 1900 <= got["alpha_milli"] <= 2100
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet/*.parquet'"
    )
    assert_frames_match(
        an.hill_tail_index(spark, str(d)),
        con.execute(an.HILL_TAIL_SQL),
        ctx="hill_planted",
    )


# --- empty-table behavior, batch 2 ----------------------------------------


def test_queue_r12b_batch2_on_empty_tables(spark, tmp_path):
    import duckdb
    import pyarrow.parquet as pq

    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.operators import mining as mn
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
        ("t_closeness_audit", mn.t_closeness_audit, mn.T_CLOSENESS_SQL),
        ("cramers_v_assoc", mn.cramers_v_assoc, mn.CRAMERS_V_SQL),
        ("hill_tail_index", an.hill_tail_index, an.HILL_TAIL_SQL),
    ]:
        assert_frames_match(
            fn(spark, str(d)), con.execute(sql), ctx=f"empty:{name}"
        )


# --- pr_auc_by_lang (batch 3) ----------------------------------------------


def test_pr_auc_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import analytics as an

    assert_frames_match(
        an.pr_auc_by_lang(spark, SF_DIR),
        duck.execute(an.PR_AUC_SQL),
        ctx="pr_auc_by_lang",
    )


def test_pr_auc_python_model(spark):
    """Recompute the tie-group step AP directly: sort distinct score
    values descending, walk thresholds accumulating TP/PP, apply the
    identical per-term floor."""
    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.operators.textstats import quality_score
    from mapreduceece563_spark.sources.catalog import load_table

    q = {
        r["doc_id"]: round(r["quality"] * 1_000_000)
        for r in quality_score(spark, SF_DIR).collect()
    }
    meta = [
        (r["lang"], r["doc_id"], r["source"])
        for r in load_table(spark, SF_DIR, "documents")
        .select("lang", "doc_id", "source")
        .collect()
    ]
    curated = set(an.AUC_CURATED_SOURCES)
    model = {}
    for lang in sorted({m[0] for m in meta}):
        hist: dict[int, list[int]] = {}
        for lg, did, src in meta:
            if lg != lang:
                continue
            cell = hist.setdefault(q[did], [0, 0])
            cell[0 if src in curated else 1] += 1
        n_pos = sum(p for p, _ in hist.values())
        n_neg = sum(n for _, n in hist.values())
        tp = pp = ap_sum = 0
        for qp in sorted(hist, reverse=True):
            p, n = hist[qp]
            tp += p
            pp += p + n
            ap_sum += 1_000_000 * p * tp // pp
        model[lang] = (
            n_pos,
            n_neg,
            ap_sum // n_pos if n_pos else None,
            1_000_000 * n_pos // (n_pos + n_neg),
        )
    got = {
        r["lang"]: (r["n_pos"], r["n_neg"], r["ap_ppm"], r["prevalence_ppm"])
        for r in an.pr_auc_by_lang(spark, SF_DIR).collect()
    }
    assert got == model


def test_pr_auc_beats_prevalence_iff_score_ranks(spark):
    """Sanity: AP is bounded by [~prevalence, 1e6]; a score with any
    positive signal sits at or above the random baseline up to
    quantization."""
    from mapreduceece563_spark.operators import analytics as an

    for r in an.pr_auc_by_lang(spark, SF_DIR).collect():
        if r["ap_ppm"] is None:
            continue
        assert 0 < r["ap_ppm"] <= 1_000_000
        # AP of a random ranker concentrates at prevalence; allow the
        # tie-group floors a small slack below it
        assert r["ap_ppm"] >= r["prevalence_ppm"] - 50_000


# --- brier_decomposition (batch 3) ------------------------------------------


def test_brier_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import analytics as an

    assert_frames_match(
        an.brier_decomposition(spark, SF_DIR),
        duck.execute(an.BRIER_DECOMP_SQL),
        ctx="brier_decomposition",
    )


def test_brier_python_model(spark):
    """Recompute all four Murphy quantities with the identical
    integer floors from the raw (score, label) pairs."""
    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.operators.textstats import quality_score
    from mapreduceece563_spark.sources.catalog import load_table

    q = {
        r["doc_id"]: round(r["quality"] * 1_000_000)
        for r in quality_score(spark, SF_DIR).collect()
    }
    meta = [
        (r["lang"], r["doc_id"], r["source"])
        for r in load_table(spark, SF_DIR, "documents")
        .select("lang", "doc_id", "source")
        .collect()
    ]
    curated = set(an.AUC_CURATED_SOURCES)
    model = {}
    for lang in sorted({m[0] for m in meta}):
        pairs = [
            (q[did], 1 if src in curated else 0)
            for lg, did, src in meta
            if lg == lang
        ]
        n = len(pairs)
        o = sum(y for _, y in pairs)
        bsum = sum((qp - 1_000_000 * y) ** 2 for qp, y in pairs)
        bins: dict[int, list[int]] = {}
        for qp, y in pairs:
            b = min(qp // 100_000, an.ECE_BINS - 1)
            cell = bins.setdefault(b, [0, 0, 0])
            cell[0] += 1
            cell[1] += y
            cell[2] += qp
        rel = sum(
            (sb - 1_000_000 * ob) ** 2 // nb for nb, ob, sb in bins.values()
        )
        res = sum(
            (ob * n - o * nb) ** 2 // nb for nb, ob, sb in bins.values()
        )
        model[lang] = (
            n,
            o,
            bsum // n,
            rel // n,
            10**12 * res // (n**3),
            10**12 * o * (n - o) // (n**2),
        )
    got = {
        r["lang"]: (
            r["n_docs"],
            r["n_pos"],
            r["brier_e12"],
            r["reliability_e12"],
            r["resolution_e12"],
            r["uncertainty_e12"],
        )
        for r in an.brier_decomposition(spark, SF_DIR).collect()
    }
    assert got == model


def test_brier_identity_within_binning_residual(spark):
    """Murphy identity sanity: brier ~ reliability - resolution +
    uncertainty, with the gap bounded by the within-bin variance the
    10-bin coarsening leaves behind (loose 10% of uncertainty here —
    a sign error or unit mixup would blow far past it)."""
    from mapreduceece563_spark.operators import analytics as an

    for r in an.brier_decomposition(spark, SF_DIR).collect():
        lhs = r["brier_e12"]
        rhs = (
            r["reliability_e12"]
            - r["resolution_e12"]
            + r["uncertainty_e12"]
        )
        assert abs(lhs - rhs) <= max(r["uncertainty_e12"] // 10, 10**10)


# --- theil_sen_hourly_trend (batch 3) ---------------------------------------


def test_theil_sen_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import temporal as tp

    assert_frames_match(
        tp.theil_sen_hourly_trend(spark, SF_DIR),
        duck.execute(tp.THEIL_SEN_SQL),
        ctx="theil_sen_hourly_trend",
    )


def test_theil_sen_python_model(spark):
    """Recompute the pairwise-slope lower median from the gap-filled
    series with pure-Python floor division (matching the shifted
    quotient exactly)."""
    import duckdb

    from mapreduceece563_spark.operators import temporal as tp

    rows = duckdb.connect().execute(
        f"""SELECT event_type, epoch_us(ts) // 3600000000 AS h
            FROM '{SF_DIR}/events.parquet'"""
    ).fetchall()
    counts: dict[str, dict[int, int]] = {}
    for et, h in rows:
        counts.setdefault(et, {}).setdefault(h, 0)
        counts[et][h] += 1
    series = {
        et: [
            hist.get(h, 0)
            for h in range(min(hist), max(hist) + 1)
        ]
        for et, hist in counts.items()
    }
    model = {}
    for et, ys in series.items():
        n = len(ys)
        slopes = []
        for i in range(n):
            for j in range(i + 1, n):
                # python // floors, matching the shifted div exactly
                slopes.append(1_000_000 * (ys[j] - ys[i]) // (j - i))
        slopes.sort()
        n_pairs = len(slopes)
        med = None
        if n_pairs:
            med = slopes[(n_pairs - 1) // 2]  # lower median (2*cum>=n)
        model[et] = (n, n_pairs, med)
    got = {
        r["event_type"]: (
            r["n_hours"],
            r["n_pairs"],
            r["slope_micro_per_hour"],
        )
        for r in tp.theil_sen_hourly_trend(spark, SF_DIR).collect()
    }
    assert got == model


def test_theil_sen_planted_trend_is_robust(spark, tmp_path):
    """A clean +2/hour ramp with a single massive outlier hour must
    still read ~2e6 micro/hour (OLS would be dragged far off) — the
    robustness that justifies the estimator; negative-trend fixture
    pins the floor-division sign handling."""
    import duckdb

    from mapreduceece563_spark.operators import temporal as tp

    d = tmp_path / "ts_sf"
    d.mkdir()
    rows = []
    eid = 0
    for h in range(48):
        n_up = 10 + 2 * h + (5000 if h == 24 else 0)
        for _ in range(n_up):
            eid += 1
            rows.append(
                ("ramp_up", f"2024-01-0{1 + h // 24} {h % 24:02d}:30:00", 1.0, eid, "u1")
            )
        n_dn = 150 - 3 * h
        for _ in range(n_dn):
            eid += 1
            rows.append(
                ("ramp_dn", f"2024-01-0{1 + h // 24} {h % 24:02d}:30:00", 1.0, eid, "u1")
            )
    spark.createDataFrame(
        rows,
        "event_type string, ts string, value double, event_id long, user_id string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(
        str(d / "events.parquet")
    )
    got = {
        r["event_type"]: r["slope_micro_per_hour"]
        for r in tp.theil_sen_hourly_trend(spark, str(d)).collect()
    }
    assert got["ramp_up"] == 2_000_000, got
    assert got["ramp_dn"] == -3_000_000, got
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet/*.parquet'"
    )
    assert_frames_match(
        tp.theil_sen_hourly_trend(spark, str(d)),
        con.execute(tp.THEIL_SEN_SQL),
        ctx="theil_sen_planted",
    )


# --- empty-table behavior, batch 3 ------------------------------------------


def test_queue_r12b_batch3_on_empty_tables(spark, tmp_path):
    import duckdb
    import pyarrow.parquet as pq

    from mapreduceece563_spark.operators import analytics as an
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
        ("pr_auc_by_lang", an.pr_auc_by_lang, an.PR_AUC_SQL),
        ("brier_decomposition", an.brier_decomposition, an.BRIER_DECOMP_SQL),
        ("theil_sen_hourly_trend", tp.theil_sen_hourly_trend, tp.THEIL_SEN_SQL),
    ]:
        assert_frames_match(
            fn(spark, str(d)), con.execute(sql), ctx=f"empty:{name}"
        )
