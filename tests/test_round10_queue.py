"""Round-10 queue: implemented + oracle-tested ahead of registration
(the round-7/8/9-queue precedent — the round-9 debt ceiling covers the
4 round-9 registrations and moves down only, so these wait for the
round-10 window).

Each entry gets the same oracle compare the driver will run, plus the
invariants the hash check cannot see (pure-Python models for all
four — the SRP sign algebra, the per-domain top-k selection, the
prefix-extremum CUSUM, and the temperature-mixture quantization).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR, assert_frames_match


def test_srp_signature_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import similarity as sim

    assert_frames_match(
        sim.srp_signature(spark, SF_DIR),
        duck.execute(sim.SRP_SIGNATURE_SQL),
        ctx="srp_signature",
    )


def test_srp_signature_python_model(spark):
    """Recompute every signature from the raw embeddings in pure
    Python (same ppm quantization, same LCG hyperplanes) — bit-exact
    equality, plus popcount consistency and duplicate-vector
    collision (identical vectors MUST collide; that is the point of
    the fingerprint)."""
    from mapreduceece563_spark.operators import similarity as sim
    from mapreduceece563_spark.sources.catalog import load_table

    emb = {
        r["vec_id"]: [round(x * 1_000_000) for x in r["embedding"]]
        for r in load_table(spark, SF_DIR, "embeddings").collect()
    }
    planes = [sim._srp_signs(j) for j in range(sim.SRP_BITS)]

    def sig_of(v):
        s = 0
        for j, plane in enumerate(planes):
            dot = sum(a * b for a, b in zip(v, plane))
            if dot >= 0:
                s |= 1 << j
        return s

    got = {
        r["vec_id"]: (r["srp_sig"], r["n_pos_bits"])
        for r in sim.srp_signature(spark, SF_DIR).collect()
    }
    assert set(got) == set(emb)
    for vid, v in emb.items():
        s = sig_of(v)
        assert got[vid] == (s, bin(s).count("1")), vid
    # identical vectors collide
    by_vec: dict = {}
    for vid, v in emb.items():
        by_vec.setdefault(tuple(v), []).append(vid)
    for vids in by_vec.values():
        assert len({got[v][0] for v in vids}) == 1
    # hyperplanes are reasonably balanced: signatures occupy more than
    # one bucket and not every bit is constant across the corpus
    sigs = {s for s, _ in got.values()}
    assert len(sigs) > 1
    varying_bits = sum(
        1
        for j in range(sim.SRP_BITS)
        if len({(s >> j) & 1 for s, _ in got.values()}) == 2
    )
    assert varying_bits >= sim.SRP_BITS // 2, varying_bits


def test_srp_signature_is_map_only(spark):
    """The signature pass must be a pure map — zero exchanges, zero
    joins (the 100 TB posture claim in the docstring, pinned)."""
    from mapreduceece563_spark.operators import similarity as sim
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(sim.srp_signature(spark, SF_DIR), "simple")
    assert "Exchange hashpartitioning" not in p
    assert "Join" not in p
    assert "SortAggregate" not in p and "HashAggregate" not in p


def test_domain_cap_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import corpus as cp

    assert_frames_match(
        cp.domain_cap_survivors(spark, SF_DIR),
        duck.execute(cp.DOMAIN_CAP_SQL),
        ctx="domain_cap_survivors",
    )


def test_domain_cap_python_model(spark):
    """Per-domain accounting against a pure-Python top-k model over
    the op's own quality scores: kept = min(n, CAP), kept+dropped = n,
    and kept_chars equals the char mass of exactly the top-CAP docs
    under (quality ppm DESC, doc_id ASC)."""
    from mapreduceece563_spark.operators import corpus as cp
    from mapreduceece563_spark.operators.textstats import quality_score
    from mapreduceece563_spark.sources.catalog import load_table

    q = {
        r["doc_id"]: round(r["quality"] * 1_000_000)
        for r in quality_score(spark, SF_DIR).collect()
    }
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "n_chars"
    ).collect()
    by_dom: dict = {}
    for r in docs:
        by_dom.setdefault(r["source"] + ".example.com", []).append(
            (-q[r["doc_id"]], r["doc_id"], r["n_chars"])
        )
    got = {r["domain"]: r for r in cp.domain_cap_survivors(spark, SF_DIR).collect()}
    assert set(got) == set(by_dom)
    for dom, rows in by_dom.items():
        rows.sort()
        kept = rows[: cp.DOMAIN_DOC_CAP]
        g = got[dom]
        assert g["n_docs"] == len(rows)
        assert g["n_kept"] == min(len(rows), cp.DOMAIN_DOC_CAP)
        assert g["n_kept"] + g["n_dropped"] == g["n_docs"]
        assert g["kept_chars"] == sum(c for _, _, c in kept)


def test_domain_cap_plan_uses_window_group_limit(spark):
    """The bounded-k selection must plan as WindowGroupLimit (map-side
    per-partition top-k BEFORE the domain exchange) — the invariant
    that makes a per-doc window legal at 100 TB."""
    from mapreduceece563_spark.operators import corpus as cp
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(cp.domain_cap_survivors(spark, SF_DIR), "simple")
    assert "WindowGroupLimit" in p
    assert "windowspecdefinition(domain" in p or "Window [row_number" in p


def test_round10_queue_on_empty_tables(spark, tmp_path):
    """Both queue ops must agree with their oracles on EMPTY tables."""
    import duckdb
    import pyarrow.parquet as pq

    from mapreduceece563_spark.operators import corpus as cp
    from mapreduceece563_spark.operators import similarity as sim
    from mapreduceece563_spark.sources.catalog import TABLES

    d = tmp_path / "empty_sf"
    d.mkdir()
    for t in TABLES:
        schema = pq.read_schema(f"{SF_DIR}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")

    assert_frames_match(
        sim.srp_signature(spark, str(d)),
        con.execute(sim.SRP_SIGNATURE_SQL),
        ctx="empty:srp_signature",
    )
    assert_frames_match(
        cp.domain_cap_survivors(spark, str(d)),
        con.execute(cp.DOMAIN_CAP_SQL),
        ctx="empty:domain_cap_survivors",
    )
    con.close()


def test_cusum_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import analytics as an

    assert_frames_match(
        an.cusum_drift_scan(spark, SF_DIR),
        duck.execute(an.CUSUM_DRIFT_SQL),
        ctx="cusum_drift_scan",
    )


def test_cusum_python_model(spark):
    """Replicate the prefix-extremum CUSUM in pure Python from the raw
    events: identical sup S+ / sup S- / first-peak timestamp, plus the
    telescoping invariant P_n == 0 (the n-scaled deviations sum to
    zero by construction)."""
    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.sources.catalog import load_table
    from pyspark.sql import functions as F2

    ev = (
        load_table(spark, SF_DIR, "events")
        .select(
            "event_type",
            "event_id",
            F2.unix_micros("ts").alias("ts_us"),
            F2.round(F2.col("value") * 100, 0).cast("long").alias("cents"),
        )
        .collect()
    )
    by_type: dict = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append(
            (r["ts_us"], r["event_id"], r["cents"])
        )
    got = {r["event_type"]: r for r in an.cusum_drift_scan(spark, SF_DIR).collect()}
    assert set(got) == set(by_type)
    for et, rows in by_type.items():
        rows.sort()
        n = len(rows)
        tot = sum(c for _, _, c in rows)
        p = 0
        run_min = run_max = 0
        best_up = best_dn = 0
        peak_ts = None
        for ts, _eid, c in rows:
            p += n * c - tot
            run_min = min(run_min, p)
            run_max = max(run_max, p)
            s_up = p - min(0, run_min)
            s_dn = max(0, run_max) - p
            if s_up > best_up:
                best_up, peak_ts = s_up, ts
            if peak_ts is None:
                peak_ts = ts  # all-zero path: first row is the peak
            best_dn = max(best_dn, s_dn)
        assert p == 0, "n-scaled deviations must telescope to zero"
        g = got[et]
        assert (g["n"], g["cusum_up_max"], g["cusum_down_max"]) == (
            n, best_up, best_dn,
        )
        assert g["peak_ts_us"] == peak_ts


def test_cusum_plan_partitions_by_type_only(spark):
    """All windows must partition by event_type (parallel strata) —
    no global single-partition window."""
    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(an.cusum_drift_scan(spark, SF_DIR), "simple")
    assert "windowspecdefinition(event_type" in p
    # every Window node carries the event_type partition key
    for frag in p.split("windowspecdefinition(")[1:]:
        assert frag.startswith("event_type"), frag[:60]


def test_temperature_mixture_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import trainprep as tr

    assert_frames_match(
        tr.temperature_mixture_weights(spark, SF_DIR),
        duck.execute(tr.TEMPERATURE_MIXTURE_SQL),
        ctx="temperature_mixture_weights",
    )


def test_temperature_mixture_model_and_invariants(spark):
    """Python model over the op's own token counts (half-up micro
    quantization of the IEEE sqrt), plus the mixture laws: weights sum
    to ~1e6 (floor loss < |sources| ppm), below-natural-share sources
    are boosted (>1000 milli) and above-share damped (<1000), and
    temperature preserves the share ORDER while compressing its
    range."""
    import math

    from mapreduceece563_spark.operators import trainprep as tr

    rows = tr.temperature_mixture_weights(spark, SF_DIR).collect()
    tot = sum(r["n_tokens"] for r in rows)
    quanta = {
        r["source"]: math.floor(
            math.sqrt(r["n_tokens"] / tot) * 1_000_000 + 0.5
        )
        for r in rows
    }
    snorm = sum(quanta.values())
    for r in rows:
        s = quanta[r["source"]]
        assert r["temp_weight_ppm"] == s * 1_000_000 // snorm
        assert r["boost_milli"] == (s * 1_000_000 // snorm) * tot // (
            1000 * r["n_tokens"]
        )
        assert r["tok_share_ppm"] == r["n_tokens"] * 1_000_000 // tot
    wsum = sum(r["temp_weight_ppm"] for r in rows)
    assert 1_000_000 - len(rows) <= wsum <= 1_000_000
    mean_share = 1_000_000 / len(rows)
    for r in rows:
        if r["tok_share_ppm"] < mean_share * 0.8:
            assert r["boost_milli"] > 1000, r
        if r["tok_share_ppm"] > mean_share * 1.2:
            assert r["boost_milli"] < 1000, r
    by_share = sorted(rows, key=lambda r: (r["tok_share_ppm"], r["source"]))
    weights = [r["temp_weight_ppm"] for r in by_share]
    assert weights == sorted(weights), "temperature must preserve order"
    shares = [r["tok_share_ppm"] for r in by_share]
    assert (weights[-1] - weights[0]) < (shares[-1] - shares[0]), (
        "temperature must compress the spread"
    )


def test_round10_queue_batch2_on_empty_tables(spark, tmp_path):
    import duckdb
    import pyarrow.parquet as pq

    from mapreduceece563_spark.operators import analytics as an
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

    assert_frames_match(
        an.cusum_drift_scan(spark, str(d)),
        con.execute(an.CUSUM_DRIFT_SQL),
        ctx="empty:cusum_drift_scan",
    )
    assert_frames_match(
        tr.temperature_mixture_weights(spark, str(d)),
        con.execute(tr.TEMPERATURE_MIXTURE_SQL),
        ctx="empty:temperature_mixture_weights",
    )
    con.close()


def test_cusum_finds_injected_changepoint(spark, tmp_path):
    """Semantic ground truth (the model test replicates the algebra;
    this pins that the algebra DETECTS): inject a mean PULSE at a
    known window — the upward CUSUM's cumulative excess over the
    global mean grows through the pulse and decays after it, so the
    statistic must peak exactly at the pulse's last elevated event;
    a flat control stream must report both sups exactly zero."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from mapreduceece563_spark.operators import analytics as an

    base = 1_700_000_000_000_000  # epoch us
    rows = []
    eid = 0
    # flat type: constant value
    for t in range(200):
        rows.append((eid, base + t * 1_000_000, 1, "flat", 10.0)); eid += 1
    # pulsed type: 10.0 until t=99, 30.0 for t in [100, 149], 10.0 after
    for t in range(200):
        v = 30.0 if 100 <= t < 150 else 10.0
        rows.append((eid, base + t * 1_000_000, 1, "pulsed", v)); eid += 1
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows)),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    got = {
        r["event_type"]: r
        for r in an.cusum_drift_scan(spark, str(tmp_path)).collect()
    }
    # flat stream: every deviation is zero -> both sups are exactly 0
    assert got["flat"]["cusum_up_max"] == 0
    assert got["flat"]["cusum_down_max"] == 0
    # pulsed stream: upward CUSUM peaks at the pulse's LAST elevated
    # event (t=149) — cumulative excess over the global mean grows
    # through the pulse and decays after it
    assert got["pulsed"]["peak_ts_us"] == base + 149 * 1_000_000
    assert got["pulsed"]["cusum_up_max"] > 0
