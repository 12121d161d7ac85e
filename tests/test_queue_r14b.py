"""Round-14 registration queue, built and oracle-tested in round 13.

Ten operators: two-stage rerank retrieval (IVF probe -> int8 scan ->
fp64 rerank, the cross-encoder serving funnel), 2-D projection
neighborhood-preservation audit (overlap@k vs the full cosine space),
label-centroid margin audit (nearest-other-centroid mislabel signal),
streaming late-data/out-of-order watermark stress (the one entry that
makes the watermark actually DROP rows, against an empirically pinned
drop rule), batch-padding waste curve (the padded-batching complement
of pack_len_sensitivity), hourly burstiness (Fano factor on the
gap-filled spine), classical monthly seasonal decomposition
(trend/seasonal/residual, int-exact x24 scaling), parquet row-group
sizing advisor, multi-touch purchase attribution (first/last/linear
credit), and a broadcast-threshold join-strategy advisor. Each gets
the driver's oracle compare, model/invariant checks, plan pins where
the plan is the point, and the empty-table pin.

Registration plan (queue growth <= ~10/round): these ten register in
round 14, after CORRECTNESS_r13 certifies the round-13 queue.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_DIR, assert_frames_match


def _duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


# --- rerank_two_stage --------------------------------------------------------


def test_rerank_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import similarity as sim

    assert_frames_match(
        sim.rerank_two_stage(spark, SF_DIR),
        duck.execute(sim.RERANK_TWO_STAGE_SQL),
        ctx="rerank_two_stage",
    )


def test_rerank_funnel_invariants(spark):
    """Shape contracts: RERANK_K rows per query; final ranks are
    1..K; every exported row came through stage 1 (stage1_rank <=
    CAND_K); cosine non-increasing in final_rank per query."""
    from mapreduceece563_spark.operators import similarity as sim

    rows = sim.rerank_two_stage(spark, SF_DIR).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) == sim.N_QUERIES
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["final_rank"])
        assert [r["final_rank"] for r in rs] == list(
            range(1, sim.RERANK_K + 1)
        )
        for r in rs:
            assert 1 <= r["stage1_rank"] <= sim.RERANK_CAND_K
        cosines = [r["cosine"] for r in rs]
        assert cosines == sorted(cosines, reverse=True), q


def test_rerank_recall_vs_exact(spark):
    """The funnel's recall against the exact top-k is exactly the
    in_exact_topk markers; recompute the exact top-k with the
    already-tested knn_brute_force contract (TOP_K == RERANK_K) and
    cross-check the markers."""
    from mapreduceece563_spark.operators import similarity as sim

    assert sim.TOP_K == sim.RERANK_K
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.knn_brute_force(spark, SF_DIR).collect()
    }
    for r in sim.rerank_two_stage(spark, SF_DIR).collect():
        assert r["in_exact_topk"] == (
            (r["query_id"], r["neighbor_id"]) in exact
        ), r


# --- projection_neighborhood_audit -------------------------------------------


def test_projection_audit_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import similarity as sim

    assert_frames_match(
        sim.projection_neighborhood_audit(spark, SF_DIR),
        duck.execute(sim.PROJECTION_NEIGHBORHOOD_SQL),
        ctx="projection_neighborhood_audit",
    )


def test_projection_audit_python_model(spark):
    """Recompute overlap@k in numpy from the raw vectors: full-space
    cosine kNN vs dims-(1,2) squared-L2 kNN on micro ints, same
    tiebreaks."""
    import numpy as np

    from mapreduceece563_spark.operators import similarity as sim
    from mapreduceece563_spark.sources.catalog import load_table

    rows = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    ids = sorted(vecs)
    K, NQ = sim.PRESERVE_K, sim.PRESERVE_QUERIES

    def topk_full(q):
        qs = vecs[q]
        scored = []
        for c in ids:
            if c == q:
                continue
            cs = vecs[c]
            cos = float(qs @ cs) / (
                math.sqrt(float(qs @ qs)) * math.sqrt(float(cs @ cs))
            )
            scored.append((-cos, c))
        scored.sort()
        return {c for _, c in scored[:K]}

    def topk_proj(q):
        d0, d1 = (d - 1 for d in sim.PRESERVE_DIMS)
        qp = [round(vecs[q][d0] * 1e6), round(vecs[q][d1] * 1e6)]
        scored = []
        for c in ids:
            if c == q:
                continue
            cp = [round(vecs[c][d0] * 1e6), round(vecs[c][d1] * 1e6)]
            d2 = (qp[0] - cp[0]) ** 2 + (qp[1] - cp[1]) ** 2
            scored.append((d2, c))
        scored.sort()
        return {c for _, c in scored[:K]}

    want = {
        q: len(topk_full(q) & topk_proj(q)) for q in ids if q < NQ
    }
    got = {
        r["query_id"]: r["overlap_at_k"]
        for r in sim.projection_neighborhood_audit(spark, SF_DIR).collect()
    }
    assert got == want


# --- label_centroid_margin ---------------------------------------------------


def test_margin_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import similarity as sim

    assert_frames_match(
        sim.label_centroid_margin(spark, SF_DIR),
        duck.execute(sim.LABEL_CENTROID_MARGIN_SQL),
        ctx="label_centroid_margin",
    )


def test_margin_python_model(spark):
    """Full python recompute: micro quantization, floored shifted
    centroid means, int squared-L2, margin rollup."""
    from collections import defaultdict

    from mapreduceece563_spark.operators import similarity as sim
    from mapreduceece563_spark.sources.catalog import load_table

    rows = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    micro = {
        r["vec_id"]: (
            r["label"],
            [round(float(x) * sim.MARGIN_MICRO) for x in r["embedding"]],
        )
        for r in rows
    }
    sums: dict[int, list[int]] = defaultdict(lambda: [0] * 64)
    ns: dict[int, int] = defaultdict(int)
    for lbl, mv in micro.values():
        ns[lbl] += 1
        for i, x in enumerate(mv):
            sums[lbl][i] += x
    cent = {
        lbl: [
            (s + sim.MARGIN_SHIFT * ns[lbl]) // ns[lbl] - sim.MARGIN_SHIFT
            for s in sums[lbl]
        ]
        for lbl in ns
    }
    agg: dict[int, list[int]] = {}
    for lbl, mv in micro.values():
        dists = {
            cl: sum((a - b) * (a - b) for a, b in zip(mv, cv))
            for cl, cv in cent.items()
        }
        own = dists[lbl]
        other = min(d for cl, d in dists.items() if cl != lbl)
        margin = other - own
        st = agg.setdefault(lbl, [0, 0, None])
        st[0] += 1
        st[1] += 1 if margin < 0 else 0
        st[2] = margin if st[2] is None else min(st[2], margin)
    got = {
        r["label"]: (r["n_vecs"], r["n_misfit"], r["worst_margin"])
        for r in sim.label_centroid_margin(spark, SF_DIR).collect()
    }
    want = {lbl: (v[0], v[1], v[2]) for lbl, v in agg.items()}
    assert got == want


# --- streaming_late_data_audit -----------------------------------------------


def test_late_data_audit_matches_oracle(spark, duck):
    from mapreduceece563_spark.streaming import late_stream as ls

    assert_frames_match(
        ls.streaming_late_data_audit(spark, SF_DIR),
        duck.execute(ls.LATE_DATA_AUDIT_SQL),
        ctx="streaming_late_data_audit",
    )


def test_late_data_audit_actually_drops(spark, duck):
    """The stress must stress: the accepted census is strictly
    smaller than the raw per-hour census (rows were dropped by the
    watermark), and the dropped mass sits exactly in the
    displaced chunks' time ranges."""
    from mapreduceece563_spark.streaming import late_stream as ls

    accepted = sum(
        r["n_events"]
        for r in ls.streaming_late_data_audit(spark, SF_DIR).collect()
    )
    total = duck.execute("SELECT count(*) FROM events").fetchone()[0]
    assert 0 < accepted < total


def test_late_rule_pinned(spark, tmp_path):
    """The crafted 3-batch fixture that separates the candidate drop
    rules (and the watermark's batch lag):

      batch 0: one row 10:30  -> sets the future watermark 08:30
      batch 1: one row 23:30  -> would set 21:30 — but with the
               one-extra-batch lag it must NOT affect batch 2
      batch 2: 07:50 (window end 08:00 <= 08:30: DROPPED),
               08:10 (ts < 08:30 but window end 09:00 > 08:30: KEPT
               — separates the window-end rule from the event-time
               rule), 08:40 (KEPT)

    Expected accepted census: {10:00: 1, 23:00: 1, 08:00: 2}. If
    Spark's semantics move (rule or lag), this pin and the oracle
    fail together, pointing at the engine, not the fixture."""
    import os

    from pyspark.sql import Window

    from mapreduceece563_spark.streaming.wordcount_stream import ReplayOrder

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    os.makedirs(src)
    os.makedirs(sink)
    order = ReplayOrder(src)
    batches = [
        ["2024-01-05 10:30:00"],
        ["2024-01-05 23:30:00"],
        ["2024-01-05 07:50:00", "2024-01-05 08:10:00", "2024-01-05 08:40:00"],
    ]
    for rows in batches:
        (
            spark.createDataFrame(
                [(t, "A") for t in rows], "ts STRING, event_type STRING"
            )
            .select(F.col("ts").cast("timestamp").alias("ts"), "event_type")
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
        order.mark(src)
    stream = (
        spark.readStream.schema("ts TIMESTAMP, event_type STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n_events"))
    )

    def sink_fn(df, bid):
        df.select(
            F.col("window.start").alias("hour"), "event_type", "n_events"
        ).write.mode("overwrite").parquet(
            os.path.join(sink, f"batch_id={bid}")
        )

    q = (
        agg.writeStream.foreachBatch(sink_fn)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    upd = spark.read.parquet(sink)
    w = Window.partitionBy("hour", "event_type").orderBy(
        F.col("batch_id").desc()
    )
    got = {
        str(r["hour"]): r["n_events"]
        for r in upd.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("hour", "n_events")
        .collect()
    }
    assert got == {
        "2024-01-05 10:00:00": 1,
        "2024-01-05 23:00:00": 1,
        "2024-01-05 08:00:00": 2,
    }


# --- padding_waste_curve -----------------------------------------------------


def test_padding_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import trainprep as tr

    assert_frames_match(
        tr.padding_waste_curve(spark, SF_DIR),
        duck.execute(tr.PADDING_WASTE_SQL),
        ctx="padding_waste_curve",
    )


def test_padding_python_model(spark):
    """Recompute padded totals from raw whitespace token counts."""
    from mapreduceece563_spark.operators import trainprep as tr
    from mapreduceece563_spark.sources.catalog import load_table

    texts = [
        r["text"]
        for r in load_table(spark, SF_DIR, "documents")
        .select("text")
        .collect()
    ]
    tokens = [
        len([t for t in txt.split(" ") if t]) for txt in texts
    ]
    tokens = [t for t in tokens if t > 0]

    def padded(t, caps):
        top = caps[-1]
        full = (t // top) * top
        r = t % top
        if r == 0:
            return full
        return full + min(c for c in caps if c >= r)

    want = {}
    for name, caps in tr.PADDING_SCHEMES:
        tot = sum(tokens)
        pad = sum(padded(t, caps) for t in tokens)
        want[name] = (len(tokens), tot, pad, 1_000_000 * (pad - tot) // pad)
    got = {
        r["scheme"]: (
            r["n_docs"],
            r["total_tokens"],
            r["padded_tokens"],
            r["waste_ppm"],
        )
        for r in tr.padding_waste_curve(spark, SF_DIR).collect()
    }
    assert got == want


def test_padding_single_bucket_dominates(spark):
    """A one-rung ladder can never waste less than a ladder that
    contains the same top rung plus finer rungs."""
    from mapreduceece563_spark.operators import trainprep as tr

    rows = {
        r["scheme"]: r["padded_tokens"]
        for r in tr.padding_waste_curve(spark, SF_DIR).collect()
    }
    assert rows["pow2"] <= rows["single128"]
    assert rows["linear32"] <= rows["single128"]


# --- hourly_burstiness_fano --------------------------------------------------


def test_fano_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import temporal as tp

    assert_frames_match(
        tp.hourly_burstiness_fano(spark, SF_DIR),
        duck.execute(tp.FANO_SQL),
        ctx="hourly_burstiness_fano",
    )


def test_fano_python_model(spark):
    """Recompute n/S/Q on the gap-filled series in python."""
    from collections import Counter

    from mapreduceece563_spark.operators import temporal as tp
    from mapreduceece563_spark.sources.catalog import load_table

    rows = (
        load_table(spark, SF_DIR, "events")
        .select("event_type", F.expr("unix_micros(ts) div 3600000000").alias("h"))
        .collect()
    )
    per_type: dict[str, Counter] = {}
    for r in rows:
        per_type.setdefault(r["event_type"], Counter())[r["h"]] += 1
    want = {}
    for t, c in per_type.items():
        h0, h1 = min(c), max(c)
        ys = [c.get(h, 0) for h in range(h0, h1 + 1)]
        n, s, q = len(ys), sum(ys), sum(y * y for y in ys)
        want[t] = (n, s, 1000 * (n * q - s * s) // (n * s), 1000 * s // n)
    got = {
        r["event_type"]: (
            r["n_hours"],
            r["n_events"],
            r["fano_milli"],
            r["mean_milli"],
        )
        for r in tp.hourly_burstiness_fano(spark, SF_DIR).collect()
    }
    assert got == want


# --- seasonal_decomposition_monthly ------------------------------------------


def test_seasonal_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import temporal as tp

    assert_frames_match(
        tp.seasonal_decomposition_monthly(spark, SF_DIR),
        duck.execute(tp.SEASONAL_DECOMP_SQL),
        ctx="seasonal_decomposition_monthly",
    )


def test_seasonal_identity_and_edges(spark):
    """Decomposition identity: wherever trend is defined,
    24*y = trend + seasonal + residual (exact ints); the first and
    last 6 months have NULL trend/detrended/residual; every month of
    the spine is present exactly once."""
    from mapreduceece563_spark.operators import temporal as tp

    rows = sorted(
        tp.seasonal_decomposition_monthly(spark, SF_DIR).collect(),
        key=lambda r: r["month_idx"],
    )
    idxs = [r["month_idx"] for r in rows]
    assert idxs == list(range(idxs[0], idxs[-1] + 1))
    for i, r in enumerate(rows):
        at_edge = i < 6 or i >= len(rows) - 6
        if at_edge:
            assert r["trend_x24"] is None and r["residual_x24"] is None
        else:
            assert (
                24 * r["revenue_cents"]
                == r["trend_x24"] + r["seasonal_x24"] + r["residual_x24"]
            ), r
        assert r["month_of_year"] == r["month_idx"] % 12 + 1


# --- rowgroup_size_plan ------------------------------------------------------


def test_rowgroup_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import storage as stg

    assert_frames_match(
        stg.rowgroup_size_plan(spark, SF_DIR),
        duck.execute(stg.ROWGROUP_SIZE_SQL),
        ctx="rowgroup_size_plan",
    )


def test_rowgroup_python_model(spark):
    from mapreduceece563_spark.operators import storage as stg
    from mapreduceece563_spark.sources.catalog import load_table

    rows = (
        load_table(spark, SF_DIR, "documents")
        .select("text", "lang", "source")
        .collect()
    )
    widths = [
        len(r["text"].encode())
        + len(r["lang"].encode())
        + len(r["source"].encode())
        + stg.ROWGROUP_FIXED_ROW_BYTES
        for r in rows
    ]
    n, tot, mx = len(widths), sum(widths), max(widths)
    avg = tot // n
    want = {}
    for t in stg.ROWGROUP_TARGETS:
        rpg = max(1, t // avg)
        want[t] = (
            n,
            tot,
            avg,
            rpg,
            (n + rpg - 1) // rpg,
            sum(1 for wdt in widths if wdt > t),
            1000 * mx // avg,
        )
    got = {
        r["target_bytes"]: (
            r["n_rows"],
            r["tot_bytes"],
            r["avg_row_bytes"],
            r["rows_per_group"],
            r["n_groups"],
            r["oversize_rows"],
            r["width_skew_milli"],
        )
        for r in stg.rowgroup_size_plan(spark, SF_DIR).collect()
    }
    assert got == want


# --- multitouch_attribution --------------------------------------------------


def test_multitouch_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import analytics as an

    assert_frames_match(
        an.multitouch_attribution(spark, SF_DIR),
        duck.execute(an.MULTITOUCH_SQL),
        ctx="multitouch_attribution",
    )


def test_multitouch_python_model(spark):
    """Full sequential recompute of window assignment and the three
    credit models."""
    from collections import defaultdict

    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.sources.catalog import load_table

    rows = sorted(
        load_table(spark, SF_DIR, "events")
        .select("user_id", "ts", "event_id", "event_type", "value")
        .collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    per_user: dict[int, list] = defaultdict(list)
    for r in rows:
        per_user[r["user_id"]].append(r)
    stats = defaultdict(lambda: [0, 0, 0, 0])  # n, first, last, linear
    for evs in per_user.values():
        win = 0
        touches: dict[int, list] = defaultdict(list)
        purchases: dict[int, int] = {}
        for r in evs:
            if r["event_type"] == "purchase":
                purchases[win] = round(r["value"] * 100)
                win += 1
            elif r["event_type"] in an.ATTRIB_TOUCH_TYPES:
                touches[win].append(r["event_type"])
        for w, cents in purchases.items():
            ts = touches.get(w, [])
            if not ts:
                continue
            n = len(ts)
            for i, t in enumerate(ts):
                st = stats[t]
                st[0] += 1
                if i == 0:
                    st[1] += cents
                if i == n - 1:
                    st[2] += cents
                st[3] += cents * 1000 // n
    got = {
        r["event_type"]: (
            r["n_touches_credited"],
            r["first_touch_cents"],
            r["last_touch_cents"],
            r["linear_milli_cents"],
        )
        for r in an.multitouch_attribution(spark, SF_DIR).collect()
    }
    want = {t: tuple(v) for t, v in stats.items()}
    assert got == want


def test_multitouch_credit_conservation(spark):
    """Each model distributes at most the total credited purchase
    value: first == last in total (both assign each credited
    purchase exactly once), and linear in milli-cents never exceeds
    1000x that total (floor remainders only lose)."""
    from mapreduceece563_spark.operators import analytics as an

    rows = an.multitouch_attribution(spark, SF_DIR).collect()
    first = sum(r["first_touch_cents"] for r in rows)
    last = sum(r["last_touch_cents"] for r in rows)
    linear = sum(r["linear_milli_cents"] for r in rows)
    assert first == last
    assert linear <= 1000 * first
    assert linear > 1000 * first - 1000 * sum(
        r["n_touches_credited"] for r in rows
    )


# --- broadcast_threshold_plan ------------------------------------------------


def test_broadcast_plan_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import skew as sk

    assert_frames_match(
        sk.broadcast_threshold_plan(spark, SF_DIR),
        duck.execute(sk.BROADCAST_PLAN_SQL),
        ctx="broadcast_threshold_plan",
    )


def test_broadcast_plan_shape(spark):
    from mapreduceece563_spark.operators import skew as sk

    rows = {
        r["table_name"]: r for r in sk.broadcast_threshold_plan(
            spark, SF_DIR
        ).collect()
    }
    assert set(rows) == {"region", "nation", "supplier", "customer", "part"}
    for r in rows.values():
        assert r["strategy"] == (
            "broadcast" if r["broadcastable"] else "shuffle"
        )
        assert r["est_bytes"] >= r["n_rows"]  # >= 1 byte/row trivially


# --- plan hygiene, all ten ---------------------------------------------------


def test_queue_r14b_no_cartesian_blowups(spark):
    """No CartesianProduct anywhere except the deliberately tiny
    panel/centroid cross joins (query-panel x 10 centroids and the
    advisor grid), which are bounded by constants, not data. We pin
    the STRONGER property directly: no plan joins corpus-sized
    frames without keys — every entry's output is bounded and every
    cartesian participant is a broadcast of a constant-bounded
    frame."""
    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.operators import skew as sk
    from mapreduceece563_spark.operators import storage as stg
    from mapreduceece563_spark.operators import temporal as tp
    from mapreduceece563_spark.operators import trainprep as tr
    from mapreduceece563_spark.plans import plan_string

    for name, fn in [
        ("padding_waste_curve", tr.padding_waste_curve),
        ("hourly_burstiness_fano", tp.hourly_burstiness_fano),
        ("seasonal_decomposition_monthly", tp.seasonal_decomposition_monthly),
        ("rowgroup_size_plan", stg.rowgroup_size_plan),
        ("multitouch_attribution", an.multitouch_attribution),
        ("broadcast_threshold_plan", sk.broadcast_threshold_plan),
    ]:
        p = plan_string(fn(spark, SF_DIR), "simple")
        assert "CartesianProduct" not in p, name


def test_rerank_and_margin_cross_joins_are_broadcast(spark):
    """The similarity entries DO cross-join — against 10-row
    centroid/panel frames. Pin that those cross joins execute as
    broadcast joins (BroadcastNestedLoopJoin), never a shuffled
    cartesian of corpus-sized sides."""
    from mapreduceece563_spark.operators import similarity as sim
    from mapreduceece563_spark.plans import plan_string

    for name, fn in [
        ("rerank_two_stage", sim.rerank_two_stage),
        ("label_centroid_margin", sim.label_centroid_margin),
        ("projection_neighborhood_audit", sim.projection_neighborhood_audit),
    ]:
        p = plan_string(fn(spark, SF_DIR), "simple")
        assert "CartesianProduct" not in p, name


# --- empty-table behavior, all ten -------------------------------------------


def test_queue_r14b_on_empty_tables(spark, tmp_path):
    import duckdb
    import pyarrow.parquet as pq

    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.operators import skew as sk
    from mapreduceece563_spark.operators import similarity as sim
    from mapreduceece563_spark.operators import storage as stg
    from mapreduceece563_spark.operators import temporal as tp
    from mapreduceece563_spark.operators import trainprep as tr
    from mapreduceece563_spark.sources.catalog import TABLES
    from mapreduceece563_spark.streaming import late_stream as ls

    d = tmp_path / "empty_sf"
    d.mkdir()
    for t in TABLES:
        schema = pq.read_schema(f"{SF_DIR}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")

    for name, fn, sql in [
        ("rerank_two_stage", sim.rerank_two_stage, sim.RERANK_TWO_STAGE_SQL),
        (
            "projection_neighborhood_audit",
            sim.projection_neighborhood_audit,
            sim.PROJECTION_NEIGHBORHOOD_SQL,
        ),
        (
            "label_centroid_margin",
            sim.label_centroid_margin,
            sim.LABEL_CENTROID_MARGIN_SQL,
        ),
        (
            "streaming_late_data_audit",
            ls.streaming_late_data_audit,
            ls.LATE_DATA_AUDIT_SQL,
        ),
        ("padding_waste_curve", tr.padding_waste_curve, tr.PADDING_WASTE_SQL),
        ("hourly_burstiness_fano", tp.hourly_burstiness_fano, tp.FANO_SQL),
        (
            "seasonal_decomposition_monthly",
            tp.seasonal_decomposition_monthly,
            tp.SEASONAL_DECOMP_SQL,
        ),
        ("rowgroup_size_plan", stg.rowgroup_size_plan, stg.ROWGROUP_SIZE_SQL),
        ("multitouch_attribution", an.multitouch_attribution, an.MULTITOUCH_SQL),
        (
            "broadcast_threshold_plan",
            sk.broadcast_threshold_plan,
            sk.BROADCAST_PLAN_SQL,
        ),
    ]:
        assert_frames_match(
            fn(spark, str(d)), con.execute(sql), ctx=f"empty:{name}"
        )
