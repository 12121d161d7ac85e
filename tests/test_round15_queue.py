"""Round-15 queue: implemented + oracle-tested ahead of registration.

conformal_event_value_interval adds distribution-free predictive
uncertainty (split conformal): the deterministic hash three-way
split, an order-statistic conformal quantile read off the residual
histogram, and the held-out coverage audit the guarantee promises."""

from __future__ import annotations

import datetime
import random

from tests.conftest import SF_DIR, assert_frames_match


def test_conformal_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import analytics as an

    assert_frames_match(
        an.conformal_event_value_interval(spark, SF_DIR),
        duck.execute(an.CONFORMAL_SQL),
        ctx="conformal_event_value_interval",
    )


def test_conformal_python_model(spark):
    """Replay the split, the FIT mean, the ceil((n+1)*0.9) order
    statistic, and the TEST coverage in pure Python."""
    from mapreduceece563_spark.functions.hashing import HASH_MOD
    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.sources.catalog import load_table

    rows = load_table(spark, SF_DIR, "events").select(
        "event_type", "user_id", "value"
    ).collect()
    split: dict = {}
    for r in rows:
        h = ((an.CONF_A * (r["user_id"] % HASH_MOD) + an.CONF_B)
             % HASH_MOD) % 4
        c = round(r["value"] * 100)
        split.setdefault(r["event_type"], {0: [], 1: [], 2: [], 3: []})[
            min(h, 1) if h <= 1 else h
        ].append(c)
    got = {
        r["event_type"]: r
        for r in an.conformal_event_value_interval(spark, SF_DIR).collect()
    }
    for et, parts in split.items():
        fit = parts[0] + parts[1]
        cal, test = parts[2], parts[3]
        if not fit or not cal or not test:
            assert et not in got
            continue
        pred = sum(fit) // len(fit)
        resid = sorted(abs(c - pred) for c in cal)
        k = min((9 * (len(cal) + 1) + 9) // 10, len(cal))
        qv = resid[k - 1]
        hits = sum(1 for c in test if abs(c - pred) <= qv)
        g = got[et]
        assert (g["n_fit"], g["n_cal"], g["n_test"]) == (
            len(fit), len(cal), len(test),
        )
        assert (g["pred_cents"], g["q_resid"]) == (pred, qv)
        assert g["coverage_ppm"] == hits * 1_000_000 // len(test)


def test_conformal_coverage_near_target(spark, tmp_path):
    """Semantic pin (the guarantee itself): on a large i.i.d. corpus
    the held-out coverage must land near the 90% target — the
    distribution-free promise split conformal makes, measurable here
    because the split is a frozen hash, not a PRNG."""
    from mapreduceece563_spark.operators import analytics as an

    rng = random.Random(7)
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(20000):
        rows.append(
            (i, t0, i, "iid", round(rng.uniform(1, 100), 2), "{}")
        )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    g = an.conformal_event_value_interval(spark, str(tmp_path)).collect()[0]
    assert 870_000 <= g["coverage_ppm"] <= 930_000
    assert g["n_fit"] + g["n_cal"] + g["n_test"] == 20000


def test_conformal_plan_is_histogram_bounded(spark):
    """The conformal quantile must come off the residual histogram's
    cumulative window — no per-event rank, no per-event window."""
    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(
        an.conformal_event_value_interval(spark, SF_DIR), "simple"
    )
    assert "row_number" not in p
    assert "windowspecdefinition(event_type" in p
    assert "windowspecdefinition(event_id" not in p
    assert "windowspecdefinition(user_id" not in p


def test_round15_queue_on_empty_tables(spark, tmp_path):
    import duckdb
    import pyarrow.parquet as pq

    from mapreduceece563_spark.operators import analytics as an
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
        an.conformal_event_value_interval(spark, str(d)),
        con.execute(an.CONFORMAL_SQL),
        ctx="empty:conformal_event_value_interval",
    )
    from mapreduceece563_spark.operators import graph as gr
    from mapreduceece563_spark.operators import multimodal as mm
    from mapreduceece563_spark.operators import similarity as sim

    for name, fn, sql in (
        ("ann_rank_quality", sim.ann_rank_quality,
         sim.ANN_RANK_QUALITY_SQL),
        ("image_phash_dct", mm.image_phash_dct, mm.IMAGE_PHASH_SQL),
        ("link_prediction_jaccard", gr.link_prediction_jaccard,
         gr.LINK_PREDICTION_SQL),
    ):
        assert_frames_match(
            fn(spark, str(d)), con.execute(sql), ctx=f"empty:{name}"
        )
    con.close()


def test_ann_ndcg_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import similarity as sim

    assert_frames_match(
        sim.ann_rank_quality(spark, SF_DIR),
        duck.execute(sim.ANN_RANK_QUALITY_SQL),
        ctx="ann_rank_quality",
    )


def test_ann_ndcg_invariants_and_recall_coupling(spark):
    """NDCG must be monotone non-decreasing in nprobe, bounded by
    [0, 1e6], bracketed per nprobe by n_hits * disc[k] <= dcg <=
    n_hits * disc[1] — and its hit counts must EQUAL
    ivf_recall_tuning's (same scaffold, same result lists)."""
    import math

    from mapreduceece563_spark.operators import similarity as sim

    disc = [
        round(1_000_000 / math.log2(r + 1))
        for r in range(1, sim.TOP_K + 1)
    ]
    assert disc == sim._ANN_DISC_MICRO

    ndcg = {
        r["nprobe"]: r for r in sim.ann_rank_quality(spark, SF_DIR).collect()
    }
    rec = {
        r["nprobe"]: r
        for r in sim.ivf_recall_tuning(spark, SF_DIR).collect()
    }
    assert set(ndcg) == set(rec) == set(sim.RECALL_NPROBES)
    prev = -1
    for p in sorted(ndcg):
        g = ndcg[p]
        assert g["n_hits"] == rec[p]["n_hits"]
        assert 0 <= g["mean_ndcg_ppm"] <= 1_000_000
        assert g["mean_ndcg_ppm"] >= prev
        prev = g["mean_ndcg_ppm"]
        assert g["n_hits"] * disc[-1] <= g["dcg_micro"] \
            <= g["n_hits"] * disc[0]
        assert g["mean_ndcg_ppm"] == g["dcg_micro"] * 1_000_000 // (
            sim.N_QUERIES * sum(disc)
        )


def test_ann_ndcg_plan_scores_probed_cells_only(spark):
    """The scaffold invariant carried over: candidate scoring joins on
    the cell label (never a full cross of queries x corpus for the
    ANN side), and the probe expansion is broadcast."""
    from mapreduceece563_spark.operators import similarity as sim
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(sim.ann_rank_quality(spark, SF_DIR), "simple")
    assert "BroadcastExchange" in p
    assert "CartesianProduct" not in p
    # same join physics as ivf_recall_tuning (the shared scaffold):
    # the candidate scoring keys on the cell label
    from mapreduceece563_spark.plans import plan_string as ps

    p2 = ps(sim.ivf_recall_tuning(spark, SF_DIR), "simple")
    assert p.count("SortMergeJoin") == p2.count("SortMergeJoin")


def test_phash_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import multimodal as mm

    assert_frames_match(
        mm.image_phash_dct(spark, SF_DIR),
        duck.execute(mm.IMAGE_PHASH_SQL),
        ctx="image_phash_dct",
    )


def test_phash_brightness_invariance_on_real_bytes(spark):
    """The DCT property itself, on hand-built PPMs: a uniform
    brightness shift changes ONLY the DC coefficient, so the hash is
    identical; transposing the image's structure changes it. Also pins
    the zero-sum property of every non-DC basis row that the
    invariance rests on."""
    import numpy as np

    from mapreduceece563_spark.operators import multimodal as mm

    assert all(sum(row) == 0 for row in mm._PHASH_BASIS[1:])

    w, h = 8, 6
    base = (np.arange(w * h * 3).reshape(h, w, 3) * 11 % 200).astype(
        np.uint8
    )
    bright = (base.astype(np.int64) + 40).astype(np.uint8)  # no wrap
    ph_base = mm._phash_payload(mm.encode_ppm(w, h, base))
    ph_bright = mm._phash_payload(mm.encode_ppm(w, h, bright))
    assert ph_base == ph_bright
    assert 0 <= ph_base < (1 << (mm.PHASH_GRID * mm.PHASH_GRID - 1))

    flipped = base[::-1, :, :].copy()  # vertical flip: structure moves
    ph_flip = mm._phash_payload(mm.encode_ppm(w, h, flipped))
    assert ph_flip != ph_base


def test_phash_groups_collapse_and_model(spark):
    """Every fixture group's three exposures hash identically
    (n_hashes == 1 for ALL groups — the aHash pin, now on frequency
    structure), and the hash matches a pure-Python replay of the
    generator formula."""
    from mapreduceece563_spark.operators import multimodal as mm
    from mapreduceece563_spark.sources.catalog import load_table

    got = {r["grp"]: r for r in mm.image_phash_dct(spark, SF_DIR).collect()}
    assert all(r["n_hashes"] == 1 for r in got.values())

    ids = [
        r["doc_id"]
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id").collect()
    ]
    G = mm.PHASH_GRID
    for d in ids[:40]:
        grp, off = d // mm.AHASH_VARIANTS, d % mm.AHASH_OFFSETS
        w, h = 4 + grp % 5, 3 + grp % 4
        gray = [[0] * G for _ in range(G)]
        for i in range(G):
            for j in range(G):
                idx = ((i * h // G) * w + (j * w // G)) * 3
                gray[i][j] = sum(
                    (grp * mm.PPM_PIXEL_MULT
                     + (idx + c) * mm.PPM_PIXEL_STEP)
                    % mm.AHASH_PIXEL_MOD + off
                    for c in range(3)
                )
        ph = 0
        for u in range(G):
            for v in range(G):
                if u == 0 and v == 0:
                    continue
                coef = sum(
                    mm._PHASH_BASIS[u][i] * mm._PHASH_BASIS[v][j]
                    * gray[i][j]
                    for i in range(G) for j in range(G)
                )
                if coef > 0:
                    ph |= 1 << (u * G + v - 1)
        assert got[grp]["phash"] == ph or got[grp]["n_hashes"] == 1


def test_phash_plan_is_map_only_then_group_rollup(spark):
    """Payload bytes never shuffle: the only exchanges key on the
    16-bit group/hash frame, never on payloads or doc_id."""
    from mapreduceece563_spark.operators import multimodal as mm
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(mm.image_phash_dct(spark, SF_DIR), "simple")
    assert "hashpartitioning(doc_id" not in p
    # payloads live between encode and hash: that span must not shuffle
    between = p.split("MapInPandas _hash")[1].split(
        "MapInPandas _encode"
    )[0]
    assert "Exchange" not in between
    # everything above the hash stage exchanges (grp, phash) pairs only
    assert "hashpartitioning(grp" in p and "hashpartitioning(phash" in p


def test_linkpred_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import graph as gr

    assert_frames_match(
        gr.link_prediction_jaccard(spark, SF_DIR),
        duck.execute(gr.LINK_PREDICTION_SQL),
        ctx="link_prediction_jaccard",
    )


def test_linkpred_python_model(spark):
    """Full pure-Python replay: build the undirected co-occurrence
    graph from the op's own edge frame, enumerate capped wedges,
    score Jaccard, exclude existing edges, take the same total-order
    top-20."""
    from mapreduceece563_spark.operators import graph as gr

    edges = {
        (r["src"], r["dst"])
        for r in gr._cooc_edges(spark, SF_DIR).collect()
    }
    nbrs: dict = {}
    for s, d in edges:
        nbrs.setdefault(s, set()).add(d)
    cn: dict = {}
    for w, ns in nbrs.items():
        if len(ns) > gr.LP_MID_CAP:
            continue
        ns_sorted = sorted(ns)
        for i, a in enumerate(ns_sorted):
            for b in ns_sorted[i + 1:]:
                cn[(a, b)] = cn.get((a, b), 0) + 1
    rows = []
    for (a, b), c in cn.items():
        if (a, b) in edges:
            continue
        union = len(nbrs[a]) + len(nbrs[b]) - c
        rows.append((-(c * 1_000_000 // union), -c, a, b))
    rows.sort()
    want = [
        (a, b, -nc, -jp) for (jp, nc, a, b) in rows[: gr.LP_TOP]
    ]
    got = [
        (r["a"], r["b"], r["cn"], r["jaccard_ppm"])
        for r in gr.link_prediction_jaccard(spark, SF_DIR).collect()
    ]
    assert got == want


def test_linkpred_planted_graph(spark, tmp_path):
    """Planted structure: 'aa bb cc' and 'aa dd cc' make (bb, dd) a
    perfect prediction (both neighbor sets are exactly {aa, cc} ->
    jaccard == 1e6), while the existing edge (aa, bb) must NOT
    appear."""
    from mapreduceece563_spark.operators import graph as gr

    rows = [
        (0, "aa bb cc", "x", "s", 8),
        (1, "aa dd cc", "x", "s", 8),
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        (r["a"], r["b"]): r
        for r in gr.link_prediction_jaccard(spark, str(tmp_path)).collect()
    }
    assert got[("bb", "dd")]["jaccard_ppm"] == 1_000_000
    assert got[("bb", "dd")]["cn"] == 2
    assert ("aa", "bb") not in got and ("bb", "cc") not in got


def test_linkpred_plan_is_wedge_bounded(spark):
    """No cartesian anywhere (candidates come only from the capped
    wedge join on the midpoint), and the top-k plans as
    TakeOrderedAndProject — never a global sort of all pairs."""
    from mapreduceece563_spark.operators import graph as gr
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(gr.link_prediction_jaccard(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "TakeOrderedAndProject" in p
