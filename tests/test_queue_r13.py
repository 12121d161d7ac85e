"""Round-13 registration queue, built and oracle-tested in round 10.

Cluster separation (simplified silhouette), per-source vocabulary
growth (Heaps' law), cross-delivery overlap (exact-dup matrix, with
an injected fixture because the synthetic corpus shares no exact
texts across sources at small SF), and arrival-process dispersion
(Fano factor). Oracle compare + Python models + invariant plan pins
+ empty-table pins.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_DIR, assert_frames_match


# --- silhouette_by_cell -----------------------------------------------


def test_silhouette_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import clustering as cl

    assert_frames_match(
        cl.silhouette_by_cell(spark, SF_DIR),
        duck.execute(cl.SILHOUETTE_SQL),
        ctx="silhouette_by_cell",
    )


def test_silhouette_python_model(spark):
    """Replay assignment + top-2 centroid distances in Python with
    the identical fold order; every cell's stats must match, the
    cell census must equal kmeans_2iter's, and every silhouette is
    in [0, 1e6] by construction (d1 <= d2)."""
    from mapreduceece563_spark.operators import clustering as cl
    from mapreduceece563_spark.sources.catalog import load_table

    emb = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in load_table(spark, SF_DIR, "embeddings").collect()
    }

    def sqdist(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return acc

    c0 = {vid: emb[vid] for vid in range(cl.K) if vid in emb}
    a1 = {
        vid: min((sqdist(v, c), cid) for cid, c in c0.items())[1]
        for vid, v in emb.items()
    }
    sums: dict = {}
    for vid, cid in a1.items():
        xs = [int(round(x * cl.SCALE)) for x in emb[vid]]
        s, n = sums.get(cid, ([0] * len(xs), 0))
        for i, x in enumerate(xs):
            s[i] += x
        sums[cid] = (s, n + 1)
    c1 = {
        cid: [(si / cl.SCALE) / n for si in s]
        for cid, (s, n) in sums.items()
    }
    expected: dict = {}
    for vid, v in emb.items():
        ds = sorted((math.sqrt(sqdist(v, c)), cid) for cid, c in c1.items())
        (d1, cid1), (d2, _) = ds[0], ds[1]
        s_ppm = 0 if d2 == 0 else int(round((1.0 - d1 / d2) * 1_000_000))
        n, tot, mn = expected.get(cid1, (0, 0, 10**9))
        expected[cid1] = (n + 1, tot + s_ppm, min(mn, s_ppm))
    got = {
        r["cluster_id"]: r
        for r in cl.silhouette_by_cell(spark, SF_DIR).collect()
    }
    assert set(got) == set(expected)
    for cid, (n, tot, mn) in expected.items():
        r = got[cid]
        assert r["n_vectors"] == n
        assert r["mean_silhouette_ppm"] == (2 * tot + n) // (2 * n)
        assert r["min_silhouette_ppm"] == mn
        assert 0 <= r["min_silhouette_ppm"] <= 1_000_000
    km = {
        r["cluster_id"]: r["n_vectors"]
        for r in cl.kmeans_2iter(spark, SF_DIR).collect()
    }
    assert {c: r["n_vectors"] for c, r in got.items()} == km


def test_silhouette_codebook_is_broadcast(spark):
    from mapreduceece563_spark.operators import clustering as cl
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(cl.silhouette_by_cell(spark, SF_DIR), "simple")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


# --- heaps_law_fit -----------------------------------------------------


def test_heaps_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import corpus as cp

    assert_frames_match(
        cp.heaps_law_fit(spark, SF_DIR),
        duck.execute(cp.HEAPS_LAW_ORACLE),
        ctx="heaps_law_fit",
    )


def test_heaps_python_model(spark):
    """Replay the checkpoint cuts, prefix vocab/token counts, and the
    micro-nat regression in Python; betas must match exactly and sit
    in [0, 1e6] (vocabulary can't shrink or grow faster than
    tokens)."""
    from mapreduceece563_spark.operators import corpus as cp
    from mapreduceece563_spark.operators import ngrams as ng

    docs = ng._words_per_doc(spark, SF_DIR).collect()
    from mapreduceece563_spark.sources.catalog import load_table

    src = {
        r["doc_id"]: r["source"]
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", "source")
        .collect()
    }
    by_src: dict = {}
    for r in docs:
        by_src.setdefault(src[r["doc_id"]], []).append(
            (r["doc_id"], list(r["words"]))
        )
    got = {
        r["source"]: r for r in cp.heaps_law_fit(spark, SF_DIR).collect()
    }
    C = cp.HEAPS_CHECKPOINTS
    # sources whose every doc has zero words produce no points
    for s, dws in by_src.items():
        ids = [d for d, _ in dws] or [0]
        lo, hi = min(ids), max(ids)
        pts = []
        for k in range(1, C + 1):
            cut = lo + ((hi - lo + 1) * k) // C
            vocab = set()
            n_tok = 0
            for d, ws in dws:
                if d < cut:
                    vocab.update(ws)
                    n_tok += len(ws)
            if vocab and n_tok:
                pts.append(
                    (
                        int(round(math.log(n_tok) * 1_000_000)),
                        int(round(math.log(len(vocab)) * 1_000_000)),
                    )
                )
        if not pts:
            assert s not in got
            continue
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        den = n * sxx - sx * sx
        r = got[s]
        assert r["n_checkpoints"] == n
        if den == 0:
            assert r["heaps_beta_micro"] is None
        else:
            want = int(round((n * sxy - sx * sy) / den * 1_000_000))
            assert r["heaps_beta_micro"] == want, s
            assert 0 <= r["heaps_beta_micro"] <= 1_000_000


def test_heaps_has_no_document_window(spark):
    """Invariant pin: no window anywhere — checkpoints come from
    arithmetic cuts on broadcast (min, max) bounds, first occurrences
    from a vocabulary-granular groupBy."""
    from mapreduceece563_spark.operators import corpus as cp
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(cp.heaps_law_fit(spark, SF_DIR), "simple")
    assert "Window" not in p
    assert "windowspecdefinition" not in p


# --- cross_source_duplicate_matrix --------------------------------------


def test_cross_source_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import dedup as dd

    assert_frames_match(
        dd.cross_source_duplicate_matrix(spark, SF_DIR),
        duck.execute(dd.CROSS_SOURCE_DUP_SQL),
        ctx="cross_source_duplicate_matrix",
    )


def test_cross_source_injected_fixture(spark, tmp_path):
    """The synthetic corpus shares no exact texts across sources at
    small SF (the matrix is honestly empty there), so the non-zero
    path gets its own ground truth: an injected corpus where the
    shared-text structure is known exactly (the PII-audit
    precedent)."""
    import duckdb

    from mapreduceece563_spark.operators import dedup as dd

    rows = [
        # "alpha" text: 2 copies in src0, 1 in src1  -> pair (src0,src1)
        (1, "alpha", "src0"),
        (2, "alpha", "src0"),
        (3, "alpha", "src1"),
        # "beta": 1 copy each in src1, src2          -> pair (src1,src2)
        (4, "beta", "src1"),
        (5, "beta", "src2"),
        # "gamma": src0 only (no pair)
        (6, "gamma", "src0"),
        (7, "gamma", "src0"),
        # "delta": in all three sources -> 3 pairs
        (8, "delta", "src0"),
        (9, "delta", "src1"),
        (10, "delta", "src2"),
    ]
    d = tmp_path / "inj"
    d.mkdir()
    spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, source STRING"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    got = {
        (r["source_a"], r["source_b"]): (
            r["n_shared_texts"],
            r["n_shared_copies"],
        )
        for r in dd.cross_source_duplicate_matrix(spark, str(d)).collect()
    }
    assert got == {
        # n_shared_copies sums each pair's per-source copy counts:
        # alpha contributes 2+1, delta 1+1 -> 5 for (src0, src1)
        ("src0", "src1"): (2, 5),
        ("src1", "src2"): (2, 4),  # beta 1+1 + delta 1+1
        ("src0", "src2"): (1, 2),  # delta 1+1
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{d}/documents.parquet/*.parquet'"
    )
    assert_frames_match(
        dd.cross_source_duplicate_matrix(spark, str(d)),
        con.execute(dd.CROSS_SOURCE_DUP_SQL),
        ctx="injected:cross_source_duplicate_matrix",
    )


def test_cross_source_joins_digests_only(spark):
    """Invariant pin: the self-join key is the md5 digest — text
    never reaches an exchange."""
    from mapreduceece563_spark.operators import dedup as dd
    from mapreduceece563_spark.plans import plan_string

    import re

    p = plan_string(dd.cross_source_duplicate_matrix(spark, SF_DIR), "simple")
    # every hash exchange below the final rollup keys on the digest
    # (_k, source) or on the output pair keys — never on text
    keys = re.findall(r"Exchange hashpartitioning\(([^,#]*)", p)
    assert keys and all(k in ("_k", "source_a") for k in keys), keys
    assert "CartesianProduct" not in p


# --- burstiness_by_type -------------------------------------------------


def test_burstiness_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import temporal as tp

    assert_frames_match(
        tp.burstiness_by_type(spark, SF_DIR),
        duck.execute(tp.BURSTINESS_SQL),
        ctx="burstiness_by_type",
    )


def test_burstiness_python_model(spark):
    """Exact-integer replay of the gap-filled Fano computation, plus
    the definitional invariants: n_hours spans the observed hour
    range densely, and the flag is num > den exactly."""
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
        for r in tp.burstiness_by_type(spark, SF_DIR).collect()
    }
    assert set(got) == set(series)
    for et, hs in series.items():
        lo, hi = min(hs), max(hs)
        counts = [0] * (hi - lo + 1)
        for h in hs:
            counts[h - lo] += 1
        n = len(counts)
        s = sum(counts)
        q = sum(c * c for c in counts)
        r = got[et]
        assert r["n_hours"] == n and r["n_events"] == s
        if n < 2 or s == 0:
            assert r["fano_milli"] is None
        else:
            num = n * q - s * s
            den = (n - 1) * s
            assert r["fano_milli"] == (1000 * num) // den
            assert r["overdispersed"] == (num > den)


def test_burstiness_is_hour_granular(spark):
    """Invariant pin: no window at all (pure aggregates over the
    hour spine); the only exchanges key on event_type / (type, hour)."""
    from mapreduceece563_spark.operators import temporal as tp
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(tp.burstiness_by_type(spark, SF_DIR), "simple")
    assert "Window" not in p


# --- empty-table behavior, all four --------------------------------------


def test_queue_r13_on_empty_tables(spark, tmp_path):
    import duckdb
    import pyarrow.parquet as pq

    from mapreduceece563_spark.operators import clustering as cl
    from mapreduceece563_spark.operators import corpus as cp
    from mapreduceece563_spark.operators import dedup as dd
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
        ("silhouette_by_cell", cl.silhouette_by_cell, cl.SILHOUETTE_SQL),
        ("heaps_law_fit", cp.heaps_law_fit, cp.HEAPS_LAW_ORACLE),
        (
            "cross_source_duplicate_matrix",
            dd.cross_source_duplicate_matrix,
            dd.CROSS_SOURCE_DUP_SQL,
        ),
        ("burstiness_by_type", tp.burstiness_by_type, tp.BURSTINESS_SQL),
    ]:
        assert_frames_match(
            fn(spark, str(d)), con.execute(sql), ctx=f"empty:{name}"
        )
