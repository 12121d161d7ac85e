"""Round-11 queue: implemented + oracle-tested ahead of registration
(the established queue precedent — the round-10 window is spoken for
by its own four-entry queue, so these two wait one more rotation).

srp_hamming_neardup's oracle is deliberately the BRUTE-FORCE O(n^2)
pair definition, so every driver hash compare doubles as a proof that
the banded plan loses no pair; ndcg_at_k gets a pure-Python model and
the bounded-top-k plan pin.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_DIR, assert_frames_match


def test_srp_hamming_matches_bruteforce_oracle(spark, duck):
    from mapreduceece563_spark.operators import similarity as sim

    assert_frames_match(
        sim.srp_hamming_neardup(spark, SF_DIR),
        duck.execute(sim.SRP_HAMMING_SQL),
        ctx="srp_hamming_neardup",
    )


def test_srp_hamming_python_model(spark):
    """Brute-force the pair set in pure Python from the signatures
    (which the round-10 tests already pin bit-exactly) — banding must
    lose nothing and invent nothing, and every reported distance must
    be the true popcount of the XOR."""
    from mapreduceece563_spark.operators import similarity as sim

    sigs = {
        r["vec_id"]: r["srp_sig"]
        for r in sim.srp_signature(spark, SF_DIR).collect()
    }
    ids = sorted(sigs)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= sim.SRP_HAMMING_MAX:
                want[(a, b)] = h
    got = {
        (r["vec_a"], r["vec_b"]): r["hamming"]
        for r in sim.srp_hamming_neardup(spark, SF_DIR).collect()
    }
    assert got == want
    assert want, "fixture corpus must contain near-dup signatures"
    # the pigeonhole claim itself: every reported pair shares at least
    # one untouched 8-bit band
    width = sim.SRP_BITS // sim.SRP_BANDS
    mask = (1 << width) - 1
    for (a, b) in want:
        assert any(
            (sigs[a] >> (i * width)) & mask == (sigs[b] >> (i * width)) & mask
            for i in range(sim.SRP_BANDS)
        )


def test_srp_hamming_plan_is_bucketed(spark):
    """The self-join must key on the band columns (equi-join) — no
    cartesian/broadcast-nested-loop pair enumeration — and the
    signature stage must be cached once for both sides."""
    from mapreduceece563_spark.operators import similarity as sim
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(sim.srp_hamming_neardup(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "band_id" in p and "band_val" in p
    assert "InMemoryTableScan" in p


def test_ndcg_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import analytics as an

    assert_frames_match(
        an.ndcg_at_k(spark, SF_DIR),
        duck.execute(an.NDCG_AT_K_SQL),
        ctx="ndcg_at_k",
    )


def test_ndcg_python_model(spark):
    """Pure-Python NDCG@10 from the op's own quality scores: identical
    DCG/IDCG/ndcg_ppm per language, discounts recomputed from
    math.log2 (pinning the literal tables against drift)."""
    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.operators.textstats import quality_score
    from mapreduceece563_spark.sources.catalog import load_table

    q = {
        r["doc_id"]: round(r["quality"] * 1_000_000)
        for r in quality_score(spark, SF_DIR).collect()
    }
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "source"
    ).collect()
    disc = [round(1_000_000 / math.log2(r + 1)) for r in range(1, an.NDCG_K + 1)]
    assert disc == an._NDCG_DISC_MICRO
    by_lang: dict = {}
    for r in docs:
        by_lang.setdefault(r["lang"], []).append(
            (-q[r["doc_id"]], r["doc_id"],
             1 if r["source"] in an.AUC_CURATED_SOURCES else 0)
        )
    got = {r["lang"]: r for r in an.ndcg_at_k(spark, SF_DIR).collect()}
    assert set(got) == set(by_lang)
    for lang, rows in by_lang.items():
        rows.sort()
        n_pos = sum(g for _, _, g in rows)
        dcg = sum(
            g * disc[i] for i, (_, _, g) in enumerate(rows[: an.NDCG_K])
        )
        idcg = sum(disc[: min(n_pos, an.NDCG_K)])
        g = got[lang]
        assert (g["n_pos"], g["dcg_micro"], g["idcg_micro"]) == (
            n_pos, dcg, idcg,
        )
        assert g["ndcg_ppm"] == dcg * 1_000_000 // max(idcg, 1)
        assert 0 <= g["ndcg_ppm"] <= 1_000_000


def test_ndcg_perfect_ranking_is_one(spark, tmp_path):
    """Semantic pin: a corpus where the curated docs ARE the
    top-quality docs must score ndcg_ppm == 1e6 exactly, and one
    where they are ranked LAST must score far below."""
    from mapreduceece563_spark.operators import analytics as an

    rows = []
    # 'good' lang: curated docs get long, clean text (high quality);
    # crawled docs get a single word (low quality)
    for i in range(20):
        curated = i < 5
        text = ("the quick brown fox jumps cleanly " * 8).strip() if curated \
            else "zz"
        rows.append((i, text, "good", "src0" if curated else "src9",
                     len(text)))
    # 'bad' lang: the reverse
    for i in range(20, 40):
        curated = i < 25
        text = "zz" if curated else (
            "the quick brown fox jumps cleanly " * 8).strip()
        rows.append((i, text, "bad", "src0" if curated else "src9",
                     len(text)))
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {r["lang"]: r for r in an.ndcg_at_k(spark, str(tmp_path)).collect()}
    assert got["good"]["ndcg_ppm"] == 1_000_000
    assert got["bad"]["ndcg_ppm"] < 500_000


def test_ndcg_plan_uses_window_group_limit(spark):
    """The bounded top-k must plan as WindowGroupLimit; n_pos comes
    from a window-free rollup."""
    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(an.ndcg_at_k(spark, SF_DIR), "simple")
    assert "WindowGroupLimit" in p
    assert "windowspecdefinition(doc_id" not in p


def test_round11_queue_on_empty_tables(spark, tmp_path):
    import duckdb
    import pyarrow.parquet as pq

    from mapreduceece563_spark.operators import analytics as an
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
        sim.srp_hamming_neardup(spark, str(d)),
        con.execute(sim.SRP_HAMMING_SQL),
        ctx="empty:srp_hamming_neardup",
    )
    assert_frames_match(
        an.ndcg_at_k(spark, str(d)),
        con.execute(an.NDCG_AT_K_SQL),
        ctx="empty:ndcg_at_k",
    )
    con.close()
