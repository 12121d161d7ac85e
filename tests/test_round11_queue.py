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
    assert_frames_match(
        an.quality_calibration_ece(spark, str(d)),
        con.execute(an.QUALITY_CALIBRATION_ECE_SQL),
        ctx="empty:quality_calibration_ece",
    )
    from mapreduceece563_spark.operators import corpus as cp

    assert_frames_match(
        cp.token_gini_by_source(spark, str(d)),
        con.execute(cp.TOKEN_GINI_SQL),
        ctx="empty:token_gini_by_source",
    )
    con.close()


def test_ece_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import analytics as an

    assert_frames_match(
        an.quality_calibration_ece(spark, SF_DIR),
        duck.execute(an.QUALITY_CALIBRATION_ECE_SQL),
        ctx="quality_calibration_ece",
    )


def test_ece_python_model(spark):
    """Pure-Python 10-bin ECE from the op's own quality scores: same
    n / n_bins / ece_ppm / max_bin_gap_ppm per language, and the
    telescoped integer form equals the textbook sum((n_b/n)*|acc-conf|)
    definition within quantization."""
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
    bins: dict = {}
    for r in docs:
        qp = q[r["doc_id"]]
        b = min(qp // 100_000, an.ECE_BINS - 1)
        nb, pb, qb = bins.setdefault((r["lang"], b), [0, 0, 0])
        bins[(r["lang"], b)] = [
            nb + 1,
            pb + (1 if r["source"] in an.AUC_CURATED_SOURCES else 0),
            qb + qp,
        ]
    per_lang: dict = {}
    for (lang, _b), (nb, pb, qb) in bins.items():
        n, k, gap, mx = per_lang.setdefault(lang, [0, 0, 0, 0])
        per_lang[lang] = [
            n + nb,
            k + 1,
            gap + abs(pb * 1_000_000 - qb),
            max(mx, abs(pb * 1_000_000 - qb) // nb),
        ]
    got = {
        r["lang"]: r
        for r in an.quality_calibration_ece(spark, SF_DIR).collect()
    }
    assert set(got) == set(per_lang)
    for lang, (n, k, gap, mx) in per_lang.items():
        g = got[lang]
        assert (g["n"], g["n_bins"]) == (n, k)
        assert g["ece_ppm"] == gap // n
        assert g["max_bin_gap_ppm"] == mx
        assert 0 <= g["ece_ppm"] <= g["max_bin_gap_ppm"] <= 1_000_000


def test_ece_calibrated_corpus_is_zero(spark, tmp_path):
    """Semantic pin: every doc is the SAME text ('zz' -> quality
    0.402, one occupied bin), so a language whose curated fraction is
    exactly 0.402 is perfectly calibrated (ece_ppm == 0) and a
    language with zero curated docs carries the full 402000 ppm gap."""
    from mapreduceece563_spark.operators import analytics as an

    rows = []
    for i in range(1000):
        rows.append(
            (i, "zz", "cal", "src0" if i < 402 else "src9", 2)
        )
    for i in range(1000, 1100):
        rows.append((i, "zz", "uncal", "src9", 2))
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        r["lang"]: r
        for r in an.quality_calibration_ece(spark, str(tmp_path)).collect()
    }
    assert got["cal"]["n_bins"] == 1
    assert got["cal"]["ece_ppm"] == 0
    assert got["cal"]["max_bin_gap_ppm"] == 0
    assert got["uncal"]["ece_ppm"] == 402_000
    assert got["uncal"]["max_bin_gap_ppm"] == 402_000


def test_ece_plan_is_histogram_bounded(spark):
    """ECE never ranks or windows anything: the whole reduction is two
    hash aggregates (per-bin, then per-lang) with map-side partials —
    no Window operator may appear, and nothing may exchange on doc_id
    after the metadata join."""
    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(an.quality_calibration_ece(spark, SF_DIR), "simple")
    assert "Window" not in p
    assert "windowspecdefinition" not in p


def test_token_gini_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import corpus as cp

    assert_frames_match(
        cp.token_gini_by_source(spark, SF_DIR),
        duck.execute(cp.TOKEN_GINI_SQL),
        ctx="token_gini_by_source",
    )


def test_token_gini_python_model(spark):
    """Pure-Python Gini from the textbook per-doc rank formula
    G = (2*sum(i*x_(i)) - (n+1)*sum(x)) / (n*sum(x)) on the op's own
    token counts — pinning that the histogram/tie-group telescoping
    reproduces the sorted-rank definition exactly."""
    from mapreduceece563_spark.operators import corpus as cp
    from mapreduceece563_spark.operators.textstats import token_stats
    from mapreduceece563_spark.sources.catalog import load_table

    toks = {
        r["doc_id"]: r["n_tokens"]
        for r in token_stats(spark, SF_DIR).collect()
    }
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source"
    ).collect()
    by_src: dict = {}
    for r in docs:
        by_src.setdefault(r["source"], []).append(toks[r["doc_id"]])
    got = {
        r["source"]: r
        for r in cp.token_gini_by_source(spark, SF_DIR).collect()
    }
    assert set(got) == set(by_src)
    for src, xs in by_src.items():
        xs.sort()
        n, s = len(xs), sum(xs)
        w2 = 2 * sum(i * x for i, x in enumerate(xs, start=1))
        g = got[src]
        assert (g["n_docs"], g["total_tokens"]) == (n, s)
        assert g["gini_ppm"] == (w2 - (n + 1) * s) * 1_000_000 // max(n * s, 1)
        assert 0 <= g["gini_ppm"] < 1_000_000


def test_token_gini_semantic_pins(spark, tmp_path):
    """Equal mass -> gini 0 exactly; one doc carrying all the mass
    among n -> the theoretical (n-1)/n; zero-token sources guard the
    division (gini 0, not NULL/error)."""
    from mapreduceece563_spark.operators import corpus as cp

    rows = []
    for i in range(10):
        rows.append((i, "aa bb cc", "even", "even", 8))
    rows.append((10, " ".join(["tok"] * 50), "skew", "skew", 200))
    for i in range(11, 20):
        rows.append((i, "", "skew", "skew", 0))
    for i in range(20, 23):
        rows.append((i, "", "void", "void", 0))
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        r["source"]: r
        for r in cp.token_gini_by_source(spark, str(tmp_path)).collect()
    }
    assert got["even"]["gini_ppm"] == 0
    # one doc holds all 50 tokens among 10 docs: G = (n-1)/n = 0.9
    assert got["skew"]["gini_ppm"] == 900_000
    assert got["void"]["total_tokens"] == 0
    assert got["void"]["gini_ppm"] == 0


def test_token_gini_plan_is_histogram_bounded(spark):
    """The Gini must never materialize a per-doc rank: no row_number
    anywhere, the only window slides over the (source, n_tokens)
    histogram, and every exchange keys on source (never doc_id)."""
    from mapreduceece563_spark.operators import corpus as cp
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(cp.token_gini_by_source(spark, SF_DIR), "simple")
    assert "row_number" not in p
    assert "hashpartitioning(doc_id" not in p
    assert "windowspecdefinition(source" in p
