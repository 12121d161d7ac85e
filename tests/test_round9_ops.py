"""Round-9 operator pins beyond the oracle compare.

roc_auc_by_lang and rrf_rank_fusion both pass the driver's hash check
(Spark == DuckDB); these tests pin what that compare cannot see —
AUC ground truth against a brute-force pairwise model on an injected
fixture, rank-fusion algebra against a pure-Python model, and the
plan physics (histogram-granularity windows, bounded candidate sets,
broadcast query side).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR, assert_frames_match


# --- roc_auc_by_lang ---------------------------------------------------


def test_roc_auc_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import analytics as an

    assert_frames_match(
        an.roc_auc_by_lang(spark, SF_DIR),
        duck.execute(an.ROC_AUC_SQL),
        ctx="roc_auc_by_lang",
    )


def test_roc_auc_brute_force_ground_truth(spark, tmp_path):
    """Inject a tiny corpus with hand-checkable separation and compare
    against the O(P*N) pairwise definition: AUC = (wins + ties/2) /
    (P*N) over every (positive, negative) pair."""
    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.operators.textstats import quality_score

    # texts chosen only to yield distinct-ish quality scores; the
    # ground truth below recomputes from the op's own score, so the
    # fixture needs no particular score values — just both classes.
    rows = []
    for i in range(40):
        src = f"src{i % 8}"  # src0-4 curated (positive), src5-7 not
        lang = "en" if i % 2 == 0 else "de"
        text = ("quick brown fox " * ((i % 7) + 1)).strip()
        rows.append((i, text, lang, src, len(text)))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    q = {
        r["doc_id"]: r["quality"]
        for r in quality_score(spark, str(tmp_path)).collect()
    }
    got = {r["lang"]: r for r in an.roc_auc_by_lang(spark, str(tmp_path)).collect()}

    for lang in ("en", "de"):
        pos = [
            round(q[i] * 1_000_000)
            for i, _, lg, s, _ in rows
            if lg == lang and s in an.AUC_CURATED_SOURCES
        ]
        neg = [
            round(q[i] * 1_000_000)
            for i, _, lg, s, _ in rows
            if lg == lang and s not in an.AUC_CURATED_SOURCES
        ]
        u2 = sum(
            2 if p > n else (1 if p == n else 0) for p in pos for n in neg
        )
        assert got[lang]["n_pos"] == len(pos)
        assert got[lang]["n_neg"] == len(neg)
        assert got[lang]["u2"] == u2
        assert got[lang]["auc_ppm"] == u2 * 500_000 // (len(pos) * len(neg))


def test_roc_auc_bounds_and_histogram_plan(spark):
    """AUC is a probability (0..1e6 ppm); class counts cover the
    corpus; and the plan stays at histogram granularity — no per-doc
    window or per-doc exchange."""
    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.plans import plan_string
    from mapreduceece563_spark.sources.catalog import load_table

    out = an.roc_auc_by_lang(spark, SF_DIR)
    rows = out.collect()
    assert rows, "fixture corpus must produce per-lang rows"
    for r in rows:
        assert 0 <= r["auc_ppm"] <= 1_000_000
        assert r["u2"] <= 2 * r["n_pos"] * r["n_neg"]
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert sum(r["n_pos"] + r["n_neg"] for r in rows) == n_docs

    p = plan_string(out, "simple")
    assert "hashpartitioning(doc_id" not in p, (
        "per-doc exchange crept into the AUC histogram formulation"
    )
    assert "windowspecdefinition(doc_id" not in p
    assert "Window" in p


# --- rrf_rank_fusion ---------------------------------------------------


def test_rrf_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import similarity as sim

    assert_frames_match(
        sim.rrf_rank_fusion(spark, SF_DIR),
        duck.execute(sim.RRF_RANK_FUSION_SQL),
        ctx="rrf_rank_fusion",
    )


def test_rrf_python_model(spark):
    """Recompute both rankings and the fusion in pure Python from the
    op's own inputs (integer BM25 micro-scores; ppm-quantized inner
    products) and require the exact same top-20."""
    from mapreduceece563_spark.operators import similarity as sim
    from mapreduceece563_spark.operators.ngrams import bm25_scored_micro
    from mapreduceece563_spark.sources.catalog import load_table

    lex = {
        r["doc_id"]: r["_sm"]
        for r in bm25_scored_micro(spark, SF_DIR).collect()
    }
    emb = {
        r["vec_id"]: [round(x * 1_000_000) for x in r["embedding"]]
        for r in load_table(spark, SF_DIR, "embeddings").collect()
    }
    qv = emb[sim.RRF_QUERY_VEC_ID]
    dots = {
        vid: sum(a * b for a, b in zip(v, qv))
        for vid, v in emb.items()
        if vid != sim.RRF_QUERY_VEC_ID
    }
    vec_rank = {
        vid: i + 1
        for i, (vid, _) in enumerate(
            sorted(dots.items(), key=lambda kv: (-kv[1], kv[0]))
        )
    }
    lex_rank = {
        did: i + 1
        for i, (did, _) in enumerate(
            sorted(lex.items(), key=lambda kv: (-kv[1], kv[0]))
        )
    }
    ids = set(vec_rank) | set(lex_rank)
    fused = {
        i: (1_000_000 // (sim.RRF_K + lex_rank[i]) if i in lex_rank else 0)
        + (1_000_000 // (sim.RRF_K + vec_rank[i]) if i in vec_rank else 0)
        for i in ids
    }
    want = sorted(ids, key=lambda i: (-fused[i], i))[: sim.RRF_TOP_K]

    got = sim.rrf_rank_fusion(spark, SF_DIR).collect()
    assert [r["doc_id"] for r in got] == want
    for r in got:
        assert r["rrf_ppm"] == fused[r["doc_id"]]
        assert r["vec_rank"] == vec_rank.get(r["doc_id"])
        assert r["lex_rank"] == lex_rank.get(r["doc_id"])


def test_rrf_plan_physics(spark):
    """The query vector side must be broadcast (never a shuffled
    join), the fused top-k must be a TakeOrderedAndProject (no global
    sort materialization), and no per-doc text column survives into
    the fusion join."""
    from mapreduceece563_spark.operators import similarity as sim
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(sim.rrf_rank_fusion(spark, SF_DIR), "simple")
    assert "BroadcastExchange" in p
    assert "TakeOrderedAndProject" in p
    assert "SortMergeJoin [vec_id" not in p
