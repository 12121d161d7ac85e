"""Model-based fuzz for the round-9 queue operators, at the right
altitude: the quality double and the norms fold are already oracle-
pinned elsewhere, so the Python models here replicate only the NOVEL
algebra — the mid-rank CDF + decile rollup, and the frozen-quantizer
assignment + shifted ppm mean — against fixtures built to stress ties
and argmax boundaries.
"""

from __future__ import annotations

import math
import random
from collections import defaultdict

from pyspark.sql import functions as F


def test_quantile_normalize_matches_midrank_model(spark, tmp_path):
    """Heavy-tie corpus (many docs share identical text, hence
    identical quality) per source: the operator's rollup must equal a
    Python mid-rank CDF over the collected (source, q_ppm) pairs."""
    from mapreduceece563_spark.operators import textstats as ts

    rng = random.Random(9)
    words = ["alpha", "beta", "the", "of", "and", "zz9", "%%%", "texture"]
    templates = [
        " ".join(rng.choice(words) for _ in range(rng.randint(1, 30)))
        for _ in range(8)
    ]
    rows = []
    for i in range(120):
        # ~15 docs per template -> massive quality ties inside sources
        t = templates[i % len(templates)]
        rows.append((i, t, "en", f"s{i % 3}", len(t)))
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    # trusted input: the separately-pinned quality double, quantized
    q = {
        r["doc_id"]: int(round(r["quality"] * 1_000_000))
        for r in ts.quality_score(spark, str(tmp_path)).collect()
    }
    src = {i: f"s{i % 3}" for i in range(120)}

    per_val: dict = defaultdict(int)
    for d, qp in q.items():
        per_val[(src[d], qp)] += 1
    n_per_src: dict = defaultdict(int)
    for (s, _), c in per_val.items():
        n_per_src[s] += c
    expected: dict = defaultdict(lambda: [0, 0])  # (src, decile) -> [n, sum_qp]
    for s in n_per_src:
        vals = sorted(qp for (s2, qp) in per_val if s2 == s)
        cum = 0
        for qp in vals:
            cnt = per_val[(s, qp)]
            mid_ppm = (2 * cum + cnt) * 500000 // n_per_src[s]
            dec = min(mid_ppm // 100000, 9)
            expected[(s, dec)][0] += cnt
            expected[(s, dec)][1] += qp * cnt
            cum += cnt
    model = {
        k: (n, (2 * sq + n) // (2 * n)) for k, (n, sq) in expected.items()
    }

    got = {
        (r["source"], r["decile"]): (r["n_docs"], r["mean_quality_ppm"])
        for r in ts.quality_quantile_normalize(spark, str(tmp_path)).collect()
    }
    assert got == model


def test_ivf_incremental_matches_python_model(spark, tmp_path):
    """Random small vector corpus with deliberately CLOSE centroids
    (argmax boundaries matter): the operator must equal a pure-Python
    replication of the fixed-point centroid, sequential-fold cosine,
    label-asc tie-break, and shifted ppm mean."""
    from mapreduceece563_spark.operators import similarity as sim

    rng = random.Random(10)
    dim, n_vec, n_lab = 64, 60, 3
    rows = []
    for i in range(n_vec):
        lab = i % n_lab
        # cluster structure with noise; floats quantized like the
        # parquet column (float32)
        vec = [
            float(
                round(0.1 * lab + rng.uniform(-0.5, 0.5), 4)
            )
            for _ in range(dim)
        ]
        rows.append((i, vec, lab))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    # python model ------------------------------------------------
    import struct

    def f32(x: float) -> float:
        return struct.unpack("f", struct.pack("f", x))[0]

    vecs = {i: [f32(x) for x in v] for i, v, _ in rows}
    labs = {i: l for i, _, l in rows}

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    nrm = {i: math.sqrt(fold_dot(v, v)) for i, v in vecs.items()}
    cut = (max(vecs) + 1) * sim.IVF_INCR_OLD_NUM // 5
    old = [i for i in vecs if i < cut]
    new = [i for i in vecs if i >= cut]

    cents = {}
    for lab in range(n_lab):
        members = [i for i in old if labs[i] == lab]
        cv = []
        for p in range(dim):
            s = sum(
                int(_round_half_even(vecs[i][p] * 1_000_000))
                for i in members
            )
            cv.append((s / 1_000_000.0) / len(members))
        cents[lab] = (cv, math.sqrt(fold_dot(cv, cv)))

    stats = defaultdict(lambda: [0, 0])  # cell -> [n_new, sum_cp]
    for i in new:
        best = None
        for lab in sorted(cents):
            cv, cn = cents[lab]
            cos = fold_dot(vecs[i], cv) / (nrm[i] * cn)
            if best is None or cos > best[1]:
                best = (lab, cos)
        cell, cos = best
        stats[cell][0] += 1
        stats[cell][1] += int(_round_half_even(cos * 1_000_000))
    model = {}
    for cell, (n, s) in stats.items():
        mean = (2 * (s + n * 1_000_000) + n) // (2 * n) - 1_000_000
        n_old = sum(1 for i in old if labs[i] == cell)
        model[cell] = (n_old, n, mean)

    got = {
        r["cell"]: (r["n_old"], r["n_new"], r["mean_cos_ppm"])
        for r in sim.ivf_incremental_assign(spark, str(tmp_path)).collect()
    }
    assert got == model


def _round_half_even(x: float) -> float:
    """Spark's round(x, 0) on DOUBLE uses HALF_UP on the decimal
    expansion; Python's round() is banker's. For the magnitudes here
    (x*1e6 with float32 inputs, never landing on .5 ties after the
    double multiply) the two agree — asserted by the end-to-end
    equality; fall back to decimal HALF_UP to be exact anyway."""
    import decimal

    return float(
        decimal.Decimal(repr(x)).quantize(
            decimal.Decimal("1"), rounding=decimal.ROUND_HALF_UP
        )
    )


def test_roc_auc_matches_pairwise_model_on_tied_corpus(spark, tmp_path):
    """Heavy-tie random corpus (identical texts shared across curated
    AND crawled sources, so positives and negatives collide on the
    same score value): per-language AUC must equal the O(P*N)
    pairwise Mann-Whitney model (win=1, tie=1/2) over the operator's
    own quality scores."""
    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.operators.textstats import quality_score

    rng = random.Random(91)
    words = ["alpha", "beta", "the", "of", "and", "zz9", "%%%", "tex"]
    templates = [
        " ".join(rng.choice(words) for _ in range(rng.randint(1, 25)))
        for _ in range(10)
    ]
    rows = []
    for i in range(160):
        t = templates[rng.randrange(len(templates))]
        rows.append(
            (i, t, rng.choice(["en", "de", "zh"]), f"src{rng.randrange(8)}",
             len(t))
        )
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    q = {
        r["doc_id"]: int(round(r["quality"] * 1_000_000))
        for r in quality_score(spark, str(tmp_path)).collect()
    }
    got = {
        r["lang"]: r
        for r in an.roc_auc_by_lang(spark, str(tmp_path)).collect()
    }
    langs = {lg for _, _, lg, _, _ in rows}
    for lang in langs:
        pos = [q[i] for i, _, lg, s, _ in rows
               if lg == lang and s in an.AUC_CURATED_SOURCES]
        neg = [q[i] for i, _, lg, s, _ in rows
               if lg == lang and s not in an.AUC_CURATED_SOURCES]
        u2 = sum(2 if p > n else (1 if p == n else 0)
                 for p in pos for n in neg)
        g = got[lang]
        assert (g["n_pos"], g["n_neg"], g["u2"]) == (len(pos), len(neg), u2)
        assert g["auc_ppm"] == u2 * 500_000 // max(len(pos) * len(neg), 1)


def test_rrf_fusion_model_on_engineered_ties(spark, tmp_path):
    """Random fixture engineered for the nasty cases: duplicate
    vectors (exact dot ties -> id tie-break), a zero vector (dot 0
    against everything), and documents that carry NO query term (no
    lexical rank -> vector-only RRF contribution). The fused top-k
    must equal the pure-Python model built from the op's own integer
    inputs."""
    from mapreduceece563_spark.operators import similarity as sim
    from mapreduceece563_spark.operators.ngrams import bm25_scored_micro

    rng = random.Random(17)
    n, d = 60, 8
    vecs = {}
    for i in range(n):
        if i % 7 == 3:
            vecs[i] = list(vecs[i - 1])  # exact duplicate of neighbor
        elif i == 5:
            vecs[i] = [0.0] * d  # zero vector
        else:
            vecs[i] = [round(rng.uniform(-0.5, 0.5), 6) for _ in range(d)]
    texts = []
    for i in range(n):
        if i % 5 == 0:
            texts.append("hash join scan " * (1 + i % 4))
        else:
            # only 12 of 60 docs carry a query term — fewer lexical
            # candidates than RRF_TOP_K, so the fused top-20 MUST
            # contain vector-only entries (a doc with any lexical rank
            # always outscores the best vector-only doc here:
            # 1e6/(60+12) + 1e6/(60+59) > 1e6/(60+1))
            texts.append("no query terms at all " * (1 + i % 5))
    spark.createDataFrame(
        [(i, t.strip(), "en", "s0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    spark.createDataFrame(
        [(i, vecs[i], 0) for i in range(n)],
        "vec_id long, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    lex = {
        r["doc_id"]: r["_sm"]
        for r in bm25_scored_micro(spark, str(tmp_path)).collect()
    }
    # quantize exactly as the op does: from the FLOAT32 stored values
    from mapreduceece563_spark.sources.catalog import load_table

    emb = {
        r["vec_id"]: [round(x * 1_000_000) for x in r["embedding"]]
        for r in load_table(spark, str(tmp_path), "embeddings").collect()
    }
    qv = emb[sim.RRF_QUERY_VEC_ID]
    dots = {
        v: sum(a * b for a, b in zip(emb[v], qv))
        for v in emb
        if v != sim.RRF_QUERY_VEC_ID
    }
    vec_rank = {
        v: i + 1
        for i, (v, _) in enumerate(
            sorted(dots.items(), key=lambda kv: (-kv[1], kv[0]))
        )
    }
    lex_rank = {
        doc: i + 1
        for i, (doc, _) in enumerate(
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

    got = sim.rrf_rank_fusion(spark, str(tmp_path)).collect()
    assert [r["doc_id"] for r in got] == want
    for r in got:
        assert r["rrf_ppm"] == fused[r["doc_id"]]
    # the fixture really exercised the cases
    assert any(i not in lex_rank for i in want), "vector-only doc in top-k"
    dup_pairs = [(i - 1, i) for i in range(n) if i % 7 == 3]
    assert any(dots[a] == dots[b] for a, b in dup_pairs if a in dots and b in dots)
