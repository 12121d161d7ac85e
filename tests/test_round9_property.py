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
