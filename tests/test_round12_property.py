"""Model-based fuzz for the round-11/12 queue algebra at the right
altitude: quality doubles and tokenization are oracle-pinned
elsewhere, so these fixtures stress exactly what is NOVEL — tie
handling in the doubled mid-ranks (MWU, Spearman), the telescoped
Gini/ECE identities, and degenerate mixes (all-tied, constant
marginals, zero-token docs) that real corpora rarely hit."""

from __future__ import annotations

import datetime
import math
import random
from collections import Counter


def test_mwu_model_on_heavy_tie_streams(spark, tmp_path):
    """Three engineered event types, each with only 4 distinct cents
    values (massive tie groups) and random epoch assignment across 3
    seeds folded into one table — the integer decision and cles must
    match the textbook tie-corrected model exactly."""
    from mapreduceece563_spark.operators import analytics as an

    split = datetime.datetime.fromisoformat(an.KS_SPLIT)
    rows, eid = [], 0
    model: dict = {}
    for seed in range(3):
        rng = random.Random(100 + seed)
        et = f"t{seed}"
        vals = []
        for _ in range(300):
            cents = rng.choice([100, 200, 200, 300, 900])
            is_b = rng.random() < 0.4 + 0.2 * seed
            ts = split + datetime.timedelta(days=1 if is_b else -1)
            rows.append((eid, ts, 1, et, cents / 100.0, "{}"))
            eid += 1
            vals.append((cents, is_b))
        model[et] = vals
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    got = {
        r["event_type"]: r
        for r in an.mann_whitney_drift(spark, str(tmp_path)).collect()
    }
    for et, vals in model.items():
        vals.sort()
        n = len(vals)
        n_a = sum(1 for _, b in vals if not b)
        n_b = n - n_a
        ra_x2 = tie_t = 0
        i = 0
        while i < n:
            j = i
            while j < n and vals[j][0] == vals[i][0]:
                j += 1
            c = j - i
            tie_t += c**3 - c
            ra_x2 += (2 * i + c + 1) * sum(
                1 for k in range(i, j) if not vals[k][1]
            )
            i = j
        u_x2 = ra_x2 - n_a * (n_a + 1)
        g = got[et]
        assert (g["n_a"], g["n_b"], g["u_a_x2"]) == (n_a, n_b, u_x2)
        assert g["cles_ppm"] == u_x2 * 500_000 // max(n_a * n_b, 1)
        lhs = an.MWU_Z2_005_DEN * n * (n - 1) * (u_x2 - n_a * n_b) ** 2
        rhs = (
            an.MWU_Z2_005_NUM * n_a * n_b
            * ((n + 1) * n * (n - 1) - tie_t)
        )
        assert g["drift_at_005"] == (lhs > rhs)


def test_spearman_model_on_tiny_joint_grid(spark, tmp_path):
    """Qualities and lengths drawn from tiny grids (4 texts x 3
    lengths) so the joint histogram is dense with multi-doc cells —
    the cell-weighted rank sums must equal per-doc doubled ranks."""
    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.operators.textstats import quality_score

    rng = random.Random(12)
    texts = [
        "the and of the",
        "zz",
        "alpha beta gamma delta epsilon zeta",
        "%%% --- !!!",
    ]
    rows = []
    for i in range(160):
        t = rng.choice(texts)
        rows.append((i, t, f"L{i % 2}", "src0", rng.choice([10, 20, 30])))
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    q = {
        r["doc_id"]: round(r["quality"] * 1_000_000)
        for r in quality_score(spark, str(tmp_path)).collect()
    }
    by_lang: dict = {}
    for i, (d, t, lang, s, nc) in enumerate(rows):
        by_lang.setdefault(lang, []).append((q[d], nc))

    def doubled_ranks(vals):
        order = sorted(range(len(vals)), key=lambda k: vals[k])
        out = [0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vals[order[j]] == vals[order[i]]:
                j += 1
            for k in range(i, j):
                out[order[k]] = 2 * i + (j - i) + 1
            i = j
        return out

    got = {
        r["lang"]: r
        for r in an.spearman_quality_length(spark, str(tmp_path)).collect()
    }
    for lang, pairs in by_lang.items():
        rx = doubled_ranks([p[0] for p in pairs])
        ry = doubled_ranks([p[1] for p in pairs])
        n = len(pairs)
        sx, sy = sum(rx), sum(ry)
        sxy = sum(a * b for a, b in zip(rx, ry))
        d1 = n * sum(a * a for a in rx) - sx * sx
        d2 = n * sum(b * b for b in ry) - sy * sy
        num = n * sxy - sx * sy
        g = got[lang]
        assert g["n"] == n
        if d1 > 0 and d2 > 0:
            want = math.floor(
                1e6 * float(num)
                / (math.sqrt(float(d1)) * math.sqrt(float(d2)))
            )
            assert g["rho_ppm"] == max(-1_000_000, min(1_000_000, want))
        else:
            assert g["rho_ppm"] is None


def test_gini_and_simpson_models_on_degenerate_mixes(spark, tmp_path):
    """Random mixes that include all-empty sources, single-doc
    sources, and sources where one doc carries ~everything — Gini
    from the textbook sorted-rank formula, Simpson from the raw
    collision count, across 2 seeds folded into one table."""
    from mapreduceece563_spark.operators import corpus as cp

    vocab = ["aa", "bb", "cc", "dd", "the"]
    rows, did = [], 0
    for seed in range(2):
        rng = random.Random(7 + seed)
        for s in range(4):
            src = f"m{seed}_{s}"
            n_docs = rng.choice([1, 3, 12])
            for _ in range(n_docs):
                k = rng.choice([0, 0, 2, 5, 40])
                text = " ".join(rng.choice(vocab) for _ in range(k))
                rows.append((did, text, "x", src, len(text)))
                did += 1
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    toks: dict = {}
    words: dict = {}
    for d, text, _, src, _ in rows:
        ws = [w for w in text.split(" ") if w]
        toks.setdefault(src, []).append(len(ws))
        words.setdefault(src, Counter()).update(ws)

    got_g = {
        r["source"]: r
        for r in cp.token_gini_by_source(spark, str(tmp_path)).collect()
    }
    for src, xs in toks.items():
        xs.sort()
        n, s = len(xs), sum(xs)
        w2 = 2 * sum(i * x for i, x in enumerate(xs, start=1))
        assert got_g[src]["gini_ppm"] == (
            (w2 - (n + 1) * s) * 1_000_000 // max(n * s, 1)
        )

    got_s = {
        r["source"]: r
        for r in cp.simpson_vocab_diversity(spark, str(tmp_path)).collect()
    }
    for src, cnt in words.items():
        n = sum(cnt.values())
        if n == 0:
            assert src not in got_s  # no tokens -> no row (both engines)
            continue
        coll = sum(c * (c - 1) for c in cnt.values())
        g = got_s[src]
        assert g["simpson_ppb"] == coll * 10**9 // max(n * (n - 1), 1)
        if coll:
            assert g["inv_simpson_milli"] == n * (n - 1) * 1000 // coll
        else:
            assert g["inv_simpson_milli"] is None
