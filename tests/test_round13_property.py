"""Model-based fuzz for the round-13 queue algebra at the right
altitude: tokenization and the quality formula are oracle-pinned
elsewhere, so these fixtures stress exactly what is NOVEL — the
Page-Hinkley prefix-sum construction on burst/constant/gap-heavy
series, SAX symbol degeneracy, planted-dominance Cliff's delta,
engineered McNemar discordance, Chao1 on hapax-heavy corpora, and
the star-graph sign of assortativity."""

from __future__ import annotations

import datetime
import random
from collections import Counter


def _write_events(spark, tmp_path, series: dict[str, dict[int, int]]):
    """Materialize {event_type: {hour_index: count}} as an events
    table (hour 0 = 2024-01-01T00)."""
    t0 = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    for et, hist in series.items():
        for h, c in hist.items():
            for _ in range(c):
                rows.append(
                    (eid, t0 + datetime.timedelta(hours=h, minutes=7),
                     1, et, 1.0, "{}")
                )
                eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def test_page_hinkley_model_on_engineered_series(spark, tmp_path):
    """Burst, constant, gap-heavy and random series (3 seeds) — the
    window construction must match the textbook recursion on every
    shape, and the constant series must never alarm."""
    from mapreduceece563_spark.operators import temporal as tp

    series: dict[str, dict[int, int]] = {
        "constant": {h: 7 for h in range(120)},
        "burst": {**{h: 2 for h in range(100)}, 50: 400},
        "gappy": {0: 5, 77: 5, 154: 5},
    }
    for seed in range(3):
        rng = random.Random(2000 + seed)
        # counts are >= 1: a zero-count hour would emit no event rows,
        # so the observed series bounds would exclude it — quiet hours
        # come from ABSENT keys (gaps), which both sides gap-fill
        series[f"rnd{seed}"] = {
            h: rng.randint(1, 25)
            for h in range(rng.randint(10, 150))
            if rng.random() < 0.8
        }
        if not series[f"rnd{seed}"]:
            series[f"rnd{seed}"] = {0: 1}
    _write_events(spark, tmp_path, series)
    got = {
        r["event_type"]: r.asDict()
        for r in tp.page_hinkley_drift(spark, str(tmp_path)).collect()
    }
    for et, hist in series.items():
        h0, h1 = min(hist), max(hist)
        ys = [hist.get(h, 0) for h in range(h0, h1 + 1)]
        n = s = m = mn = al = 0
        for y in ys:
            n += 1
            s += y
            m = m + y * 1000 - (s * 1000) // n - tp.PH_DELTA_MILLI
            mn = min(mn, m)
            if m - mn > tp.PH_LAMBDA_MILLI:
                al += 1
        g = got[et]
        assert g["n_hours"] == len(ys), et
        assert g["ph_final_milli"] == m - mn, et
        assert g["n_alarm_hours"] == al, et
    assert got["constant"]["n_alarm_hours"] == 0
    assert got["burst"]["n_alarm_hours"] > 0


def test_sax_degenerate_and_random_series(spark, tmp_path):
    """A constant series degenerates to one motif (symbol 0 trigram)
    occurring n_frames-2 times; random series must match the pure
    model exactly."""
    from mapreduceece563_spark.operators import temporal as tp

    series: dict[str, dict[int, int]] = {
        "flatline": {h: 4 for h in range(tp.SAX_FRAME_HOURS * 20)},
    }
    for seed in range(3):
        rng = random.Random(3000 + seed)
        series[f"rnd{seed}"] = {
            h: rng.randint(1, 50)
            for h in range(tp.SAX_FRAME_HOURS * rng.randint(5, 25))
            if rng.random() < 0.9
        }
        if len(series[f"rnd{seed}"]) < 2:
            series[f"rnd{seed}"] = {0: 1, 40: 2}
    _write_events(spark, tmp_path, series)
    got: dict[str, list] = {}
    for r in tp.sax_motif_counts(spark, str(tmp_path)).collect():
        got.setdefault(r["event_type"], []).append(r.asDict())
    for et, hist in series.items():
        h0, h1 = min(hist), max(hist)
        frames: dict[int, list[int]] = {}
        for h in range(h0, h1 + 1):
            frames.setdefault(h // tp.SAX_FRAME_HOURS, []).append(
                hist.get(h, 0)
            )
        paa = {f: (1000 * sum(v)) // len(v) for f, v in frames.items()}
        lo, hi = min(paa.values()), max(paa.values())
        syms = [
            ((paa[f] - lo) * tp.SAX_ALPHABET) // (hi - lo + 1)
            for f in sorted(paa)
        ]
        tri = Counter(
            syms[i] * 16 + syms[i + 1] * 4 + syms[i + 2]
            for i in range(len(syms) - 2)
        )
        top = sorted(tri.items(), key=lambda kv: (-kv[1], kv[0]))[
            : tp.SAX_TOP_MOTIFS
        ]
        rs = sorted(got[et], key=lambda r: r["rank"])
        assert [(r["motif"], r["n_occurrences"]) for r in rs] == top, et
    flat = got["flatline"]
    assert len(flat) == 1
    assert flat[0]["motif"] == 0
    assert flat[0]["n_occurrences"] == 20 - 2


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def test_cliffs_delta_planted_dominance(spark, tmp_path):
    """A source whose every document outscores every other document
    must report delta exactly +1e6; a source strictly dominated
    reports exactly -1e6 (the shifted quotient must not be off by
    one at either pole)."""
    from mapreduceece563_spark.operators import analytics as an

    # quality_score rewards mid-length clean prose; junk is short
    # with digits/punct. Exact values don't matter — only that every
    # good doc beats every junk doc, which the assertion verifies
    # before trusting the poles.
    good = (
        "the quick brown fox jumps over the lazy dog and keeps "
        "running through the quiet green field toward the river "
    ) * 3
    junk = "@@ 11 ##"
    rows = []
    for i in range(8):
        rows.append((i, good, "en", "alpha", len(good)))
    for i in range(8, 24):
        rows.append((i, junk, "en", "omega", len(junk)))
    _write_docs(spark, tmp_path, rows)
    got = {
        r["source"]: r.asDict()
        for r in an.cliffs_delta_quality(spark, str(tmp_path)).collect()
    }
    assert got["alpha"]["less_pairs"] == 0
    assert got["alpha"]["cliffs_delta_ppm"] == 1_000_000
    assert got["omega"]["greater_pairs"] == 0
    assert got["omega"]["cliffs_delta_ppm"] == -1_000_000


def test_mcnemar_engineered_discordance(spark, tmp_path):
    """Documents built so the size gate and the token gate disagree
    in exactly known directions; the cells and the decision must be
    the hand-computed ones."""
    from mapreduceece563_spark.operators import trainprep as tr

    long_few_tokens = "x" * 600  # 600 chars, 1 token: A=1, B=0
    short_many_tokens = " ".join(["a"] * 100)  # 199 chars: A=0, B=1
    both_pass = " ".join(["ab"] * 200)  # 599 chars, 200 tokens: A=1, B=1
    neither = "tiny"
    rows = []
    did = 0
    for text, n in [
        (long_few_tokens, 13),
        (short_many_tokens, 2),
        (both_pass, 5),
        (neither, 3),
    ]:
        for _ in range(n):
            rows.append((did, text, "en", "s", len(text)))
            did += 1
    _write_docs(spark, tmp_path, rows)
    got = tr.mcnemar_filter_compare(spark, str(tmp_path)).collect()
    assert len(got) == 1
    g = got[0].asDict()
    assert g["n_docs"] == 23
    assert g["both_keep"] == 5
    assert g["only_size_keeps"] == 13
    assert g["only_tokens_keeps"] == 2
    # chi2 = (|13-2|-1)^2/(13+2) = 100/15
    assert g["chi2_milli"] == (1000 * 100) // 15
    assert g["filters_differ_05"] == (1_000_000 * 100 > 3_841_459 * 15)


def test_chao1_on_hapax_heavy_corpus(spark, tmp_path):
    """Engineered so the f1/f2 spectrum is known exactly: source
    'hap' is all hapaxes (chao1 explodes quadratically), source
    'dup' is one word repeated (chao1 == vocab == 1)."""
    from mapreduceece563_spark.operators import corpus as cp

    # purely alphabetic words: normalizeWord strips digits, so "w0"
    # and "w1" would both collapse to "w"
    import itertools
    import string

    alpha_words = [
        a + b for a, b in itertools.product(string.ascii_lowercase, "aeiou")
    ][:40]
    hap_text = " ".join(alpha_words)  # 40 hapaxes
    dup_text = " ".join(["same"] * 40)
    rows = [
        (1, hap_text, "en", "hap", len(hap_text)),
        (2, dup_text, "en", "dup", len(dup_text)),
    ]
    _write_docs(spark, tmp_path, rows)
    got = {
        r["source"]: r.asDict()
        for r in cp.chao1_vocab_richness(spark, str(tmp_path)).collect()
    }
    h = got["hap"]
    assert (h["vocab"], h["f1"], h["f2"]) == (40, 40, 0)
    assert h["chao1_est"] == 40 + (40 * 39) // 2
    assert h["unseen_mass_ppm"] == 1_000_000  # every token is new
    d = got["dup"]
    assert (d["vocab"], d["f1"], d["f2"]) == (1, 0, 0)
    assert d["chao1_est"] == 1
    assert d["unseen_mass_ppm"] == 0


def test_assortativity_star_is_negative_clique_is_null(spark, tmp_path):
    """A star (hub-and-spoke) graph has assortativity -1000 exactly;
    a clique is degree-regular (denominator 0) and must export NULL.
    Baskets are orders: each basket's distinct parts pairwise
    co-purchase."""
    from mapreduceece563_spark.operators import graph as gph

    # star: baskets {hub, leaf_i} for 6 leaves -> edges hub-leaf only
    rows = []
    ln = 0
    for i, leaf in enumerate(range(101, 107)):
        for part in (100, leaf):
            rows.append((1000 + i, part, ln))
            ln += 1
    spark.createDataFrame(
        [(o, p, i, 1, 1.0, 0.0, 0.0, "N", "O",
          datetime.date(2024, 1, 1), datetime.date(2024, 1, 2),
          datetime.date(2024, 1, 3), "x", "y", "z")
         for (o, p, i) in rows],
        "l_orderkey long, l_partkey long, l_linenumber int,"
        " l_quantity int, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate date, l_commitdate date, l_receiptdate date,"
        " l_shipinstruct string, l_shipmode string, l_comment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    got = gph.degree_assortativity(spark, str(tmp_path)).collect()[0]
    assert got["n_edges"] == 6
    # star of n leaves: r = -1 exactly
    assert got["assortativity_milli"] == -1000

    # clique: one basket with 5 parts -> K5, all degrees 4
    rows2 = [(1, 200 + j, j) for j in range(5)]
    spark.createDataFrame(
        [(o, p, i, 1, 1.0, 0.0, 0.0, "N", "O",
          datetime.date(2024, 1, 1), datetime.date(2024, 1, 2),
          datetime.date(2024, 1, 3), "x", "y", "z")
         for (o, p, i) in rows2],
        "l_orderkey long, l_partkey long, l_linenumber int,"
        " l_quantity int, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate date, l_commitdate date, l_receiptdate date,"
        " l_shipinstruct string, l_shipmode string, l_comment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    got2 = gph.degree_assortativity(spark, str(tmp_path)).collect()[0]
    assert got2["n_edges"] == 10
    assert got2["assortativity_milli"] is None
