"""Round-17 queue: implemented + oracle-tested ahead of registration.

template_dedup_stats is the dedup tier between exact and near:
form letters — identical except for the digits in them — hash apart
under exact dedup yet are one template."""

from __future__ import annotations

from tests.conftest import SF_DIR, assert_frames_match


def test_template_dedup_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import dedup as dd

    assert_frames_match(
        dd.template_dedup_stats(spark, SF_DIR),
        duck.execute(dd.TEMPLATE_DEDUP_SQL),
        ctx="template_dedup_stats",
    )


def test_template_dedup_python_model(spark):
    """Replay the mask + double-digest accounting in pure Python."""
    import hashlib
    import re

    from mapreduceece563_spark.operators import dedup as dd
    from mapreduceece563_spark.sources.catalog import load_table

    texts = [
        r["text"]
        for r in load_table(spark, SF_DIR, "documents")
        .select("text").collect()
    ]
    fams: dict = {}
    for t in texts:
        m = re.sub(dd.TEMPLATE_WS_RE, " ",
                   re.sub(dd.TEMPLATE_DIGIT_RE, "#", t.lower()))
        tk = hashlib.md5(m.encode()).hexdigest()
        rk = hashlib.md5(t.encode()).hexdigest()
        n, raws = fams.setdefault(tk, [0, set()])
        raws.add(rk)
        fams[tk] = [n + 1, raws]
    g = dd.template_dedup_stats(spark, SF_DIR).collect()[0]
    assert g["n_docs"] == len(texts)
    assert g["n_templates"] == len(fams)
    assert g["n_docs_in_families"] == sum(
        n for n, _ in fams.values() if n > 1
    )
    assert g["n_templated_families"] == sum(
        1 for n, raws in fams.values() if n > 1 and len(raws) > 1
    )


def test_template_dedup_finds_planted_form_letters(spark, tmp_path):
    """Planted structure: five order confirmations differing only in
    their numbers -> ONE templated family of five; three exact copies
    -> a family that is NOT templated (masking did no work); distinct
    prose -> nothing."""
    from mapreduceece563_spark.operators import dedup as dd

    rows = []
    for i in range(5):
        rows.append((
            i,
            f"Order {1000 + i} confirmed: {i + 2} items, total "
            f"{50 + 7 * i} dollars. Ref {i}{i}{i}.",
            "en", "s", 60,
        ))
    for i in range(5, 8):
        rows.append((i, "exact same text here", "en", "s", 20))
    rows.append((8, "completely different prose", "en", "s", 26))
    rows.append((9, "another unrelated document", "en", "s", 26))
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    g = dd.template_dedup_stats(spark, str(tmp_path)).collect()[0]
    assert g["n_docs"] == 10
    assert g["n_templates"] == 4  # form letter, exact text, 2 prose
    assert g["n_families"] == 2
    assert g["n_templated_families"] == 1
    assert g["n_docs_templated"] == 5
    assert g["n_docs_in_families"] == 8


def test_template_dedup_plan_shuffles_digests_only(spark):
    from mapreduceece563_spark.operators import dedup as dd
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(dd.template_dedup_stats(spark, SF_DIR), "simple")
    assert "hashpartitioning(_tk" in p
    assert "hashpartitioning(text" not in p
    assert "Window" not in p


def test_round17_queue_on_empty_tables(spark, tmp_path):
    import duckdb
    import pyarrow.parquet as pq

    from mapreduceece563_spark.operators import dedup as dd
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
        dd.template_dedup_stats(spark, str(d)),
        con.execute(dd.TEMPLATE_DEDUP_SQL),
        ctx="empty:template_dedup_stats",
    )
    assert_frames_match(
        dd.cdc_chunk_stats(spark, str(d)),
        con.execute(dd.CDC_CHUNK_SQL),
        ctx="empty:cdc_chunk_stats",
    )
    from mapreduceece563_spark.operators import mining as mn

    assert_frames_match(
        mn.markov_next_event_accuracy(spark, str(d)),
        con.execute(mn.MARKOV_ACCURACY_SQL),
        ctx="empty:markov_next_event_accuracy",
    )
    assert_frames_match(
        dd.neardup_transitivity_audit(spark, str(d)),
        con.execute(dd.NEARDUP_TRANSITIVITY_ORACLE),
        ctx="empty:neardup_transitivity_audit",
    )
    con.close()


def test_cdc_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import dedup as dd

    assert_frames_match(
        dd.cdc_chunk_stats(spark, SF_DIR),
        duck.execute(dd.CDC_CHUNK_SQL),
        ctx="cdc_chunk_stats",
    )


def test_cdc_python_model(spark):
    """Replay the trailing-window boundary rule, the chunking, the
    chunk poly-hashes, and the dedup ledger in pure Python."""
    from mapreduceece563_spark.functions.hashing import HASH_BASE, HASH_MOD
    from mapreduceece563_spark.operators import dedup as dd
    from mapreduceece563_spark.sources.catalog import load_table

    texts = [
        r["text"]
        for r in load_table(spark, SF_DIR, "documents")
        .select("text").collect()
    ]

    def win_hash(t, p):  # p is 1-based end position
        acc = 0
        for i in range(p - dd.CDC_WINDOW + 1, p + 1):
            acc = (acc * HASH_BASE + ord(t[i - 1])) % HASH_MOD
        return acc

    def poly(s):
        acc = 0
        for ch in s:
            acc = (acc * HASH_BASE + ord(ch)) % HASH_MOD
        return acc if s else 0

    from collections import Counter

    per_chunk: Counter = Counter()
    for t in texts:
        n = len(t)
        pos = [
            p for p in range(dd.CDC_WINDOW, n)
            if win_hash(t, p) % dd.CDC_MASK == 0
        ] if n > dd.CDC_WINDOW else []
        b = [0] + pos + [n]
        for i in range(len(b) - 1):
            seg = t[b[i]:b[i + 1]]
            per_chunk[(poly(seg), len(seg))] += 1
    g = dd.cdc_chunk_stats(spark, SF_DIR).collect()[0]
    total = sum(per_chunk.values())
    assert g["n_chunk_instances"] == total
    assert g["n_distinct_chunks"] == len(per_chunk)
    assert g["total_bytes"] == sum(
        ln * c for (_, ln), c in per_chunk.items()
    )
    assert g["dup_bytes"] == sum(
        (c - 1) * ln for (_, ln), c in per_chunk.items()
    )
    assert g["min_chunk_len"] == min(ln for _, ln in per_chunk)
    assert g["max_chunk_len"] == max(ln for _, ln in per_chunk)


def test_cdc_survives_an_insertion(spark, tmp_path):
    """THE content-defined property: inserting one character near the
    start of a document shifts every byte after it, yet the chunking
    re-synchronizes at the next boundary — the two versions must
    share most of their bytes as duplicate chunks (fixed-stride
    chunking would share none past the edit)."""
    import random

    from mapreduceece563_spark.operators import dedup as dd

    rng = random.Random(17)
    body = "".join(
        rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(3000)
    )
    edited = body[:15] + "X" + body[15:]
    rows = [
        (0, body, "en", "s", len(body)),
        (1, edited, "en", "s", len(edited)),
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    g = dd.cdc_chunk_stats(spark, str(tmp_path)).collect()[0]
    assert g["total_bytes"] == 6001
    # everything after the first post-edit boundary dedups: the two
    # versions share all chunks except the one(s) containing the edit
    assert g["dup_bytes"] > 2400


def test_cdc_plan_shuffles_chunk_digests_only(spark):
    from mapreduceece563_spark.operators import dedup as dd
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(dd.cdc_chunk_stats(spark, SF_DIR), "simple")
    assert "hashpartitioning(h" in p
    assert "hashpartitioning(text" not in p
    assert "Window" not in p


def test_markov_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import mining as mn

    assert_frames_match(
        mn.markov_next_event_accuracy(spark, SF_DIR),
        duck.execute(mn.MARKOV_ACCURACY_SQL),
        ctx="markov_next_event_accuracy",
    )


def test_markov_python_model(spark):
    """Replay pairing, epoch split, argmax training, and both
    accuracy metrics in pure Python."""
    import datetime
    from collections import Counter

    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.operators import mining as mn
    from mapreduceece563_spark.sources.catalog import load_table

    split = datetime.datetime.fromisoformat(an.KS_SPLIT)
    rows = load_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["event_type"])
        )
    train: Counter = Counter()
    test = []
    maj: Counter = Counter()
    for u, evs in by_user.items():
        evs.sort()
        for (ts, _, a), (_, _, b) in zip(evs, evs[1:]):
            if ts >= split:
                test.append((a, b))
            else:
                train[(a, b)] += 1
                maj[b] += 1
    pred = {}
    for (a, b), c in train.items():
        cur = pred.get(a)
        if cur is None or (-c, b) < cur[0]:
            pred[a] = ((-c, b), b)
    pred = {a: v[1] for a, v in pred.items()}
    majority = min(maj, key=lambda t: (-maj[t], t))
    got = {
        r["from_type"]: r
        for r in mn.markov_next_event_accuracy(spark, SF_DIR).collect()
    }
    per_from: dict = {}
    for a, b in test:
        n, c, m = per_from.setdefault(a, [0, 0, 0])
        per_from[a] = [
            n + 1,
            c + (1 if pred.get(a) == b else 0),
            m + (1 if b == majority else 0),
        ]
    assert set(got) == set(per_from)
    for a, (n, c, m) in per_from.items():
        g = got[a]
        assert (g["n_test_pairs"], g["n_correct"]) == (n, c)
        assert g["predicted_type"] == pred.get(a)
        assert g["accuracy_ppm"] == c * 1_000_000 // n
        assert g["majority_baseline_ppm"] == m * 1_000_000 // n


def test_markov_learns_a_planted_chain(spark, tmp_path):
    """A deterministic A->B->C->A cycle in both epochs: the trained
    predictor must score EXACTLY 1e6 on the held-out epoch while the
    majority baseline sits near 1/3 — proof the entry measures
    transition signal, not class frequency."""
    import datetime

    from mapreduceece563_spark.operators import analytics as an
    from mapreduceece563_spark.operators import mining as mn

    split = datetime.datetime.fromisoformat(an.KS_SPLIT)
    cycle = ["alpha", "beta", "gamma"]
    rows, eid = [], 0
    for epoch, t0 in ((0, split - datetime.timedelta(days=5)),
                      (1, split + datetime.timedelta(days=5))):
        for u in range(10):
            for i in range(30):
                ts = t0 + datetime.timedelta(minutes=i)
                rows.append(
                    (eid, ts, u, cycle[i % 3], 1.0, "{}")
                )
                eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    got = {
        r["from_type"]: r
        for r in mn.markov_next_event_accuracy(spark, str(tmp_path)).collect()
    }
    for a, nxt in (("alpha", "beta"), ("beta", "gamma"), ("gamma", "alpha")):
        assert got[a]["predicted_type"] == nxt
        assert got[a]["accuracy_ppm"] == 1_000_000
    # the majority class is 'alpha' (count tie -> lexicographic), so
    # the baseline is 0 from alpha and beta (their next is beta/gamma)
    # and 1e6 from gamma — the Markov predictor beats it where the
    # chain disagrees with class frequency and ties it where it can't
    assert got["alpha"]["majority_baseline_ppm"] == 0
    assert got["beta"]["majority_baseline_ppm"] == 0
    assert got["gamma"]["majority_baseline_ppm"] == 1_000_000


def test_markov_plan_windows_user_sequences_only(spark):
    from mapreduceece563_spark.operators import mining as mn
    from mapreduceece563_spark.plans import plan_string

    p = plan_string(mn.markov_next_event_accuracy(spark, SF_DIR), "simple")
    assert "windowspecdefinition(user_id" in p
    assert "windowspecdefinition(event_id" not in p


def test_transitivity_matches_oracle(spark, duck):
    from mapreduceece563_spark.operators import dedup as dd

    assert_frames_match(
        dd.neardup_transitivity_audit(spark, SF_DIR),
        duck.execute(dd.NEARDUP_TRANSITIVITY_ORACLE),
        ctx="neardup_transitivity_audit",
    )


def test_transitivity_python_model(spark):
    """Wedge/closure census replayed in pure Python from the op's own
    candidate pairs — complete verification of the counting."""
    from mapreduceece563_spark.operators import dedup as dd

    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dd.dedup_minhash(spark, SF_DIR).collect()
    }
    nbrs: dict = {}
    for a, b in pairs:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    wedges = 0
    closed = 0
    for w, ns in nbrs.items():
        ns_sorted = sorted(ns)
        for i, a in enumerate(ns_sorted):
            for b in ns_sorted[i + 1:]:
                wedges += 1
                if (a, b) in pairs:
                    closed += 1
    g = dd.neardup_transitivity_audit(spark, SF_DIR).collect()[0]
    assert (g["n_pairs"], g["n_wedges"], g["n_closed"]) == (
        len(pairs), wedges, closed,
    )
    assert g["closure_ppm"] == closed * 1_000_000 // max(wedges, 1)
    assert 0 <= g["closure_ppm"] <= 1_000_000
