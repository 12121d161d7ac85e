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
