"""Training-corpus assembly operators: PII redaction on an injected
fixture (the driver tables contain no PII-shaped strings), split
determinism, packing invariants, quantization ranges, and the plan
shapes that matter at scale."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from mapreduceece563_spark import registry
from mapreduceece563_spark.operators.trainprep import (
    EMAIL_RE,
    IPV4_RE,
    LONG_DIGITS_RE,
    PACK_BUDGET_TOKENS,
    PACK_SHARDS,
    QUANT_LEVELS,
    redact_pii,
)
from mapreduceece563_spark.plans import plan_string
from tests.conftest import SF_DIR

Q = registry.queries()

PII_LINES = [
    "contact me at jane.doe+test@example.co.uk or on 5551234567890",
    "server 192.168.0.1 and 10.0.0.255 responded",
    "no pii here at all",
    "a@b.io mid-sentence and trailing ip 8.8.8.8",
    "short 12345 digits stay, 987654321 gets cut",
]


@pytest.fixture(scope="module")
def pii_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("pii") / "docs.parquet"
    pq.write_table(
        pa.table({"doc_id": list(range(len(PII_LINES))), "text": PII_LINES}),
        str(p),
    )
    return str(p)


def test_redact_pii_counts_and_text(spark, pii_path):
    out = redact_pii(spark.read.parquet(pii_path)).orderBy("doc_id").collect()
    assert [r["n_emails"] for r in out] == [1, 0, 0, 1, 0]
    assert [r["n_ips"] for r in out] == [0, 2, 0, 1, 0]
    assert [r["n_long_digits"] for r in out] == [1, 0, 0, 0, 1]
    assert out[0]["text"] == "contact me at <EMAIL> or on <NUM>"
    assert out[1]["text"] == "server <IP> and <IP> responded"
    assert out[2]["text"] == "no pii here at all"
    assert out[3]["text"] == "<EMAIL> mid-sentence and trailing ip <IP>"
    assert out[4]["text"] == "short 12345 digits stay, <NUM> gets cut"


def test_redact_pii_patterns_match_duckdb(spark, pii_path):
    """The same pattern strings must behave identically under Java
    regex (Spark) and RE2 (DuckDB) — that's what makes an oracle for
    a redaction pipeline possible at all."""
    srows = sorted(
        (r["doc_id"], r["text"])
        for r in redact_pii(spark.read.parquet(pii_path)).collect()
    )
    con = duckdb.connect()
    drows = sorted(
        con.execute(
            f"""
            SELECT doc_id,
                   regexp_replace(regexp_replace(regexp_replace(text,
                     '{EMAIL_RE}', '<EMAIL>', 'g'),
                     '{IPV4_RE}', '<IP>', 'g'),
                     '{LONG_DIGITS_RE}', '<NUM>', 'g') AS text
            FROM '{pii_path}'
            """
        ).fetchall()
    )
    assert srows == drows


def test_split_deterministic_and_disjoint(spark):
    per = {
        r["split"]: r
        for r in Q["train_test_split"](spark, SF_DIR).collect()
    }
    assert set(per) == {"train", "val", "test"}
    again = {
        r["split"]: r
        for r in Q["train_test_split"](spark, SF_DIR).collect()
    }
    assert per == again
    total_share = sum(r["tok_share"] for r in per.values())
    assert abs(total_share - 1.0) < 1e-4


def test_token_pack_invariants(spark):
    rows = Q["token_pack"](spark, SF_DIR).collect()
    assert {r["shard"] for r in rows} <= set(range(PACK_SHARDS))
    for r in rows:
        assert r["first_doc"] <= r["last_doc"]
        assert r["n_docs"] >= 1
        # next-fit: a bin holds at least one doc and only the last doc
        # may straddle the budget boundary
        if r["n_docs"] > 1:
            assert r["n_tokens"] >= PACK_BUDGET_TOKENS or r["bin"] >= 0


def test_embedding_quantize_int8_range(spark):
    rows = Q["embedding_quantize"](spark, SF_DIR).collect()
    assert all(-QUANT_LEVELS <= r["q_min"] <= r["q_max"] <= QUANT_LEVELS
               for r in rows)
    # the max-magnitude dim must hit exactly +/-127
    assert all(
        max(abs(r["q_min"]), abs(r["q_max"])) == QUANT_LEVELS for r in rows
    )


def test_contamination_broadcast_semi_join(spark):
    """The eval shingle set must broadcast (semi join, no corpus-side
    shuffle for the membership probe)."""
    plan = plan_string(Q["contamination_check"](spark, SF_DIR), "simple")
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan


def test_mixture_weights_equalize(spark):
    rows = Q["source_mixture_weights"](spark, SF_DIR).collect()
    # weight * share == 1/n_sources for every source (up to rounding)
    n = len(rows)
    for r in rows:
        assert r["mix_weight"] * r["tok_share"] == pytest.approx(
            1.0 / n, rel=1e-3
        )


def test_token_balanced_mixture_reports_zero_token_source(
    spark, tmp_path, duck
):
    """ADVICE r3: a source whose documents all have empty text has
    _tot=0 and a NULL mix factor; it must appear in the manifest with
    n_docs_out=0 / n_tokens_out=0, not silently vanish — in BOTH
    engines."""
    import pandas as pd

    from mapreduceece563_spark.operators import trainprep as tr
    from mapreduceece563_spark.sources.catalog import TABLES

    d = tmp_path / "mix_sf"
    d.mkdir()
    # minimal documents table: one real source, one all-empty source
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["alpha beta gamma", "delta epsilon", "", None],
            "lang": ["en"] * 4,
            "source": ["web", "web", "ghost", "ghost"],
            "n_chars": [16, 13, 0, 0],
        }
    ).to_parquet(d / "documents.parquet")
    for t in TABLES:
        if t != "documents":
            pq.write_table(
                pq.read_table(f"{SF_DIR}/{t}.parquet").slice(0, 0),
                d / f"{t}.parquet",
            )

    rows = {
        r["source"]: r
        for r in tr.token_balanced_mixture(spark, str(d)).collect()
    }
    assert set(rows) == {"web", "ghost"}
    assert rows["ghost"]["n_docs_out"] == 0
    assert rows["ghost"]["n_tokens_out"] == 0
    assert rows["web"]["n_tokens_out"] > 0

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    orows = {
        r[0]: r
        for r in con.execute(tr.TOKEN_BALANCED_MIXTURE_SQL).fetchall()
    }
    con.close()
    assert set(orows) == {"web", "ghost"}
    assert orows["ghost"][1] == 0 and orows["ghost"][2] == 0


def test_mixture_ops_null_on_zero_token_source(spark, tmp_path):
    """Adversarial-vintage regression (round 12): a source whose every
    document is empty has no defined mix weight / repeat factor. The
    Spark side used to raise DIVIDE_BY_ZERO under ANSI mode while the
    DuckDB oracle returned NULL (float path) or errored (integer
    path) — now BOTH engines export explicit NULLs and stay
    hash-identical."""
    from tests.conftest import SF_DIR, assert_frames_match
    from mapreduceece563_spark.operators import trainprep as tr
    from mapreduceece563_spark.sources.catalog import TABLES

    d = tmp_path / "zt_sf"
    d.mkdir()
    for t in TABLES:
        if t == "documents":
            continue
        schema = pq.read_schema(f"{SF_DIR}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["hello world", "", ""], pa.string()),
            "lang": pa.array(["en", "en", "en"], pa.string()),
            "source": pa.array(["full", "void", "void"], pa.string()),
            "n_chars": pa.array([11, 0, 0], pa.int64()),
        }
    )
    pq.write_table(docs, str(d / "documents.parquet"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")

    assert_frames_match(
        tr.source_mixture_weights(spark, str(d)),
        con.execute(tr.SOURCE_MIXTURE_SQL),
        ctx="zero-token:source_mixture_weights",
    )
    assert_frames_match(
        tr.mixture_epoch_schedule(spark, str(d)),
        con.execute(tr.MIXTURE_EPOCH_SQL),
        ctx="zero-token:mixture_epoch_schedule",
    )
    rows = {
        r["source"]: r.asDict()
        for r in tr.source_mixture_weights(spark, str(d)).collect()
    }
    assert rows["void"]["mix_weight"] is None
    assert rows["full"]["mix_weight"] is not None
    sched = {
        r["source"]: r.asDict()
        for r in tr.mixture_epoch_schedule(spark, str(d)).collect()
    }
    assert sched["void"]["repeat_milli"] is None
    assert sched["void"]["n_epochs"] is None
    assert sched["void"]["tokens_weighted"] is None
    assert sched["full"]["repeat_milli"] is not None
