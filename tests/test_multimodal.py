"""Multimodal plumbing: binary payload schema, Arrow-batched
extraction, stubbed decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduceece563_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_image,
    documents_as_media,
    extract_features,
)
from tests.conftest import SF_DIR


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00\x01")


def test_decode_fake_deterministic():
    px = decode_image(b"payload", fake=True)
    assert px == decode_image(b"payload", fake=True)
    assert len(px) == 16 and all(0 <= b <= 255 for b in px)


def test_media_schema_and_extraction(spark):
    media = documents_as_media(spark, SF_DIR)
    assert [f.name for f in media.schema.fields] == [
        f.name for f in MEDIA_SCHEMA.fields
    ]
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == media.count()
    # payload md5 must equal md5 of the utf-8 text it was built from
    import hashlib

    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()}
    for r in rows[:20]:
        expected = hashlib.md5(docs[r["media_id"]].encode()).hexdigest()
        assert r["payload_md5"] == expected
        assert r["n_bytes"] == len(docs[r["media_id"]].encode())


def test_metadata_only_plan_prunes_payload(spark):
    """Selecting only metadata must not read the payload column —
    column pruning reaches the scan."""
    media = documents_as_media(spark, SF_DIR)
    meta_only = media.select("media_id", "media_type")
    plan = meta_only._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan
