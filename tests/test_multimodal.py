"""Multimodal plumbing: binary payload schema, Arrow-batched
extraction, real PPM decode."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mapreduceece563_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_ppm,
    documents_as_media,
    documents_as_ppm,
    encode_ppm,
    extract_features,
    image_decode_stats,
)
from tests.conftest import SF_DIR


def test_ppm_round_trip():
    px = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(4, 5, 3)
    payload = encode_ppm(5, 4, px)
    w, h, decoded = decode_ppm(payload)
    assert (w, h) == (5, 4)
    assert np.array_equal(decoded, px)


def test_ppm_decode_handles_comments_and_rejects_malformed():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    payload = b"P6\n# a netpbm comment\n2 2\n255\n" + px.tobytes()
    w, h, decoded = decode_ppm(payload)
    assert (w, h) == (2, 2) and decoded.shape == (2, 2, 3)
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n2 2\n255\n" + px.tobytes())  # wrong magic
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n2 2\n255\n" + px.tobytes()[:-1])  # short raster
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n2 2\n65535\n" + px.tobytes())  # 16-bit maxval


def test_decoded_stats_match_payload_pixels(spark):
    """image_decode_stats must agree with an independent decode of the
    actual payload bytes (not the closed-form formula — that is the
    oracle's job)."""
    payloads = {
        r["media_id"]: bytes(r["payload"])
        for r in documents_as_ppm(spark, SF_DIR).collect()
    }
    for r in image_decode_stats(spark, SF_DIR).limit(500).collect():
        w, h, px = decode_ppm(payloads[r["doc_id"]])
        sums = px.astype(np.int64).sum(axis=(0, 1))
        assert (r["width"], r["height"]) == (w, h)
        assert (r["sum_r"], r["sum_g"], r["sum_b"]) == tuple(sums)


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


def test_wav_roundtrip_and_malformed():
    """encode_wav -> decode_wav is the identity on (rate, samples);
    malformed payloads raise instead of mis-parsing."""
    import numpy as np
    import pytest

    from mapreduceece563_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    s = np.array([-2048, 0, 17, 2047, -1], dtype=np.int16)
    rate, out = decode_wav(encode_wav(8000, s))
    assert rate == 8000
    assert out.tolist() == s.tolist()
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxJUNK")
    with pytest.raises(ValueError):
        decode_wav(b"not audio at all")
    # stereo / non-PCM rejected by the fmt walk
    bad = bytearray(encode_wav(8000, s))
    bad[22] = 2  # channels = 2
    with pytest.raises(ValueError):
        decode_wav(bytes(bad))


def test_vf1_frame_seek_and_bounds():
    """decode_vf1_frame seeks the exact raster; out-of-range frame
    indices and bad magic raise."""
    import numpy as np
    import pytest

    from mapreduceece563_spark.operators.multimodal import (
        decode_vf1_frame,
        encode_vf1,
    )

    frames = np.arange(2 * 3 * 4 * 3, dtype=np.uint8).reshape(2, 3, 4, 3)
    payload = encode_vf1(4, 3, frames)
    for k in range(2):
        w, h, px = decode_vf1_frame(payload, k)
        assert (w, h) == (4, 3)
        assert np.array_equal(px, frames[k])
    with pytest.raises(ValueError):
        decode_vf1_frame(payload, 2)
    with pytest.raises(ValueError):
        decode_vf1_frame(b"P6\n1 1\n255\nxxx", 0)
