"""Multimodal column plumbing (binary payload + meta struct)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from caliper_poc_data_etl_spark.multimodal import (
    MEDIA_SCHEMA,
    decode_media_real,
    documents_as_media,
    fake_decode_pixel_features,
    payload_stats,
    resize_pixels,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return documents_as_media(spark, sf_dir)


def test_media_layout(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "payload", "meta"]
    assert media.schema["payload"].dataType.typeName() == "binary"
    # Same names/types as the declared convention (nullability may
    # differ — literals in the adapter are non-nullable).
    assert media.schema.simpleString() == MEDIA_SCHEMA.simpleString()
    row = media.first()
    assert row["meta"]["kind"] == "text"


def test_payload_stats_matches_local(media):
    sample = {r["media_id"]: bytes(r["payload"]) for r in media.limit(20).collect()}
    ps = payload_stats(media)
    got = {
        r["media_id"]: r
        for r in ps.filter(ps.media_id.isin(list(sample))).collect()
    }
    for mid, payload in sample.items():
        assert got[mid]["n_bytes"] == len(payload)
        assert got[mid]["payload_md5"] == hashlib.md5(payload).hexdigest()
        assert got[mid]["head_byte"] == payload[0]


def test_fake_decode_matches_numpy(media):
    sample = {r["media_id"]: bytes(r["payload"]) for r in media.limit(20).collect()}
    feats = {
        r["media_id"]: r for r in fake_decode_pixel_features(media).collect()
    }
    for mid, payload in sample.items():
        px = np.frombuffer(payload, dtype=np.uint8)
        assert feats[mid]["n_pixels"] == px.size
        assert feats[mid]["mean_pixel"] == pytest.approx(float(px.mean()))
        assert feats[mid]["min_pixel"] == int(px.min())
        assert feats[mid]["max_pixel"] == int(px.max())


def test_frame_sampling_reassembles(media):
    fb = 32
    frames = sample_frames(media, frame_bytes=fb, every_n=1)  # keep all frames
    one = media.orderBy("media_id").first()
    payload = bytes(one["payload"])
    got = sorted(
        (
            (r["frame_idx"], bytes(r["frame"]))
            for r in frames.filter(frames.media_id == one["media_id"]).collect()
        )
    )
    reassembled = b"".join(f for _, f in got)
    assert reassembled == payload
    assert all(len(f) == fb for _, f in got[:-1])  # only last frame ragged


def test_frame_sampling_stride(media):
    fb = 32
    half = sample_frames(media, frame_bytes=fb, every_n=2)
    assert half.filter(half.frame_idx % 2 == 1).count() == 0


def test_resize_strides_payload(media):
    factor = 4
    small = resize_pixels(media, factor=factor)
    assert small.schema == media.schema
    orig = {r["media_id"]: bytes(r["payload"]) for r in media.limit(5).collect()}
    got = {
        r["media_id"]: bytes(r["payload"])
        for r in small.filter(small.media_id.isin(list(orig))).collect()
    }
    for mid, payload in orig.items():
        assert got[mid] == payload[::factor]


def test_real_decode_is_cleanly_stubbed(media):
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL unexpectedly present; stub path not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_media_real(media)


def test_frame_sampling_empty_payload_emits_no_rows(spark):
    # sequence(0, -1) on an empty payload would emit a spurious
    # frame_idx=0 row without the n_frames>0 guard (ADVICE r1).
    media = spark.createDataFrame(
        [("m0", b""), ("m1", b"abcdef")], "media_id string, payload binary"
    )
    rows = sample_frames(media, frame_bytes=4, every_n=1).collect()
    assert {r["media_id"] for r in rows} == {"m1"}
    assert len(rows) == 2  # ceil(6/4) frames for m1 only
