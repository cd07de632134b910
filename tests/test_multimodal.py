"""Multimodal plumbing tests: schemas/batch shapes are real even though
decode kernels are stubbed (no codec libs in this container)."""

import pytest

from elastic_asset_etl_poc_spark.operators.multimodal import (
    FRAME_SAMPLE_SCHEMA,
    IMAGE_FEATURES_SCHEMA,
    extract_image_features,
    sample_frames,
    synthetic_media,
)


def test_image_features_schema_and_rows(spark):
    media = synthetic_media(spark, n=16)
    out = extract_image_features(media)
    assert out.schema == IMAGE_FEATURES_SCHEMA
    rows = out.collect()
    assert len(rows) == 16
    assert all(r.n_bytes > 0 and r.width >= 16 for r in rows)


def test_image_features_deterministic(spark):
    media = synthetic_media(spark, n=8)
    a = sorted(map(tuple, extract_image_features(media).collect()))
    b = sorted(map(tuple, extract_image_features(media).collect()))
    assert a == b


def test_frame_sampling_fanout(spark):
    media = synthetic_media(spark, n=6)
    out = sample_frames(media, every_n=2)
    assert out.schema == FRAME_SAMPLE_SCHEMA
    rows = out.collect()
    assert len(rows) > 6  # fan-out: multiple frames per media row
    assert all(r.frame_idx % 2 == 0 for r in rows)
    assert all(len(r.frame_bytes) <= 1024 for r in rows)


def test_audio_features_real_wav_decode(spark):
    from elastic_asset_etl_poc_spark.operators.multimodal import (
        extract_audio_features,
        synthetic_audio,
    )

    out = {r.media_id: r for r in extract_audio_features(synthetic_audio(spark, 16)).collect()}
    assert len(out) == 16
    ok = [r for r in out.values() if r.decode_ok]
    bad = [r for r in out.values() if not r.decode_ok]
    assert len(bad) == 2  # every 8th payload is garbage (ids 7, 15)
    assert {r.media_id for r in bad} == {7, 15}
    for r in ok:
        assert r.sample_rate == 8000 and r.n_channels == 1
        assert r.n_samples in range(400, 651, 50)
        assert abs(r.duration_sec - r.n_samples / 8000) < 1e-9
        assert abs(r.rms - 12000 / 32768 / 2**0.5) < 0.01  # sine rms = A/sqrt(2)
    for r in bad:
        assert r.sample_rate is None and r.rms is None
