"""Multimodal plumbing tests: schemas/batch shapes are real even though
decode kernels are stubbed (no codec libs in this container)."""

import pytest

from elastic_asset_etl_poc_spark.operators.multimodal import (
    FRAME_SAMPLE_SCHEMA,
    IMAGE_FEATURES_SCHEMA,
    decode_audio,
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


def test_audio_decode_stubbed(spark):
    with pytest.raises(NotImplementedError):
        decode_audio(synthetic_media(spark, n=1))
