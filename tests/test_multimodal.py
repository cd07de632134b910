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


def _make_bmp(w, h, rgb):
    import struct

    stride = (w * 3 + 3) & ~3
    header = struct.pack("<2sIHHI", b"BM", 54 + stride * h, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 2835, 2835, 0, 0
    )
    row = bytes([rgb[2], rgb[1], rgb[0]] * w) + b"\x00" * (stride - w * 3)
    return header + row * h


def _png_chunk(t, d):
    import struct
    import zlib

    return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d))


def _make_png(w, h, rgb, filters=None):
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    if filters is None:
        raw = b"".join(b"\x00" + bytes(rgb) * w for _ in range(h))
    else:
        raw = filters
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def test_real_bmp_png_decode(spark):
    df = spark.createDataFrame(
        [
            (0, _make_bmp(4, 2, (255, 0, 0))),   # red -> luma 76.245
            (1, _make_png(3, 3, (0, 0, 255))),    # blue -> luma 29.07
            (2, b"\xff\xd8\xff not-actually-jpeg"),  # unknown -> stub
        ],
        "media_id long, payload binary",
    )
    out = {r.media_id: r for r in extract_image_features(df).collect()}
    assert (out[0].format, out[0].width, out[0].height) == ("bmp", 4, 2)
    assert abs(out[0].mean_luma - 0.299 * 255) < 1e-9
    assert (out[1].format, out[1].width, out[1].height) == ("png", 3, 3)
    assert abs(out[1].mean_luma - 0.114 * 255) < 1e-9
    assert out[2].format == "fake"


def test_png_sub_filter_unfiltering(spark):
    # one scanline, filter type 1 (Sub): stored = actual - left-pixel byte
    raw = bytes([1, 10, 20, 30, 5, 5, 5])  # pixels (10,20,30), (15,25,35)
    df = spark.createDataFrame(
        [(0, _make_png(2, 1, None, filters=raw))], "media_id long, payload binary"
    )
    r = extract_image_features(df).collect()[0]
    assert r.format == "png"
    expected = (
        (0.299 * 10 + 0.587 * 20 + 0.114 * 30)
        + (0.299 * 15 + 0.587 * 25 + 0.114 * 35)
    ) / 2
    assert abs(r.mean_luma - expected) < 1e-9


def test_png_average_and_paeth_filters(spark):
    # row 1: filter 0 (raw); row 2: Paeth — both pixels predict from up/left
    raw_paeth = (
        bytes([0, 10, 20, 30, 40, 50, 60]) + bytes([4, 2, 2, 2, 5, 5, 5])
    )  # row2 pixels decode to (12,22,32), (45,55,65)
    raw_avg = bytes([3, 10, 20, 30, 10, 15, 20])  # pixels (10,20,30), (15,25,35)
    df = spark.createDataFrame(
        [
            (0, _make_png(2, 2, None, filters=raw_paeth)),
            (1, _make_png(2, 1, None, filters=raw_avg)),
            (2, _make_png(1, 1, None, filters=bytes([7, 1, 2, 3]))),  # bad filter
        ],
        "media_id long, payload binary",
    )
    out = {r.media_id: r for r in extract_image_features(df).collect()}

    def luma(*px):
        return sum(0.299 * r + 0.587 * g + 0.114 * b for r, g, b in px) / len(px)

    assert out[0].format == "png"
    assert abs(out[0].mean_luma - luma((10, 20, 30), (40, 50, 60), (12, 22, 32), (45, 55, 65))) < 1e-9
    assert out[1].format == "png"
    assert abs(out[1].mean_luma - luma((10, 20, 30), (15, 25, 35))) < 1e-9
    assert out[2].format == "fake"  # corrupt filter byte -> fail-soft stub
