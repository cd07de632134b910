"""Property-based tests (hypothesis) for the pure numeric kernels —
no SparkSession needed, so these run fast and explore edge cases the
fixture tests can't (odd dimensions, extreme values, random content)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from elastic_asset_etl_poc_spark.operators.multimodal import (
    _decode_jpeg,
    _decode_png,
    _encode_jpeg_baseline,
    _encode_png_gray,
    _jpeg_end,
    _split_mjpeg,
)


@st.composite
def gray_images(draw, max_side=16):
    w = draw(st.integers(1, max_side))
    h = draw(st.integers(1, max_side))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8)


@settings(max_examples=12, deadline=None)
@given(img=gray_images(), color=st.booleans(), ri=st.integers(0, 3))
def test_jpeg_roundtrip_random_images(img, color, ri):
    """Any uint8 image survives encode→decode with exact dimensions and
    near-exact luma (all-2s quant ⇒ ≤ ±1 per coefficient), with or
    without restart intervals (DRI/RSTn resets exercised when ri > 0)."""
    b = _encode_jpeg_baseline(img, color_420=color, restart_interval=ri)
    w, h, plane = _decode_jpeg(b)
    assert (w, h) == (img.shape[1], img.shape[0])
    assert plane.shape == img.shape
    # per-pixel bound: quantization error over 64 coefficients
    assert float(np.abs(plane - img).max()) <= 16.0
    assert abs(float(plane.mean()) - float(img.mean())) <= 2.0


@settings(max_examples=12, deadline=None)
@given(img=gray_images(max_side=24))
def test_png_gray_roundtrip_lossless(img):
    """Grayscale PNG encode→decode is bit-lossless for any content."""
    w, h, back = _decode_png(_encode_png_gray(img.astype(np.float64)))
    assert (w, h) == (img.shape[1], img.shape[0])
    assert np.array_equal(back.astype(np.uint8), img)


@settings(max_examples=10, deadline=None)
@given(
    imgs=st.lists(gray_images(max_side=12), min_size=1, max_size=6),
    colors=st.lists(st.booleans(), min_size=6, max_size=6),
)
def test_mjpeg_split_recovers_every_frame(imgs, colors):
    """Concatenating any encoded frames and splitting recovers each frame
    byte-exactly (the structural walk never over/under-shoots an EOI)."""
    frames = [
        _encode_jpeg_baseline(img, color_420=c) for img, c in zip(imgs, colors)
    ]
    stream = b"".join(frames)
    out = _split_mjpeg(stream)
    assert out == frames
    # _jpeg_end is exact on each frame boundary
    pos = 0
    for f in frames:
        assert _jpeg_end(stream, pos) == pos + len(f)
        pos += len(f)


@settings(max_examples=15, deadline=None)
@given(
    img=gray_images(max_side=20),
    ow=st.integers(1, 24),
    oh=st.integers(1, 24),
)
def test_resample_preserves_global_mean(img, ow, oh):
    """The integral-image box filter preserves the global mean EXACTLY
    (up to float) for any input and any output geometry — uniform strip
    areas telescope to the total integral."""
    from elastic_asset_etl_poc_spark.operators.multimodal import _area_resample

    src = img.astype(np.float64)
    thumb = _area_resample(src, ow, oh)
    assert thumb.shape == (oh, ow)
    assert abs(float(thumb.mean()) - float(src.mean())) < 1e-9


@settings(max_examples=8, deadline=None)
@given(
    picks=st.lists(st.integers(0, 5), min_size=2, max_size=20),
    extras=st.lists(
        st.integers(-(1 << 63), (1 << 63) - 1), min_size=0, max_size=6
    ),
    k=st.integers(0, 4),
)
def test_banded_hamming_pairs_equals_exact_property(spark, picks, extras, k):
    """Property: the pre-collapsed banded Hamming join emits EXACTLY the
    all-pairs popcount<=k set, for corpora mixing clone clusters (values
    from a 6-element pool -> guaranteed identical fingerprints) with
    arbitrary 64-bit outliers, at every band layout k=0..4."""
    from elastic_asset_etl_poc_spark.operators.neardup import banded_hamming_pairs

    pool = [
        0x0123456789ABCDEF,
        0x0123456789ABCDE0,          # hamming 4 from pool[0]
        -0x7FEDCBA987654321,
        0x00000000FFFFFFFF,
        -1,
        1 << 62,
    ]
    fps = [pool[p] for p in picks] + extras
    rows = [(i, v) for i, v in enumerate(fps)]
    df = spark.createDataFrame(rows, "doc_id long, simhash long")
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in banded_hamming_pairs(df, max_hamming=k).collect()
    }
    want = {}
    for a in range(len(fps)):
        for b in range(a + 1, len(fps)):
            h = bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1")
            if h <= k:
                want[(a, b)] = h
    assert got == want
