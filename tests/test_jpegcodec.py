"""Baseline JPEG codec (functions/jpegcodec.py): round-trip error bounds
across gray/RGB, 4:4:4 and 4:2:0, odd sizes, quality sweep, marker-level
structure, honest refusals, and integration with the image-tier
dispatcher."""

import struct

import numpy as np
import pytest

from homemade_vector_db_spark.functions import imagecodec as ic
from homemade_vector_db_spark.functions import jpegcodec as jc


def _smooth(h, w):
    x = np.linspace(0, 255, w)
    y = np.linspace(0, 255, h)
    return np.clip(np.round(np.add.outer(y, x) / 2), 0, 255).astype(np.uint8)


def _smooth_rgb(h, w):
    g = _smooth(h, w)
    return np.stack([g, 255 - g, g // 2 + 40], axis=-1)


def test_gray_round_trip_tight():
    g = _smooth(32, 32)
    dec = jc.decode_jpeg(jc.encode_jpeg(g, quality=95))
    assert dec.shape == g.shape and dec.dtype == np.uint8
    assert np.abs(dec.astype(int) - g.astype(int)).max() <= 3


def test_rgb_444_round_trip():
    img = _smooth_rgb(24, 40)
    dec = jc.decode_jpeg(jc.encode_jpeg(img, quality=92))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 8


def test_rgb_420_subsampled_round_trip():
    """4:2:0 exercises the decoder's generic MCU walk (2x2 luma blocks
    per MCU + upsampled chroma)."""
    img = _smooth_rgb(23, 37)  # odd dims: crop path + partial MCUs
    data = jc.encode_jpeg(img, quality=92, subsample=True)
    dec = jc.decode_jpeg(data)
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 16
    # the stream really declares 2x2 luma sampling
    i = data.index(b"\xff\xc0")
    assert data[i + 11] == 0x22  # component 1 h=2, v=2


def test_quality_monotonic_size_and_error():
    img = _smooth_rgb(32, 32)
    sizes, errs = [], []
    for q in (30, 60, 90):
        d = jc.encode_jpeg(img, quality=q)
        sizes.append(len(d))
        errs.append(np.abs(jc.decode_jpeg(d).astype(int) - img.astype(int)).mean())
    assert sizes[0] <= sizes[1] <= sizes[2]
    assert errs[0] >= errs[1] >= errs[2]


def test_noise_round_trip_bounded():
    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    dec = jc.decode_jpeg(jc.encode_jpeg(g, quality=95))
    # noise is JPEG's worst case; q95 still bounds the error well below
    # full-scale
    assert np.abs(dec.astype(int) - g.astype(int)).max() <= 48


def test_flat_image_is_near_exact():
    flat = np.full((8, 8, 3), 77, dtype=np.uint8)
    dec = jc.decode_jpeg(jc.encode_jpeg(flat, quality=90))
    assert np.abs(dec.astype(int) - 77).max() <= 1


def test_refuses_progressive_and_12bit():
    # minimal stream with a progressive SOF2
    sof2 = b"\xff\xc2" + struct.pack(">H", 11) + bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0])
    with pytest.raises(NotImplementedError, match="non-baseline"):
        jc.decode_jpeg(b"\xff\xd8" + sof2)
    sof0_12 = b"\xff\xc0" + struct.pack(">H", 11) + bytes([12, 0, 8, 0, 8, 1, 1, 0x11, 0])
    with pytest.raises(NotImplementedError, match="12-bit"):
        jc.decode_jpeg(b"\xff\xd8" + sof0_12 + b"\xff\xda\x00\x08\x01\x01\x00\x00\x3f\x00")
    with pytest.raises(ValueError, match="not a JPEG"):
        jc.decode_jpeg(b"PNG junk")
    with pytest.raises(ValueError, match="no SOS"):
        jc.decode_jpeg(b"\xff\xd8\xff\xe0" + struct.pack(">H", 4) + b"xx")


def test_skips_app_and_comment_segments():
    g = _smooth(8, 8)
    data = bytearray(jc.encode_jpeg(g, quality=90))
    com = b"\xff\xfe" + struct.pack(">H", 9) + b"comment"
    spliced = bytes(data[:2]) + com + bytes(data[2:])
    dec = jc.decode_jpeg(spliced)
    assert np.abs(dec.astype(int) - g.astype(int)).max() <= 3


def test_image_tier_dispatch_and_thumbnail():
    img = _smooth_rgb(20, 30)
    data = jc.encode_jpeg(img, quality=95)
    assert ic.sniff_format(data) == "jpeg"
    dec = ic.decode_image(data)
    assert dec.shape == (20, 30, 3)
    small = ic.resize_nearest(dec, 8, 8)
    assert small.shape == (8, 8, 3)


def test_huffman_tables_are_canonical():
    """Spec sanity: canonical code assignment is prefix-free and the
    encoder/decoder tables are exact inverses."""
    for spec in (jc.DC_LUM_SPEC, jc.DC_CHROM_SPEC, jc.AC_LUM_SPEC, jc.AC_CHROM_SPEC):
        enc = jc._build_huffman(spec)
        dec = jc._build_decoder(spec)
        assert len(enc) == len(dec) == len(spec[1])
        for sym, (code, ln) in enc.items():
            assert dec[(ln, code)] == sym
        # prefix-free: no code is a prefix of another
        codes = sorted(
            (f"{code:0{ln}b}" for code, ln in enc.values()), key=len
        )
        for i, a in enumerate(codes):
            for b in codes[i + 1 :]:
                assert not b.startswith(a), (a, b)
