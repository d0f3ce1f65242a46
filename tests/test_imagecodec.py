"""Pure-numpy image codec: decode/encode round-trips, hand-built BMP
layouts, all five PNG scanline filters, and honest refusal of formats a
no-imaging-libs container cannot decode."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from homemade_vector_db_spark.functions import imagecodec as ic


def _rand_rgb(h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_ppm_round_trip():
    arr = _rand_rgb(5, 7)
    out = ic.decode_image(ic.encode_ppm(arr))
    assert out.shape == (5, 7, 3)
    assert np.array_equal(out, arr)


def test_pgm_round_trip_and_header_comments():
    gray = np.random.default_rng(1).integers(0, 256, (4, 6), dtype=np.uint8)
    data = ic.encode_ppm(gray)
    assert data[:2] == b"P5"
    assert np.array_equal(ic.decode_image(data), gray)
    # comments between header fields are legal PNM
    commented = b"P5\n# a comment\n6 4\n# more\n255\n" + gray.tobytes()
    assert np.array_equal(ic.decode_image(commented), gray)


def test_png_round_trip_color_and_gray():
    arr = _rand_rgb(9, 4, seed=2)
    assert np.array_equal(ic.decode_image(ic.encode_png(arr)), arr)
    gray = np.random.default_rng(3).integers(0, 256, (3, 8), dtype=np.uint8)
    assert np.array_equal(ic.decode_image(ic.encode_png(gray)), gray)


def _png_with_filters(arr: np.ndarray, ftypes: list[int]) -> bytes:
    """Encode truecolor PNG applying a given filter type per scanline
    (forward-filtering independently of the decoder under test)."""
    h, w, _ = arr.shape
    nch, stride = 3, 3 * w
    a32 = arr.reshape(h, stride).astype(np.int32)
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = a32[y]
        f = ftypes[y % len(ftypes)]
        line = cur.copy()
        for x in range(stride):
            left = cur[x - nch] if x >= nch else 0
            up = prev[x]
            ul = prev[x - nch] if x >= nch else 0
            if f == 1:
                line[x] = (cur[x] - left) & 0xFF
            elif f == 2:
                line[x] = (cur[x] - up) & 0xFF
            elif f == 3:
                line[x] = (cur[x] - ((left + up) >> 1)) & 0xFF
            elif f == 4:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = (
                    left
                    if (pa <= pb and pa <= pc)
                    else (up if pb <= pc else ul)
                )
                line[x] = (cur[x] - pred) & 0xFF
        out.append(f)
        out.extend(int(v) for v in line)
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        ic.PNG_MAGIC
        + ic._png_chunk(b"IHDR", ihdr)
        + ic._png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + ic._png_chunk(b"IEND", b"")
    )


def test_png_all_filter_types_decode():
    arr = _rand_rgb(10, 6, seed=4)
    for ftypes in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        got = ic.decode_image(_png_with_filters(arr, ftypes))
        assert np.array_equal(got, arr), ftypes


def _bmp24(arr: np.ndarray, top_down: bool = False) -> bytes:
    """Hand-assemble a 24-bit BI_RGB BMP (4-byte row padding)."""
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    rows = arr[:, :, ::-1]  # RGB → BGR
    if not top_down:
        rows = rows[::-1]
    body = bytearray()
    for y in range(h):
        body.extend(rows[y].tobytes())
        body.extend(b"\x00" * (stride - w * 3))
    hdr_h = h if not top_down else -h
    info = struct.pack("<IiiHHIIiiII", 40, w, hdr_h, 1, 24, 0, len(body), 0, 0, 0, 0)
    off = 14 + 40
    file_hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    return file_hdr + info + bytes(body)


def test_bmp_bottom_up_and_top_down():
    arr = _rand_rgb(5, 3, seed=5)  # w=3 → stride padding exercised
    assert np.array_equal(ic.decode_image(_bmp24(arr)), arr)
    assert np.array_equal(ic.decode_image(_bmp24(arr, top_down=True)), arr)


def test_bmp32_alpha_dropped():
    arr = _rand_rgb(2, 2, seed=6)
    h, w = 2, 2
    bgra = np.zeros((h, w, 4), dtype=np.uint8)
    bgra[:, :, :3] = arr[:, :, ::-1]
    bgra[:, :, 3] = 200
    body = bgra[::-1].tobytes()  # stride = 8, already 4-aligned
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 32, 0, len(body), 0, 0, 0, 0)
    off = 14 + 40
    data = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off) + info + body
    assert np.array_equal(ic.decode_image(data), arr)


def test_unsupported_formats_refuse_honestly():
    # round 7: baseline JPEG now decodes for real; a truncated stream is
    # a parse error, not a fabricated result
    with pytest.raises(ValueError, match="no SOS"):
        ic.decode_image(b"\xff\xd8\xff\xe0JFIF-ish")
    with pytest.raises(NotImplementedError):
        ic.decode_image(b"GIF89a notsupported")
    # compressed BMP refuses rather than mis-decoding
    bad = bytearray(_bmp24(_rand_rgb(2, 2)))
    struct.pack_into("<I", bad, 14 + 16, 1)  # compression = BI_RLE8
    with pytest.raises(NotImplementedError, match="compressed BMP"):
        ic.decode_image(bytes(bad))


def test_mean_luma_and_resize():
    flat = np.full((4, 4, 3), 255, dtype=np.uint8)
    assert ic.mean_luma(flat) == pytest.approx(1.0)
    gray = np.full((4, 4), 51, dtype=np.uint8)
    assert ic.mean_luma(gray) == pytest.approx(0.2)
    arr = _rand_rgb(8, 12, seed=7)
    small = ic.resize_nearest(arr, 6, 4)
    assert small.shape == (4, 6, 3)
    # nearest-neighbor: every output pixel is some input pixel
    assert np.array_equal(small[0, 0], arr[0, 0])
    g = ic.resize_nearest(gray, 2, 2)
    assert g.shape == (2, 2) and g.dtype == np.uint8


def test_png_sub_filter_vectorized_wide():
    """Sub unfilter is a per-channel cumsum (round-7 vectorization) —
    exercise a wide scanline to catch any mod-256/overflow slip."""
    arr = _rand_rgb(3, 1500, seed=17)
    got = ic.decode_image(_png_with_filters(arr, [1]))
    assert np.array_equal(got, arr)


def test_png_serial_filters_bounded():
    """Average/Paeth keep a true serial data dependence so they stay
    per-byte Python — scanlines past the documented bound refuse honestly
    (ADVICE r6); the vectorized filters have no bound."""
    w = ic._MAX_SERIAL_FILTER_PX + 1
    wide = np.zeros((1, w, 3), dtype=np.uint8)
    for f in (3, 4):
        with pytest.raises(NotImplementedError, match="pure-Python"):
            ic.decode_image(_png_with_filters(wide, [f]))
    assert ic.decode_image(_png_with_filters(wide, [1])).shape == (1, w, 3)
    assert ic.decode_image(_png_with_filters(wide, [2])).shape == (1, w, 3)


def test_sniff_recognizes_ascii_pnm_and_pbm():
    """P1/P2/P3 (ASCII PNM) and P4 (PBM) sniff as real formats, not
    'unknown', so the multimodal tier can refuse instead of fabricating
    stats from their raw bytes (ADVICE r6)."""
    assert ic.sniff_format(b"P3\n2 2\n255\n0 0 0 1 1 1 2 2 2 3 3 3") == "pnm-ascii"
    assert ic.sniff_format(b"P1\n2 2\n0 1 1 0") == "pnm-ascii"
    assert ic.sniff_format(b"P2\n2 2\n255\n0 1 2 3") == "pnm-ascii"
    assert ic.sniff_format(b"P4\n2 2\n\x80\x40") == "pbm"
    assert ic.sniff_format(b"Px not a magic") == "unknown"


def test_encode_bmp_round_trip():
    """Round-7 encoder (completes the 4-format in-plan certification):
    encode_bmp → decode_image restores every pixel, including non-4-byte
    row strides and the bottom-up BGR layout."""
    for (h, w) in ((8, 8), (5, 7), (3, 2)):
        arr = _rand_rgb(h, w, seed=h * 10 + w)
        assert np.array_equal(ic.decode_image(ic.encode_bmp(arr)), arr)
    with pytest.raises(ValueError, match="RGB"):
        ic.encode_bmp(np.zeros((4, 4), dtype=np.uint8))


# ---------------------------------------------------- perceptual hash
def test_phash64_brightness_invariance():
    import numpy as np

    from homemade_vector_db_spark.functions import imagecodec as ic

    y, x = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    base = ((y * 97 + x * 31) * 40503 % 200).astype(np.uint8)
    h0 = ic.phash64(base)
    # global brightness shift only moves the (dropped) DC coefficient
    assert ic.phash64(base + 7) == h0
    assert ic.phash64(base + 40) == h0
    assert 0 <= h0 < (1 << 63)


def test_phash64_rgb_and_resize_paths():
    import numpy as np

    from homemade_vector_db_spark.functions import imagecodec as ic

    y, x = np.meshgrid(np.arange(64), np.arange(48), indexing="ij")
    gray = ((y * 13 + x * 29) % 256).astype(np.uint8)
    rgb = np.repeat(gray[:, :, None], 3, axis=2)
    # grayscale and its RGB replication share the luma plane → same hash,
    # and the non-32x32 input exercises the resize_nearest path
    assert ic.phash64(gray) == ic.phash64(rgb)


def test_phash64_distinct_patterns_far_apart():
    import numpy as np

    from homemade_vector_db_spark.functions import imagecodec as ic

    y, x = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    hashes = []
    for c in range(6):
        img = (((c * 2654435761 + y * 97 + x * 31) * 40503) % 200).astype(
            np.uint8
        )
        hashes.append(ic.phash64(img))
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            assert bin(hashes[i] ^ hashes[j]).count("1") >= 8


def test_dct_descriptor_real_structure():
    import numpy as np

    from homemade_vector_db_spark.functions import imagecodec as ic

    flat = np.full((32, 32), 100, np.uint8)
    d = ic.dct_descriptor(flat, dim=8)
    assert len(d) == 8
    # constant image: all energy in DC, zero in every AC coefficient
    assert abs(d[0] - 100.0 * 32 / 255.0) < 1e-6  # DC = mean * N
    assert all(abs(v) < 1e-9 for v in d[1:])
    # horizontal gradient: energy appears in the horizontal AC, and the
    # descriptor separates it from the flat image
    grad = np.tile(np.arange(0, 256, 8, dtype=np.uint8), (32, 1))
    g = ic.dct_descriptor(grad, dim=8)
    assert abs(g[1]) > 0.5  # first horizontal frequency
    assert sum((a - b) ** 2 for a, b in zip(d, g)) > 1.0
