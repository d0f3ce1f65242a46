"""MJPEG-AVI container (functions/avicodec.py): build → parse round
trip, metadata, frame extraction through the Spark video tier, honest
refusals for ffmpeg-needing containers, and DHT-less MJPEG decode."""

import numpy as np
import pytest

from homemade_vector_db_spark.functions import avicodec as av
from homemade_vector_db_spark.functions import jpegcodec as jc


def _frame(i, h=16, w=24):
    x = np.linspace(0, 255, w)
    y = np.linspace(0, 255, h)
    g = np.clip(np.round(np.add.outer(y, x) / 2) + i * 10, 0, 255).astype(np.uint8)
    return np.stack([g, g, g], axis=-1)


def _avi(n=3, h=16, w=24, q=95):
    jpegs = [jc.encode_jpeg(_frame(i, h, w), quality=q) for i in range(n)]
    return av.encode_mjpeg_avi(jpegs, w, h, fps=10), jpegs


def test_avi_round_trip_and_metadata():
    data, jpegs = _avi(4)
    assert av.sniff_video_format(data) == "avi"
    got = av.extract_frames(data)
    assert got == jpegs  # byte-exact container round trip
    meta = av.avi_metadata(data)
    assert meta["n_frames"] == 4 and (meta["width"], meta["height"]) == (24, 16)
    assert meta["us_per_frame"] == 100_000


def test_avi_frames_decode_as_jpeg():
    data, _ = _avi(2)
    for i, fb in enumerate(av.extract_frames(data)):
        dec = jc.decode_jpeg(fb)
        want = _frame(i)
        assert dec.shape == want.shape
        assert np.abs(dec.astype(int) - want.astype(int)).max() <= 8


def test_dht_less_mjpeg_frame_decodes():
    """MJPEG streams often strip DHT; the decoder implies the standard
    Annex K tables (our encoder always uses them, so stripping is
    lossless)."""
    full = jc.encode_jpeg(_frame(0), quality=95)
    stripped = bytearray()
    i = 2
    stripped += full[:2]
    import struct as st

    while i + 4 <= len(full):
        marker = full[i + 1]
        if marker == 0xD9:
            stripped += full[i : i + 2]
            break
        if marker == 0xDA:
            stripped += full[i:]
            break
        ln = st.unpack_from(">H", full, i + 2)[0]
        if marker != 0xC4:  # drop DHT segments
            stripped += full[i : i + 2 + ln]
        i += 2 + ln
    assert b"\xff\xc4" not in bytes(stripped)[:50]
    a = jc.decode_jpeg(bytes(stripped))
    b = jc.decode_jpeg(full)
    assert np.array_equal(a, b)


def test_sniffs_and_refusals():
    assert av.sniff_video_format(b"\x00\x00\x00\x18ftypmp42rest") == "mp4"
    assert av.sniff_video_format(b"\x1a\x45\xdf\xa3matroska") == "mkv"
    assert av.sniff_video_format(b"RIFFxxxxWAVE") == "unknown"
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        av.extract_frames(b"\x00\x00\x00\x18ftypmp42")
    with pytest.raises(ValueError, match="no frames"):
        av.encode_mjpeg_avi([], 8, 8)


def test_real_avi_through_spark_video_tier(spark):
    from homemade_vector_db_spark.operators import multimodal

    data, jpegs = _avi(4)
    rows = [
        (30, "video", data, "video/x-msvideo", 24, 16, 400),
        (31, "video", b"not a container at all, just bytes" * 3,
         "video/raw", None, None, 100),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    frames = multimodal.sample_frames(media, every_n=1, max_frames=3).collect()
    by_mid = {}
    for r in frames:
        by_mid.setdefault(r.media_id, []).append(r)
    # real path: 3 of the 4 frames, byte-equal to the encoded JPEGs
    got = sorted(by_mid[30], key=lambda r: r.frame_idx)
    assert [bytes(r.frame_bytes) for r in got] == jpegs[:3]
    # stub path still works for unknown payloads
    assert len(by_mid[31]) >= 1
    mp4 = spark.createDataFrame(
        [(32, "video", b"\x00\x00\x00\x18ftypmp42xxxx", "video/mp4",
          None, None, 50)],
        multimodal.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="ffmpeg"):
        multimodal.sample_frames(mp4).collect()
