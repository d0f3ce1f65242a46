"""Minimal AVI (RIFF) container parser/writer for MJPEG video — pure
stdlib struct, the video sibling of audiocodec (same RIFF chunk walking).

An MJPEG AVI is a RIFF('AVI ') holding a LIST('hdrl') of headers and a
LIST('movi') of per-frame chunks ('NNdc' compressed / 'NNdb' DIB); each
'dc' payload of an MJPEG stream is a baseline JPEG (often DHT-less —
functions/jpegcodec.py fills in the implied Annex K tables). With this
plus the JPEG codec, frame sampling and frame decode are REAL for
MJPEG-AVI; other containers (MP4/MKV/WebM) refuse honestly — their
codecs (H.264 etc.) genuinely need ffmpeg.
"""

from __future__ import annotations

import struct


def sniff_video_format(data: bytes) -> str:
    """'avi' | 'mp4' | 'mkv' | 'unknown' by magic."""
    if len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return "avi"
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return "mp4"
    if data[:4] == b"\x1a\x45\xdf\xa3":
        return "mkv"
    return "unknown"


def _walk_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size); descends into LIST/RIFF."""
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        csz = struct.unpack_from("<I", data, pos + 4)[0]
        body_start = pos + 8
        body_end = min(body_start + csz, end)
        if cid in (b"LIST", b"RIFF"):
            yield from _walk_chunks(data, body_start + 4, body_end)
        else:
            yield cid, body_start, body_end - body_start
        pos = body_start + csz + (csz & 1)  # word-aligned


def extract_frames(data: bytes) -> "list[bytes]":
    """All video-frame payloads ('NNdc'/'NNdb' chunks) in stream order."""
    if sniff_video_format(data) != "avi":
        raise ValueError("not a RIFF/AVI payload")
    frames = []
    for cid, start, size in _walk_chunks(data, 12, len(data)):
        if len(cid) == 4 and cid[2:4] in (b"dc", b"db") and cid[:2].isdigit():
            frames.append(data[start : start + size])
    return frames


def avi_metadata(data: bytes) -> dict:
    """(n_frames, width, height, us_per_frame) from the avih header."""
    if sniff_video_format(data) != "avi":
        raise ValueError("not a RIFF/AVI payload")
    for cid, start, size in _walk_chunks(data, 12, len(data)):
        if cid == b"avih" and size >= 40:
            us, _rate, _pad, _flags, n = struct.unpack_from(
                "<IIIII", data, start
            )
            w, h = struct.unpack_from("<II", data, start + 32)
            return {
                "n_frames": n,
                "width": w,
                "height": h,
                "us_per_frame": us,
            }
    raise ValueError("AVI missing avih header")


def encode_mjpeg_avi(
    frames: "list[bytes]", width: int, height: int, fps: int = 25
) -> bytes:
    """JPEG payloads → minimal valid MJPEG AVI (hdrl + movi)."""
    if not frames:
        raise ValueError("no frames")

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    max_bytes = max(len(f) for f in frames)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # µs per frame
        max_bytes * fps,  # max bytes/sec
        0,
        0x10,  # AVIF_HASINDEX off; plain flags
        len(frames),
        0,
        1,  # one stream
        max_bytes,
        width,
        height,
        0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, fps,  # scale / rate
        0, len(frames), max_bytes, 0xFFFFFFFF, 0,
        0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
