"""Pure numpy + stdlib WAV (RIFF/PCM) codec — the audio sibling of
functions/imagecodec.py.

The reference has no media path at all; a training-data pipeline treats
audio as opaque binary columns with typed metadata and decodes inside
Arrow-batched executor kernels (operators/multimodal.py). This module
makes that decode REAL for everything decodable without native libs:

- container: RIFF/WAVE, chunk-walked (fmt / data, unknown chunks
  skipped — LIST/INFO/fact etc.), including WAVE_FORMAT_EXTENSIBLE
  wrappers around PCM/float subformats
- sample formats: PCM 8-bit (unsigned), 16-bit, 24-bit, 32-bit
  (signed little-endian), IEEE float32/float64
- compressed codecs (MP3/FLAC/OGG/ADPCM/µ-law...) refuse honestly with
  NotImplementedError, same contract as JPEG in the image tier

Everything is vectorized (frombuffer + shape/astype); the only
per-byte work is the 24-bit widen, done with a zero-pad column trick.
"""

from __future__ import annotations

import struct

import numpy as np

WAV_MAGIC_RIFF = b"RIFF"
WAV_MAGIC_WAVE = b"WAVE"

# wFormatTag values
_FMT_PCM = 0x0001
_FMT_IEEE_FLOAT = 0x0003
_FMT_EXTENSIBLE = 0xFFFE


def sniff_audio_format(data: bytes) -> str:
    """'wav' | 'mp3' | 'flac' | 'ogg' | 'unknown' by magic."""
    if len(data) >= 12 and data[:4] == WAV_MAGIC_RIFF and data[8:12] == WAV_MAGIC_WAVE:
        return "wav"
    if data[:3] == b"ID3" or (len(data) >= 2 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0):
        return "mp3"
    if data[:4] == b"fLaC":
        return "flac"
    if data[:4] == b"OggS":
        return "ogg"
    return "unknown"


def decode_wav(data: bytes) -> "tuple[int, np.ndarray]":
    """RIFF/WAVE → (sample_rate, float64 array (n_samples, n_channels))
    with samples normalized to [-1, 1] (integer full-scale = 2^(bits-1)).

    Walks the chunk list; unknown chunks are skipped by their declared
    size (word-aligned), so LIST/INFO/fact/cue metadata never breaks the
    parse. Refuses compressed format tags honestly."""
    if sniff_audio_format(data) != "wav":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, min(len(data), 8 + struct.unpack_from("<I", data, 4)[0])
    fmt = None
    raw = None
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        csz = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + csz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            raw = body
        pos += 8 + csz + (csz & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, n_ch, rate, _brate, _align, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if tag == _FMT_EXTENSIBLE:
        if len(fmt) < 40:
            raise ValueError("truncated WAVE_FORMAT_EXTENSIBLE fmt chunk")
        # SubFormat GUID: first 2 bytes are the real format tag
        tag = struct.unpack_from("<H", fmt, 24)[0]
    if n_ch < 1:
        raise ValueError("WAV with zero channels")
    if tag == _FMT_PCM:
        if bits == 8:
            x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            b3 = np.frombuffer(raw, dtype=np.uint8)
            b3 = b3[: (len(b3) // 3) * 3].reshape(-1, 3)
            # widen 3-byte LE to 4-byte LE with sign-extension via int32
            wide = np.zeros((b3.shape[0], 4), dtype=np.uint8)
            wide[:, 1:] = b3  # value << 8
            x = wide.view("<i4").reshape(-1).astype(np.float64) / (
                32768.0 * 65536.0
            )  # 2^31, since value sits in the top 3 bytes
        elif bits == 32:
            x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
        else:
            raise NotImplementedError(f"{bits}-bit PCM WAV")
    elif tag == _FMT_IEEE_FLOAT:
        if bits == 32:
            x = np.frombuffer(raw, dtype="<f4").astype(np.float64)
        elif bits == 64:
            x = np.frombuffer(raw, dtype="<f8").astype(np.float64)
        else:
            raise NotImplementedError(f"{bits}-bit float WAV")
    else:
        raise NotImplementedError(
            f"compressed WAV codec (format tag 0x{tag:04x}) — needs "
            "ffmpeg/librosa; swap in at this seam in deployment"
        )
    n_frames = len(x) // n_ch
    return int(rate), x[: n_frames * n_ch].reshape(n_frames, n_ch)


def encode_wav(
    samples: np.ndarray, rate: int, bits: int = 16
) -> bytes:
    """(n,) or (n, ch) array → RIFF/WAVE. Integer dtypes are written
    verbatim at their width; float input is full-scale-quantized for
    integer `bits` or written as float32 when bits == 32 and the dtype
    is floating. Inverse of decode_wav on the supported formats."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    is_float = np.issubdtype(arr.dtype, np.floating)
    if is_float and bits == 32:
        tag, payload = _FMT_IEEE_FLOAT, arr.astype("<f4").tobytes()
    elif bits == 16:
        tag = _FMT_PCM
        ints = (
            np.clip(np.round(arr * 32767.0), -32768, 32767).astype("<i2")
            if is_float
            else arr.astype("<i2")
        )
        payload = ints.tobytes()
    elif bits == 8:
        tag = _FMT_PCM
        ints = (
            np.clip(np.round(arr * 127.0) + 128, 0, 255).astype(np.uint8)
            if is_float
            else (arr.astype(np.int64) + 128).astype(np.uint8)
        )
        payload = ints.tobytes()
    elif bits == 24:
        tag = _FMT_PCM
        i32 = (
            np.clip(np.round(arr * 8388607.0), -8388608, 8388607).astype("<i4")
            if is_float
            else arr.astype("<i4")
        )
        b4 = i32.reshape(-1).view(np.uint8).reshape(-1, 4)
        payload = b4[:, :3].tobytes()  # drop the high byte (LE)
    else:
        raise NotImplementedError(f"encode_wav bits={bits}")
    block = ch * (bits // 8)
    fmt = struct.pack("<HHIIHH", tag, ch, rate, rate * block, block, bits)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
        + (b"\x00" if len(payload) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def rms(samples: np.ndarray) -> float:
    """Root-mean-square over all channels of a normalized decode."""
    x = np.asarray(samples, dtype=np.float64)
    return float(np.sqrt(np.mean(x * x))) if x.size else 0.0


def zero_crossing_rate(samples: np.ndarray) -> float:
    """Fraction of adjacent same-channel sample pairs with a sign change
    (mono: plain ZCR; multichannel: averaged over channels)."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    if x.shape[0] < 2:
        return 0.0
    s = np.signbit(x)
    return float(np.mean(s[1:] != s[:-1]))


def spectral_features(samples: np.ndarray) -> "tuple[int, float, float]":
    """FFT spectral stats over a mono signal (multichannel is averaged
    down to mono first): returns (dominant_bin, centroid_bin, flatness).

    - dominant_bin: argmax of |rFFT| over bins 1..n//2 (DC excluded) —
      for an n-periodic tone at bin k this is exactly k.
    - centroid_bin: magnitude-weighted mean bin index (spectral
      centroid in bin units, DC excluded).
    - flatness: geometric/arithmetic mean ratio of the DC-excluded
      magnitudes in (0, 1] — near 0 for pure tones, near 1 for white
      noise; the standard tonality gate for audio quality filtering.

    Pure numpy (np.fft.rfft); O(n log n) per clip, runs inside the
    Arrow-batched decode kernels on executors.
    """
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 2:
        x = x.mean(axis=1)
    n = x.shape[0]
    if n < 4:
        return 0, 0.0, 1.0
    mag = np.abs(np.fft.rfft(x))[1 : n // 2 + 1]
    if mag.size == 0 or float(mag.sum()) == 0.0:
        return 0, 0.0, 1.0
    dom = int(np.argmax(mag)) + 1
    bins = np.arange(1, mag.size + 1, dtype=np.float64)
    centroid = float((bins * mag).sum() / mag.sum())
    eps = 1e-12
    flat = float(np.exp(np.mean(np.log(mag + eps))) / (np.mean(mag) + eps))
    return dom, centroid, min(flat, 1.0)


def _mel_filterbank(
    n_mels: int, n_fft: int, rate: int
) -> np.ndarray:
    """Triangular mel filterbank (HTK mel scale, public formula
    mel = 2595·log10(1 + f/700)), shape (n_mels, n_fft//2 + 1)."""
    fmax = rate / 2.0
    mel_max = 2595.0 * np.log10(1.0 + fmax / 700.0)
    mel_pts = np.linspace(0.0, mel_max, n_mels + 2)
    hz_pts = 700.0 * (10.0 ** (mel_pts / 2595.0) - 1.0)
    bins = np.floor((n_fft + 1) * hz_pts / rate).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for m in range(1, n_mels + 1):
        lo, ctr, hi = bins[m - 1], bins[m], bins[m + 1]
        for k in range(lo, ctr):
            if ctr > lo:
                fb[m - 1, k] = (k - lo) / (ctr - lo)
        for k in range(ctr, hi):
            if hi > ctr:
                fb[m - 1, k] = (hi - k) / (hi - ctr)
    return fb


def mfcc(
    samples: np.ndarray,
    rate: int,
    n_coeffs: int = 13,
    frame: int = 256,
    hop: int = 128,
    n_mels: int = 20,
) -> np.ndarray:
    """REAL MFCC, pure numpy: frame → Hann window → power rFFT → mel
    filterbank → log → orthonormal DCT-II → first n_coeffs, averaged
    over frames into one clip descriptor. Deterministic; O(n log n).
    Replaces the former documented stub — no librosa needed for the
    canonical pipeline (librosa would swap in at this seam only for
    exotic variants)."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 2:
        x = x.mean(axis=1)
    if x.shape[0] < frame:
        x = np.pad(x, (0, frame - x.shape[0]))
    n_frames = 1 + (x.shape[0] - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    win = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(frame) / frame)
    spec = np.abs(np.fft.rfft(x[idx] * win[None, :], axis=1)) ** 2
    fb = _mel_filterbank(n_mels, frame, rate)
    logmel = np.log(spec @ fb.T + 1e-10)
    # orthonormal DCT-II over the mel axis (same basis law as the
    # image pHash — imagecodec._dct_matrix)
    k = np.arange(n_mels)[:, None].astype(np.float64)
    i = np.arange(n_mels)[None, :].astype(np.float64)
    dct = np.cos(np.pi * (2 * i + 1) * k / (2 * n_mels)) * np.sqrt(
        2.0 / n_mels
    )
    dct[0] *= np.sqrt(0.5)
    coeffs = logmel @ dct.T[:, :n_coeffs]
    return coeffs.mean(axis=0)


def fingerprint64(samples: np.ndarray, n_segments: int = 8) -> int:
    """64-bit melody-contour fingerprint: split the clip into
    n_segments equal windows, take each window's dominant rFFT bin
    (capped at 255), pack one byte per segment. The dominant bin is
    invariant to any positive amplitude scaling (argmax of a scaled
    spectrum), so re-encoded / volume-normalized copies of a clip
    produce the SAME fingerprint — the property audio dedup needs.
    Compare fingerprints with banded Hamming LSH exactly like image
    pHashes (multimodal.phash_neardup is hash-agnostic)."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 2:
        x = x.mean(axis=1)
    n = x.shape[0]
    seg = max(4, n // n_segments)
    out = 0
    for j in range(n_segments):
        w = x[j * seg : (j + 1) * seg]
        if w.shape[0] < 4:
            dom = 0
        else:
            mag = np.abs(np.fft.rfft(w))[1 : w.shape[0] // 2 + 1]
            dom = 0 if mag.size == 0 else int(np.argmax(mag)) + 1
        out |= (min(dom, 255)) << (8 * j)
    # two's-complement wrap: byte 7 >= 128 (dominant bin >= 128 in a
    # long final segment) would otherwise overflow Spark's signed
    # LongType; the banded-Hamming engine compares bit patterns
    # (XOR/bit_count), which the wrap preserves exactly
    if out >= 1 << 63:
        out -= 1 << 64
    return out
