"""Pure-numpy WAV codec (functions/audiocodec.py): round-trips across
PCM widths and float, chunk-walking robustness, honest refusals, and the
real decode flowing through the Spark audio tier."""

import struct

import numpy as np
import pytest

from homemade_vector_db_spark.functions import audiocodec as ac


def _sine(n=480, rate=16000, freq=440.0, amp=0.5, ch=1):
    t = np.arange(n) / rate
    x = amp * np.sin(2 * np.pi * freq * t)
    return np.tile(x[:, None], (1, ch))


def test_wav_pcm16_round_trip_exact():
    ints = (np.arange(-500, 500, dtype=np.int16) * 60).astype(np.int16)
    data = ac.encode_wav(ints, 8000, bits=16)
    rate, x = ac.decode_wav(data)
    assert rate == 8000 and x.shape == (1000, 1)
    # integer samples survive encode->decode bit-exactly
    assert np.array_equal(np.round(x[:, 0] * 32768.0).astype(np.int16), ints)


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
def test_wav_float_quantize_round_trip(bits):
    x = _sine(ch=2)
    data = ac.encode_wav(x, 16000, bits=bits)
    rate, y = ac.decode_wav(data)
    assert rate == 16000 and y.shape == x.shape
    tol = {8: 1 / 127, 16: 1 / 32767, 24: 1 / 8388607, 32: 1e-6}[bits]
    assert np.max(np.abs(y - x)) <= tol * 1.01


def test_wav_float32_payload_exact():
    x = _sine().astype(np.float32)
    rate, y = ac.decode_wav(ac.encode_wav(x, 22050, bits=32))
    assert rate == 22050
    assert np.array_equal(y.astype(np.float32), x)


def test_wav_skips_unknown_chunks_and_word_alignment():
    x = (np.arange(7, dtype=np.int16) * 1000).astype(np.int16)
    data = ac.encode_wav(x, 8000, bits=16)
    # splice a LIST chunk with odd size (forces word-align skip) between
    # WAVE and fmt
    body = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = data[:12] + body + data[12:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    rate, y = ac.decode_wav(spliced)
    assert rate == 8000
    assert np.array_equal(np.round(y[:, 0] * 32768.0).astype(np.int16), x)


def test_wav_extensible_wrapper_decodes():
    x = (np.arange(5, dtype=np.int16) * 999).astype(np.int16)
    data = bytearray(ac.encode_wav(x, 44100, bits=16))
    i = data.index(b"fmt ")
    old_fmt = bytes(data[i + 8 : i + 8 + 16])
    guid = struct.pack("<H", 1) + b"\x00\x00" + b"\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    new_fmt = (
        struct.pack("<H", 0xFFFE) + old_fmt[2:]
        + struct.pack("<HIH", 16, 0, 0)[:2]  # cbSize = 22
        + struct.pack("<H", 16)  # valid bits
        + struct.pack("<I", 0)  # channel mask
        + guid
    )
    rest = bytes(data[i + 8 + 16 :])
    out = bytes(data[:i]) + b"fmt " + struct.pack("<I", len(new_fmt)) + new_fmt + rest
    out = out[:4] + struct.pack("<I", len(out) - 8) + out[8:]
    rate, y = ac.decode_wav(out)
    assert rate == 44100
    assert np.array_equal(np.round(y[:, 0] * 32768.0).astype(np.int16), x)


def test_wav_refusals_and_sniff():
    assert ac.sniff_audio_format(b"ID3\x04rest") == "mp3"
    assert ac.sniff_audio_format(b"\xff\xfb\x90\x00") == "mp3"
    assert ac.sniff_audio_format(b"fLaC\x00") == "flac"
    assert ac.sniff_audio_format(b"OggS\x00") == "ogg"
    assert ac.sniff_audio_format(b"neither") == "unknown"
    with pytest.raises(ValueError, match="not a RIFF"):
        ac.decode_wav(b"fLaC\x00\x00")
    # a-law format tag refuses honestly
    x = (np.arange(4, dtype=np.int16)).astype(np.int16)
    data = bytearray(ac.encode_wav(x, 8000, bits=16))
    i = data.index(b"fmt ")
    struct.pack_into("<H", data, i + 8, 0x0006)  # WAVE_FORMAT_ALAW
    with pytest.raises(NotImplementedError, match="0x0006"):
        ac.decode_wav(bytes(data))


def test_rms_and_zcr():
    x = np.array([1.0, -1.0, 1.0, -1.0])
    assert ac.rms(x) == pytest.approx(1.0)
    assert ac.zero_crossing_rate(x) == pytest.approx(1.0)
    assert ac.zero_crossing_rate(np.ones(10)) == 0.0
    assert ac.rms(np.zeros(0)) == 0.0


def test_real_wav_through_spark_audio_tier(spark):
    """WAV payloads decode for real inside the Arrow-batched kernel:
    duration_ms and rms come from the samples (metadata duration is
    overridden); MP3 refuses honestly; unknown bytes keep the fake."""
    from homemade_vector_db_spark.operators import multimodal

    x = _sine(n=8000, rate=16000, amp=0.5)  # 500 ms
    wav = ac.encode_wav(x, 16000, bits=16)
    rows = [
        (20, "audio", wav, "audio/wav", None, None, 9999),
        (21, "audio", bytes([1, 2] * 100), "audio/bin", None, None, 2000),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feats = {r.media_id: r for r in multimodal.audio_features(media).collect()}
    assert feats[20].duration_ms == 500  # ground truth, not the 9999 column
    assert feats[20].rms == pytest.approx(0.5 / np.sqrt(2), rel=1e-3)
    assert feats[21].duration_ms == 2000  # fake path keeps metadata
    mp3 = spark.createDataFrame(
        [(22, "audio", b"ID3\x04\x00tag", "audio/mpeg", None, None, 100)],
        multimodal.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="ffmpeg/librosa"):
        multimodal.audio_features(mp3).collect()


# ------------------------------------------- round-7 spectral kernels
def test_mfcc_shape_and_amplitude_law():
    import numpy as np

    from homemade_vector_db_spark.functions import audiocodec as ac

    # broadband signal: every mel bin carries power well above the log
    # epsilon, so the amplitude law is clean (a pure tone's empty bins
    # are epsilon-dominated and break exact invariance)
    x = np.random.default_rng(7).standard_normal(4096)
    m1 = ac.mfcc(x, 16000)
    assert m1.shape == (13,)
    # scaling amplitude multiplies power by s^2 -> log-mel shifts by a
    # constant -> only the DC cepstral coefficient moves (orthonormal
    # DCT row 0 is constant); c1..c12 are amplitude-invariant
    m2 = ac.mfcc(3.0 * x, 16000)
    assert abs(m2[0] - m1[0]) > 1.0
    assert np.allclose(m1[1:], m2[1:], atol=1e-6)


def test_mfcc_distinguishes_tones():
    import numpy as np

    from homemade_vector_db_spark.functions import audiocodec as ac

    t = np.arange(4096)
    lo = ac.mfcc(np.sin(2 * np.pi * 300 * t / 16000.0), 16000)
    hi = ac.mfcc(np.sin(2 * np.pi * 3000 * t / 16000.0), 16000)
    assert float(np.abs(lo[1:] - hi[1:]).max()) > 1.0


def test_fingerprint64_amplitude_invariant_and_melody_sensitive():
    import numpy as np

    from homemade_vector_db_spark.functions import audiocodec as ac

    def clip(bins, amp):
        t = np.arange(480)
        return np.concatenate(
            [np.round(amp * np.sin(2 * np.pi * k * t / 480)) for k in bins]
        )

    bins = [3, 5, 7, 9, 11, 13, 4, 6]
    f1 = ac.fingerprint64(clip(bins, 8000))
    assert f1 == ac.fingerprint64(clip(bins, 12000))  # scale-invariant
    f2 = ac.fingerprint64(clip([4, 6, 8, 10, 12, 14, 5, 7], 8000))
    assert bin(f1 ^ f2).count("1") >= 8  # different melody, far apart
    # byte j is segment j's dominant bin
    assert (f1 >> 0) & 0xFF == 3 and (f1 >> 8) & 0xFF == 5


def test_fingerprint64_high_bin_fits_signed_long():
    import numpy as np

    from homemade_vector_db_spark.functions import audiocodec as ac

    # 8 segments of 512 samples; the final segment's tone sits at bin
    # 200 -> byte 7 = 200 has its top bit set -> overall bit 63 set ->
    # must wrap to a negative signed 64-bit value (Spark LongType),
    # preserving the bit pattern the Hamming engine compares
    t = np.arange(512)
    segs = [np.round(9000 * np.sin(2 * np.pi * 3 * t / 512))] * 7
    segs.append(np.round(9000 * np.sin(2 * np.pi * 200 * t / 512)))
    f = ac.fingerprint64(np.concatenate(segs))
    assert -(1 << 63) <= f < (1 << 63)
    assert f < 0  # bit 63 genuinely set
    assert (f >> 56) & 0xFF == 200
