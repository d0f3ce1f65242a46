"""Pure numpy + stdlib baseline JPEG codec (ITU T.81 sequential DCT).

Rounds 6-7 made the image (PPM/PGM/BMP/PNG) and audio (WAV/PCM) tiers
real; this module closes the largest remaining refusal: baseline JPEG,
implemented from the public spec (ITU-T T.81 / JFIF) with no native
libs — standard Annex K quantization + Huffman tables, quality scaling,
YCbCr, 8×8 DCT as a vectorized matrix sandwich over all blocks, and a
bit-exact entropy coder/decoder pair.

Supported:
- encode: 8-bit grayscale or RGB, baseline sequential, 4:4:4 (no
  subsampling — simplest and highest fidelity), quality 1-100
- decode: baseline sequential (SOF0), 1- or 3-component, ANY sampling
  factors (generic MCU walk with nearest-neighbor chroma upsample —
  4:4:4 / 4:2:2 / 4:2:0 all handled), multiple DQT/DHT segments,
  0xFF00 byte unstuffing, restart markers (DRI/RSTn)
- honest refusals: progressive (SOF2) and every non-baseline SOF,
  12-bit precision, arithmetic coding

The entropy decode is per-symbol Python (a real Huffman stream is
serial); like the PNG Paeth path it is bounded (_MAX_DECODE_PX) so the
executor-side cost stays honest — swap in libjpeg at the decode_jpeg
seam for billion-image corpora.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------ constants
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)

Q_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# Annex K Huffman specs: (bits[1..16], huffval)
DC_LUM_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROM_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUM_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
        0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
        0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
        0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
        0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
        0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
        0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
        0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
        0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
        0xf9, 0xfa,
    ],
)
AC_CHROM_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
        0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
        0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
        0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
        0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
        0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
        0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
        0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
        0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
        0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
        0xf9, 0xfa,
    ],
)

_MAX_DECODE_PX = 1 << 22  # 4 MP bound on the per-symbol Python entropy loop

# DCT-II orthonormal basis: C @ block @ C.T, inverse C.T @ coef @ C
_C = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(1 / 8) if _u == 0 else np.sqrt(2 / 8)
    for _x in range(8):
        _C[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _build_huffman(spec):
    """(bits, vals) → {symbol: (code, length)} per T.81 C.2 canonical
    code assignment."""
    bits, vals = spec
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decoder(spec):
    """(bits, vals) → {(length, code): symbol}."""
    enc = _build_huffman(spec)
    return {(ln, code): sym for sym, (code, ln) in enc.items()}


def quality_tables(quality: int) -> "tuple[np.ndarray, np.ndarray]":
    """IJG quality scaling of the Annex K tables."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    lum = np.clip((Q_LUM * scale + 50) // 100, 1, 255)
    chrom = np.clip((Q_CHROM * scale + 50) // 100, 1, 255)
    return lum.astype(np.int64), chrom.astype(np.int64)


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H8, W8) → (n_blocks, 8, 8) in row-major block order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _from_blocks(blocks: np.ndarray, h8: int, w8: int) -> np.ndarray:
    return (
        blocks.reshape(h8 // 8, w8 // 8, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(h8, w8)
    )


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _magnitude(v: int) -> "tuple[int, int]":
    """T.81 F.1.2.1: (size, bits) — negatives use ones'-complement."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _encode_plane_blocks(
    blocks: np.ndarray, qtab: np.ndarray
) -> np.ndarray:
    coef = np.einsum("ux,nxy,vy->nuv", _C, blocks - 128.0, _C)
    return np.round(coef / qtab).astype(np.int64)


def _encode_block_stream(bw, blk, pred_box, dc_enc, ac_enc):
    diff = int(blk[0]) - pred_box[0]
    pred_box[0] = int(blk[0])
    size, bits = _magnitude(diff)
    code, ln = dc_enc[size]
    bw.write(code, ln)
    bw.write(bits, size)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if blk[k] != 0:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(blk[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        size, bits = _magnitude(v)
        code, ln = ac_enc[run * 16 + size]
        bw.write(code, ln)
        bw.write(bits, size)
        run = 0
    if last_nz != 63:
        code, ln = ac_enc[0x00]  # EOB
        bw.write(code, ln)


def encode_jpeg(
    arr: np.ndarray, quality: int = 90, subsample: bool = False
) -> bytes:
    """8-bit grayscale (H, W) or RGB (H, W, 3) → baseline JFIF bytes
    (standard tables at the given quality). subsample=True emits 4:2:0
    (2×2-averaged chroma, the standard web layout); default is 4:4:4."""
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qlum, qchrom = quality_tables(quality)

    if gray:
        planes = [arr.astype(np.float64)]
        qtabs = [qlum]
        factors = [(1, 1)]
        n_comp = 1
    else:
        ycc = _rgb_to_ycbcr(arr)
        planes = [ycc[..., i] for i in range(3)]
        qtabs = [qlum, qchrom, qchrom]
        factors = (
            [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1), (1, 1), (1, 1)]
        )
        n_comp = 3
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per-component: (down)sample, pad to its MCU grid, quantize blocks
    zz = []
    for ci, p in enumerate(planes):
        hc, vc = factors[ci]
        if (hc, vc) != (hmax, vmax):
            ry, rx = vmax // vc, hmax // hc
            hpad = -(-p.shape[0] // ry) * ry
            wpad = -(-p.shape[1] // rx) * rx
            p = np.pad(
                p, ((0, hpad - p.shape[0]), (0, wpad - p.shape[1])), mode="edge"
            )
            p = p.reshape(
                p.shape[0] // ry, ry, p.shape[1] // rx, rx
            ).mean(axis=(1, 3))
        th, tw = mcuy * 8 * vc, mcux * 8 * hc
        p = np.pad(
            p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"
        )
        q = _encode_plane_blocks(_to_blocks(p), qtabs[ci])
        zz.append(q.reshape(-1, 64)[:, ZIGZAG])

    dc_specs = [DC_LUM_SPEC] + [DC_CHROM_SPEC] * (n_comp - 1)
    ac_specs = [AC_LUM_SPEC] + [AC_CHROM_SPEC] * (n_comp - 1)
    dc_enc = [_build_huffman(s) for s in dc_specs]
    ac_enc = [_build_huffman(s) for s in ac_specs]

    bw = _BitWriter()
    preds = [[0] for _ in range(n_comp)]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(n_comp):
                hc, vc = factors[ci]
                bw_blocks = mcux * hc
                for by in range(vc):
                    for bx in range(hc):
                        row = my * vc + by
                        col = mx * hc + bx
                        blk = zz[ci][row * bw_blocks + col]
                        _encode_block_stream(
                            bw, blk, preds[ci], dc_enc[ci], ac_enc[ci]
                        )
    bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    # DQT: table 0 = lum, table 1 = chrom (zigzag order)
    out += seg(0xDB, bytes([0x00]) + bytes(qlum.reshape(-1)[ZIGZAG].tolist()))
    if n_comp == 3:
        out += seg(
            0xDB, bytes([0x01]) + bytes(qchrom.reshape(-1)[ZIGZAG].tolist())
        )
    # SOF0
    comps = bytearray()
    for ci in range(n_comp):
        hc, vc = factors[ci]
        comps += bytes([ci + 1, hc * 16 + vc, 0 if ci == 0 else 1])
    out += seg(
        0xC0,
        bytes([8]) + struct.pack(">HH", h, w) + bytes([n_comp]) + comps,
    )
    # DHT
    def dht(tc, th, spec):
        bits, vals = spec
        return seg(0xC4, bytes([tc * 16 + th]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, DC_LUM_SPEC) + dht(1, 0, AC_LUM_SPEC)
    if n_comp == 3:
        out += dht(0, 1, DC_CHROM_SPEC) + dht(1, 1, AC_CHROM_SPEC)
    # SOS
    sos = bytearray([n_comp])
    for ci in range(n_comp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, bytes(sos))
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """MSB-first reader over the entropy segment with 0xFF00 unstuffing;
    stops at any non-RST marker. next_marker() consumes an expected RST."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> bool:
        d = self.data
        p = self.pos
        if p >= len(d):
            return False
        b = d[p]
        if b == 0xFF:
            if p + 1 < len(d) and d[p + 1] == 0x00:
                self.pos = p + 2
            else:
                return False  # a real marker: stop
        else:
            self.pos = p + 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise ValueError("truncated JPEG entropy stream")
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_expect_rst(self) -> None:
        self.acc = 0
        self.nbits = 0
        d, p = self.data, self.pos
        if p + 1 < len(d) and d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
            self.pos = p + 2
        else:
            raise ValueError("expected restart marker")


def _decode_symbol(br: _BitReader, table: dict) -> int:
    code, ln = 0, 0
    while ln <= 16:
        code = (code << 1) | br.read_bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(bits: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline sequential JFIF/JPEG → (H, W) uint8 or (H, W, 3) RGB.

    Generic MCU walk over the declared sampling factors (4:4:4 / 4:2:2 /
    4:2:0 ...), nearest-neighbor chroma upsample, restart-marker aware.
    Refuses progressive (SOF2), 12-bit, and arithmetic-coded streams."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple, dict] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        length = struct.unpack_from(">H", data, pos + 2)[0]
        body = data[pos + 4 : pos + 2 + length]
        pos += 2 + length
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tab = np.zeros(64, dtype=np.int64)
                tab[ZIGZAG] = np.frombuffer(
                    body[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.int64)
                qtabs[tq] = tab.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                huff[(tc, th)] = _build_decoder((bits, vals))
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec = body[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            h, w = struct.unpack_from(">HH", body, 1)
            n_comp = body[5]
            comps = []
            for ci in range(n_comp):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{marker:02x}, e.g. "
                "progressive) — swap in libjpeg for these"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            if not huff:
                # MJPEG convention: streams may omit DHT entirely and
                # imply the Annex K standard tables
                huff[(0, 0)] = _build_decoder(DC_LUM_SPEC)
                huff[(1, 0)] = _build_decoder(AC_LUM_SPEC)
                huff[(0, 1)] = _build_decoder(DC_CHROM_SPEC)
                huff[(1, 1)] = _build_decoder(AC_CHROM_SPEC)
            h, w, comps = frame
            if h * w > _MAX_DECODE_PX:
                raise NotImplementedError(
                    f"{h}x{w} exceeds the {_MAX_DECODE_PX}-px pure-Python "
                    "JPEG decode bound; swap in libjpeg"
                )
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
                comp = next(c for c in comps if c["id"] == cs)
                scan.append((comp, tdta >> 4, tdta & 0x0F))
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            # per-component coefficient storage
            store = []
            for c, _, _ in scan:
                bw_ = mcux * c["h"]
                bh_ = mcuy * c["v"]
                store.append(np.zeros((bh_ * bw_, 8, 8), dtype=np.int64))
            br = _BitReader(data, pos)
            pred = [0] * ns
            mcu_count = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if (
                        restart_interval
                        and mcu_count
                        and mcu_count % restart_interval == 0
                    ):
                        br.align_and_expect_rst()
                        pred = [0] * ns
                    for si, (c, td, ta) in enumerate(scan):
                        dct = huff[(0, td)]
                        act = huff[(1, ta)]
                        bw_ = mcux * c["h"]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                blk = np.zeros(64, dtype=np.int64)
                                size = _decode_symbol(br, dct)
                                diff = _extend(br.read_bits(size), size)
                                pred[si] += diff
                                blk[0] = pred[si]
                                k = 1
                                while k < 64:
                                    sym = _decode_symbol(br, act)
                                    if sym == 0x00:  # EOB
                                        break
                                    run, sz = sym >> 4, sym & 0x0F
                                    if sym == 0xF0:  # ZRL
                                        k += 16
                                        continue
                                    k += run
                                    if k > 63:
                                        raise ValueError("AC index overflow")
                                    blk[k] = _extend(br.read_bits(sz), sz)
                                    k += 1
                                row = my * c["v"] + by
                                col = mx * c["h"] + bx
                                out = np.zeros((8, 8), dtype=np.int64)
                                out.reshape(-1)[ZIGZAG] = blk
                                store[si][row * bw_ + col] = out
                    mcu_count += 1
            # dequantize + IDCT per component (vectorized over blocks)
            planes = []
            for si, (c, _, _) in enumerate(scan):
                q = qtabs[c["tq"]]
                coef = store[si].astype(np.float64) * q
                px = np.einsum("xu,nuv,vy->nxy", _C.T, coef, _C) + 128.0
                bw_ = mcux * c["h"]
                bh_ = mcuy * c["v"]
                plane = _from_blocks(px, bh_ * 8, bw_ * 8)
                # upsample to full MCU grid resolution then crop
                ry = (vmax + c["v"] - 1) // c["v"]
                rx = (hmax + c["h"] - 1) // c["h"]
                if ry > 1 or rx > 1:
                    plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
                planes.append(plane[:h, :w])
            if ns == 1:
                return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
            ycc = np.stack(planes, axis=-1)
            return _ycbcr_to_rgb(ycc)
        # other markers (APPn, COM) are skipped by the generic length walk
    raise ValueError("no SOS in JPEG stream")
