"""Baseline JPEG codec in pure numpy + stdlib — no external libraries.

Completes the real-decode story for the dominant web image format
(``media_codecs`` handles netpbm/PNG/GIF/WAV; the multimodal boundary in
``operators/multimodal`` stubs only formats with genuinely no codec
here, per the plugin-extractor boundary of
``reference src/extraction/external_plugin_extractor.cpp``).

Decoder: baseline sequential DCT (SOF0), 8-bit, 1 or 3 components,
sampling factors 1-2 (4:4:4 / 4:2:2 / 4:2:0), restart intervals,
canonical Huffman tables, byte-unstuffing, dezigzag + dequant, exact
float IDCT (8×8 DCT-II basis matrix), chroma replication upsample, JFIF
YCbCr→RGB. Progressive (SOF2) and arithmetic coding raise
``NotImplementedError`` — the honest boundary.

Encoder (the round-trip oracle for tests): 4:4:4 or 4:2:0, standard
Annex-K quantization tables scaled by a quality factor and the standard
Huffman tables. JPEG is lossy, so round-trips assert bounded
reconstruction error, plus an exact case (flat blocks quantize to DC
only and survive bit-exactly at quality 100... up to IDCT rounding —
asserted within ±1).

Everything is deterministic; decode cost is O(pixels) numpy work — the
multimodal featurizers call it inside the same Arrow batches as the
other codecs.
"""

from __future__ import annotations

import numpy as np

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

#: Annex K.1 luminance / K.2 chrominance quantization tables
STD_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
STD_CHROMA_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

#: Annex K.3 standard Huffman table specs: (bits[1..16], values)
STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# 8x8 DCT-II basis: C[k, n] = a(k) cos((2n+1)kπ/16)
_N = np.arange(8)
_DCT = np.cos((2 * _N[None, :] + 1) * _N[:, None] * np.pi / 16.0)
_DCT[0] *= 1.0 / np.sqrt(2.0)
_DCT *= 0.5


def _idct2(block: np.ndarray) -> np.ndarray:
    """Exact float 2-D inverse DCT of one 8x8 coefficient block."""
    return _DCT.T @ block @ _DCT


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _DCT @ block @ _DCT.T


# ---------- Huffman ----------


def _build_decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """{(length, code): symbol} canonical Huffman assignment (B.2.4.2)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """{symbol: (code, length)}"""
    return {v: (c, l) for (l, c), v in _build_decode_table(bits, values).items()}


def _build_fast_table(table: dict[tuple[int, int], int]) -> dict[int, tuple[int, int]]:
    """{16-bit peek: (symbol, code_length)} — every code padded to all its
    16-bit extensions so one peek resolves any symbol. Built lazily per
    (decode-table id), ~65k entries filled in runs."""
    fast: dict[int, tuple[int, int]] = {}
    for (length, code), sym in table.items():
        base = code << (16 - length)
        for ext in range(1 << (16 - length)):
            fast[base | ext] = (sym, length)
    return fast


class _BitReader:
    """MSB-first bit cursor over the UNSTUFFED entropy-coded segment.

    The 0xFF00 byte-unstuffing is done once up front (one bytes scan)
    instead of per fill; reads are integer slices of a window, and
    Huffman decode is a single 16-bit peek into a flattened code table —
    the loops-per-bit of the naive reader were the decode hot spot."""

    def __init__(self, data: bytes, pos: int):
        # unstuff until the next marker (non-0x00, non-RST after 0xFF)
        out = bytearray()
        i = pos
        n = len(data)
        while i < n:
            b = data[i]
            if b == 0xFF:
                nxt = data[i + 1] if i + 1 < n else 0xD9
                if nxt == 0x00:
                    out.append(0xFF)
                    i += 2
                    continue
                if 0xD0 <= nxt <= 0xD7:  # restart marker: keep scanning
                    self._restarts = getattr(self, "_restarts", [])
                    self._restarts.append(len(out))
                    i += 2
                    continue
                break
            out.append(b)
            i += 1
        self.buf = bytes(out) + b"\x00\x00\x00"  # peek padding
        self.bitpos = 0
        self.end_pos = i  # marker position in the original stream
        self._fast_cache: dict[int, dict] = {}

    def _peek16(self) -> int:
        byte, bit = divmod(self.bitpos, 8)
        window = int.from_bytes(self.buf[byte : byte + 3], "big")
        return (window >> (8 - bit)) & 0xFFFF

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        byte, bit = divmod(self.bitpos, 8)
        need = (bit + n + 7) // 8
        window = int.from_bytes(self.buf[byte : byte + need], "big")
        if byte + need > len(self.buf):
            raise ValueError("JPEG entropy stream truncated")
        self.bitpos += n
        return (window >> (need * 8 - bit - n)) & ((1 << n) - 1)

    def read_bit(self) -> int:
        return self.read_bits(1)

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        fast = self._fast_cache.get(id(table))
        if fast is None:
            fast = _build_fast_table(table)
            self._fast_cache[id(table)] = fast
        hit = fast.get(self._peek16())
        if hit is None:
            raise ValueError("JPEG invalid Huffman code")
        sym, length = hit
        self.bitpos += length
        return sym

    def skip_restart(self) -> None:
        """Advance past the next restart boundary (recorded during the
        unstuffing scan) and byte-align."""
        restarts = getattr(self, "_restarts", [])
        cur_byte = (self.bitpos + 7) // 8
        for r in restarts:
            if r >= cur_byte:
                self.bitpos = r * 8
                return
        raise ValueError("JPEG missing restart marker")


def _extend(v: int, t: int) -> int:
    """F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG decode → uint8 (h, w) grayscale or (h, w, 3) RGB."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        length = int.from_bytes(payload[pos : pos + 2], "big")
        seg = payload[pos + 2 : pos + length]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(np.int32)
                    i += 64
                else:
                    tbl = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(np.int32)
                    i += 128
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                values = list(seg[i + 17 : i + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_decode_table(bits, values)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError("JPEG precision != 8")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid = seg[6 + 3 * c]
                hv = seg[7 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": seg[8 + 3 * c]}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("JPEG non-baseline frame type")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = {}
            for c in range(ns):
                cid = seg[1 + 2 * c]
                tables = seg[2 + 2 * c]
                scan[cid] = (tables >> 4, tables & 0x0F)
            data_pos = pos + length
            return _decode_scan(
                payload, data_pos, frame, scan, qt, huff_dc, huff_ac,
                restart_interval,
            )
        pos += length
    raise ValueError("JPEG contains no scan")


def _decode_scan(payload, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        for c in comps
    }
    pred = {c["id"]: 0 for c in comps}
    reader = _BitReader(payload, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.skip_restart()
                pred = {c["id"]: 0 for c in comps}
            for c in comps:
                dc_t, ac_t = scan[c["id"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coefs = np.zeros(64, dtype=np.int32)
                        t = reader.decode_symbol(huff_dc[dc_t])
                        diff = _extend(reader.read_bits(t), t) if t else 0
                        pred[c["id"]] += diff
                        coefs[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(huff_ac[ac_t])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run overflow")
                            coefs[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = coefs * qt[c["tq"]][np.arange(64)]
                        pix = _idct2(block.reshape(8, 8)) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_count += 1

    # upsample to full resolution (pixel replication) and crop
    out = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        return np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


# ---------- encoder (round-trip oracle) ----------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.acc <<= 8 - self.nbits
            self.acc |= (1 << (8 - self.nbits)) - 1  # pad with 1s
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _magnitude(v: int) -> tuple[int, int]:
    """(category, magnitude bits) for a signed value (F.1.2.1.1)."""
    if v == 0:
        return 0, 0
    t = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << t) - 1
    return t, bits


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((q * scale + 50) // 100, 1, 255).astype(np.int32)


def encode_jpeg(img: np.ndarray, quality: int = 85, subsample: bool = False) -> bytes:
    """Baseline JPEG encoder: grayscale or RGB uint8; ``subsample=True``
    writes 4:2:0 (2×2-mean chroma), else 4:4:4. Standard quantization
    (quality-scaled) and Huffman tables."""
    arr = np.asarray(img, dtype=np.float64)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        planes = [arr]
        samp = [(1, 1)]
    else:
        r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            def pool(p):
                hh = (p.shape[0] + 1) // 2 * 2
                ww = (p.shape[1] + 1) // 2 * 2
                pad = np.pad(p, ((0, hh - p.shape[0]), (0, ww - p.shape[1])), mode="edge")
                return (pad[0::2, 0::2] + pad[1::2, 0::2] + pad[0::2, 1::2] + pad[1::2, 1::2]) / 4.0
            planes = [y, pool(cb), pool(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]

    # STD tables are in natural order; JPEG stores/streams zigzag order
    luma_q = _quality_scale(STD_LUMA_Q, quality)[ZIGZAG]
    chroma_q = _quality_scale(STD_CHROMA_Q, quality)[ZIGZAG]
    qtabs = [luma_q] + ([chroma_q] if not gray else [])
    dc_enc = [_build_encode_table(*STD_DC_LUMA), _build_encode_table(*STD_DC_CHROMA)]
    ac_enc = [_build_encode_table(*STD_AC_LUMA), _build_encode_table(*STD_AC_CHROMA)]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        ph, pw = mcuy * sv * 8, mcux * sh * 8
        padded.append(np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"))

    bw = _BitWriter()
    pred = [0] * len(planes)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (p, (sh, sv)) in enumerate(zip(padded, samp)):
                qi = 0 if ci == 0 else 1
                q = qtabs[qi] if not gray else qtabs[0]
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        block = p[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        coefs = _fdct2(block)
                        # zigzag-order coefficients / zigzag-order table
                        zz = np.round(
                            coefs.reshape(64)[ZIGZAG] / q.astype(np.float64)
                        ).astype(np.int32)
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        t, bits = _magnitude(diff)
                        code, ln = dc_enc[qi][t]
                        bw.write(code, ln)
                        if t:
                            bw.write(bits, t)
                        run = 0
                        last_nz = 0
                        for k in range(1, 64):
                            if zz[k] != 0:
                                last_nz = k
                        for k in range(1, last_nz + 1):
                            if zz[k] == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = ac_enc[qi][0xF0]
                                bw.write(code, ln)
                                run -= 16
                            t, bits = _magnitude(int(zz[k]))
                            code, ln = ac_enc[qi][(run << 4) | t]
                            bw.write(code, ln)
                            bw.write(bits, t)
                            run = 0
                        if last_nz < 63:
                            code, ln = ac_enc[qi][0x00]
                            bw.write(code, ln)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")
    for ti, q in enumerate(qtabs):
        out += seg(0xDB, bytes([ti]) + bytes(int(x) for x in q))
    ncomp = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        sh, sv = samp[ci]
        tq = 0 if ci == 0 else 1 if not gray else 0
        sof += bytes([ci + 1, (sh << 4) | sv, tq])
    out += seg(0xC0, sof)
    for tc, (bits, values) in [(0x00, STD_DC_LUMA), (0x10, STD_AC_LUMA)] + (
        [] if gray else [(0x01, STD_DC_CHROMA), (0x11, STD_AC_CHROMA)]
    ):
        out += seg(0xC4, bytes([tc]) + bytes(bits) + bytes(values))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1 if not gray else 0
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
