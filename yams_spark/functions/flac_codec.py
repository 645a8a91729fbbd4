"""FLAC codec in pure Python/numpy — lossless audio, no libraries.

Joins WAV in the real-audio-decode set (``media_codecs``): FLAC is the
dominant lossless web-audio container and its decode needs nothing but
bit plumbing. Implements the format per the public spec (RFC 9639 /
xiph.org):

Decoder: "fLaC" marker, metadata blocks (STREAMINFO parsed, others
skipped), frame sync + header (blocking strategy, block-size /
sample-rate / sample-size codes, UTF-8-coded frame number, CRC-8),
per-channel subframes — CONSTANT, VERBATIM, FIXED orders 0-4, LPC
orders 1-32 with quantized coefficients — rice-coded residual
partitions (4/5-bit parameters, escape to verbatim), stereo channel
decorrelation (left/side, right/side, mid/side), CRC-16 footer
verification. Returns int32 samples (n, channels) + sample rate.

Encoder (the round-trip oracle — FLAC is lossless, so decode(encode(x))
is BIT-EXACT): fixed-blocksize frames, independent channels, VERBATIM
or FIXED-order subframes with single-partition rice residuals; correct
CRC-8/CRC-16 so the decoder's verification paths run for real.
"""

from __future__ import annotations

import numpy as np

_CRC8_POLY = 0x07
_CRC16_POLY = 0x8005

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ _CRC8_POLY) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ _CRC16_POLY) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _Bits:
    """MSB-first bit reader with byte-position tracking (for CRC spans)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            if self.byte >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            v = (v << 1) | ((self.data[self.byte] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        n = 0
        while self.read(1) == 0:
            n += 1
        return n

    def read_rice(self, param: int) -> int:
        q = self.read_unary()
        r = self.read(param) if param else 0
        v = (q << param) | r
        return (v >> 1) ^ -(v & 1)  # zigzag

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _read_utf8_number(bits: _Bits) -> int:
    """FLAC's UTF-8-style frame/sample number (up to 7 bytes)."""
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise ValueError("FLAC invalid UTF-8 coded number")
    v = b0 & (mask - 1)
    for _ in range(n):
        c = bits.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("FLAC invalid UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _decode_residual(bits: _Bits, blocksize: int, order: int) -> list[int]:
    method = bits.read(2)
    if method not in (0, 1):
        raise ValueError("FLAC reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    part_order = bits.read(4)
    n_parts = 1 << part_order
    if blocksize % n_parts:
        raise ValueError("FLAC partition order does not divide blocksize")
    out: list[int] = []
    for p in range(n_parts):
        n = (blocksize >> part_order) - (order if p == 0 else 0)
        param = bits.read(pbits)
        if param == escape:
            raw = bits.read(5)
            out.extend(bits.read_signed(raw) if raw else 0 for _ in range(n))
        else:
            out.extend(bits.read_rice(param) for _ in range(n))
    return out


def _decode_subframe(bits: _Bits, blocksize: int, bps: int) -> list[int]:
    if bits.read(1) != 0:
        raise ValueError("FLAC subframe sync bit set")
    stype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.read_unary() + 1
    eff = bps - wasted
    if stype == 0:  # CONSTANT
        v = bits.read_signed(eff)
        samples = [v] * blocksize
    elif stype == 1:  # VERBATIM
        samples = [bits.read_signed(eff) for _ in range(blocksize)]
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        warm = [bits.read_signed(eff) for _ in range(order)]
        resid = _decode_residual(bits, blocksize, order)
        samples = list(warm)
        coefs = _FIXED_COEFFS[order]
        for i, r in enumerate(resid):
            pred = sum(c * samples[order + i - 1 - j] for j, c in enumerate(coefs))
            samples.append(r + pred)
    elif stype >= 32:  # LPC order 1-32
        order = stype - 31
        warm = [bits.read_signed(eff) for _ in range(order)]
        prec = bits.read(4) + 1
        if prec == 16:
            raise ValueError("FLAC invalid LPC precision")
        shift = bits.read_signed(5)
        coefs = [bits.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(bits, blocksize, order)
        samples = list(warm)
        for i, r in enumerate(resid):
            acc = sum(c * samples[order + i - 1 - j] for j, c in enumerate(coefs))
            samples.append(r + (acc >> shift))
    else:
        raise ValueError(f"FLAC reserved subframe type {stype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


_BLOCKSIZE_CODES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_SAMPLE_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def decode_flac(payload: bytes):
    """(samples int32 (n, channels), sample_rate): full stream decode
    with CRC-8/CRC-16 verification per frame."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC marker)")
    pos = 4
    streaminfo = None
    while True:
        header = payload[pos : pos + 4]
        last = header[0] >> 7
        btype = header[0] & 0x7F
        length = int.from_bytes(header[1:4], "big")
        body = payload[pos + 4 : pos + 4 + length]
        if btype == 0:
            bits = _Bits(body)
            bits.read(16); bits.read(16)  # min/max blocksize
            bits.read(24); bits.read(24)  # min/max framesize
            rate = bits.read(20)
            channels = bits.read(3) + 1
            bps = bits.read(5) + 1
            total = bits.read(36)
            streaminfo = {"rate": rate, "channels": channels, "bps": bps, "total": total}
        pos += 4 + length
        if last:
            break
    if streaminfo is None:
        raise ValueError("FLAC missing STREAMINFO")

    out: list[list[int]] = []
    while pos < len(payload) and streaminfo["total"] and len(out) < streaminfo["total"]:
        frame_start = pos
        bits = _Bits(payload, pos)
        sync = bits.read(14)
        if sync != 0x3FFE:
            raise ValueError("FLAC frame sync lost")
        bits.read(1)  # reserved
        bits.read(1)  # blocking strategy
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        ss_code = bits.read(3)
        bits.read(1)  # reserved
        _read_utf8_number(bits)
        if bs_code == 6:
            blocksize = bits.read(8) + 1
        elif bs_code == 7:
            blocksize = bits.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODES[bs_code]
        if sr_code == 12:
            bits.read(8)
        elif sr_code in (13, 14):
            bits.read(16)
        bps = streaminfo["bps"] if ss_code == 0 else _SAMPLE_SIZE_CODES[ss_code]
        header_crc = bits.read(8)
        if _crc8(payload[frame_start : bits.byte - 1]) != header_crc:
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if ch_code < 8:
            n_ch = ch_code + 1
            chans = [
                _decode_subframe(bits, blocksize, bps) for _ in range(n_ch)
            ]
        elif ch_code in (8, 9, 10):
            # stereo decorrelation: one channel carries the side (+1 bit)
            if ch_code == 8:  # left/side
                left = _decode_subframe(bits, blocksize, bps)
                side = _decode_subframe(bits, blocksize, bps + 1)
                chans = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right/side
                side = _decode_subframe(bits, blocksize, bps + 1)
                right = _decode_subframe(bits, blocksize, bps)
                chans = [[r + s for r, s in zip(right, side)], right]
            else:  # mid/side
                mid = _decode_subframe(bits, blocksize, bps)
                side = _decode_subframe(bits, blocksize, bps + 1)
                chans = [[], []]
                for m, s in zip(mid, side):
                    m = (m << 1) | (s & 1)
                    chans[0].append((m + s) >> 1)
                    chans[1].append((m - s) >> 1)
        else:
            raise ValueError("FLAC reserved channel assignment")
        bits.align()
        footer_crc = bits.read(16)
        if _crc16(payload[frame_start : bits.byte - 2]) != footer_crc:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = bits.byte
        out.extend(zip(*chans))

    arr = np.asarray(out, dtype=np.int32)
    return arr[: streaminfo["total"]], streaminfo["rate"]


# ---------- encoder (round-trip oracle) ----------


class _BitW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.n = 0

    def write_signed(self, v: int, n: int) -> None:
        self.write(v & ((1 << n) - 1), n)

    def write_rice(self, v: int, param: int) -> None:
        z = (v << 1) if v >= 0 else ((-v) << 1) - 1  # zigzag
        q = z >> param
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)
        if param:
            self.write(z & ((1 << param) - 1), param)

    def align(self) -> None:
        while self.n:
            self.write(0, 1)


def encode_flac(
    samples: np.ndarray,
    rate: int = 8000,
    bps: int = 16,
    blocksize: int = 1024,
    fixed_order: int = 2,
) -> bytes:
    """Minimal valid FLAC: STREAMINFO + fixed-blocksize frames with
    independent channels; FIXED-order subframes (single rice partition,
    parameter chosen per frame) when the block is long enough, VERBATIM
    otherwise. Lossless by construction — the decode oracle must return
    the input bit-exactly."""
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, channels = x.shape
    lim = 1 << (bps - 1)
    if x.min() < -lim or x.max() >= lim:
        raise ValueError("samples exceed bits-per-sample range")

    out = bytearray(b"fLaC")
    si = _BitW()
    si.write(blocksize, 16); si.write(blocksize, 16)
    si.write(0, 24); si.write(0, 24)
    si.write(rate, 20); si.write(channels - 1, 3); si.write(bps - 1, 5)
    si.write(n, 36)
    body = bytes(si.out) + bytes(16)  # zero MD5 (unset, per spec allowed)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    for f, start in enumerate(range(0, n, blocksize)):
        blk = x[start : start + blocksize]
        bs = len(blk)
        w = _BitW()
        w.write(0x3FFE, 14); w.write(0, 1); w.write(0, 1)
        w.write(7, 4)       # blocksize: 16-bit at end of header
        w.write(0, 4)       # sample rate: from STREAMINFO
        w.write(channels - 1, 4)
        w.write(0, 3)       # sample size: from STREAMINFO
        w.write(0, 1)
        # UTF-8 frame number (frames are small in tests; support 2 bytes)
        if f < 0x80:
            w.write(f, 8)
        else:
            w.write(0xC0 | (f >> 6), 8)
            w.write(0x80 | (f & 0x3F), 8)
        w.write(bs - 1, 16)
        hdr = bytes(w.out)
        w.write(_crc8(hdr), 8)
        for c in range(channels):
            ch = blk[:, c].tolist()
            use_fixed = fixed_order > 0 and bs > fixed_order
            if use_fixed:
                w.write(0, 1); w.write(8 + fixed_order, 6); w.write(0, 1)
                coefs = _FIXED_COEFFS[fixed_order]
                for i in range(fixed_order):
                    w.write_signed(ch[i], bps)
                resid = [
                    ch[i] - sum(
                        cc * ch[i - 1 - j] for j, cc in enumerate(coefs)
                    )
                    for i in range(fixed_order, bs)
                ]
                # rice parameter: smallest covering the mean magnitude
                mean = max(1, int(np.mean(np.abs(resid))) if resid else 1)
                param = min(14, max(0, int(mean).bit_length()))
                w.write(0, 2)       # rice method 0 (4-bit params)
                w.write(0, 4)       # partition order 0
                w.write(param, 4)
                for r in resid:
                    w.write_rice(int(r), param)
            else:
                w.write(0, 1); w.write(1, 6); w.write(0, 1)
                for s in ch:
                    w.write_signed(int(s), bps)
        w.align()
        frame = bytes(w.out)
        out += frame + _crc16(frame).to_bytes(2, "big")
    return bytes(out)
