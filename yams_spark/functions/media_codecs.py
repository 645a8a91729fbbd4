"""Real, dependency-free media codecs for the multimodal columns.

The container has no image/audio libraries, but two formats are decodable
with nothing beyond numpy and the stdlib, which makes the multimodal
pipeline's decode step REAL for them (the plugin-extractor boundary of
``reference src/extraction/external_plugin_extractor.cpp`` then only
stubs formats whose codecs genuinely don't exist here):

* **PPM/PGM (P5/P6)** — the netpbm binary formats: ASCII header
  (magic, width, height, maxval) + raw samples. Decode → uint8 numpy
  array; nearest-neighbor resize; per-channel mean/std + 8-bin histogram
  features.
* **WAV (PCM16)** — stdlib ``wave`` + numpy frombuffer. Decode → float32
  samples in [-1, 1]; RMS / zero-crossing-rate / 8-band FFT energy
  features.
* **PNG (8-bit, all color types, non-interlaced)** — stdlib ``zlib``:
  CRC-verified chunk walk, IDAT inflate, scanline unfilter
  (None/Sub/Up/Average/Paeth), palette expansion. Adam7 and 16-bit
  raise — that's the honest strict-mode boundary; JPEG/MP3 entropy
  coding genuinely needs codecs this container lacks.

Everything is deterministic and byte-exact — used by operators/multimodal
as the real decode path and by tests as round-trip oracles.
"""

from __future__ import annotations

import io
import wave

import numpy as np

IMAGE_FEATURE_BINS = 8
AUDIO_FEATURE_BANDS = 8


# ---------- netpbm ----------


def _pnm_header(data: bytes) -> tuple[bytes, int, int, int, int]:
    """Parse (magic, width, height, maxval, data_offset); whitespace and
    '#' comments per the netpbm spec."""
    magic = data[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary PGM/PPM: magic={magic!r}")
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        fields.append(int(data[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = fields
    return magic, w, h, maxval, i


def decode_pnm(payload: bytes) -> np.ndarray:
    """P6 -> (h, w, 3) uint8; P5 -> (h, w) uint8."""
    magic, w, h, maxval, off = _pnm_header(payload)
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    ch = 3 if magic == b"P6" else 1
    n = w * h * ch
    arr = np.frombuffer(payload, dtype=np.uint8, count=n, offset=off)
    return arr.reshape((h, w, 3)) if ch == 3 else arr.reshape((h, w))


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) or (h, w) uint8 -> P6/P5 bytes (test fixture builder)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 3:
        h, w, _ = img.shape
        return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()
    h, w = img.shape
    return b"P5\n%d %d\n255\n" % (w, h) + img.tobytes()


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (index-map gather — pure numpy)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


def image_features(img: np.ndarray, bins: int = IMAGE_FEATURE_BINS) -> np.ndarray:
    """Per-channel mean + std (scaled to [0,1]) followed by a per-channel
    ``bins``-bucket normalized histogram; grayscale is treated as one
    channel repeated. float32, length = 3*(2+bins)."""
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    feats: list[float] = []
    for c in range(3):
        ch = img[:, :, c].astype(np.float64) / 255.0
        feats.append(float(ch.mean()))
        feats.append(float(ch.std()))
        hist, _ = np.histogram(ch, bins=bins, range=(0.0, 1.0))
        feats.extend((hist / max(1, ch.size)).tolist())
    return np.asarray(feats, dtype=np.float32)


# ---------- WAV ----------


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM16 WAV -> (float32 mono samples in [-1,1], sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError("only PCM16 WAV supported")
        rate = wf.getframerate()
        n_ch = wf.getnchannels()
        raw = wf.readframes(wf.getnframes())
    samples = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    if n_ch > 1:
        samples = samples.reshape(-1, n_ch).mean(axis=1)
    return samples, rate


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """float32 [-1,1] mono -> PCM16 WAV bytes (test fixture builder)."""
    pcm = np.clip(np.asarray(samples) * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def audio_features(
    samples: np.ndarray, rate: int, bands: int = AUDIO_FEATURE_BANDS
) -> np.ndarray:
    """RMS, zero-crossing rate, duration_s, and ``bands`` normalized FFT
    band energies (0..rate/2). float32, length = 3 + bands."""
    x = np.asarray(samples, dtype=np.float64)
    if x.size == 0:
        return np.zeros(3 + bands, dtype=np.float32)
    rms = float(np.sqrt((x * x).mean()))
    zcr = float((np.signbit(x[1:]) != np.signbit(x[:-1])).mean()) if x.size > 1 else 0.0
    spec = np.abs(np.fft.rfft(x)) ** 2
    edges = np.linspace(0, len(spec), bands + 1).astype(int)
    band_e = np.array(
        [spec[a:b].sum() for a, b in zip(edges, edges[1:])], dtype=np.float64
    )
    total = band_e.sum()
    if total > 0:
        band_e /= total
    return np.asarray(
        [rms, zcr, x.size / rate, *band_e.tolist()], dtype=np.float32
    )


# ---------- dispatcher ----------

#: mimes with a REAL decoder in this environment
# ---------- PNG (stdlib zlib; RFC 2083) ----------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: samples per pixel by color type (0 gray, 2 RGB, 3 palette, 4 gray+A, 6 RGBA)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> np.ndarray:
    """Real PNG decode with nothing beyond stdlib zlib: chunk walk with
    CRC verification, IDAT inflate, per-scanline unfilter (None / Sub /
    Up / Average / Paeth), palette expansion. Supports bit depth 8, all
    five color types, non-interlaced (Adam7 raises — the strict-mode
    boundary, like any genuinely absent codec). Returns uint8 (h, w) or
    (h, w, channels)."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} (only 8 supported)")
    if color not in _PNG_CHANNELS:
        raise ValueError(f"PNG color type {color} invalid")
    if comp != 0 or filt != 0:
        raise ValueError("PNG nonstandard compression/filter method")
    if interlace != 0:
        raise NotImplementedError("PNG Adam7 interlace not supported")
    ch = _PNG_CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_start + 1
        ).copy()
        if ftype == 0:
            rec = line
        elif ftype == 2:  # Up — fully vectorized
            rec = (line.astype(np.int32) + prev).astype(np.uint8)
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth — sequential in x
            rec = np.zeros(stride, dtype=np.uint8)
            li = line.astype(np.int32)
            pv = prev.astype(np.int32)
            for x in range(stride):
                a = int(rec[x - ch]) if x >= ch else 0
                b = int(pv[x])
                if ftype == 1:
                    rec[x] = (li[x] + a) & 0xFF
                elif ftype == 3:
                    rec[x] = (li[x] + (a + b) // 2) & 0xFF
                else:
                    c = int(pv[x - ch]) if x >= ch else 0
                    rec[x] = (li[x] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ftype} invalid")
        out[y] = rec
        prev = rec
    img = out.reshape(h, w, ch)
    if color == 3:
        if plte is None:
            raise ValueError("PNG palette image missing PLTE")
        img = plte[img[:, :, 0]]
    return img[:, :, 0] if img.shape[2] == 1 else img


def encode_png(img: np.ndarray) -> bytes:
    """Minimal PNG encoder (filter 0 rows, zlib level 9) for gray /
    gray+alpha / RGB / RGBA uint8 arrays — the round-trip oracle for
    ``decode_png`` in tests."""
    import struct
    import zlib

    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    return (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )


REAL_DECODABLE = {
    "image/x-portable-pixmap",
    "image/x-portable-graymap",
    "image/png",
    "audio/wav",
    "audio/x-wav",
}


def decode_features(payload: bytes, mime: str) -> np.ndarray | None:
    """Real decode+featurize for supported mimes; None when no codec
    exists here (caller stubs or raises per its strict flag)."""
    if mime in ("image/x-portable-pixmap", "image/x-portable-graymap"):
        return image_features(decode_pnm(payload))
    if mime == "image/png":
        img = decode_png(payload)
        if img.ndim == 3 and img.shape[2] in (2, 4):
            img = img[:, :, :-1]  # drop alpha for luminance features
        return image_features(img)
    if mime in ("audio/wav", "audio/x-wav"):
        return audio_features(*decode_wav(payload))
    return None
