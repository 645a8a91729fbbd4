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
REAL_DECODABLE = {
    "image/x-portable-pixmap",
    "image/x-portable-graymap",
    "audio/wav",
    "audio/x-wav",
}


def decode_features(payload: bytes, mime: str) -> np.ndarray | None:
    """Real decode+featurize for supported mimes; None when no codec
    exists here (caller stubs or raises per its strict flag)."""
    if mime in ("image/x-portable-pixmap", "image/x-portable-graymap"):
        return image_features(decode_pnm(payload))
    if mime in ("audio/wav", "audio/x-wav"):
        return audio_features(*decode_wav(payload))
    return None
