"""Real codecs for the uncompressed media formats — pure numpy + struct.

The container has no PIL/librosa/ffmpeg, so COMPRESSED formats (JPEG,
MP3, H.264) stay honestly stubbed in queries.py. But the uncompressed
containers are just headers + raw arrays, and parsing them needs nothing
beyond the standard library: this module implements REAL encode/decode
for RIFF/WAVE PCM audio and BI_RGB BMP images, so the multimodal
pipeline's decode stage genuinely decodes — byte-exact round-trips,
malformed-input errors, and closed-form-verified features — instead of
hashing bytes.

Formats (both public specifications):

- WAV: RIFF container, ``fmt `` chunk (PCM=1, 16-bit LE), ``data``
  chunk. Mono or interleaved multi-channel.
- BMP: BITMAPFILEHEADER + BITMAPINFOHEADER (40 bytes), 24-bit BI_RGB,
  bottom-up row order, rows padded to 4 bytes, BGR channel order.

Everything here is per-row executor work — the Spark side batches
payloads through mapInPandas (queries.py) and never moves decoded
arrays across a shuffle.
"""

from __future__ import annotations

import struct

import numpy as np


# --- WAV (RIFF PCM 16-bit) ------------------------------------------------

def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """RIFF/WAVE PCM16 bytes from an int16 array (1-D mono or
    (n, channels) interleaved)."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(f"samples must be 1-D or 2-D, got shape {arr.shape}")
    n_ch = arr.shape[1]
    data = arr.reshape(-1).tobytes()
    block = n_ch * 2
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * block, block, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """(rate, samples[n, channels]) from RIFF/WAVE PCM16 bytes. Raises
    ValueError on anything that is not uncompressed 16-bit PCM — a
    malformed blob in a 100 TB lake must fail loudly, not decode to
    garbage."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_ch, rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"only uncompressed PCM16 supported, got format={audio_format},"
            f" bits={bits}"
        )
    arr = np.frombuffer(data, dtype="<i2")
    if n_ch > 1:
        arr = arr[: len(arr) - len(arr) % n_ch]
    return int(rate), arr.reshape(-1, max(n_ch, 1))


def wav_features(payload: bytes) -> dict:
    """Closed-form audio features from a decoded PCM16 payload:
    duration (s), RMS level (full-scale = 1.0), peak, zero-crossing
    rate of channel 0 — the triage columns an audio-curation pipeline
    filters on (silence, clipping, tone-vs-noise)."""
    rate, x = decode_wav(payload)
    f = x.astype(np.float64) / 32768.0
    ch0 = f[:, 0]
    zc = float(np.mean(np.abs(np.diff(np.signbit(ch0))))) if len(ch0) > 1 else 0.0
    return {
        "duration_s": round(x.shape[0] / rate, 6),
        "rms": round(float(np.sqrt(np.mean(f * f))), 6) if x.size else 0.0,
        "peak": round(float(np.max(np.abs(f))), 6) if x.size else 0.0,
        "zcr": round(zc, 6),
        "rate": rate,
        "channels": x.shape[1],
    }


# --- BMP (24-bit BI_RGB) ----------------------------------------------------

def encode_bmp(img: np.ndarray) -> bytes:
    """24-bit BI_RGB BMP bytes from an (h, w, 3) uint8 RGB array."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"need (h, w, 3) RGB, got shape {a.shape}")
    h, w, _ = a.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # bottom-up rows, BGR order, 4-byte padded
    bgr = a[::-1, :, ::-1]
    rows = b"".join(
        bgr[r].tobytes() + b"\x00" * pad for r in range(h)
    )
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(rows), 0, 0, 14 + 40)
    return header + info + rows


def decode_bmp(payload: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB from 24-bit BI_RGB BMP bytes; ValueError on
    compressed/paletted/other-depth files."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (_, _, _, _, offset) = struct.unpack_from("<2sIHHI", payload, 0)
    (hsize, w, h, _, bpp, comp) = struct.unpack_from("<IiiHHI", payload, 14)
    if hsize < 40 or bpp != 24 or comp != 0:
        raise ValueError(
            f"only 24-bit BI_RGB supported, got bpp={bpp}, compression={comp}"
        )
    bottom_up = h > 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    need = offset + stride * h
    if len(payload) < need:
        raise ValueError(f"BMP truncated: need {need} bytes, have {len(payload)}")
    raw = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=offset)
    rows = raw.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def bmp_features(payload: bytes) -> dict:
    """Image triage features: dimensions, mean luminance (Rec. 601
    weights), contrast (luma std)."""
    img = decode_bmp(payload)
    luma = (
        0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
    )
    return {
        "width": img.shape[1],
        "height": img.shape[0],
        "mean_luma": round(float(luma.mean()), 4),
        "contrast": round(float(luma.std()), 4),
    }


def resize_nearest(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resize by index mapping — the bandwidth-bound
    thumbnailing step, pure numpy indexing (no interpolation libs)."""
    if w < 1 or h < 1:
        raise ValueError(f"target size must be >= 1, got {w}x{h}")
    src_h, src_w = img.shape[:2]
    ys = (np.arange(h) * src_h // h).clip(0, src_h - 1)
    xs = (np.arange(w) * src_w // w).clip(0, src_w - 1)
    return img[ys][:, xs]


# --- deterministic synthetic payload generators (test/dev corpus) ---------

def synth_wav(doc_id: int, rate: int = 8000) -> bytes:
    """Deterministic per-doc sine tone: freq 200+(doc_id%17)·50 Hz,
    0.25 s, amplitude 0.5 full-scale — features have closed forms
    (RMS = 0.5/√2) so decode correctness is provable, not just stable."""
    freq = 200 + (int(doc_id) % 17) * 50
    t = np.arange(int(rate * 0.25)) / rate
    x = np.round(0.5 * 32767 * np.sin(2 * np.pi * freq * t)).astype(np.int16)
    return encode_wav(x, rate)


def synth_bmp(doc_id: int) -> bytes:
    """Deterministic per-doc gradient card: width 16+(doc_id%5)·3 (hits
    every 4-byte-padding case), height 8+(doc_id%3)·5, horizontal
    red-channel gradient with green/blue constants keyed on doc_id."""
    w = 16 + (int(doc_id) % 5) * 3
    h = 8 + (int(doc_id) % 3) * 5
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :, 0] = (np.arange(w) * 255 // max(w - 1, 1))[None, :]
    img[:, :, 1] = int(doc_id) % 256
    img[:, :, 2] = (int(doc_id) * 7) % 256
    return encode_bmp(img)


# --- NPY (NumPy array container, format spec v1.0) --------------------------
#
# The interchange format training pipelines actually ship tensors in
# (features, embeddings, spectrograms). np.save/np.load ARE the reference
# implementation of the public .npy spec, so the codec delegates to them
# over in-memory buffers with pickle disabled (object arrays are a code
# -execution vector from untrusted corpora and have no place in a data
# pipeline).


def encode_npy(arr: np.ndarray) -> bytes:
    """.npy bytes for a numeric ndarray (any shape/dtype, no objects)."""
    import io

    if arr.dtype == object:
        raise ValueError("encode_npy: object arrays are not supported")
    buf = io.BytesIO()
    np.save(buf, arr, allow_pickle=False)
    return buf.getvalue()


def decode_npy(payload: bytes) -> np.ndarray:
    """ndarray from .npy bytes; rejects pickled/object payloads."""
    import io

    return np.load(io.BytesIO(payload), allow_pickle=False)


def npy_features(payload: bytes) -> dict:
    """Shape/dtype/moments of a tensor payload — the metadata row a
    tensor lake indexes on."""
    arr = decode_npy(payload)
    flat = arr.astype(np.float64, copy=False).ravel()
    return {
        "ndim": int(arr.ndim),
        "shape": "x".join(str(s) for s in arr.shape),
        "dtype": str(arr.dtype),
        "n_elems": int(arr.size),
        "mean": float(flat.mean()) if arr.size else 0.0,
        "std": float(flat.std()) if arr.size else 0.0,
    }


def synth_npy(doc_id: int) -> bytes:
    """Deterministic small float32 tensor keyed by doc_id (test fixture)."""
    rng = np.random.default_rng(doc_id)
    return encode_npy(rng.normal(0, 1, (4, 8)).astype(np.float32))
