"""Multimodal column plumbing (graft-added surface).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages.

Decode support is tiered by what a dependency-free container can honestly
do:

- REAL decoders (numpy + stdlib only, no codec libs):
  * PPM (P6) / PGM (P5) binary images -> H x W x C float32 in [0, 1]
  * WAV (RIFF PCM 8/16/32-bit) audio  -> mono float32 waveform + rate
  The decode stage sniffs magic bytes and uses these automatically.
- STUBBED formats (JPEG/PNG/MP3/H.264 need codec libraries absent here):
  with ``fallback="fake"`` a deterministic payload-seeded array stands in
  for the decoded media (tests stay stable); ``fallback="error"`` raises
  NotImplementedError at the clearly marked point below.

Feature extraction (mean-pool resize, RMS/ZCR/spectral-centroid audio
stats) is real numpy either way — only the codec for compressed formats
is out of scope.
"""

from __future__ import annotations

import io
import wave
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType, IntegerType, StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),          # image | audio | video
        StructField("payload", BinaryType()),        # opaque encoded bytes
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("sample_rate", IntegerType()),
    ]
)


# ---------------------------------------------------------------------------
# Real, dependency-free codecs
# ---------------------------------------------------------------------------


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5), 8-bit maxval -> (H, W, C) float32 in
    [0, 1]. Pure numpy; raises ValueError on anything else."""
    if not payload or payload[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PPM/PGM payload")
    # header = magic, width, height, maxval as whitespace-separated tokens,
    # with '#' comments; pixel data starts after the single whitespace byte
    # following maxval
    tokens, pos = [], 2
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    ch = 3 if payload[:2] == b"P6" else 1
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch, offset=pos)
    return (arr.reshape(h, w, ch).astype(np.float32)) / np.float32(maxval)


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 1|3) float in [0,1] or uint8 -> binary PGM/PPM bytes."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)
    h, w, c = img.shape
    magic = b"P6" if c == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + img.tobytes()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF PCM WAV -> (mono float32 waveform in [-1, 1], sample_rate).
    stdlib wave + numpy; raises on compressed formats."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        n, width, rate, ch = (wf.getnframes(), wf.getsampwidth(),
                              wf.getframerate(), wf.getnchannels())
        raw = wf.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, rate


def encode_wav(x: np.ndarray, rate: int = 16000) -> bytes:
    """mono float waveform in [-1, 1] -> 16-bit PCM WAV bytes."""
    pcm = np.clip(np.round(np.asarray(x) * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(int(rate))
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def mean_pool_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-style downscale by block mean (pads by edge-cropping to a
    multiple of the output grid). (H, W, C) -> (out_h, out_w, C)."""
    h, w, c = img.shape
    bh, bw = max(h // out_h, 1), max(w // out_w, 1)
    h2, w2 = (h // bh) * bh, (w // bw) * bw
    pooled = img[:h2, :w2].reshape(h2 // bh, bh, w2 // bw, bw, c).mean(axis=(1, 3))
    # crop/pad to the exact grid
    out = np.zeros((out_h, out_w, c), dtype=np.float32)
    hh, ww = min(out_h, pooled.shape[0]), min(out_w, pooled.shape[1])
    out[:hh, :ww] = pooled[:hh, :ww]
    return out


def _fake_decode(payload: bytes, n: int) -> np.ndarray:
    """Deterministic stand-in for a codec: a seeded PRNG keyed by the
    payload bytes. Same payload -> same 'pixels', so tests are stable."""
    seed = np.frombuffer((payload or b"\0")[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
    rng = np.random.default_rng(int(seed))
    return rng.random(n, dtype=np.float64).astype(np.float32)


def _decode_pixels(payload: bytes, n_fallback: int, fallback: str) -> np.ndarray:
    """Sniff magic bytes; real-decode what we can, else the stub tier."""
    if payload and payload[:2] in (b"P5", b"P6"):
        return decode_ppm(payload).ravel()
    if payload and payload[:4] == b"RIFF":
        return decode_wav(payload)[0]
    if fallback == "fake":
        return _fake_decode(payload, n_fallback)
    # --- REAL DECODER FOR COMPRESSED FORMATS GOES HERE (PIL/ffmpeg) ---
    raise NotImplementedError(
        "decoding this payload format requires a codec library not present "
        "in this environment (only PPM/PGM/WAV decode dependency-free)"
    )


# ---------------------------------------------------------------------------
# Spark stages
# ---------------------------------------------------------------------------


def image_features(
    df: DataFrame,
    out_dim: int = 64,
    fallback: str = "fake",
    batch_limit: int = 256,
) -> DataFrame:
    """payload -> decoded pixels (real PPM/PGM/WAV decode; see module
    docstring for the fallback tiers) -> mean-pooled feature vector.
    mapInPandas: each Arrow batch decodes <=batch_limit media items and
    emits (media_id, features:array<float>)."""

    out_schema = "media_id string, features array<float>"

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start : start + batch_limit]
                feats = []
                for _, row in chunk.iterrows():
                    n_px = max(int(row.get("width") or 8) * int(row.get("height") or 8), out_dim)
                    px = _decode_pixels(row["payload"], n_px, fallback)
                    if len(px) < out_dim:
                        px = np.pad(px, (0, out_dim - len(px)))
                    # mean-pool to fixed dim (the 'feature extraction' stage)
                    trim = (len(px) // out_dim) * out_dim
                    feats.append(px[:trim].reshape(out_dim, -1).mean(axis=1))
                yield pd.DataFrame(
                    {"media_id": chunk["media_id"].values, "features": feats}
                )

    return df.mapInPandas(decode_batches, schema=out_schema)


def image_resize(
    df: DataFrame,
    out_h: int = 16,
    out_w: int = 16,
) -> DataFrame:
    """Real resize stage for PPM/PGM payloads: decode -> block-mean
    downscale -> re-encode as PGM/PPM bytes (media stays a binary column,
    now at thumbnail size). Non-PNM payloads raise — this stage is only
    meaningful with a real decoder."""
    out_schema = "media_id string, payload binary, width int, height int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "payload": [], "width": [], "height": []}
            for _, row in pdf.iterrows():
                img = decode_ppm(row["payload"])
                small = mean_pool_resize(img, out_h, out_w)
                out["media_id"].append(row["media_id"])
                out["payload"].append(encode_ppm(small))
                out["width"].append(out_w)
                out["height"].append(out_h)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=out_schema)


def audio_features(df: DataFrame, n_mel_ish: int = 16) -> DataFrame:
    """Real WAV feature extraction: RMS, zero-crossing rate, spectral
    centroid, plus an n-band log-power spectrum (FFT band-pooled — the
    dependency-free stand-in for a mel filterbank)."""
    out_schema = ("media_id string, rms float, zcr float, "
                  "spectral_centroid float, bands array<float>")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "rms": [], "zcr": [],
                   "spectral_centroid": [], "bands": []}
            for _, row in pdf.iterrows():
                x, rate = decode_wav(row["payload"])
                if len(x) == 0:
                    x = np.zeros(2, dtype=np.float32)
                rms = float(np.sqrt(np.mean(x * x)))
                zcr = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))
                spec = np.abs(np.fft.rfft(x.astype(np.float64))) ** 2
                freqs = np.fft.rfftfreq(len(x), d=1.0 / rate)
                cent = float((freqs * spec).sum() / max(spec.sum(), 1e-12))
                trim = (len(spec) // n_mel_ish) * n_mel_ish
                bands = np.log1p(
                    spec[:trim].reshape(n_mel_ish, -1).mean(axis=1)
                ).astype(np.float32) if trim else np.zeros(n_mel_ish, np.float32)
                out["media_id"].append(row["media_id"])
                out["rms"].append(rms)
                out["zcr"].append(zcr)
                out["spectral_centroid"].append(cent)
                out["bands"].append(bands)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=out_schema)


def frame_sample(
    df: DataFrame,
    every_n: int = 10,
    fallback: str = "fake",
) -> DataFrame:
    """video payload -> one row per sampled frame index. Container/codec
    parsing for real video needs ffmpeg (absent), so frames use the
    fallback tier; the sampling/explode plumbing is real."""
    out_schema = "media_id string, frame_idx int, frame_feature float"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_feature": []}
            for _, row in pdf.iterrows():
                n = int(row.get("n_frames") or 0)
                for idx in range(0, n, every_n):
                    if fallback == "fake":
                        val = float(_fake_decode(row["payload"], idx + 1)[-1])
                    else:
                        raise NotImplementedError("real frame decode not available")
                    rows["media_id"].append(row["media_id"])
                    rows["frame_idx"].append(idx)
                    rows["frame_feature"].append(val)
            yield pd.DataFrame(rows)

    return df.mapInPandas(sample, schema=out_schema)


def gen_fake_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fixture in MEDIA_SCHEMA shape. Images are REAL PPM
    payloads and audio REAL WAV payloads (so the real decoders run in
    tests); video stays an opaque blob (codec out of scope)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        w, h = int(rng.integers(8, 65)), int(rng.integers(8, 65))
        if kind == "image":
            payload = encode_ppm(rng.random((h, w, 3)))
        elif kind == "audio":
            t = np.arange(int(rng.integers(800, 4000))) / 16000.0
            payload = encode_wav(
                0.5 * np.sin(2 * np.pi * float(rng.integers(100, 2000)) * t), 16000
            )
        else:
            payload = rng.bytes(128)
        rows.append(
            (
                f"m{i:05d}", kind, payload, w, h,
                int(rng.integers(1, 120)) if kind == "video" else 0,
                16000 if kind == "audio" else 0,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
