"""Multimodal columns — image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested: schema, Arrow batch shape,
mapInPandas decode signature, partitioning discipline (binary payloads make
rows wide — keep maxRecordsPerBatch moderate and NEVER shuffle the binary
column through a wide join; join on id, attach payload last).

Decode has two modes:
- mode="fake": a deterministic stand-in deriving metadata/features from the
  payload's md5 — stable for tests and oracles;
- mode="real": dependency-free container parsing — PNG IHDR / JPEG SOF /
  GIF logical-screen headers give true (width, height), the feature vector
  is a normalized byte histogram. Pixel decoding (Pillow/ffmpeg) slots into
  the same kernel when the libs exist; everything Spark-side is identical.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "id long, media binary, media_type string, "
    "width int, height int, n_pixels long, feat array<float>"
)


def attach_fake_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Test fixture: treat the UTF-8 text bytes as an opaque media payload."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.col(text_col).cast("binary").alias("media"),
        F.lit("image/fake").alias("media_type"),
    )


def _fake_decode_one(payload: bytes) -> tuple[int, int, list[float]]:
    h = hashlib.md5(payload).hexdigest()
    width = 1 + int(h[0:2], 16) % 64
    height = 1 + int(h[2:4], 16) % 64
    feat = [
        float(int(h[i : i + 2], 16)) / 255.0 for i in range(4, 20, 2)
    ]  # 8-dim deterministic "embedding"
    return width, height, feat


def _parse_png(b: bytes) -> tuple[int, int] | None:
    """PNG: 8-byte signature, then the IHDR chunk holds big-endian
    width/height at offsets 16/20."""
    if len(b) < 24 or b[:8] != b"\x89PNG\r\n\x1a\n" or b[12:16] != b"IHDR":
        return None
    return int.from_bytes(b[16:20], "big"), int.from_bytes(b[20:24], "big")


def _parse_jpeg(b: bytes) -> tuple[int, int] | None:
    """JPEG: walk marker segments to the first frame header (SOF0..SOF15
    except DHT/JPG/DAC); height/width are big-endian at +5/+7."""
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    i = 2
    while i + 9 < len(b):
        if b[i] != 0xFF:
            i += 1
            continue
        marker = b[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if i + 4 > len(b):
            return None
        seglen = int.from_bytes(b[i + 2 : i + 4], "big")
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 > len(b):
                return None
            h = int.from_bytes(b[i + 5 : i + 7], "big")
            w = int.from_bytes(b[i + 7 : i + 9], "big")
            return w, h
        if seglen < 2:
            return None
        i += 2 + seglen
    return None


def _parse_gif(b: bytes) -> tuple[int, int] | None:
    """GIF: logical screen width/height, little-endian at offsets 6/8."""
    if len(b) < 10 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    return int.from_bytes(b[6:8], "little"), int.from_bytes(b[8:10], "little")


def _real_decode_one(payload: bytes) -> tuple[int, int, list[float]]:
    """Header-true dimensions (0×0 for unrecognized payloads) + an 8-bin
    normalized byte histogram as the feature vector — real, deterministic,
    dependency-free. Full pixel decode plugs in here when codec libs exist."""
    dims = _parse_png(payload) or _parse_jpeg(payload) or _parse_gif(payload)
    w, h = dims if dims else (0, 0)
    counts = np.bincount(
        np.frombuffer(payload, dtype=np.uint8) >> 5, minlength=8
    ).astype(np.float64)
    total = counts.sum()
    feat = (counts / total if total else counts).tolist()
    return w, h, feat


def decode_media(media: DataFrame, mode: str = "fake") -> DataFrame:
    """(id, media, media_type) → MEDIA_SCHEMA with decoded metadata +
    feature vector. Arrow-batched; payload stays columnar end to end."""
    if mode not in ("fake", "real"):
        raise ValueError(f"unknown decode mode {mode!r}")
    decode_one = _real_decode_one if mode == "real" else _fake_decode_one

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ws, hs, feats = [], [], []
            for payload in pdf["media"]:
                w, h, f = decode_one(bytes(payload))
                ws.append(w)
                hs.append(h)
                feats.append(np.array(f, dtype=np.float32))
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "media": pdf["media"],
                    "media_type": pdf["media_type"],
                    "width": np.array(ws, dtype=np.int32),
                    "height": np.array(hs, dtype=np.int32),
                    "n_pixels": np.array(ws, dtype=np.int64) * np.array(hs, dtype=np.int64),
                    "feat": feats,
                }
            )

    return media.mapInPandas(kernel, schema=MEDIA_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emit (id, frame_no) rows for frames
    0, n, 2n, ... based on a fake frame count from the payload length (stub
    for the container-less environment; the explode shape is the real part —
    one row per sampled frame, ready for a decode kernel)."""
    with_count = media.withColumn(
        "n_frames", (F.length("media") % 300 + 1).cast("int")
    )
    frames = with_count.withColumn(
        "frame_no",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))),
    )
    return frames.select("id", "frame_no")


# -- audio ------------------------------------------------------------------

AUDIO_SCHEMA = (
    "id long, media_type string, sample_rate int, channels int, "
    "n_samples long, duration_sec double"
)


def _parse_wav(b: bytes) -> tuple[int, int, int] | None:
    """WAV/RIFF: walk chunks for 'fmt ' (channels LE16@+2, sample_rate
    LE32@+4, bits LE16@+14) and 'data' (payload size → sample count).
    Returns (sample_rate, channels, n_samples) or None if not a WAV."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    sr = ch = bits = None
    data_size = None
    i = 12
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        size = int.from_bytes(b[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 24 <= len(b):
            ch = int.from_bytes(b[i + 10 : i + 12], "little")
            sr = int.from_bytes(b[i + 12 : i + 16], "little")
            bits = int.from_bytes(b[i + 22 : i + 24], "little")
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if not (sr and ch and bits and data_size is not None):
        return None
    return sr, ch, data_size // max(ch * bits // 8, 1)


def _fake_audio_one(payload: bytes) -> tuple[int, int, int]:
    """md5-closed-form audio metadata (SQL-twin-able like _fake_decode_one):
    sample_rate = 8000 + hex[0:2] % 8 · 4000, channels = 1 + hex[2:4] % 2,
    n_samples = (hex[4:6] + 1) · 1000."""
    h = hashlib.md5(payload).hexdigest()
    sr = 8000 + (int(h[0:2], 16) % 8) * 4000
    ch = 1 + int(h[2:4], 16) % 2
    n = (int(h[4:6], 16) + 1) * 1000
    return sr, ch, n


def decode_audio(media: DataFrame, mode: str = "fake") -> DataFrame:
    """(id, media, media_type) → AUDIO_SCHEMA. mode="real" parses WAV/RIFF
    headers dependency-free (unrecognized payloads decode as 0s); "fake" is
    the md5 closed form the DuckDB oracle replicates. The binary column is
    consumed here and NOT emitted — downstream audio analytics shuffle only
    scalar metadata."""
    if mode not in ("fake", "real"):
        raise ValueError(f"unknown decode mode {mode!r}")

    def one(payload: bytes) -> tuple[int, int, int]:
        if mode == "fake":
            return _fake_audio_one(payload)
        return _parse_wav(payload) or (0, 0, 0)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            srs, chs, ns = [], [], []
            for payload in pdf["media"]:
                sr, ch, n = one(bytes(payload))
                srs.append(sr)
                chs.append(ch)
                ns.append(n)
            sr_a = np.array(srs, dtype=np.int64)
            n_a = np.array(ns, dtype=np.int64)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "media_type": pdf["media_type"],
                    "sample_rate": np.array(srs, dtype=np.int32),
                    "channels": np.array(chs, dtype=np.int32),
                    "n_samples": n_a,
                    "duration_sec": np.where(
                        sr_a > 0, n_a / np.maximum(sr_a, 1), 0.0
                    ),
                }
            )

    return media.mapInPandas(kernel, schema=AUDIO_SCHEMA)
