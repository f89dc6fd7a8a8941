"""Multimodal columns — image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested: schema, Arrow batch shape,
mapInPandas decode signature, partitioning discipline (binary payloads make
rows wide — keep maxRecordsPerBatch moderate and NEVER shuffle the binary
column through a wide join; join on id, attach payload last).

The actual codec step is environment-dependent (no image/audio libs in this
container), so decode has two modes:
- mode="fake": a deterministic stand-in deriving metadata/features from the
  payload's md5 — stable for tests and oracles;
- mode="real": raises NotImplementedError with the integration point named —
  plug Pillow/torchaudio/ffmpeg there; the Spark plumbing is unchanged.
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


def decode_media(media: DataFrame, mode: str = "fake") -> DataFrame:
    """(id, media, media_type) → MEDIA_SCHEMA with decoded metadata +
    feature vector. Arrow-batched; payload stays columnar end to end."""
    if mode == "real":
        raise NotImplementedError(
            "plug a real codec here: replace _fake_decode_one with e.g. "
            "PIL.Image.open(io.BytesIO(payload)) → size/thumbnail/features; "
            "the mapInPandas signature and schema stay identical"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ws, hs, feats = [], [], []
            for payload in pdf["media"]:
                w, h, f = _fake_decode_one(bytes(payload))
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
