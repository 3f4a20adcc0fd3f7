"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns + typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode kernels themselves are STUBS (the image/audio codec
libraries are not in this container): ``decode='fake'`` produces
deterministic synthetic pixels/samples so the Spark-side plumbing —
schema contracts, batch iteration, partition sizing, UDF signatures —
is real and fully tested; ``decode='real'`` raises NotImplementedError
at the clearly marked point where PIL/libav would be called.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = ["IMAGE_SCHEMA", "image_features", "frame_sample", "synth_binary_column"]

# canonical multimodal row contract
IMAGE_SCHEMA = (
    "id long, modality string, data binary, "
    "meta struct<width:int, height:int, format:string>"
)

FEATURE_SCHEMA = (
    "id long, width int, height int, n_bytes int, "
    "mean_luma double, phash long"
)


def synth_binary_column(df: DataFrame, id_col: str = "row_id",
                        width: int = 32, height: int = 32) -> DataFrame:
    """Deterministic fake 'image' bytes derived from the id — lets
    pipelines exercise binary columns without codec libraries."""
    return df.select(
        F.col(id_col).alias("id"),
        F.lit("image").alias("modality"),
        F.sha2(F.col(id_col).cast("string"), 256).cast("binary").alias("data"),
        F.struct(
            F.lit(width).alias("width"), F.lit(height).alias("height"),
            F.lit("fake").alias("format"),
        ).alias("meta"),
    )


def _decode_image(data: bytes, meta: dict, mode: str) -> np.ndarray:
    if mode == "real":
        # integration point for a real decoder (PIL.Image.open /
        # cv2.imdecode) — not available in this environment
        raise NotImplementedError("image codecs not available; use decode='fake'")
    # deterministic fake decode: seed pixels from sha256(data)
    h = hashlib.sha256(data or b"").digest()
    rng = np.frombuffer((h * ((meta["width"] * meta["height"] // len(h)) + 1))[
        : meta["width"] * meta["height"]], dtype=np.uint8)
    return rng.reshape(meta["height"], meta["width"]).astype(np.float64)


def image_features(df: DataFrame, decode: str = "fake",
                   batch_size_hint: int = 1024) -> DataFrame:
    """Decode → feature-extract per Arrow batch: mean luminance and a
    64-bit average-hash (aHash) perceptual fingerprint from an 8×8
    downsample. Partition-parallel, vectorized within batches."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                meta = r["meta"]
                px = _decode_image(r["data"], meta, decode)
                # resize to 8x8 by block averaging (pure numpy)
                h, w = px.shape
                bh, bw = max(h // 8, 1), max(w // 8, 1)
                small = px[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
                bits = (small > small.mean()).flatten()
                phash = 0
                for i, b in enumerate(bits):
                    if b:
                        phash |= 1 << i
                rows.append(
                    (int(r["id"]), int(meta["width"]), int(meta["height"]),
                     len(r["data"] or b""), float(px.mean()),
                     int(np.int64(np.uint64(phash).astype(np.int64))))
                )
            yield pd.DataFrame(
                rows, columns=["id", "width", "height", "n_bytes", "mean_luma", "phash"]
            )

    return df.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10, decode: str = "fake") -> DataFrame:
    """Video frame-sampling plumbing: emits (id, frame_idx) rows for
    every ``every_n``-th frame. Fake mode synthesizes a deterministic
    frame count from the data length; real mode is the libav stub."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_frame = [], []
            for _, r in pdf.iterrows():
                if decode == "real":
                    raise NotImplementedError("video codecs not available; use decode='fake'")
                n_frames = (len(r["data"] or b"") % 97) + 30
                for fi in range(0, n_frames, every_n):
                    out_id.append(int(r["id"]))
                    out_frame.append(fi)
            yield pd.DataFrame({"id": out_id, "frame_idx": out_frame})

    return df.mapInPandas(kernel, schema="id long, frame_idx int")
