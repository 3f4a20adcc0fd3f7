"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns + typed metadata, processed via Arrow-batched ``mapInPandas``.

``decode='real'`` decodes uncompressed 24-bit BMP natively (pure numpy
— a genuinely working image path with no codec library) and raises
NotImplementedError at the clearly marked point where PIL/libav would
handle other formats (those libraries are not in this container);
``decode='fake'`` produces deterministic synthetic pixels/samples so
the Spark-side plumbing — schema contracts, batch iteration, partition
sizing, UDF signatures — is exercised independent of any codec.
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


def _decode_bmp(data: bytes) -> np.ndarray:
    """Pure-numpy decode of an uncompressed 24-bit BMP (BITMAPINFOHEADER)
    to a float64 luma plane — a REAL decoder needing no codec library.
    Raises ValueError for anything that isn't a 24bpp uncompressed BMP.
    """
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP")
    off = int.from_bytes(data[10:14], "little")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    comp = int.from_bytes(data[30:34], "little")
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        raise ValueError("only 24-bit uncompressed BMP supported")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    px = np.frombuffer(data, dtype=np.uint8, count=row_bytes * h, offset=off)
    px = px.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        px = px[::-1]
    # BMP stores BGR; Rec.601 luma
    bgr = px.astype(np.float64)
    return 0.114 * bgr[..., 0] + 0.587 * bgr[..., 1] + 0.299 * bgr[..., 2]


def _decode_image(data: bytes, meta: dict, mode: str) -> np.ndarray:
    if mode == "real":
        # BMP decodes natively (pure numpy); other formats are the
        # integration point for PIL/cv2 — not available in this
        # environment
        try:
            return _decode_bmp(data or b"")
        except ValueError as e:
            raise NotImplementedError(
                f"non-BMP codecs not available ({e}); use decode='fake' or BMP input"
            ) from e
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
            n = len(pdf)
            if n == 0:
                continue
            ids = pdf["id"].to_numpy()
            datas = pdf["data"].tolist()
            metas = pdf["meta"].tolist()
            widths = np.array([m["width"] for m in metas], dtype=np.int32)
            heights = np.array([m["height"] for m in metas], dtype=np.int32)
            n_bytes = np.array([len(d or b"") for d in datas], dtype=np.int32)
            mean_luma = np.empty(n, dtype=np.float64)
            phash = np.empty(n, dtype=np.uint64)
            # decode stays per row (the codec integration point); all
            # numpy work (block-mean resize, aHash) runs stacked per
            # same-shape group — the hot path when real decoders land.
            for wh in {(int(w), int(h)) for w, h in zip(widths, heights)}:
                w, h = wh
                idx = np.nonzero((widths == w) & (heights == h))[0]
                px = np.stack([_decode_image(datas[i], metas[i], decode) for i in idx])
                bh, bw = max(h // 8, 1), max(w // 8, 1)
                small = px[:, : bh * 8, : bw * 8].reshape(len(idx), 8, bh, 8, bw).mean(
                    axis=(2, 4)
                )
                bits = (small > small.mean(axis=(1, 2), keepdims=True)).reshape(len(idx), 64)
                # bits are disjoint powers of two, so the sum IS the OR
                phash[idx] = (bits.astype(np.uint64)
                              << np.arange(64, dtype=np.uint64)).sum(axis=1)
                mean_luma[idx] = px.mean(axis=(1, 2))
            yield pd.DataFrame(
                {
                    "id": ids,
                    "width": widths,
                    "height": heights,
                    "n_bytes": n_bytes,
                    "mean_luma": mean_luma,
                    "phash": phash.astype(np.int64),
                }
            )

    return df.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10, decode: str = "fake") -> DataFrame:
    """Video frame-sampling plumbing: emits (id, frame_idx) rows for
    every ``every_n``-th frame. Fake mode synthesizes a deterministic
    frame count from the data length; real mode is the libav stub."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError("video codecs not available; use decode='fake'")
            ids = pdf["id"].to_numpy()
            n_frames = np.array(
                [(len(d or b"") % 97) + 30 for d in pdf["data"]], dtype=np.int64
            )
            counts = (n_frames + every_n - 1) // every_n  # sampled frames per row
            out_id = np.repeat(ids, counts)
            out_frame = (
                np.arange(counts.sum(), dtype=np.int64)
                - np.repeat(np.concatenate(([0], counts.cumsum()[:-1])), counts)
            ) * every_n
            yield pd.DataFrame({"id": out_id, "frame_idx": out_frame.astype(np.int32)})

    return df.mapInPandas(kernel, schema="id long, frame_idx int")
