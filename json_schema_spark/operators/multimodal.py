"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns + typed metadata, processed via Arrow-batched ``mapInPandas``.

``decode='real'`` decodes uncompressed 24-bit BMP (images), 16-bit PCM
WAV (audio), and YUV4MPEG2 (video) natively — pure numpy, genuinely
working paths for one canonical uncompressed format per modality, no
codec library — and raises NotImplementedError at the clearly marked
point where PIL/libsndfile/libav would handle compressed formats
(those libraries are not in this container);
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

__all__ = ["IMAGE_SCHEMA", "AUDIO_FEATURE_SCHEMA", "VIDEO_FEATURE_SCHEMA",
           "image_features", "audio_features", "video_features",
           "frame_sample", "synth_binary_column", "synth_wav_bytes",
           "synth_y4m_bytes"]

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


AUDIO_FEATURE_SCHEMA = (
    "id long, sample_rate int, n_samples long, duration_s double, "
    "rms double, peak double, zero_cross_rate double"
)


def synth_wav_bytes(seed: int, n_samples: int = 8000, rate: int = 8000,
                    freq: float = 440.0) -> bytes:
    """Deterministic 16-bit PCM mono WAV (sine + seeded noise) — a
    driver-side generator so the REAL audio decode path is testable
    without shipping media files."""
    rng = np.random.default_rng(seed)
    t = np.arange(n_samples) / rate
    x = 0.5 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.standard_normal(n_samples)
    pcm = np.clip(x * 32767.0, -32768, 32767).astype("<i2").tobytes()
    hdr = (b"RIFF" + (36 + len(pcm)).to_bytes(4, "little") + b"WAVE"
           + b"fmt " + (16).to_bytes(4, "little")
           + (1).to_bytes(2, "little")          # PCM
           + (1).to_bytes(2, "little")          # mono
           + rate.to_bytes(4, "little")
           + (rate * 2).to_bytes(4, "little")   # byte rate
           + (2).to_bytes(2, "little")          # block align
           + (16).to_bytes(2, "little")         # bits/sample
           + b"data" + len(pcm).to_bytes(4, "little"))
    return hdr + pcm


def _decode_wav_pcm16(data: bytes) -> tuple[np.ndarray, int]:
    """Pure-numpy RIFF/WAVE chunk walk + 16-bit PCM decode to a float64
    mono signal in [-1, 1] — a REAL audio decoder needing no codec
    library. Raises ValueError for anything that isn't 16-bit PCM."""
    if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        size = int.from_bytes(data[pos + 4:pos + 8], "little")
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or len(fmt) < 16 or raw is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt = int.from_bytes(fmt[0:2], "little")
    n_ch = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bps = int.from_bytes(fmt[14:16], "little")
    if audio_fmt != 1 or bps != 16 or n_ch < 1 or rate <= 0:
        raise ValueError("only 16-bit PCM WAV supported")
    frame = 2 * n_ch
    samples = np.frombuffer(raw[: len(raw) // frame * frame], dtype="<i2")
    mono = samples.reshape(-1, n_ch).mean(axis=1) / 32768.0
    return mono, rate


def _decode_audio(data: bytes, mode: str) -> tuple[np.ndarray, int]:
    if mode == "real":
        try:
            return _decode_wav_pcm16(data or b"")
        except ValueError as e:
            # integration point for libsndfile/ffmpeg codecs — not
            # available in this environment
            raise NotImplementedError(
                f"non-PCM-WAV codecs not available ({e}); use decode='fake' or WAV input"
            ) from e
    h = hashlib.sha256(data or b"").digest()
    n = 4096
    reps = (n * 2 // len(h)) + 1
    raw = np.frombuffer((h * reps)[: n * 2], dtype="<i2")
    return raw.astype(np.float64) / 32768.0, 8000


def audio_features(df: DataFrame, decode: str = "fake") -> DataFrame:
    """Decode → per-clip signal features (duration, RMS, peak,
    zero-crossing rate) per Arrow batch over ``(id, data)`` rows.
    Real mode decodes 16-bit PCM WAV natively; other codecs raise at
    the marked integration point. Vectorized numpy per clip —
    partition-parallel, no driver collect."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {k: [] for k in ("id", "sample_rate", "n_samples",
                                   "duration_s", "rms", "peak",
                                   "zero_cross_rate")}
            for rid, data in zip(pdf["id"], pdf["data"]):
                x, rate = _decode_audio(data, decode)
                n = len(x)
                out["id"].append(rid)
                out["sample_rate"].append(rate)
                out["n_samples"].append(n)
                out["duration_s"].append(n / rate if rate else 0.0)
                out["rms"].append(float(np.sqrt(np.mean(x * x))) if n else 0.0)
                out["peak"].append(float(np.max(np.abs(x))) if n else 0.0)
                out["zero_cross_rate"].append(
                    float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                    if n > 1 else 0.0)
            yield pd.DataFrame(out)

    return df.mapInPandas(kernel, schema=AUDIO_FEATURE_SCHEMA)


VIDEO_FEATURE_SCHEMA = (
    "id long, frame_idx int, width int, height int, "
    "mean_y double, std_y double"
)


def synth_y4m_bytes(seed: int, n_frames: int = 12, width: int = 16,
                    height: int = 8) -> bytes:
    """Deterministic YUV4MPEG2 (C420jpeg) clip — a driver-side
    generator so the REAL video decode path is testable without
    shipping media files. Luma ramps per frame with seeded noise."""
    rng = np.random.default_rng(seed)
    hdr = f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 C420jpeg\n".encode()
    u = np.full((height // 2, width // 2), 128, np.uint8)
    parts = [hdr]
    for i in range(n_frames):
        y = ((i * 16 + rng.integers(0, 8, (height, width))) % 256).astype(np.uint8)
        parts.append(b"FRAME\n" + y.tobytes() + u.tobytes() + u.tobytes())
    return b"".join(parts)


def _decode_y4m(data: bytes) -> tuple[int, int, list[np.ndarray]]:
    """Pure-numpy YUV4MPEG2 parse: stream header, per-frame FRAME
    markers, planar YUV; returns (width, height, [Y planes]) — chroma
    planes are skipped (luma carries the sampling/feature signal).
    Raises ValueError for anything that isn't 8-bit 4:2:0/4:2:2/4:4:4."""
    if not data.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = data.index(b"\n")
    w = h = None
    cs = "420jpeg"
    for p in data[9:nl].decode("ascii", "replace").split():
        if p[:1] == "W":
            w = int(p[1:])
        elif p[:1] == "H":
            h = int(p[1:])
        elif p[:1] == "C":
            cs = p[1:]
    if not w or not h or w <= 0 or h <= 0:
        raise ValueError("missing/invalid W/H in stream header")
    if cs.startswith("420"):
        frame_sz = w * h + 2 * ((w // 2) * (h // 2))
    elif cs.startswith("422"):
        frame_sz = w * h + 2 * ((w // 2) * h)
    elif cs.startswith("444") and "alpha" not in cs:
        frame_sz = 3 * w * h
    else:
        raise ValueError(f"unsupported colorspace C{cs}")
    frames: list[np.ndarray] = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.index(b"\n", pos)
        if data[pos:fnl][:5] != b"FRAME":
            raise ValueError("missing FRAME marker")
        if fnl + 1 + frame_sz > len(data):
            raise ValueError("truncated frame payload")
        frames.append(
            np.frombuffer(data[fnl + 1:fnl + 1 + w * h], dtype=np.uint8).reshape(h, w)
        )
        pos = fnl + 1 + frame_sz
    return w, h, frames


def _video_frames(data: bytes, mode: str) -> tuple[int, int, list[np.ndarray]]:
    if mode == "real":
        try:
            return _decode_y4m(data or b"")
        except ValueError as e:
            # integration point for libav/ffmpeg compressed codecs —
            # not available in this environment
            raise NotImplementedError(
                f"compressed video codecs not available ({e}); "
                "use decode='fake' or YUV4MPEG2 input"
            ) from e
    # fake: deterministic frame count/planes from the byte length
    n = (len(data or b"") % 97) + 30
    return 8, 8, [np.full((8, 8), (i * 7) % 256, np.uint8) for i in range(n)]


def video_features(df: DataFrame, every_n: int = 10,
                   decode: str = "fake") -> DataFrame:
    """Decode → per-sampled-frame luma stats over ``(id, data)`` rows:
    every ``every_n``-th frame yields (frame_idx, width, height,
    mean_y, std_y). Real mode decodes YUV4MPEG2 natively (pure numpy);
    compressed codecs raise at the marked integration point.
    Partition-parallel, one numpy pass per clip, no driver collect."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {k: [] for k in ("id", "frame_idx", "width", "height",
                                   "mean_y", "std_y")}
            for rid, data in zip(pdf["id"], pdf["data"]):
                w, h, frames = _video_frames(data, decode)
                for idx in range(0, len(frames), every_n):
                    y = frames[idx].astype(np.float64)
                    out["id"].append(rid)
                    out["frame_idx"].append(idx)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["mean_y"].append(float(y.mean()))
                    out["std_y"].append(float(y.std()))
            yield pd.DataFrame(out)

    return df.mapInPandas(kernel, schema=VIDEO_FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10, decode: str = "fake") -> DataFrame:
    """Video frame-sampling plumbing: emits (id, frame_idx) rows for
    every ``every_n``-th frame. Fake mode synthesizes a deterministic
    frame count from the data length; real mode counts frames by
    decoding YUV4MPEG2 natively (compressed codecs raise at the
    integration point)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                rows_id, rows_f = [], []
                for rid, data in zip(pdf["id"], pdf["data"]):
                    _, _, frames = _video_frames(data, "real")
                    for idx in range(0, len(frames), every_n):
                        rows_id.append(rid)
                        rows_f.append(idx)
                yield pd.DataFrame({
                    "id": np.asarray(rows_id, dtype=np.int64),
                    "frame_idx": np.asarray(rows_f, dtype=np.int32)})
                continue
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
