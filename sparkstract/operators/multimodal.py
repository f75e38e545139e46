"""Multimodal column plumbing: opaque binary media + typed metadata.

Images here are real (our PNG codec); audio/video decode is STUBBED behind
NotImplementedError as the container has no codec libs — but the Spark-side
plumbing (schema, mapInPandas batch shape, partitioning) is real and tested.

Reference parity: SetImage ingests any raster (/root/reference/src/api/
baseapi.cpp:906); thumbnail/rescale mirrors the source-resolution upscale
path (baseapi.cpp:924) and pyramid use in imagefind.cpp.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

IMAGE_FEATURES_SCHEMA = (
    "media_ref string, width int, height int, ink_ratio double, "
    "otsu_threshold int, n_components int"
)

THUMBNAIL_SCHEMA = "media_ref string, thumb_w int, thumb_h int, thumb binary"


def image_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract each page image: dimensions, ink coverage,
    Otsu threshold, connected-component count. Vectorized per page inside an
    Arrow batch; one pass over the binary column."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.cclabel import label_blobs
        from ..functions.codecs import decode_gray_any
        from ..functions.otsu import binarize, otsu_threshold

        for pdf in batches:
            out = {k: [] for k in ("media_ref", "width", "height", "ink_ratio",
                                   "otsu_threshold", "n_components")}
            for ref, png in zip(pdf["media_ref"], pdf["image"]):
                try:
                    gray = decode_gray_any(bytes(png))
                except ValueError:
                    continue  # non-raster media (PDF containers) carry no
                    # pixel features — parsed at the pipeline seam instead
                ink = binarize(gray)
                out["media_ref"].append(ref)
                out["width"].append(gray.shape[1])
                out["height"].append(gray.shape[0])
                out["ink_ratio"].append(float(ink.mean()))
                out["otsu_threshold"].append(otsu_threshold(gray))
                out["n_components"].append(len(label_blobs(ink)))
            yield pd.DataFrame(out)

    return media.select("media_ref", "image").mapInPandas(
        kernel, schema=IMAGE_FEATURES_SCHEMA)


def thumbnails(media: DataFrame, max_side: int = 64) -> DataFrame:
    """Integer-factor downsample (block mean) re-encoded as PNG."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.codecs import decode_gray_any
        from ..functions.png import encode_gray

        for pdf in batches:
            out = {k: [] for k in ("media_ref", "thumb_w", "thumb_h", "thumb")}
            for ref, png in zip(pdf["media_ref"], pdf["image"]):
                try:
                    gray = decode_gray_any(bytes(png))
                except ValueError:
                    continue  # non-raster media: no thumbnail
                h, w = gray.shape
                f = max(1, int(np.ceil(max(h, w) / max_side)))
                th, tw = h // f, w // f
                thumb = gray[: th * f, : tw * f].reshape(th, f, tw, f).mean(
                    axis=(1, 3)).astype(np.uint8)
                out["media_ref"].append(ref)
                out["thumb_w"].append(tw)
                out["thumb_h"].append(th)
                out["thumb"].append(encode_gray(thumb))
            yield pd.DataFrame(out)

    return media.select("media_ref", "image").mapInPandas(
        kernel, schema=THUMBNAIL_SCHEMA)


DECODE_REPORT_SCHEMA = "format string, shape string, n long"


def media_decode_report(media: DataFrame) -> DataFrame:
    """Decode-path telemetry over a media column: one row per (container
    format, decode shape) with counts. For VP8L the shape is which entropy-
    decode path ran ("fast" bit-buffer loop vs the ~6x-slower per-pixel
    "generic"/"meta"/"cache" fallbacks) — a hostile crawl segment whose
    streams all dodge the fast loop shows up here as a number, not as an
    unexplained slowdown. Decode errors are counted, never raised (this is
    the diagnostics lane over untrusted bytes). Map-side per-partition
    counts, one tiny groupBy — scales like any counting aggregate."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import webp
        from ..functions.codecs import decode_gray_any

        for pdf in batches:
            counts: dict[tuple[str, str], int] = {}
            for blob in pdf["image"]:
                data = bytes(blob)
                fmt = _sniff(data)
                webp.SHAPE_COUNTS.clear()
                try:
                    decode_gray_any(data)
                    shape = next(iter(webp.SHAPE_COUNTS), "") \
                        if fmt == "webp" else ""
                except (ValueError, NotImplementedError) as e:
                    shape = f"error: {str(e)[:60]}"
                key = (fmt, shape)
                counts[key] = counts.get(key, 0) + 1
            yield pd.DataFrame(
                [(f, s, n) for (f, s), n in counts.items()],
                columns=["format", "shape", "n"])

    import pyspark.sql.functions as F

    return (media.select("image").mapInPandas(kernel,
                                              schema=DECODE_REPORT_SCHEMA)
            .groupBy("format", "shape").agg(F.sum("n").alias("n")))


def _sniff(data: bytes) -> str:
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"\x00\x00\x00\x0c" and data[4:8] == b"jP  " \
            or data[:4] == b"\xff\x4f\xff\x51":
        return "jp2"
    if data[:1] == b"P" and data[1:2] in b"123456":
        return "pnm"
    if data[:5] == b"%PDF-":
        return "pdf"
    return "unknown"


def decode_audio(media: DataFrame) -> DataFrame:  # pragma: no cover - stub
    """STUB: audio decode (no codec libs in this container). The production
    shape: mapInPandas over (media_ref, bytes) → (media_ref, sample_rate,
    pcm array<float>) with the same batch plumbing as image_features."""
    raise NotImplementedError("audio codecs unavailable in this environment")


def sample_video_frames(media: DataFrame, every_n: int = 30) -> DataFrame:  # pragma: no cover - stub
    """STUB: video frame sampling. Production shape: mapInPandas emitting one
    row per sampled frame (media_ref, frame_idx, png) — the fan-out side of
    the same salted (media_ref, frame) partitioning the page pipeline uses."""
    raise NotImplementedError("video codecs unavailable in this environment")
