"""Multimodal columns: image/audio/video payloads as opaque binary with
typed metadata, processed through Arrow-batched mapInPandas.

The Spark-side contract is the deliverable here — schemas, batch
shapes, partitioning, UDF signatures — while codec-dependent steps
follow the container reality (no PIL/cv2/ffmpeg):

  - image: REAL path for the engine's own PNG subset
    (kernels.image.decode_image_gray + preprocessing ladder A21-A29) and
    header-only dimension sniffing for PNG/JPEG/GIF/BMP; full decode
    of other formats is a stubbed capability, reported per row as
    decode_status='unsupported_codec' (never an exception — the
    100 TB pipeline must not die on one bad blob).
  - audio/video: deterministic byte-window frame sampler stands in for
    a real demuxer. The sampler's output shape (array<binary> of n
    windows + offsets) matches what an ffmpeg-backed worker would
    emit, so swapping the kernel does not touch the Spark plan.

Scale notes: all stages are narrow (no shuffle) over scan splits;
binary columns are pruned to exactly the payload + key, and Arrow
batch size bounds executor memory (session default 512 rows/batch).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register

IMAGE_META_SCHEMA = (
    "url string, byte_size long, width int, height int, aspect_ratio double,"
    " orientation string, megapixels double, decode_status string,"
    " mean_brightness double, preprocessing_applied array<string>"
)


def image_metadata_table(pages: DataFrame) -> DataFrame:
    """A17 metadata + A21-A29 preprocessing over image payloads.

    Header-sniffed dims for every known format; pixel statistics and
    the preprocessing ladder only where the in-repo codec can decode
    (engine PNG subset). One narrow mapInPandas stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from readur_spark.kernels import image as img_k
        from readur_spark.kernels.settings import DEFAULT_SETTINGS

        for pdf in batches:
            rows = []
            for url, data in zip(pdf["url"], pdf["html"]):
                data = bytes(data) if data is not None else b""
                meta = img_k.extract_image_metadata(data)
                row = {
                    "url": url,
                    "byte_size": len(data),
                    "width": meta.get("width"),
                    "height": meta.get("height"),
                    "aspect_ratio": meta.get("aspect_ratio"),
                    "orientation": meta.get("orientation"),
                    "megapixels": meta.get("megapixels"),
                    "decode_status": "header_only",
                    "mean_brightness": None,
                    "preprocessing_applied": None,
                }
                if not meta:
                    row["decode_status"] = "unknown_format"
                else:
                    arr = img_k.decode_image_gray(data)
                    if arr is not None:
                        processed, applied = img_k.preprocess_image(
                            arr, dict(DEFAULT_SETTINGS)
                        )
                        row["decode_status"] = "decoded"
                        row["mean_brightness"] = float(np.mean(processed))
                        row["preprocessing_applied"] = applied
                    elif data.startswith(b"\x89PNG"):
                        row["decode_status"] = "unsupported_codec"
                rows.append(row)
            yield pd.DataFrame(rows, columns=[
                "url", "byte_size", "width", "height", "aspect_ratio",
                "orientation", "megapixels", "decode_status",
                "mean_brightness", "preprocessing_applied",
            ])

    return pages.select("url", "html").mapInPandas(run, schema=IMAGE_META_SCHEMA)


# ---- audio/video frame sampling (stub kernel, real plumbing) ---------------

FRAME_SAMPLE_SCHEMA = (
    "url string, n_frames int, frame_offsets array<long>, frames array<binary>"
)


def sample_frames_bytes(data: bytes, n_frames: int, frame_size: int = 256) -> list[tuple[int, bytes]]:
    """Deterministic stand-in for a demuxer's keyframe sampler: n
    evenly spaced byte windows with their offsets. A real ffmpeg
    worker returns the same (offset, frame_bytes) shape."""
    if not data or n_frames <= 0:
        return []
    step = max(len(data) // n_frames, 1)
    out = []
    for i in range(min(n_frames, len(data))):
        off = i * step
        if off >= len(data):
            break
        out.append((off, data[off : off + frame_size]))
    return out


def decode_audio(data: bytes):  # pragma: no cover - capability stub
    """Audio decode requires a codec runtime absent from this
    container. The Spark plumbing treats this exactly like the
    reference treats a missing tesseract (capability gate,
    src/ocr/enhanced.rs:5-15)."""
    raise NotImplementedError("audio codec runtime not available in this build")


def frame_sample_table(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Narrow frame-sampling stage over (url, html) binary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, data in zip(pdf["url"], pdf["html"]):
                data = bytes(data) if data is not None else b""
                frames = sample_frames_bytes(data, n_frames)
                rows.append(
                    {
                        "url": url,
                        "n_frames": len(frames),
                        "frame_offsets": [f[0] for f in frames],
                        "frames": [f[1] for f in frames],
                    }
                )
            yield pd.DataFrame(
                rows, columns=["url", "n_frames", "frame_offsets", "frames"]
            )

    return media.select("url", "html").mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)


THUMBNAIL_SCHEMA = (
    "url string, thumbnail binary, thumb_format string, thumb_kind string,"
    " thumb_width int, thumb_height int"
)


def thumbnail_table(pages: DataFrame) -> DataFrame:
    """A35 — per-page thumbnails (kernels/thumbnails.py) as an
    Arrow-batched narrow stage: extension dispatch, fit-box resize for
    decodable images, deterministic placeholders for the reference's
    fallback arms. Preserves input partitioning; payload crosses the
    Python boundary once."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from readur_spark.kernels.thumbnails import generate_thumbnail

        cols = [
            "url", "thumbnail", "thumb_format", "thumb_kind",
            "thumb_width", "thumb_height",
        ]
        for pdf in batches:
            rows = [
                generate_thumbnail(
                    url, bytes(data) if data is not None else b""
                )
                for url, data in zip(pdf["url"], pdf["html"])
            ]
            yield pd.DataFrame(rows, columns=cols)

    return pages.select("url", "html").mapInPandas(run, schema=THUMBNAIL_SCHEMA)


# ---- driver-contract queries ----------------------------------------------


@register("multimodal_thumbnails")  # non-SQL: binary encode; pytest-verified
def multimodal_thumbnails(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail rollup over the synthetic mixed corpus: per
    (kind, format) counts with size accounting — every page gets
    exactly one thumbnail row (the get_or_generate contract)."""
    from readur_spark.corpus import synthetic_pages

    pages = synthetic_pages(spark, 500)
    thumbs = thumbnail_table(pages)
    return (
        thumbs.groupBy("thumb_kind", "thumb_format")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.length("thumbnail")).alias("total_bytes"),
            F.max("thumb_width").alias("max_w"),
            F.max("thumb_height").alias("max_h"),
        )
        .orderBy("thumb_kind", "thumb_format")
    )


@register("multimodal_image_stats")  # non-SQL: binary decode; pytest-verified
def multimodal_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-branch rollup over the synthetic mixed corpus: decode
    status × orientation with dimension aggregates."""
    from readur_spark.corpus import synthetic_pages

    pages = synthetic_pages(spark, 500).filter(F.col("url").endswith(".png"))
    meta = image_metadata_table(pages)
    return (
        meta.groupBy("decode_status", "orientation")
        .agg(
            F.count("*").alias("n"),
            F.sum("byte_size").alias("total_bytes"),
            F.max("megapixels").alias("max_megapixels"),
        )
        .orderBy("decode_status", "orientation")
    )


@register("multimodal_frame_sample")  # non-SQL: binary windows; pytest-verified
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling rollup: every sampled frame accounted for, with
    deterministic offsets."""
    from readur_spark.corpus import synthetic_pages

    pages = synthetic_pages(spark, 500).filter(
        F.col("url").endswith(".zip") | F.col("url").endswith(".jpg")
    )
    sampled = frame_sample_table(pages, n_frames=4)
    return sampled.select(
        "url", "n_frames", F.expr("aggregate(frame_offsets, 0L, (a, x) -> a + x)").alias(
            "offset_sum"
        )
    ).orderBy("url")
