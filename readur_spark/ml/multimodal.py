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


# ---- constructed-corpus twins ----------------------------------------------
# The datagen corpus is RNG-driven, so the rollup queries above stay
# rows-only; these twins run the SAME kernels over PNGs constructed
# from the documents table by a rule DuckDB can replay (the
# outlink_edges_parse pattern) — pinning header sniff, decode dispatch,
# orientation/megapixel math, and the fit-box resize end-to-end with
# value hashes.

_C_DIMS = [(50, 50), (100, 200), (300, 200), (150, 150), (640, 360)]


def constructed_image_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(url, html) — one REAL grayscale PNG per document: dims =
    _C_DIMS[doc_id % 5], pixel (r, c) = (7r + 13c + doc_id) mod 256.
    No RNG anywhere, so every downstream header/dim fact is a pure
    function of doc_id that an oracle re-derives in SQL."""
    from readur_spark.queries.tables import load

    docs = load(spark, sf_dir, "documents").select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from readur_spark.kernels.image import encode_png_gray

        for pdf in batches:
            urls: list[str] = []
            blobs: list[bytes] = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = _C_DIMS[did % len(_C_DIMS)]
                yy, xx = np.mgrid[0:h, 0:w]
                img = ((7 * yy + 13 * xx + did) % 256).astype(np.uint8)
                urls.append("https://img.example/doc%d.png" % did)
                blobs.append(encode_png_gray(img))
            yield pd.DataFrame({"url": urls, "html": blobs})

    return docs.mapInPandas(run, schema="url string, html binary")


_C_DIMS_SQL = """
      SELECT doc_id,
             'https://img.example/doc' || CAST(doc_id AS VARCHAR)
               || '.png' AS url,
             CASE doc_id % 5 WHEN 0 THEN 50 WHEN 1 THEN 100
                  WHEN 2 THEN 300 WHEN 3 THEN 150 ELSE 640 END AS w,
             CASE doc_id % 5 WHEN 0 THEN 50 WHEN 1 THEN 200
                  WHEN 2 THEN 200 WHEN 3 THEN 150 ELSE 360 END AS h
      FROM documents
"""


@register(
    "image_meta_constructed",
    oracle=f"""
    WITH b AS ({_C_DIMS_SQL})
    SELECT url, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CASE WHEN w > h THEN 'landscape'
                WHEN w < h THEN 'portrait'
                ELSE 'square' END AS orientation,
           CAST(round(round(w * h / 1000000.0, 2) * 100) AS INT)
             AS megapixels_c,
           'decoded' AS decode_status
    FROM b
    """,
)
def image_meta_constructed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A17 image metadata value-hash-checked end-to-end: real PNG
    encode → header sniff → full decode → orientation/megapixel math
    (metadata_extraction.rs:52-81 rules), with the oracle re-deriving
    every fact from the construction rule. megapixels ride as integer
    centi-units so both engines re-round the same kernel output."""
    meta = image_metadata_table(constructed_image_pages(spark, sf_dir))
    return meta.select(
        "url",
        "width",
        "height",
        "orientation",
        F.round(F.col("megapixels") * 100).cast("int").alias("megapixels_c"),
        "decode_status",
    )


@register(
    "thumbnail_dims_constructed",
    oracle=f"""
    WITH b AS ({_C_DIMS_SQL}),
    s AS (
      SELECT url, w, h,
             least(200.0 / w, 200.0 / h, 1.0) AS scale
      FROM b
    )
    SELECT url, 'image' AS thumb_kind, 'jpeg' AS thumb_format,
           CAST(greatest(1, trunc(w * scale)) AS INT) AS thumb_width,
           CAST(greatest(1, trunc(h * scale)) AS INT) AS thumb_height
    FROM s
    """,
)
def thumbnail_dims_constructed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A35 fit-box resize value-hash-checked end-to-end: the oracle
    replays fit_box's IEEE arithmetic (scale = min(200/w, 200/h, 1),
    floor, min 1 px — file_service.rs:315-339 semantics) over the
    constructed dims; the Spark side runs the REAL decode → Lanczos
    resize → JPEG encode path and reports the dims it actually
    produced."""
    thumbs = thumbnail_table(constructed_image_pages(spark, sf_dir))
    return thumbs.select(
        "url", "thumb_kind", "thumb_format", "thumb_width", "thumb_height"
    )


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


def _frame_oracle() -> str:
    from readur_spark.queries.tables import SYNTH_URL_SQL

    # replay of sample_frames_bytes geometry: step = max(len//4, 1),
    # n = min(4, len) frames at offsets i*step (i*step < len holds for
    # every emitted i by construction), so offset_sum = step*n*(n-1)/2
    return f"""
    WITH b AS (
      SELECT {SYNTH_URL_SQL} AS url,
             octet_length(encode(text)) AS len
      FROM documents
    )
    SELECT url,
           CAST(least(4, len) AS INT) AS n_frames,
           CAST(greatest(len // 4, 1)
                * (least(4, len) * (least(4, len) - 1) // 2)
             AS BIGINT) AS offset_sum
    FROM b
    """


@register("frame_sample_constructed", oracle=_frame_oracle())
def frame_sample_constructed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frame-sampler plumbing value-hash-checked end-to-end over
    the documents-derived pages (payload = utf-8 text bytes, so the
    byte length — and therefore every sampled offset — is a pure
    function DuckDB re-derives). Complements the rows-only
    `multimodal_frame_sample` (mixed binary corpus) by pinning the
    sampler geometry per row."""
    from readur_spark.corpus import pages_from_documents

    pages = pages_from_documents(spark, sf_dir)
    sampled = frame_sample_table(pages, n_frames=4)
    return sampled.select(
        "url",
        "n_frames",
        F.expr("aggregate(frame_offsets, 0L, (a, x) -> a + x)").alias(
            "offset_sum"
        ),
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
