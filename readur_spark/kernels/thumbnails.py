"""A35 — thumbnails, the last extraction-side surface.

Reference semantics (yonasBSD/readur, src/services/file_service.rs):
  - extension dispatch (:285-313): images → resized thumbnail; pdf →
    pdftoppm first page (subprocess, degrades to placeholder on any
    failure); txt → text thumbnail; everything else → placeholder
    labeled with the uppercased extension
  - image path (:316-339): resize to FIT within 200×200 preserving
    aspect (image::resize semantics), encode
  - pdf path (:341-385): external pdftoppm — capability-gated here
    exactly like OCR; absent binary → placeholder("PDF"), which is the
    reference's own failure fallback

Engine deviations (documented): output is 8-bit grayscale PNG via the
engine's own codec (the container has no JPEG encoder; format recorded
in the output row), and placeholders are deterministic label-derived
patterns instead of font renders. Resampling is Lanczos3 as of round 3
(kernels.image.lanczos3_resize — the same algorithm as the reference's
image::resize(FilterType::Lanczos3) at file_service.rs:331; round 2's
nearest-index deviation is retired).
"""

from __future__ import annotations

import hashlib

import numpy as np

from readur_spark.kernels.image import (
    decode_png_gray,
    encode_png_gray,
    lanczos3_resize,
)
from readur_spark.kernels.mime import url_extension

THUMB_MAX = 200  # file_service.rs:318

_IMAGE_EXTS = {"jpg", "jpeg", "png", "bmp", "tiff", "gif"}


def fit_box(w: int, h: int, box: int = THUMB_MAX) -> tuple[int, int]:
    """image::resize fit-within semantics: scale = min(box/w, box/h)
    capped at 1 (never upscale), floor, min 1 px."""
    if w <= 0 or h <= 0:
        return 1, 1
    scale = min(box / w, box / h, 1.0)
    return max(1, int(w * scale)), max(1, int(h * scale))




def placeholder_thumbnail(label: str) -> bytes:
    """Deterministic 200×200 placeholder: banded pattern seeded from
    the label (the reference renders the label text; without fonts the
    engine encodes it in the pattern — same role: a stable, clearly
    non-content thumbnail)."""
    seed = int.from_bytes(
        hashlib.sha256(label.encode("utf-8")).digest()[:4], "big"
    )
    base = 64 + (seed % 128)
    img = np.full((THUMB_MAX, THUMB_MAX), base, dtype=np.uint8)
    band = 8 + (seed % 24)
    idx = (np.arange(THUMB_MAX) // band) % 2 == 0
    img[idx, :] = np.uint8((base + 48) % 256)
    return encode_png_gray(img)


def generate_thumbnail(url: str, data: bytes) -> dict:
    """One page → thumbnail row: dispatch by url extension
    (file_service.rs:289-313), fit-box resize for decodable images,
    placeholder fallbacks everywhere the reference falls back."""
    ext = url_extension(url)
    if ext in _IMAGE_EXTS:
        img = decode_png_gray(data)
        if img is None:
            # undecodable image → placeholder (the reference's error
            # arm returns Err → caller placeholder)
            return _row(url, placeholder_thumbnail(ext.upper()), "placeholder")
        h, w = img.shape
        nw, nh = fit_box(w, h)
        thumb = lanczos3_resize(img, nw, nh)
        return _row(url, encode_png_gray(thumb), "image", nw, nh)
    if ext == "pdf":
        # pdftoppm is capability-gated out in this container; the
        # reference degrades to placeholder on any pdftoppm failure
        return _row(url, placeholder_thumbnail("PDF"), "placeholder")
    if ext == "txt":
        return _row(url, placeholder_thumbnail("TXT"), "placeholder")
    label = ext.upper() if ext else "FILE"
    return _row(url, placeholder_thumbnail(label), "placeholder")


def _row(
    url: str, png: bytes, kind: str, w: int | None = None, h: int | None = None
) -> dict:
    if w is None or h is None:
        w = h = THUMB_MAX
    return {
        "url": url,
        "thumbnail": png,
        "thumb_format": "png",
        "thumb_kind": kind,
        "thumb_width": w,
        "thumb_height": h,
    }
