"""A35 — thumbnails, the last extraction-side surface.

Reference semantics (yonasBSD/readur, src/services/file_service.rs):
  - extension dispatch (:285-313): images → resized thumbnail; pdf →
    pdftoppm first page (subprocess, degrades to placeholder on any
    failure); txt → text thumbnail; doc/docx → placeholder("DOC");
    everything else → placeholder labeled with the uppercased extension
  - image path (:315-339): resize to FIT within 200×200 preserving
    aspect (image::resize, Lanczos3), alpha flattened, JPEG encode
  - pdf path (:341-409): external pdftoppm — capability-gated here
    exactly like OCR; absent binary → placeholder("PDF"), which is the
    reference's own failure fallback
  - text path (:411-466): 200×200 solid background (34,139,34) with
    white 2-px "character" marks on a fixed 7×12 grid for the first 15
    lines / 25 chars of "TXT\\n<first 300 bytes>" — no font involved,
    so the engine reproduces the pixel placement exactly
  - placeholder (:468-493): 200×200 solid color by type — PDF
    (220,38,27), TXT (34,139,34), DOC/DOCX (41,128,185), other
    (108,117,125) — JPEG encoded

Round-3 codec parity: output is baseline YCbCr 4:4:4 JFIF JPEG at the
`image` crate's default quality (75) via the engine's own T.81 codec
(kernels/jpeg.py) — the PNG-output deviation of earlier rounds is
retired. Resampling is Lanczos3 (kernels.image.lanczos3_resize), the
same algorithm as image::resize(FilterType::Lanczos3). Round-4:
image thumbnails decode through decode_image_rgb and resize each
channel, so color sources keep their color end-to-end (the r3
gray-plane deviation is retired); placeholders and text thumbnails
were always exact-color.
"""

from __future__ import annotations

import numpy as np

from readur_spark.kernels.image import decode_image_rgb, lanczos3_resize
from readur_spark.kernels.jpeg import encode_jpeg_rgb
from readur_spark.kernels.mime import url_extension

THUMB_MAX = 200  # file_service.rs:318
JPEG_QUALITY = 75  # the image crate's JpegEncoder default, used by write_to

_IMAGE_EXTS = {"jpg", "jpeg", "png", "bmp", "tiff", "gif"}

# file_service.rs:475-481 placeholder color map
_PLACEHOLDER_COLORS = {
    "PDF": (220, 38, 27),
    "TXT": (34, 139, 34),
    "DOC": (41, 128, 185),
    "DOCX": (41, 128, 185),
}
_PLACEHOLDER_DEFAULT = (108, 117, 125)
_TEXT_BG = (34, 139, 34)  # generate_text_thumbnail's Rgb([34,139,34])


def fit_box(w: int, h: int, box: int = THUMB_MAX) -> tuple[int, int]:
    """image::resize fit-within semantics: scale = min(box/w, box/h)
    capped at 1 (never upscale), floor, min 1 px."""
    if w <= 0 or h <= 0:
        return 1, 1
    scale = min(box / w, box / h, 1.0)
    return max(1, int(w * scale)), max(1, int(h * scale))


def placeholder_thumbnail(label: str) -> bytes:
    """200×200 solid-color JPEG placeholder, colors per
    file_service.rs:475-481 (PDF red, TXT green, DOC blue, else gray)."""
    color = _PLACEHOLDER_COLORS.get(label, _PLACEHOLDER_DEFAULT)
    img = np.empty((THUMB_MAX, THUMB_MAX, 3), dtype=np.uint8)
    img[:] = color
    return encode_jpeg_rgb(img, JPEG_QUALITY)


def text_thumbnail_pixels(data: bytes) -> np.ndarray:
    """Pixel-exact reimplementation of generate_text_based_thumbnail
    (file_service.rs:411-466): green background; for each of the first
    15 lines of "TXT\\n<text>" place a white 2-px mark per character
    (≤25/line) at x=10+7·char, y=20+12·line. The reference lossy-decodes
    FIRST, then slices the decoded string at 300 bytes — mirrored here
    on the decoded string's UTF-8 length. Only deviation: where Rust's
    `&s[..300]` would panic on a char boundary, we back off to the
    previous boundary instead (panic-avoidance, documented)."""
    text = data.decode("utf-8", errors="replace") if data else ""
    enc = text.encode("utf-8")
    if len(enc) > 300:
        # enc is valid UTF-8 by construction, so "ignore" only drops
        # the truncated trailing sequence (the boundary back-off).
        text = enc[:300].decode("utf-8", errors="ignore")
    preview = "TXT\n" + text.strip()
    img = np.empty((THUMB_MAX, THUMB_MAX, 3), dtype=np.uint8)
    img[:] = _TEXT_BG
    for line_idx, line in enumerate(preview.split("\n")[:15]):
        line = line[:-1] if line.endswith("\r") else line  # Rust lines()
        y = 20 + line_idx * 12
        if y >= THUMB_MAX - 10:
            break
        for char_idx in range(min(len(line), 25)):
            x = 10 + char_idx * 7
            if x >= THUMB_MAX - 10:
                break
            img[y, x] = (255, 255, 255)
            if x + 1 < THUMB_MAX:
                img[y, x + 1] = (255, 255, 255)
    return img


def text_thumbnail(data: bytes) -> bytes:
    return encode_jpeg_rgb(text_thumbnail_pixels(data), JPEG_QUALITY)


def generate_thumbnail(url: str, data: bytes) -> dict:
    """One page → thumbnail row: dispatch by url extension
    (file_service.rs:289-313), fit-box resize for decodable images,
    reference-parity fallbacks everywhere else."""
    ext = url_extension(url)
    if ext in _IMAGE_EXTS:
        img = decode_image_rgb(data)
        if img is None:
            # undecodable image → placeholder (the reference's error
            # arm returns Err → caller placeholder)
            return _row(url, placeholder_thumbnail(ext.upper()), "placeholder")
        h, w = img.shape[:2]
        nw, nh = fit_box(w, h)
        rgb = np.stack(
            [lanczos3_resize(img[..., c], nw, nh) for c in range(3)], axis=-1
        )
        return _row(url, encode_jpeg_rgb(rgb, JPEG_QUALITY), "image", nw, nh)
    if ext == "pdf":
        # pdftoppm is capability-gated out in this container; the
        # reference degrades to placeholder on any pdftoppm failure
        return _row(url, placeholder_thumbnail("PDF"), "placeholder")
    if ext == "txt":
        return _row(url, text_thumbnail(data or b""), "text")
    if ext in ("doc", "docx"):
        return _row(url, placeholder_thumbnail("DOC"), "placeholder")
    label = ext.upper() if ext else "FILE"
    return _row(url, placeholder_thumbnail(label), "placeholder")


def _row(
    url: str, jpg: bytes, kind: str, w: int | None = None, h: int | None = None
) -> dict:
    if w is None or h is None:
        w = h = THUMB_MAX
    return {
        "url": url,
        "thumbnail": jpg,
        "thumb_format": "jpeg",
        "thumb_kind": kind,
        "thumb_width": w,
        "thumb_height": h,
    }
