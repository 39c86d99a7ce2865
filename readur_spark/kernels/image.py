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
  - adaptive noise removal (A26): src/ocr/enhanced.rs:596-631
  - adaptive threshold + histogram-EQ fallback (A27):
    src/ocr/enhanced.rs:635-758
  - morphological open+close (A29): src/ocr/enhanced.rs:804-812
  - ladder gating per rung: src/ocr/enhanced.rs:140-202
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


def encode_png_rgb(img: np.ndarray) -> bytes:
    """Deterministic 8-bit truecolor PNG (color type 2, filter 0 rows,
    fixed zlib level) — the color sibling of encode_png_gray; used by
    the synthetic datagen's color pages and the thumbnail tests."""
    if img.dtype != np.uint8:
        img = np.clip(img, 0, 255).astype(np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_png_rgb expects an (H,W,3) array")
    h, w = img.shape[:2]

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # RGB, 8-bit
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))
    idat = zlib.compress(raw, 6)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, w: int, h: int, bpp: int) -> np.ndarray | None:
    """Undo PNG row filters 0 (None), 1 (Sub), 2 (Up) over byte rows of
    width w·bpp. Returns (h, w·bpp) uint8 or None on an unsupported
    filter (3/4 never appear in engine-written streams)."""
    stride = w * bpp + 1
    if len(raw) < stride * h:
        return None
    out = np.empty((h, w * bpp), dtype=np.uint8)
    prev = np.zeros(w * bpp, dtype=np.uint8)
    for r in range(h):
        row = raw[r * stride : (r + 1) * stride]
        ftype = row[0]
        body = np.frombuffer(row[1:], dtype=np.uint8).copy()
        if ftype == 0:
            line = body
        elif ftype == 1:
            line = body
            for i in range(bpp, w * bpp):
                line[i] = (int(line[i]) + int(line[i - bpp])) & 0xFF
        elif ftype == 2:
            line = (body.astype(np.int16) + prev.astype(np.int16)).astype(np.uint8)
        else:
            return None
        out[r] = line
        prev = line
    return out


def _decode_png_planes(data: bytes) -> np.ndarray | None:
    """Shared PNG walk: returns (h,w) gray for color type 0, (h,w,3)
    RGB for color type 2, None outside the 8-bit 0/2 profile."""
    if not data.startswith(b"\x89PNG\r\n\x1a\n"):
        return None
    pos = 8
    w = h = color_type = None
    idat = b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack(">IIBB", payload[:10])
            if bit_depth != 8 or color_type not in (0, 2):
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
    bpp = 1 if color_type == 0 else 3
    flat = _png_unfilter(raw, w, h, bpp)
    if flat is None:
        return None
    return flat.reshape(h, w) if bpp == 1 else flat.reshape(h, w, 3)


def rgb_to_luma(rgb: np.ndarray) -> np.ndarray:
    """Rec. 601 luma (0.299/0.587/0.114, the same weights as the JPEG
    codec's Y plane), rounded to uint8 — the engine's one color→gray
    convention for the OCR-side pipeline."""
    y = (
        0.299 * rgb[..., 0].astype(np.float64)
        + 0.587 * rgb[..., 1].astype(np.float64)
        + 0.114 * rgb[..., 2].astype(np.float64)
    )
    return np.clip(np.round(y), 0, 255).astype(np.uint8)


def decode_png_gray(data: bytes) -> np.ndarray | None:
    """Decode 8-bit PNGs (color types 0 and 2, row filters 0/1/2) to a
    grayscale plane — truecolor streams go through rgb_to_luma, the
    engine's analogue of the reference's DynamicImage::to_luma8 before
    OCR. Returns None for anything else (treated as undecodable — the
    OCR branch then fails with a classified error)."""
    planes = _decode_png_planes(data)
    if planes is None:
        return None
    return planes if planes.ndim == 2 else rgb_to_luma(planes)


def decode_png_rgb(data: bytes) -> np.ndarray | None:
    """Decode 8-bit PNGs to (H,W,3) RGB; grayscale streams are
    replicated across channels."""
    planes = _decode_png_planes(data)
    if planes is None:
        return None
    if planes.ndim == 2:
        return np.repeat(planes[..., None], 3, axis=2)
    return planes


def decode_image_gray(data: bytes) -> np.ndarray | None:
    """Sniff-and-decode like the reference's image::load_from_memory
    (magic-byte dispatch): engine PNG first, then baseline JPEG
    (kernels/jpeg.py); None = undecodable."""
    if not data:
        return None
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png_gray(data)
    if data[:2] == b"\xFF\xD8":
        from readur_spark.kernels.jpeg import decode_jpeg_gray

        return decode_jpeg_gray(data)
    return None


def decode_image_rgb(data: bytes) -> np.ndarray | None:
    """Color sibling of decode_image_gray: (H,W,3) uint8 RGB from PNG
    (types 0/2) or baseline JPEG (gray or YCbCr 4:4:4); None =
    undecodable. The thumbnail path (A35) decodes through this so
    color sources keep their color, matching the reference's
    image::resize over the source DynamicImage."""
    if not data:
        return None
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png_rgb(data)
    if data[:2] == b"\xFF\xD8":
        from readur_spark.kernels.jpeg import decode_jpeg_rgb

        return decode_jpeg_rgb(data)
    return None


# --- preprocessing ladder (A21-A29, NumPy-vectorized) ----------------------


def orientation_correction(img: np.ndarray) -> tuple[np.ndarray, bool]:
    """enhanced.rs:339-350 — rotate 90° when width/height > 2.0."""
    h, w = img.shape
    if h > 0 and w / h > 2.0:
        return np.rot90(img, k=-1).copy(), True
    return img, False


def _lanczos3_kernel(x: np.ndarray) -> np.ndarray:
    """lanczos(x, 3) = sinc(x)·sinc(x/3) for |x| < 3, else 0 — the
    `image` crate's FilterType::Lanczos3 kernel (np.sinc is the
    normalized sin(πx)/(πx))."""
    out = np.zeros_like(x, dtype=np.float64)
    m = np.abs(x) < 3.0
    xm = x[m]
    out[m] = np.sinc(xm) * np.sinc(xm / 3.0)
    return out


def _lanczos3_axis0(arr: np.ndarray, n_out: int) -> np.ndarray:
    """One separable resampling pass along axis 0: per output row,
    windowed-sinc weights over the source support, normalized over the
    in-bounds window (the image crate's edge handling), accumulated in
    float. O(n_out · support · width) — the true convolution cost, no
    dense weight matrix."""
    n_in = arr.shape[0]
    if n_in == n_out:
        return arr.astype(np.float64)
    ratio = n_in / n_out
    sratio = max(ratio, 1.0)
    support = 3.0 * sratio
    out = np.empty((n_out, arr.shape[1]), dtype=np.float64)
    centers = ratio * (np.arange(n_out) + 0.5)
    for o in range(n_out):
        c = centers[o]
        lo = max(int(np.floor(c - support)), 0)
        hi = min(int(np.ceil(c + support)) + 1, n_in)
        x = (np.arange(lo, hi) + 0.5 - c) / sratio
        w = _lanczos3_kernel(x)
        s = w.sum()
        if s == 0.0:
            s = 1.0
        out[o] = (w / s) @ arr[lo:hi]
    return out


def lanczos3_resize(img: np.ndarray, nw: int, nh: int) -> np.ndarray:
    """Separable Lanczos3 resampling — the algorithm behind the
    reference's image::resize calls (enhanced.rs:383 smart resize,
    file_service.rs:316-339 thumbnails, both FilterType::Lanczos3):
    vertical then horizontal windowed-sinc passes, float accumulation,
    clamp + round to u8. Replaces round-2's nearest-index sampling;
    byte-level parity with the Rust crate is untestable in this
    container (no image crate to diff against) but the filter, support,
    normalization, and edge handling follow its documented algorithm."""
    tmp = _lanczos3_axis0(img.astype(np.float64), nh)
    out = _lanczos3_axis0(tmp.T, nw).T
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def smart_resize(
    img: np.ndarray, target_dpi: int = 300
) -> tuple[np.ndarray, bool]:
    """enhanced.rs:354-386 — >2048 max-dim downscale to 2048;
    min-dim <300 upscale so min-dim = 600. `target_dpi` is the
    settings' ocr_dpi knob, accepted and IGNORED exactly as the
    reference does (the parameter is `_target_dpi` at enhanced.rs:353;
    the resize rules are the fixed thresholds regardless) — the knob is
    read at the call site (enhanced.rs:138 parity) so the settings
    surface matches, but it cannot change output bytes. Resampling is
    Lanczos3 (enhanced.rs:383's FilterType::Lanczos3) as of round 3."""
    h, w = img.shape
    scale = None
    if max(w, h) > 2048:
        scale = 2048.0 / max(w, h)
    elif min(w, h) < 300:
        scale = 600.0 / min(w, h)
    if scale is None:
        return img, False
    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
    return lanczos3_resize(img, nw, nh), True


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
    """enhanced.rs:219-250 — any metric beyond user thresholds, OR the
    user explicitly dialed up an enhancement knob (the reference's
    user_wants_enhancement clause, :240-242)."""
    if settings.get("ocr_skip_enhancement"):
        return False
    user_wants = (
        settings.get("ocr_brightness_boost", 0.0) > 0.0
        or settings.get("ocr_contrast_multiplier", 0.0) > 1.0
        or settings.get("ocr_noise_reduction_level", 0) > 1
        or settings.get("ocr_sharpening_strength", 0.0) > 0.0
    )
    return user_wants or (
        quality["brightness"] < settings["ocr_quality_threshold_brightness"]
        or quality["contrast"] < settings["ocr_quality_threshold_contrast"]
        or quality["noise"] > settings["ocr_quality_threshold_noise"]
        or quality["sharpness"] < settings["ocr_quality_threshold_sharpness"]
    )


def brightness_contrast_correction(
    img: np.ndarray, quality: dict, settings: dict | None = None
) -> np.ndarray:
    """enhanced.rs:554-592 — (pixel + boost) × multiplier, rounded and
    clamped 0-255. User-configured boost/multiplier win when positive
    (:560-577); otherwise piecewise from the measured stats: boost
    60−b for very dim (<50), 30−(b−50)·0.5 moderate (<80), else 0;
    multiplier 2.5 / 1.8 / 1.2 by contrast band."""
    settings = settings or {}
    b = quality["brightness"] * 255.0
    user_boost = settings.get("ocr_brightness_boost", 0.0)
    if user_boost and user_boost > 0.0:
        boost = float(user_boost)
    elif b < 50:
        boost = 60.0 - b
    elif b < 80:
        boost = 30.0 - (b - 50.0) * 0.5
    else:
        boost = 0.0
    c = quality["contrast"]
    user_mult = settings.get("ocr_contrast_multiplier", 0.0)
    if user_mult and user_mult > 0.0:
        mult = float(user_mult)
    elif c < 0.2:
        mult = 2.5
    elif c < 0.4:
        mult = 1.8
    else:
        mult = 1.2
    out = np.round((img.astype(np.float64) + boost) * mult)
    return np.clip(out, 0, 255).astype(np.uint8)


# --- A26: adaptive noise removal -------------------------------------------


def median_filter(img: np.ndarray, radius: int) -> np.ndarray:
    """(2r+1)² sliding-window median, edge-padded (imageproc
    median_filter's clamped-border behavior), vectorized by stacking
    the shifted windows."""
    if radius <= 0 or img.size == 0:
        return img
    k = 2 * radius + 1
    p = np.pad(img, radius, mode="edge")
    h, w = img.shape
    windows = np.stack(
        [p[dy : dy + h, dx : dx + w] for dy in range(k) for dx in range(k)]
    )
    return np.median(windows, axis=0).astype(np.uint8)


def gaussian_blur(img: np.ndarray, sigma: float) -> np.ndarray:
    """Separable Gaussian blur (gaussian_blur_f32 analog): radius
    ceil(3σ), edge padding, float accumulate, round+clip to u8."""
    if sigma <= 0 or img.size == 0:
        return img
    radius = max(1, int(np.ceil(3.0 * sigma)))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    kernel = np.exp(-(x * x) / (2.0 * sigma * sigma))
    kernel /= kernel.sum()
    f = img.astype(np.float64)
    p = np.pad(f, ((0, 0), (radius, radius)), mode="edge")
    f = sum(kernel[i] * p[:, i : i + img.shape[1]] for i in range(len(kernel)))
    p = np.pad(f, ((radius, radius), (0, 0)), mode="edge")
    f = sum(kernel[i] * p[i : i + img.shape[0], :] for i in range(len(kernel)))
    return np.clip(np.round(f), 0, 255).astype(np.uint8)


def noise_removal(img: np.ndarray, quality: dict, settings: dict) -> np.ndarray:
    """A26 — enhanced.rs:596-631: level from the user knob when set,
    else from measured noise (>0.2 → 3 heavy, >0.1 → 2 moderate, else 1
    light); heavy = 5×5 median + σ0.8 blur, moderate = 3×3 median +
    σ0.5 blur, light = 3×3 median only."""
    user_level = settings.get("ocr_noise_reduction_level", 0)
    if user_level and user_level > 0:
        level = user_level
    elif quality["noise"] > 0.2:
        level = 3
    elif quality["noise"] > 0.1:
        level = 2
    else:
        level = 1
    if level >= 3:
        return gaussian_blur(median_filter(img, 2), 0.8)
    if level == 2:
        return gaussian_blur(median_filter(img, 1), 0.5)
    return median_filter(img, 1)


# --- A27: adaptive threshold / histogram equalization ----------------------

ADAPTIVE_THRESHOLD_MAX_PIXELS = 1_500_000  # enhanced.rs:643


def adaptive_threshold(img: np.ndarray, block_radius: int) -> np.ndarray:
    """Local-mean binarization (imageproc adaptive_threshold analog):
    255 where pixel > mean of the (2r+1)² clamped-border window, else
    0. Integral-image (cumsum) implementation — O(n) regardless of
    radius."""
    h, w = img.shape
    f = img.astype(np.float64)
    ii = np.zeros((h + 1, w + 1), dtype=np.float64)
    ii[1:, 1:] = f.cumsum(axis=0).cumsum(axis=1)
    ys = np.arange(h)
    xs = np.arange(w)
    y0 = np.clip(ys - block_radius, 0, h)[:, None]
    y1 = np.clip(ys + block_radius + 1, 0, h)[:, None]
    x0 = np.clip(xs - block_radius, 0, w)[None, :]
    x1 = np.clip(xs + block_radius + 1, 0, w)[None, :]
    area = (y1 - y0) * (x1 - x0)
    total = ii[y1, x1] - ii[y0, x1] - ii[y1, x0] + ii[y0, x0]
    mean = total / area
    return np.where(f > mean, 255, 0).astype(np.uint8)


def histogram_equalization(img: np.ndarray) -> np.ndarray:
    """enhanced.rs:686-718 — CDF lookup table, truncating u8 cast."""
    hist = np.bincount(img.ravel(), minlength=256).astype(np.uint64)
    cdf = hist.cumsum()
    total = float(img.size)
    lookup = np.where(cdf > 0, (cdf / total * 255.0).astype(np.uint8), 0).astype(
        np.uint8
    )
    return lookup[img]


def contrast_stretching(img: np.ndarray) -> np.ndarray:
    """enhanced.rs:728-758 — linear min/max stretch, truncating cast;
    identity when the image is flat."""
    mn, mx = int(img.min()), int(img.max())
    if mx == mn:
        return img
    rng = float(mx - mn)
    return ((img.astype(np.float32) - mn) / rng * 255.0).astype(np.uint8)


def adaptive_contrast_enhancement(
    img: np.ndarray, quality: dict, settings: dict
) -> tuple[np.ndarray, str]:
    """A27 — enhanced.rs:635-758. Large images (>1.5 MP, where the
    reference's integral image could overflow) take the histogram-EQ
    fallback (+ contrast stretch when contrast < 0.3); otherwise the
    window size comes from the user knob when set, else from measured
    contrast (low → min_dim/20 in [11,31]; good → min_dim/15 in
    [15,41]), forced odd, then local-mean adaptive threshold. Returns
    (pixels, step_label) — 'Contrast enhancement' for the threshold
    path, 'Basic contrast enhancement' for the fallback."""
    h, w = img.shape
    if h * w > ADAPTIVE_THRESHOLD_MAX_PIXELS:
        _log_histogram_eq_mode(settings)
        out = histogram_equalization(img)
        if quality["contrast"] < 0.3:
            out = contrast_stretching(out)
        return out, "Basic contrast enhancement"
    min_dim = min(w, h)
    user_window = settings.get("ocr_adaptive_threshold_window_size", 0)
    if user_window and user_window > 0:
        size = int(user_window)
    elif quality["contrast"] < 0.2:
        size = min(max(min_dim // 20, 11), 31)
    else:
        size = min(max(min_dim // 15, 15), 41)
    if size % 2 == 0:
        size += 1
    try:
        return adaptive_threshold(img, size), "Contrast enhancement"
    except Exception:
        _log_histogram_eq_mode(settings)
        out = histogram_equalization(img)
        if quality["contrast"] < 0.3:
            out = contrast_stretching(out)
        return out, "Basic contrast enhancement"


def _log_histogram_eq_mode(settings: dict) -> None:
    """The reference's ONLY read of the ocr_histogram_equalization knob
    (enhanced.rs:684-688): it never forces or suppresses the EQ
    fallback — the fallback triggers on size/panic either way — it only
    distinguishes 'user enabled' from 'fallback' in the log line.
    Mirrored exactly."""
    import logging

    mode = (
        "user enabled"
        if settings.get("ocr_histogram_equalization")
        else "fallback"
    )
    logging.getLogger(__name__).info(
        "Applying histogram equalization for contrast enhancement (%s)", mode
    )


# --- A29: morphological open + close ---------------------------------------


def _erode(img: np.ndarray) -> np.ndarray:
    p = np.pad(img, 1, mode="edge")
    h, w = img.shape
    return np.min(
        np.stack([p[dy : dy + h, dx : dx + w] for dy in range(3) for dx in range(3)]),
        axis=0,
    )


def _dilate(img: np.ndarray) -> np.ndarray:
    p = np.pad(img, 1, mode="edge")
    h, w = img.shape
    return np.max(
        np.stack([p[dy : dy + h, dx : dx + w] for dy in range(3) for dx in range(3)]),
        axis=0,
    )


def morphological_open_close(img: np.ndarray) -> np.ndarray:
    """A29 — enhanced.rs:804-812: grayscale opening (erode→dilate,
    removes speckle noise) then closing (dilate→erode, fills small gaps
    in glyph strokes), LInf norm radius 1 = 3×3 square element."""
    opened = _dilate(_erode(img))
    return _erode(_dilate(opened))


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
    """The A20-pre ladder with the reference's exact step gating and
    bookkeeping (enhanced.rs:140-202): orientation → resize → quality
    analysis → selective enhancement rungs, each guarded by the
    measured stat OR its user knob:

      brightness   avg < 50 (of 255)  or ocr_brightness_boost > 0
      noise        noise > 0.25       or (ocr_remove_noise and level > 1)
      contrast     contrast < 0.2     or (ocr_enhance_contrast and window > 0)
      sharpen      sharpness < 0.2    or ocr_sharpening_strength > 0.5
      morphology   ocr_morphological_operations and noise > 0.15

    Returns (pixels, steps_applied) with the reference's step labels."""
    steps: list[str] = []
    if settings.get("ocr_detect_orientation", True):
        img, rotated = orientation_correction(img)
        if rotated:
            steps.append("Orientation correction")
    img, resized = smart_resize(
        img, target_dpi=settings.get("ocr_dpi", 300)  # enhanced.rs:138
    )
    if resized:
        steps.append("Smart resize")
    if settings.get("enable_image_preprocessing"):
        quality = analyze_image_quality(img)
        if needs_enhancement(quality, settings):
            if (
                quality["brightness"] * 255.0 < 50.0
                or settings.get("ocr_brightness_boost", 0.0) > 0.0
            ):
                img = brightness_contrast_correction(img, quality, settings)
                steps.append("Brightness/contrast correction")
            if quality["noise"] > 0.25 or (
                settings.get("ocr_remove_noise")
                and settings.get("ocr_noise_reduction_level", 0) > 1
            ):
                img = noise_removal(img, quality, settings)
                steps.append("Noise reduction")
            if quality["contrast"] < 0.2 or (
                settings.get("ocr_enhance_contrast")
                and settings.get("ocr_adaptive_threshold_window_size", 0) > 0
            ):
                img, label = adaptive_contrast_enhancement(img, quality, settings)
                steps.append(label)
            if (
                quality["sharpness"] < 0.2
                or settings.get("ocr_sharpening_strength", 0.0) > 0.5
            ):
                img = sharpen(img)
                steps.append("Image sharpening")
            if (
                settings.get("ocr_morphological_operations")
                and quality["noise"] > 0.15
            ):
                img = morphological_open_close(img)
                steps.append("Morphological operations")
    return img, steps


def ocr_image(img: np.ndarray, settings: dict) -> tuple[str, float]:
    """Tesseract OCR (enhanced.rs:52-119), capability-gated like the
    reference's `#[cfg(feature="ocr")]` split. Raises the reference's
    error string when the runtime is absent. Configuration goes through
    resolve_tesseract_config (kernels/ocr_config.py): validated
    language combination with primary-first ordering and the PSM/OEM
    0-13/0-3 maps with PsmAuto/Default fallbacks."""
    if not settings.get("ocr_capability"):
        raise RuntimeError("OCR feature not enabled")
    try:
        import pytesseract  # noqa: F401
        from PIL import Image  # noqa: F401
    except ImportError:
        raise RuntimeError("OCR feature not enabled")
    from readur_spark.kernels.ocr_config import resolve_tesseract_config

    cfg = resolve_tesseract_config(settings)
    pil = Image.fromarray(img)
    config = "--psm %d --oem %d" % (cfg["psm"], cfg["oem"])
    data = pytesseract.image_to_data(
        pil, lang=cfg["lang"], config=config, output_type=pytesseract.Output.DICT
    )
    words = [w for w in data["text"] if w.strip()]
    confs = [float(c) for c, w in zip(data["conf"], data["text"]) if w.strip() and float(c) >= 0]
    mean_conf = sum(confs) / len(confs) if confs else 0.0
    return " ".join(words), mean_conf
