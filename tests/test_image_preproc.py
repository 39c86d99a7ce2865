"""A26/A27/A29 image preprocessing kernels + the A21-A29 ladder's
reference-faithful gating (src/ocr/enhanced.rs:140-202, 596-812)."""

from __future__ import annotations

import numpy as np

from readur_spark.kernels import image


def _rng(seed=0):
    return np.random.RandomState(seed)


# ---- A26: noise removal ----------------------------------------------------


def test_median_filter_kills_salt_and_pepper():
    img = np.full((21, 21), 128, dtype=np.uint8)
    img[10, 10] = 255
    img[5, 5] = 0
    out = image.median_filter(img, 1)
    assert out[10, 10] == 128 and out[5, 5] == 128


def test_median_filter_identity_on_constant():
    img = np.full((9, 9), 77, dtype=np.uint8)
    assert np.array_equal(image.median_filter(img, 2), img)


def test_gaussian_blur_reduces_variance_preserves_mean():
    img = (_rng().randint(0, 256, size=(40, 40))).astype(np.uint8)
    out = image.gaussian_blur(img, 0.8)
    assert out.var() < img.var() * 0.6
    assert abs(float(out.mean()) - float(img.mean())) < 3.0


def test_noise_removal_level_selection():
    """enhanced.rs:600-609 — user knob wins; else stats band."""
    img = (_rng().randint(0, 256, size=(30, 30))).astype(np.uint8)
    # identical inputs through explicit level vs stats-derived level
    heavy_user = image.noise_removal(img, {"noise": 0.0},
                                     {"ocr_noise_reduction_level": 3})
    heavy_stats = image.noise_removal(img, {"noise": 0.3},
                                      {"ocr_noise_reduction_level": 0})
    assert np.array_equal(heavy_user, heavy_stats)
    light = image.noise_removal(img, {"noise": 0.05},
                                {"ocr_noise_reduction_level": 0})
    assert np.array_equal(light, image.median_filter(img, 1))


# ---- A27: adaptive threshold / histogram EQ --------------------------------


def test_adaptive_threshold_binarizes_against_local_mean():
    img = np.zeros((20, 20), dtype=np.uint8)
    img[:, 10:] = 200  # right half bright
    out = image.adaptive_threshold(img, 3)
    assert set(np.unique(out)) <= {0, 255}
    # interior of each half is exactly its local mean → not above it
    assert out[10, 2] == 0
    # at the edge the bright side exceeds the mixed local mean
    assert out[10, 11] == 255


def test_histogram_equalization_formula():
    """enhanced.rs:700-712 — lookup[i] = trunc(cdf[i]/total·255)."""
    img = np.array([[0, 0], [255, 255]], dtype=np.uint8)
    out = image.histogram_equalization(img)
    # cdf(0)=2/4 → 127.5 → 127 ; cdf(255)=4/4 → 255
    assert out[0, 0] == 127 and out[1, 1] == 255


def test_contrast_stretching_full_range():
    img = np.array([[50, 100], [150, 150]], dtype=np.uint8)
    out = image.contrast_stretching(img)
    assert out.min() == 0 and out.max() == 255
    flat = np.full((3, 3), 42, dtype=np.uint8)
    assert np.array_equal(image.contrast_stretching(flat), flat)


def test_adaptive_contrast_small_image_thresholds():
    img = (_rng().randint(0, 256, size=(60, 60))).astype(np.uint8)
    out, label = image.adaptive_contrast_enhancement(
        img, {"contrast": 0.5}, {"ocr_adaptive_threshold_window_size": 0}
    )
    assert label == "Contrast enhancement"
    assert set(np.unique(out)) <= {0, 255}


def test_adaptive_contrast_large_image_falls_back_to_hist_eq():
    """>1.5 MP takes the overflow-safe histogram-EQ path
    (enhanced.rs:641-646)."""
    img = np.tile(np.arange(256, dtype=np.uint8), (6200, 5))[:, :1300]
    assert img.shape[0] * img.shape[1] > image.ADAPTIVE_THRESHOLD_MAX_PIXELS
    out, label = image.adaptive_contrast_enhancement(
        img, {"contrast": 0.5}, {}
    )
    assert label == "Basic contrast enhancement"
    assert out.shape == img.shape


# ---- A29: morphology -------------------------------------------------------


def test_morphology_open_removes_speckle():
    img = np.zeros((15, 15), dtype=np.uint8)
    img[7, 7] = 255  # isolated bright speckle
    out = image.morphological_open_close(img)
    assert out[7, 7] == 0


def test_morphology_close_fills_gap_in_stroke():
    img = np.zeros((9, 15), dtype=np.uint8)
    img[3:6, :] = 255
    img[3:6, 7] = 0  # 1-px dark gap across a thick bright stroke
    out = image.morphological_open_close(img)
    assert out[4, 7] == 255


# ---- brightness formula (reference-exact) ----------------------------------


def test_brightness_user_override_formula():
    """enhanced.rs:585-588 — (pixel + boost) × multiplier, rounded."""
    img = np.full((4, 4), 100, dtype=np.uint8)
    out = image.brightness_contrast_correction(
        img, {"brightness": 100 / 255.0, "contrast": 0.5},
        {"ocr_brightness_boost": 10.0, "ocr_contrast_multiplier": 2.0},
    )
    assert np.all(out == 220)


def test_brightness_stats_path_dim_image():
    """boost = 60 − b for b < 50; multiplier from contrast band."""
    img = np.full((4, 4), 40, dtype=np.uint8)
    out = image.brightness_contrast_correction(
        img, {"brightness": 40 / 255.0, "contrast": 0.1},
        {"ocr_brightness_boost": 0.0, "ocr_contrast_multiplier": 0.0},
    )
    # boost = 20, mult = 2.5 → (40+20)*2.5 = 150
    assert np.all(out == 150)


# ---- ladder gating ---------------------------------------------------------


def _base_settings(**over) -> dict:
    from readur_spark.kernels.settings import merged_settings

    s = merged_settings({
        "enable_image_preprocessing": True,
        "ocr_detect_orientation": False,
        "ocr_brightness_boost": 0.0,
        "ocr_contrast_multiplier": 0.0,
        "ocr_noise_reduction_level": 0,
        "ocr_sharpening_strength": 0.0,
        "ocr_remove_noise": False,
        "ocr_enhance_contrast": False,
        "ocr_adaptive_threshold_window_size": 0,
        "ocr_morphological_operations": False,
    })
    s.update(over)
    return s


def test_ladder_good_image_unchanged():
    """A clean, sharp, mid-brightness image with neutral knobs takes no
    enhancement rungs."""
    rs = _rng(3)
    img = np.clip(rs.normal(140, 60, size=(400, 400)), 0, 255).astype(np.uint8)
    out, steps = image.preprocess_image(img, _base_settings())
    assert steps == []
    assert np.array_equal(out, img)


def test_ladder_skip_enhancement_respected():
    img = np.full((400, 400), 10, dtype=np.uint8)  # very dim
    _, steps = image.preprocess_image(
        img, _base_settings(ocr_skip_enhancement=True)
    )
    assert steps == []


def test_ladder_dim_image_gets_brightness():
    img = np.full((400, 400), 30, dtype=np.uint8)
    _, steps = image.preprocess_image(img, _base_settings())
    assert "Brightness/contrast correction" in steps


def test_ladder_user_knobs_force_rungs():
    """With neutral stats, each user knob pulls in exactly its rung
    (enhanced.rs:158-199 gating)."""
    rs = _rng(3)
    img = np.clip(rs.normal(140, 60, size=(400, 400)), 0, 255).astype(np.uint8)
    _, steps = image.preprocess_image(
        img,
        _base_settings(
            ocr_remove_noise=True, ocr_noise_reduction_level=2,
            ocr_enhance_contrast=True, ocr_adaptive_threshold_window_size=15,
            ocr_sharpening_strength=0.8,
        ),
    )
    assert steps == [
        "Noise reduction",
        "Contrast enhancement",
        "Image sharpening",
    ]


def test_ladder_morphology_needs_knob_and_noise():
    rs = _rng(1)
    noisy = rs.randint(0, 256, size=(300, 300)).astype(np.uint8)
    q = image.analyze_image_quality(noisy)
    assert q["noise"] > 0.15
    # needs_enhancement must trip (default noise threshold is 0.7, which
    # random noise doesn't reach) — use the noise knob, then morphology
    # joins because its own gate (knob AND noise > 0.15) is satisfied
    _, steps = image.preprocess_image(
        noisy,
        _base_settings(
            ocr_morphological_operations=True,
            ocr_remove_noise=True, ocr_noise_reduction_level=2,
        ),
    )
    assert "Morphological operations" in steps
    _, steps_off = image.preprocess_image(
        noisy,
        _base_settings(ocr_remove_noise=True, ocr_noise_reduction_level=2),
    )
    assert "Noise reduction" in steps_off
    assert "Morphological operations" not in steps_off


class TestLanczos3Resize:
    """kernels.image.lanczos3_resize — the image crate's Lanczos3
    algorithm (windowed sinc, support 3, normalized in-bounds weights);
    round-3 replacement for nearest-index sampling (A22/A35)."""

    def test_identity_when_same_size(self):
        from readur_spark.kernels.image import lanczos3_resize

        rng = np.random.RandomState(0)
        img = rng.randint(0, 256, size=(40, 30), dtype=np.uint8)
        out = lanczos3_resize(img, 30, 40)
        # ratio 1 → kernel hits integer offsets where sinc() = 0 except
        # the center → exact identity
        assert np.array_equal(out, img)

    def test_constant_image_stays_constant(self):
        from readur_spark.kernels.image import lanczos3_resize

        img = np.full((100, 80), 137, dtype=np.uint8)
        out = lanczos3_resize(img, 20, 25)
        assert out.shape == (25, 20)
        assert np.all(out == 137)

    def test_two_to_one_averages(self):
        from readur_spark.kernels.image import lanczos3_resize

        # 1×2 → 1×1: symmetric weights → plain average
        img = np.array([[10, 20]], dtype=np.uint8)
        out = lanczos3_resize(img, 1, 1)
        assert out.shape == (1, 1)
        assert out[0, 0] == 15

    def test_downscale_antialiases_checkerboard(self):
        from readur_spark.kernels.image import lanczos3_resize

        # 1-px checkerboard downscaled 4× must land near the 127.5 mean
        # (nearest sampling returns pure 0 or 255 — the aliasing the
        # filter exists to remove)
        img = np.indices((64, 64)).sum(axis=0) % 2 * 255
        out = lanczos3_resize(img.astype(np.uint8), 16, 16)
        assert 96 <= out.astype(np.float64).mean() <= 160
        assert out.std() < 64

    def test_ramp_preserved(self):
        from readur_spark.kernels.image import lanczos3_resize

        img = np.tile(np.linspace(0, 255, 200, dtype=np.uint8), (20, 1))
        out = lanczos3_resize(img, 50, 10)
        mid = out[5].astype(np.float64)
        # monotone non-decreasing ramp away from the edges
        assert np.all(np.diff(mid[2:-2]) >= 0)
