"""Extraction settings — the reference's per-user Settings object.

Mirrors the defaults of `src/models/settings.rs:302-379` in the
reference. In the Spark engine this dict is broadcast to executors and
closed over by the pandas UDFs (the reference's "UDF surface" is
exactly this parameterization — SURVEY.md §2 end note).

Only knobs the reference ENGINE actually reads are kept; server-ops
knobs (webdav, retention, concurrency) live elsewhere or are replaced
by Spark-level configuration, and three knobs the reference merely
stores/roundtrips without ever reading are deliberately DROPPED rather
than carried as dead surface (each verified by grep of the reference's
src/ outside the models/db/routes settings plumbing):

  - auto_detect_language_combination (settings.rs:310): defined,
    persisted (db/settings.rs:29), never read by any extraction path —
    language combinations come from preferred_languages
    (enhanced.rs:246-271, mirrored in kernels/ocr_config.py).
  - auto_rotate_images (settings.rs:323): defined/persisted; rotation
    is gated by ocr_detect_orientation (enhanced.rs:133-135), which
    preprocess_image honors.
  - ocr_upscale_factor (settings.rs:350): defined/persisted; upscaling
    is the fixed min-dim<300 → 600 rule (enhanced.rs:368-374).

(ocr_dpi and ocr_histogram_equalization ARE read by the reference —
enhanced.rs:138 and :684 — and are wired below with the reference's
exact semantics: read-and-ignored resize hint, log-message-only EQ
mode.)
"""

from __future__ import annotations

DEFAULT_SETTINGS: dict = {
    # src/models/settings.rs:307-310
    "ocr_language": "eng",
    "preferred_languages": ["eng"],
    "primary_language": "eng",
    # src/models/settings.rs:313 + src/config.rs:323; the upload gate
    # (routes/documents/crud.rs:167). Read by kernels.text.
    # read_plain_text (A8 size gate).
    "max_file_size_mb": 50,
    # src/models/settings.rs:314-322 — plus "html": the engine's
    # north-star branch (the reference has no HTML extractor, so its
    # default list omits it; dropping .html at ingest would gut the
    # Common-Crawl pipeline). Read by operators.extract.
    # filter_allowed_pages (A7 ingest gate) and kernels.mime.
    # is_allowed_file_type.
    "allowed_file_types": ["pdf", "png", "jpg", "jpeg", "tiff", "bmp", "txt", "html"],
    # src/models/settings.rs:324
    "enable_image_preprocessing": False,
    # src/models/settings.rs:326-328. Read by queries.facets.paginate,
    # kernels.snippets (DEFAULT_SNIPPET_LENGTH), and queries.search.
    # fuzzy_match (default threshold; the reference's SQL hardcodes 0.3
    # and never reads its own knob — search.rs:126).
    "search_results_per_page": 25,
    "search_snippet_length": 200,
    "fuzzy_search_threshold": 0.8,
    # src/models/settings.rs:335-357
    "ocr_page_segmentation_mode": 3,
    "ocr_engine_mode": 3,
    "ocr_min_confidence": 30.0,
    # Passed to smart_resize as target_dpi at the preprocess call
    # (enhanced.rs:138) and ignored inside the resize exactly as the
    # reference's `_target_dpi` is (enhanced.rs:353) — read-site parity.
    "ocr_dpi": 300,
    "ocr_enhance_contrast": True,
    "ocr_remove_noise": True,
    "ocr_detect_orientation": True,
    "ocr_brightness_boost": 1.0,
    "ocr_contrast_multiplier": 1.2,
    "ocr_noise_reduction_level": 1,
    "ocr_sharpening_strength": 0.5,
    "ocr_morphological_operations": False,
    "ocr_adaptive_threshold_window_size": 15,
    # In the reference this knob only switches a log message — the EQ
    # fallback itself triggers on size/panic (enhanced.rs:642-645,
    # 684-688). Mirrored exactly: kernels.image._log_histogram_eq_mode
    # reads it for the 'user enabled' vs 'fallback' provenance line.
    "ocr_histogram_equalization": False,
    # Dimension reject-gate before OCR (enhanced_processing.rs:98-104;
    # error string from ocr/error.rs:19). Read by kernels.extract.
    # _extract_image. The reference's EnhancedOcrService defaults to
    # 10000² and exposes with_limits(); the settings-table default is
    # 3000² (db/mod.rs) — we honor the settings value.
    "ocr_max_image_width": 3000,
    "ocr_max_image_height": 3000,
    "ocr_quality_threshold_brightness": 0.3,
    "ocr_quality_threshold_contrast": 0.2,
    "ocr_quality_threshold_noise": 0.7,
    "ocr_quality_threshold_sharpness": 0.3,
    "ocr_skip_enhancement": False,
    # Engine extension (not in the reference): whether an OCR runtime
    # (tesseract) is available on executors. The reference gates the
    # same paths behind `#[cfg(feature = "ocr")]`
    # (src/ocr/enhanced.rs:1421-1440); this flag is the runtime analog.
    "ocr_capability": False,
    # `tesseract --list-langs` result (src/ocr/health.rs:33-53) probed
    # once per executor when the runtime exists; None = unknown → the
    # A20/A34 language validation is skipped (no runtime to validate
    # against), a list enables strict combination validation.
    "available_languages": None,
    # A13 backend injection point (kernels/ocr_ladder.py): None →
    # OcrmypdfBackend (real subprocess) when ocr_capability is set;
    # tests inject fakes to exercise the 3-strategy control flow.
    "ocr_backend": None,
    # Engine extension: enable the HTML main-content branch (the
    # reference has no HTML extractor — SURVEY.md §7 note; this is the
    # north-star extension for Common-Crawl payloads).
    "html_capability": True,
}


def merged_settings(overrides: dict | None = None) -> dict:
    s = dict(DEFAULT_SETTINGS)
    if overrides:
        s.update(overrides)
    return s
