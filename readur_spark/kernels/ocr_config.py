"""Tesseract configuration fidelity — PSM/OEM maps, language
combination builder, language-data validation.

Reference semantics (yonasBSD/readur):
  - build_language_combination: src/ocr/enhanced.rs:253-271
  - PSM 0-13 map (+ fallback PsmAuto): src/ocr/enhanced.rs:283-299
  - OEM 0-3 map (+ fallback Default): src/ocr/enhanced.rs:302-309
  - --list-langs membership check: src/ocr/health.rs:33-53
  - combination validation (each lang present, ≤4): src/ocr/health.rs:89-115

Pure functions — the Spark engine broadcasts settings and calls these
inside the image-OCR kernel; the real `tesseract --list-langs` query is
capability-gated (no tesseract in this sandbox), so the available-
language set arrives via settings["available_languages"] (populated by
a health probe on executors when the runtime exists).
"""

from __future__ import annotations

# enhanced.rs:283-299 — numeric mode → canonical tesseract PSM name.
PSM_MODES: dict[int, str] = {
    0: "PsmOsdOnly",
    1: "PsmAutoOsd",
    2: "PsmAutoOnly",
    3: "PsmAuto",
    4: "PsmSingleColumn",
    5: "PsmSingleBlockVertText",
    6: "PsmSingleBlock",
    7: "PsmSingleLine",
    8: "PsmSingleWord",
    9: "PsmCircleWord",
    10: "PsmSingleChar",
    11: "PsmSparseText",
    12: "PsmSparseTextOsd",
    13: "PsmRawLine",
}
PSM_DEFAULT = 3  # PsmAuto — the reference's `_ =>` fallback

# enhanced.rs:302-309
OEM_MODES: dict[int, str] = {
    0: "TesseractOnly",
    1: "LstmOnly",
    2: "TesseractLstmCombined",
    3: "Default",
}
OEM_DEFAULT = 3

MAX_LANGUAGES = 4  # health.rs:107-111


def normalize_psm(mode: int) -> int:
    """Out-of-range modes fall back to PsmAuto (enhanced.rs:298),
    mirroring the reference's exhaustive match arm."""
    return mode if mode in PSM_MODES else PSM_DEFAULT


def psm_name(mode: int) -> str:
    return PSM_MODES[normalize_psm(mode)]


def normalize_oem(mode: int) -> int:
    return mode if mode in OEM_MODES else OEM_DEFAULT


def oem_name(mode: int) -> str:
    return OEM_MODES[normalize_oem(mode)]


def build_language_combination(settings: dict) -> str:
    """enhanced.rs:253-271 — multi-language: preferred_languages with
    primary_language forced first, '+'-joined; single: that language;
    empty: the legacy ocr_language field."""
    preferred = list(settings.get("preferred_languages") or [])
    primary = settings.get("primary_language", "")
    if len(preferred) > 1:
        langs = [l for l in preferred if l != primary]
        langs.insert(0, primary)
        return "+".join(langs)
    if preferred:
        return preferred[0]
    return settings.get("ocr_language", "eng")


class LanguageDataError(ValueError):
    """OcrError::LanguageDataNotFound analog (src/ocr/error.rs)."""


def check_language_data(lang: str, available: list[str]) -> None:
    """health.rs:33-53 — membership in the --list-langs set."""
    if lang not in available:
        raise LanguageDataError(lang)


def validate_language_combination(combination: str, available: list[str]) -> None:
    """health.rs:89-115 — every '+'-component present, at most 4."""
    if not combination:
        raise LanguageDataError("empty")
    langs = combination.split("+")
    for lang in langs:
        check_language_data(lang.strip(), available)
    if len(langs) > MAX_LANGUAGES:
        raise LanguageDataError(
            "Too many languages in combination: %d. Maximum is %d."
            % (len(langs), MAX_LANGUAGES)
        )


def resolve_tesseract_config(settings: dict) -> dict:
    """The full A20 parameter resolution: language combination (built +
    validated when an available-language set is known), normalized
    PSM/OEM. Returns {"lang", "psm", "oem"} ready for the tesseract
    invocation."""
    combo = build_language_combination(settings)
    available = settings.get("available_languages")
    if available is not None:
        validate_language_combination(combo, available)
    return {
        "lang": combo,
        "psm": normalize_psm(settings.get("ocr_page_segmentation_mode", PSM_DEFAULT)),
        "oem": normalize_oem(settings.get("ocr_engine_mode", OEM_DEFAULT)),
    }
