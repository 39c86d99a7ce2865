"""A20/A34/A7 config fidelity: PSM/OEM maps, language combination
builder + validation, allowed-file-type gating (pure kernel + Spark
operator)."""

from __future__ import annotations

import pytest

from readur_spark.kernels import mime
from readur_spark.kernels.ocr_config import (
    MAX_LANGUAGES,
    OEM_MODES,
    PSM_MODES,
    LanguageDataError,
    build_language_combination,
    check_language_data,
    normalize_oem,
    normalize_psm,
    oem_name,
    psm_name,
    resolve_tesseract_config,
    validate_language_combination,
)

# ---- A20: PSM / OEM maps (enhanced.rs:283-309) ------------------------------

_PSM_TABLE = {
    0: "PsmOsdOnly", 1: "PsmAutoOsd", 2: "PsmAutoOnly", 3: "PsmAuto",
    4: "PsmSingleColumn", 5: "PsmSingleBlockVertText", 6: "PsmSingleBlock",
    7: "PsmSingleLine", 8: "PsmSingleWord", 9: "PsmCircleWord",
    10: "PsmSingleChar", 11: "PsmSparseText", 12: "PsmSparseTextOsd",
    13: "PsmRawLine",
}


def test_psm_table_matches_reference():
    assert PSM_MODES == _PSM_TABLE
    for mode, name in _PSM_TABLE.items():
        assert normalize_psm(mode) == mode
        assert psm_name(mode) == name


@pytest.mark.parametrize("bad", [-1, 14, 99])
def test_psm_out_of_range_falls_back_to_auto(bad):
    assert normalize_psm(bad) == 3
    assert psm_name(bad) == "PsmAuto"


def test_oem_table_and_fallback():
    assert OEM_MODES == {0: "TesseractOnly", 1: "LstmOnly",
                         2: "TesseractLstmCombined", 3: "Default"}
    assert normalize_oem(7) == 3
    assert oem_name(7) == "Default"


# ---- A20: language combination (enhanced.rs:253-271) ------------------------


def test_lang_combo_primary_first():
    s = {"preferred_languages": ["deu", "eng", "fra"], "primary_language": "eng"}
    assert build_language_combination(s) == "eng+deu+fra"


def test_lang_combo_single():
    s = {"preferred_languages": ["spa"], "primary_language": "eng"}
    assert build_language_combination(s) == "spa"


def test_lang_combo_empty_falls_back_to_legacy_field():
    s = {"preferred_languages": [], "primary_language": "eng",
         "ocr_language": "ita"}
    assert build_language_combination(s) == "ita"


# ---- A34: language validation (health.rs:33-115) ----------------------------

_AVAILABLE = ["deu", "eng", "fra", "ita", "spa"]


def test_check_language_data_membership():
    check_language_data("eng", _AVAILABLE)
    with pytest.raises(LanguageDataError):
        check_language_data("xyz", _AVAILABLE)


def test_validate_combination_each_component():
    validate_language_combination("eng+deu", _AVAILABLE)
    with pytest.raises(LanguageDataError):
        validate_language_combination("eng+xyz", _AVAILABLE)
    with pytest.raises(LanguageDataError):
        validate_language_combination("", _AVAILABLE)


def test_validate_combination_max_four():
    assert MAX_LANGUAGES == 4
    validate_language_combination("eng+deu+fra+ita", _AVAILABLE)
    with pytest.raises(LanguageDataError) as ei:
        validate_language_combination("eng+deu+fra+ita+spa", _AVAILABLE)
    assert "Maximum is 4" in str(ei.value)


def test_resolve_config_end_to_end():
    cfg = resolve_tesseract_config({
        "preferred_languages": ["deu", "eng"], "primary_language": "eng",
        "ocr_page_segmentation_mode": 6, "ocr_engine_mode": 1,
        "available_languages": _AVAILABLE,
    })
    assert cfg == {"lang": "eng+deu", "psm": 6, "oem": 1}
    with pytest.raises(LanguageDataError):
        resolve_tesseract_config({
            "preferred_languages": ["zzz"], "primary_language": "zzz",
            "available_languages": _AVAILABLE,
        })
    # unknown availability (no runtime) → validation skipped
    cfg2 = resolve_tesseract_config({
        "preferred_languages": ["zzz"], "primary_language": "zzz",
        "available_languages": None,
    })
    assert cfg2["lang"] == "zzz"


# ---- A7: allowed file types (file_service.rs:204-214) -----------------------


def test_is_allowed_file_type_kernel():
    allowed = ["pdf", "txt", "png"]
    assert mime.is_allowed_file_type("doc.pdf", allowed)
    assert mime.is_allowed_file_type("DOC.PDF", allowed)  # case-folded
    assert not mime.is_allowed_file_type("archive.zip", allowed)
    assert not mime.is_allowed_file_type("noext", allowed)  # Path::extension → None
    assert mime.is_allowed_file_type("https://h.example/a/b.txt?q=1", allowed)


def test_filter_allowed_pages_operator(spark):
    from readur_spark.operators.extract import filter_allowed_pages

    urls = [
        ("https://a.example/x.pdf",), ("https://a.example/x.zip",),
        ("https://a.example/x.TXT",), ("https://a.example/page",),
        ("https://a.example/x.html?utm=1",),
    ]
    df = spark.createDataFrame(urls, "url string")
    kept = {r.url for r in filter_allowed_pages(df).collect()}
    assert kept == {
        "https://a.example/x.pdf", "https://a.example/x.TXT",
        "https://a.example/page", "https://a.example/x.html?utm=1",
    }
    strict = {r.url for r in
              filter_allowed_pages(df, keep_extensionless=False).collect()}
    assert "https://a.example/page" not in strict
    assert "https://a.example/x.pdf" in strict


class TestWiredKnobs:
    """Knobs wired this round: max_file_size_mb (A8 gate),
    ocr_max_image_width/height (reject gate), search_results_per_page
    (paginate), fuzzy_search_threshold (fuzzy_match default)."""

    def test_max_file_size_knob_gates_text(self):
        from readur_spark.kernels import text as text_k

        small_cap = {"max_file_size_mb": 1}
        data = b"x" * (1024 * 1024 + 1)
        try:
            text_k.read_plain_text(data, small_cap)
            assert False, "expected ExtractError"
        except text_k.ExtractError as e:
            assert "too large" in str(e)
        # default settings: same payload passes
        assert text_k.read_plain_text(data) == "x" * (1024 * 1024 + 1)

    def test_image_dimension_reject_gate(self):
        import numpy as np

        from readur_spark.kernels import image as img_k
        from readur_spark.kernels.extract import extract_page
        from readur_spark.kernels.settings import DEFAULT_SETTINGS

        wide = np.full((4, 64), 128, dtype=np.uint8)
        png = img_k.encode_png_gray(wide)
        s = dict(DEFAULT_SETTINGS)
        s["ocr_capability"] = True
        s["ocr_max_image_width"] = 32
        res = extract_page("https://x/img.png", png, s)
        assert res.status == "failed"
        assert "Image too large for OCR. Max dimensions: 32x3000" in res.error
        assert "Actual: 64x4" in res.error

    def test_paginate_respects_page_size_knob(self, spark):
        from pyspark.sql import Row, functions as F

        from readur_spark.queries.facets import paginate

        df = spark.createDataFrame([Row(i=i) for i in range(20)])
        got = paginate(
            df, [F.asc("i")], page=2, settings={"search_results_per_page": 7}
        ).collect()
        assert [r["i"] for r in got] == list(range(7, 14))

    def test_fuzzy_match_defaults_to_knob(self, spark):
        from pyspark.sql import Row

        from readur_spark.queries.search import fuzzy_match

        df = spark.createDataFrame(
            [Row(name="report_2024"), Row(name="report_2025"), Row(name="zzz")]
        )
        # knob default 0.8: only near-identical strings survive
        strict = fuzzy_match(df, "name", "report_2024").collect()
        assert {r["name"] for r in strict} == {"report_2024"}
        # reference-hardcoded 0.3 keeps the sibling
        loose = fuzzy_match(df, "name", "report_2024", threshold=0.3).collect()
        assert {r["name"] for r in loose} == {"report_2024", "report_2025"}
