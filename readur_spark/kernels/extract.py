"""The extraction dispatch — one page in, one ExtractResult out.

Reimplements (Spark-first, pure-kernel layer) the reference's
`extract_text` MIME dispatch (src/ocr/enhanced.rs:1417-1483) extended
with the HTML main-content branch for Common-Crawl payloads
(BASELINE.json north_star; the reference rejects text/html —
enhanced.rs:1481, so the HTML branch is an extension with its own
pinned semantics).

Branches and confidences:
  text/plain        → passthrough+trim/truncate, confidence 100.0
                      (enhanced.rs:1474)
  application/pdf   → cascade: text-layer parse (conf 95.0,
                      enhanced.rs:872) → [OCR 85.0, capability-gated]
                      → byte-scrape (conf 50.0, enhanced.rs:902)
  text/html         → main-content extraction, confidence 90.0
                      (engine extension — pinned here)
  image/*           → preprocess ladder + OCR (conf = tesseract mean,
                      enhanced.rs:322-335), capability-gated
  other             → "Unsupported file type: {mime}" error
                      (enhanced.rs:1481, tested src/tests/ocr_tests.rs:81-94)

Failure semantics: errors → classify_error (queue.rs:1193-1215) →
status='failed' with failure_reason + error message; completed results
failing validate_ocr_quality (enhanced.rs:1562-1597) → failed with
'low_ocr_confidence', mirroring the worker's validation step
(src/ocr/queue.rs:378-410).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from readur_spark.kernels import classify, html_extract, image, mime, pdf, text as text_k
from readur_spark.kernels.settings import DEFAULT_SETTINGS

HTML_CONFIDENCE = 90.0
PDF_QUICK_CONFIDENCE = 95.0  # enhanced.rs:872
PDF_OCR_CONFIDENCE = 85.0  # enhanced.rs:1113
PDF_SCRAPE_CONFIDENCE = 50.0  # enhanced.rs:902
TEXT_CONFIDENCE = 100.0  # enhanced.rs:1474

STATUS_COMPLETED = "completed"
STATUS_FAILED = "failed"


@dataclass
class ExtractResult:
    url: str
    mime_type: str
    file_size: int
    extracted_text: str | None = None
    confidence: float | None = None
    word_count: int | None = None
    status: str = STATUS_COMPLETED
    failure_reason: str | None = None
    error: str | None = None
    preprocessing_applied: list[str] = field(default_factory=list)
    failure_stage: str | None = None


def _failed(
    url: str, mime_type: str, size: int, error: str, stage: str = "ocr"
) -> ExtractResult:
    reason, _suppress = classify.classify_error(error)
    return ExtractResult(
        url=url,
        mime_type=mime_type,
        file_size=size,
        status=STATUS_FAILED,
        failure_reason=reason,
        error=error,
        failure_stage=stage,
    )


def _extract_pdf(url: str, data: bytes, settings: dict) -> ExtractResult:
    """PDF cascade — enhanced.rs:816-919."""
    size = len(data)
    if size > pdf.MAX_PDF_SIZE:
        return _failed(
            url,
            "application/pdf",
            size,
            "PDF file too large: %.1f MB (max: %.1f MB). Consider splitting the PDF."
            % (size / (1024.0 * 1024.0), pdf.MAX_PDF_SIZE / (1024.0 * 1024.0)),
            stage="validation",
        )
    if not pdf.is_valid_pdf(data[:1024]):
        return _failed(
            url,
            "application/pdf",
            size,
            "Invalid PDF file: Missing or corrupted PDF header.",
            stage="validation",
        )

    # quick path: in-process text layer (replaces pdftotext subprocess)
    quick_text: str | None = None
    try:
        quick_text = pdf.parse_pdf_text_layer(data)
    except Exception:  # malformed structure → cascade continues
        quick_text = None
    if quick_text is not None:
        word_count_gate = len(quick_text.split())
        if word_count_gate > 5:  # enhanced.rs:1155 — >5-word acceptance
            trimmed = quick_text.strip()
            word_count = text_k.count_words_safely(trimmed)
            if text_k.is_text_extraction_quality_sufficient(trimmed, word_count, size):
                return ExtractResult(
                    url=url,
                    mime_type="application/pdf",
                    file_size=size,
                    extracted_text=trimmed,
                    confidence=PDF_QUICK_CONFIDENCE,
                    word_count=word_count,
                    preprocessing_applied=["PDF text extraction (pdftotext)"],
                )

    # full-OCR path (ocrmypdf 3-strategy ladder, enhanced.rs:980-1119),
    # capability-gated exactly like `#[cfg(feature="ocr")]`. The ladder
    # control flow (strategy degradation, 300 s budget, sidecar read,
    # conf 85.0) is real (kernels/ocr_ladder.py, golden-tested with a
    # fake backend); settings["ocr_backend"] injects the backend —
    # default is the real ocrmypdf subprocess when the binary exists.
    if settings.get("ocr_capability"):
        from readur_spark.kernels import ocr_ladder as ladder_mod

        backend = settings.get("ocr_backend") or ladder_mod.OcrmypdfBackend()
        try:
            ocr = ladder_mod.pdf_ocr_ladder(url, data, backend)
            return ExtractResult(
                url=url,
                mime_type="application/pdf",
                file_size=size,
                extracted_text=ocr.text,
                confidence=ocr.confidence,
                word_count=ocr.word_count,
                preprocessing_applied=list(ocr.preprocessing_applied),
            )
        except ladder_mod.OcrLadderError:
            # enhanced.rs:880-887 — OCR failure degrades to the
            # byte-scrape last resort below, mirroring the reference's
            # `Err(e) => { warn!(...); /* fall through */ }` arm.
            pass

    # last resort: byte-scrape (enhanced.rs:887-918)
    scraped = pdf.extract_text_from_pdf_bytes(data)
    if scraped.strip():
        word_count = text_k.count_words_safely(scraped)
        return ExtractResult(
            url=url,
            mime_type="application/pdf",
            file_size=size,
            extracted_text=scraped,
            confidence=PDF_SCRAPE_CONFIDENCE,
            word_count=word_count,
            preprocessing_applied=["Direct PDF text extraction (last resort)"],
        )
    return _failed(
        url, "application/pdf", size, "No readable text found in PDF", stage="ocr"
    )


def _extract_html(url: str, data: bytes, settings: dict) -> ExtractResult:
    size = len(data)
    if not settings.get("html_capability", True):
        return _failed(
            url, "text/html", size, "Unsupported file type: text/html", stage="ocr"
        )
    try:
        html = data.decode("utf-8", errors="replace")
    except Exception as e:
        return _failed(url, "text/html", size, "corrupted: %s" % e, stage="ocr")
    content = html_extract.extract_main_content(html)
    if not content.strip():
        return _failed(
            url, "text/html", size, "No extractable text in HTML document", stage="ocr"
        )
    word_count = text_k.count_words_safely(content)
    return ExtractResult(
        url=url,
        mime_type="text/html",
        file_size=size,
        extracted_text=content,
        confidence=HTML_CONFIDENCE,
        word_count=word_count,
        preprocessing_applied=["HTML main-content extraction"],
    )


def _extract_image(url: str, data: bytes, mime_type: str, settings: dict) -> ExtractResult:
    size = len(data)
    if not settings.get("ocr_capability"):
        # reference without the ocr feature: Err("OCR feature not
        # enabled") (enhanced.rs:1601-1607) → classify → 'other'
        return _failed(url, mime_type, size, "OCR feature not enabled", stage="ocr")
    img = image.decode_image_gray(data)
    if img is None:
        return _failed(
            url, mime_type, size, "corrupted internal structure: undecodable image",
            stage="ocr",
        )
    # dimension reject-gate (enhanced_processing.rs:98-104, message
    # from ocr/error.rs:19) — ocr_max_image_width/height knobs
    h, w = img.shape
    max_w = int(settings.get("ocr_max_image_width", 10000))
    max_h = int(settings.get("ocr_max_image_height", 10000))
    if w > max_w or h > max_h:
        return _failed(
            url, mime_type, size,
            "Image too large for OCR. Max dimensions: %dx%d, Actual: %dx%d"
            % (max_w, max_h, w, h),
            stage="validation",
        )
    img, steps = image.preprocess_image(img, settings)
    try:
        ocr_text, conf = image.ocr_image(img, settings)
    except RuntimeError as e:
        return _failed(url, mime_type, size, str(e), stage="ocr")
    trimmed = ocr_text.strip()
    word_count = text_k.count_words_safely(trimmed)
    return ExtractResult(
        url=url,
        mime_type=mime_type,
        file_size=size,
        extracted_text=trimmed,
        confidence=conf,
        word_count=word_count,
        preprocessing_applied=steps + ["Tesseract OCR"],
    )


def _extract_plain_text(url: str, data: bytes, settings: dict) -> ExtractResult:
    size = len(data)
    try:
        extracted = text_k.read_plain_text(data, settings)
    except text_k.ExtractError as e:
        return _failed(url, "text/plain", size, str(e), stage="validation")
    word_count = text_k.count_words_safely(extracted)
    return ExtractResult(
        url=url,
        mime_type="text/plain",
        file_size=size,
        extracted_text=extracted,
        confidence=TEXT_CONFIDENCE,
        word_count=word_count,
        preprocessing_applied=["Plain text read"],
    )


def extract_page(
    url: str,
    data: bytes | None,
    settings: dict | None = None,
    server_mime_type: str | None = None,
) -> ExtractResult:
    """Extract one page. MIME is detected content-first (A2), then the
    A1 dispatch routes to the branch. Completed results are validated
    (A32); failing validation flips to failed/'low_ocr_confidence'
    mirroring src/ocr/queue.rs:378-410."""
    settings = settings if settings is not None else DEFAULT_SETTINGS
    data = data or b""
    size = len(data)

    if size == 0:
        # queue.rs:464-499 — empty/no-text documents
        return _failed(url, "application/octet-stream", 0,
                       "No extractable text: 0 words", stage="validation")

    mime_type, _conf, _method = mime.detect_mime(data, url, server_mime_type)

    if mime_type == "application/pdf":
        result = _extract_pdf(url, data, settings)
    elif mime_type == "text/html":
        result = _extract_html(url, data, settings)
    elif mime_type.startswith("image/"):
        result = _extract_image(url, data, mime_type, settings)
    elif mime_type == "text/plain":
        result = _extract_plain_text(url, data, settings)
    else:
        result = _failed(
            url, mime_type, size, "Unsupported file type: %s" % mime_type, stage="validation"
        )
        # classify_error's substring rules are case-sensitive (Rust
        # `str::contains`, queue.rs:1198) and miss the capital-U
        # message; the ingest path records unsupported_format directly
        # (src/models/document.rs:56), which we mirror here.
        result.failure_reason = "unsupported_format"

    # worker-side validation (queue.rs:378-410 → enhanced.rs:1562-1597)
    if result.status == STATUS_COMPLETED:
        ok = text_k.validate_ocr_quality(
            result.extracted_text or "",
            result.confidence or 0.0,
            result.word_count or 0,
            settings.get("ocr_min_confidence", 30.0),
        )
        if not ok:
            failed = _failed(
                url, result.mime_type, size,
                "No extractable text: low quality (0 words or low confidence)",
                stage="validation",
            )
            failed.failure_reason = "low_ocr_confidence"
            return failed
    return result
