"""A13 — the ocrmypdf 3-strategy ladder control flow, golden-tested
against fake backends (the sandbox has no ocrmypdf; the reference gates
the same code behind #[cfg(feature="ocr")] — src/ocr/enhanced.rs:980-1119)."""

from __future__ import annotations

import pytest

from readur_spark.kernels import extract as extract_mod
from readur_spark.kernels.ocr_ladder import (
    OCR_STRATEGIES,
    BackendResult,
    OcrLadderError,
    pdf_ocr_ladder,
)


class FakeBackend:
    """Succeeds on the `succeed_on`-th strategy (1-based); never if 0."""

    def __init__(self, succeed_on: int = 1, text: str = "  hello ocr world  "):
        self.succeed_on = succeed_on
        self.text = text
        self.calls: list[list[str]] = []
        self.sidecar_calls = 0

    def available(self) -> bool:
        return True

    def run(self, pdf: bytes, args: list[str], timeout_s: float) -> BackendResult:
        self.calls.append(list(args))
        if len(self.calls) == self.succeed_on:
            return BackendResult(returncode=0, ocr_pdf=b"%PDF-ocr")
        return BackendResult(returncode=2, stderr="tesseract blew up", stdout="")

    def sidecar(self, ocr_pdf: bytes, timeout_s: float) -> str:
        self.sidecar_calls += 1
        assert ocr_pdf == b"%PDF-ocr"
        return self.text


class UnavailableBackend:
    def available(self) -> bool:
        return False

    def run(self, *a, **k):  # pragma: no cover
        raise AssertionError("must not be called")

    def sidecar(self, *a, **k):  # pragma: no cover
        raise AssertionError("must not be called")


def test_strategy1_success_shape():
    b = FakeBackend(succeed_on=1)
    r = pdf_ocr_ladder("u.pdf", b"%PDF-1.4", b)
    # reference arg set for the standard rung (enhanced.rs:1011-1021)
    assert b.calls == [["--force-ocr", "-O2", "--deskew", "--clean",
                        "--language", "eng"]]
    assert r.text == "hello ocr world"  # sidecar text is trimmed (:1103)
    assert r.confidence == 85.0
    assert r.word_count == 3
    assert r.strategy == "standard"
    assert r.strategies_attempted == ["standard"]
    assert r.preprocessing_applied == ["OCR via ocrmypdf"]


def test_degrades_through_all_three_rungs():
    b = FakeBackend(succeed_on=3)
    r = pdf_ocr_ladder("u.pdf", b"%PDF-1.4", b)
    assert [a for _, a in OCR_STRATEGIES] == b.calls
    assert r.strategies_attempted == ["standard", "recovery", "minimal"]
    assert r.strategy == "minimal"
    assert b.sidecar_calls == 1


def test_all_rungs_fail_raises_with_exit_code():
    b = FakeBackend(succeed_on=0)
    with pytest.raises(OcrLadderError) as ei:
        pdf_ocr_ladder("bad.pdf", b"%PDF-1.4", b)
    assert ei.value.kind == "failed"
    assert "Exit code 2" in str(ei.value)
    assert "tesseract blew up" in str(ei.value)
    assert len(b.calls) == 3


def test_unavailable_backend_raises_install_hint():
    with pytest.raises(OcrLadderError) as ei:
        pdf_ocr_ladder("u.pdf", b"%PDF-1.4", UnavailableBackend())
    assert ei.value.kind == "unavailable"
    assert "ocrmypdf is not available" in str(ei.value)
    assert "apt-get install ocrmypdf" in str(ei.value)


def test_timeout_accounting_across_strategies():
    """Each strategy burns 150 s of the 300 s budget: the third rung
    must never start (enhanced.rs:1003-1004 — one timeout wraps the
    whole ladder, not each attempt)."""
    t = {"now": 0.0}

    def clock() -> float:
        return t["now"]

    class SlowBackend(FakeBackend):
        def run(self, pdf, args, timeout_s):
            t["now"] += 150.0
            return super().run(pdf, args, timeout_s)

    b = SlowBackend(succeed_on=0)
    with pytest.raises(OcrLadderError) as ei:
        pdf_ocr_ladder("slow.pdf", b"%PDF-1.4", b, clock=clock)
    assert ei.value.kind == "timeout"
    assert "timed out after 5 minutes" in str(ei.value)
    assert len(b.calls) == 2  # third rung never started


def test_timeout_before_sidecar():
    """The strategy run succeeds but burns the whole budget — the
    sidecar read must not start; the ladder reports a timeout."""
    t = {"now": 0.0}

    class SlowSuccess(FakeBackend):
        def run(self, pdf, args, timeout_s):
            t["now"] += 301.0
            return super().run(pdf, args, timeout_s)

        def sidecar(self, ocr_pdf, timeout_s):  # pragma: no cover
            raise AssertionError("sidecar must not run after budget expiry")

    b = SlowSuccess(succeed_on=1)
    with pytest.raises(OcrLadderError) as ei:
        pdf_ocr_ladder("s.pdf", b"%PDF-1.4", b, clock=lambda: t["now"])
    assert ei.value.kind == "timeout"


# ---- integration with the PDF cascade --------------------------------------

# a header-valid PDF with no text layer and no scrapable bytes
_SCANNED_PDF = b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog >>\nendobj\n%%EOF\n"


def test_pdf_cascade_uses_ladder_when_capable():
    settings = {"ocr_capability": True, "ocr_backend": FakeBackend(succeed_on=2)}
    r = extract_mod.extract_page("https://x.example/scan.pdf", _SCANNED_PDF,
                                 {**_defaults(), **settings})
    assert r.status == "completed"
    assert r.confidence == 85.0
    assert r.extracted_text == "hello ocr world"
    assert r.preprocessing_applied == ["OCR via ocrmypdf"]


def test_pdf_cascade_falls_back_to_scrape_on_ladder_failure():
    """All three rungs fail → the cascade degrades to the byte-scrape
    last resort (conf 50.0), mirroring enhanced.rs:880-918's
    `Err(e) => fall through` arm."""
    settings = {"ocr_capability": True, "ocr_backend": FakeBackend(succeed_on=0)}
    r = extract_mod.extract_page("https://x.example/scan.pdf", _SCANNED_PDF,
                                 {**_defaults(), **settings})
    assert r.status == "completed"
    assert r.confidence == 50.0
    assert r.preprocessing_applied == ["Direct PDF text extraction (last resort)"]


def test_pdf_cascade_skips_ladder_without_capability():
    class MustNotRun(FakeBackend):
        def run(self, *a, **k):  # pragma: no cover
            raise AssertionError("ladder must be capability-gated")

    settings = {"ocr_capability": False, "ocr_backend": MustNotRun()}
    r = extract_mod.extract_page("https://x.example/scan.pdf", _SCANNED_PDF,
                                 {**_defaults(), **settings})
    # ladder skipped (MustNotRun would raise); scrape last-resort runs
    assert r.confidence == 50.0


def _defaults() -> dict:
    from readur_spark.kernels.settings import DEFAULT_SETTINGS

    return dict(DEFAULT_SETTINGS)
