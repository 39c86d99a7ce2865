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


class TestArgvGoldens:
    """Byte-for-byte subprocess contracts (VERDICT r2 item 7): the
    three ocrmypdf strategy argv lists and the full command lines the
    real backend would exec, pinned against src/ocr/enhanced.rs:1009-
    1051 so the contract can't drift while the binary is absent."""

    # enhanced.rs:1011-1021 / :1026-1037 / :1042-1051, argument order
    # exactly as .arg() chains them
    GOLDEN = [
        ("standard",
         ["--force-ocr", "-O2", "--deskew", "--clean", "--language", "eng"]),
        ("recovery",
         ["--force-ocr", "--fix-metadata", "--remove-background", "-O1",
          "--language", "eng"]),
        ("minimal", ["--force-ocr", "--skip-big", "--language", "eng"]),
    ]

    def test_strategy_table_is_byte_identical(self):
        from readur_spark.kernels.ocr_ladder import OCR_STRATEGIES

        assert OCR_STRATEGIES == self.GOLDEN

    def test_backend_command_lines(self, monkeypatch):
        """The real backend execs `ocrmypdf <strategy args> <in> <out>`
        — positional paths LAST, mirroring the .arg(&file_path)
        .arg(&temp_ocr_path) tail of every strategy."""
        import subprocess

        from readur_spark.kernels import ocr_ladder as mod

        captured = []

        class P:
            returncode = 1
            stderr = b""
            stdout = b""

        def fake_run(cmd, **kw):
            captured.append(list(cmd))
            return P()

        monkeypatch.setattr(subprocess, "run", fake_run)
        backend = mod.OcrmypdfBackend()
        for name, args in self.GOLDEN:
            backend.run(b"%PDF-1.4", args, timeout_s=10)
        assert len(captured) == 3
        for (name, args), cmd in zip(self.GOLDEN, captured):
            assert cmd[0] == "ocrmypdf"
            assert cmd[1:-2] == args, (name, cmd)
            assert cmd[-2].endswith("in.pdf") and cmd[-1].endswith("out.pdf")

    def test_ladder_attempts_argv_in_degradation_order(self):
        """Driving the ladder records the strategies in the reference's
        order with the exact argv each rung passes the backend."""
        from readur_spark.kernels.ocr_ladder import pdf_ocr_ladder

        seen = []

        class Recorder:
            def available(self):
                return True

            def run(self, pdf, args, timeout_s):
                from readur_spark.kernels.ocr_ladder import BackendResult

                seen.append(list(args))
                # fail the first two rungs, succeed on the third
                ok = len(seen) == 3
                return BackendResult(
                    returncode=0 if ok else 1, ocr_pdf=pdf if ok else None
                )

            def sidecar(self, ocr_pdf, timeout_s):
                return "text"

        res = pdf_ocr_ladder("u.pdf", b"%PDF", Recorder())
        assert seen == [args for _, args in self.GOLDEN]
        assert res.strategies_attempted == ["standard", "recovery", "minimal"]

    def test_tesseract_config_string_golden(self):
        """A20's invocation config: '--psm {0..13} --oem {0..3}' with
        PsmAuto/Default fallbacks and primary-first language combo
        (enhanced.rs:275-318, :246-271)."""
        from readur_spark.kernels.ocr_config import resolve_tesseract_config

        cfg = resolve_tesseract_config(
            {
                "preferred_languages": ["deu", "eng"],
                "primary_language": "eng",
                "ocr_page_segmentation_mode": 6,
                "ocr_engine_mode": 1,
            }
        )
        assert ("--psm %d --oem %d" % (cfg["psm"], cfg["oem"])) == "--psm 6 --oem 1"
        assert cfg["lang"] == "eng+deu"
        # fallbacks: out-of-range → PsmAuto(3) / Default(3)
        cfg = resolve_tesseract_config(
            {"ocr_page_segmentation_mode": 99, "ocr_engine_mode": -1}
        )
        assert ("--psm %d --oem %d" % (cfg["psm"], cfg["oem"])) == "--psm 3 --oem 3"
