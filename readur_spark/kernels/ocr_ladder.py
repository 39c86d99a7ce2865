"""A13 — the PDF full-OCR ladder (ocrmypdf 3-strategy fallback).

Reference semantics (yonasBSD/readur, src/ocr/enhanced.rs:980-1119):
  - availability probe; absence → the install-hint error (:984-992)
  - 300 s timeout covering the WHOLE strategy ladder (:1003-1004);
    expiry → "ocrmypdf timed out after 5 minutes for file '…'" (:1061)
  - strategy 1 "standard": --force-ocr -O2 --deskew --clean
    --language eng (:1011-1021)
  - strategy 2 "recovery": --force-ocr --fix-metadata
    --remove-background -O1 --language eng (:1026-1037)
  - strategy 3 "minimal": --force-ocr --skip-big --language eng
    (:1042-1051)
  - final failure → "ocrmypdf failed for '…': Exit code N…" with
    stderr/stdout (:1066-1072)
  - success → sidecar text extraction from the OCR'd PDF (:1076-1103),
    trimmed; confidence 85.0; word count via count_words_safely;
    preprocessing_applied = ["OCR via ocrmypdf"] (:1107-1117)

The container ships no ocrmypdf, so the *backend* is pluggable: the
control flow (strategy order, timeout accounting, degradation, error
classification) is real and golden-tested against a fake backend; a
real deployment passes OcrmypdfBackend (subprocess) and nothing else
changes. This mirrors the reference's own `#[cfg(feature="ocr")]`
split — the ladder logic is identical whether or not the binary
exists.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Protocol

OCR_TIMEOUT_SECS = 300.0  # enhanced.rs:1004
OCR_CONFIDENCE = 85.0  # enhanced.rs:1113

# (name, ocrmypdf args) in degradation order — enhanced.rs:1011-1051
OCR_STRATEGIES: list[tuple[str, list[str]]] = [
    (
        "standard",
        ["--force-ocr", "-O2", "--deskew", "--clean", "--language", "eng"],
    ),
    (
        "recovery",
        [
            "--force-ocr", "--fix-metadata", "--remove-background", "-O1",
            "--language", "eng",
        ],
    ),
    ("minimal", ["--force-ocr", "--skip-big", "--language", "eng"]),
]


@dataclass
class BackendResult:
    returncode: int
    ocr_pdf: bytes | None = None
    stderr: str = ""
    stdout: str = ""

    @property
    def success(self) -> bool:
        return self.returncode == 0 and self.ocr_pdf is not None


class OcrBackend(Protocol):
    """What a ladder backend must provide. `run` performs one ocrmypdf
    invocation (input PDF bytes + strategy args → OCR'd PDF bytes);
    `sidecar` extracts the text layer from the OCR'd PDF (the
    --sidecar call, enhanced.rs:1082-1092)."""

    def available(self) -> bool: ...

    def run(self, pdf: bytes, args: list[str], timeout_s: float) -> BackendResult: ...

    def sidecar(self, ocr_pdf: bytes, timeout_s: float) -> str: ...


class OcrLadderError(RuntimeError):
    def __init__(self, message: str, kind: str):
        super().__init__(message)
        self.kind = kind  # 'unavailable' | 'timeout' | 'failed'


@dataclass
class OcrLadderResult:
    text: str
    confidence: float
    word_count: int
    strategy: str  # which rung succeeded
    strategies_attempted: list[str]
    processing_time_ms: int
    preprocessing_applied: list[str] = field(
        default_factory=lambda: ["OCR via ocrmypdf"]
    )


def pdf_ocr_ladder(
    url: str,
    pdf: bytes,
    backend: OcrBackend,
    timeout_secs: float = OCR_TIMEOUT_SECS,
    clock: Callable[[], float] = time.monotonic,
) -> OcrLadderResult:
    """Run the 3-strategy ladder. Raises OcrLadderError with the
    reference's message shapes on unavailability / timeout / final
    failure; returns the sidecar text on the first succeeding rung."""
    if not backend.available():
        raise OcrLadderError(
            "ocrmypdf is not available on this system. To extract text from "
            "image-based PDFs like '%s', please install ocrmypdf. "
            "On Ubuntu/Debian: 'apt-get install ocrmypdf'. "
            "On macOS: 'brew install ocrmypdf'. "
            "Alternatively, convert the PDF to images and upload those instead."
            % url,
            kind="unavailable",
        )

    start = clock()
    attempted: list[str] = []
    last: BackendResult | None = None
    for name, args in OCR_STRATEGIES:
        remaining = timeout_secs - (clock() - start)
        if remaining <= 0:
            raise OcrLadderError(
                "ocrmypdf timed out after 5 minutes for file '%s'" % url,
                kind="timeout",
            )
        attempted.append(name)
        last = backend.run(pdf, args, timeout_s=remaining)
        if last.success:
            break
    else:
        stderr = last.stderr if last else ""
        stdout = last.stdout if last else ""
        code = last.returncode if last else -1
        raise OcrLadderError(
            "ocrmypdf failed for '%s': Exit code %d\nStderr: %s\nStdout: %s"
            % (url, code, stderr, stdout),
            kind="failed",
        )

    remaining = timeout_secs - (clock() - start)
    if remaining <= 0:
        raise OcrLadderError(
            "ocrmypdf timed out after 5 minutes for file '%s'" % url,
            kind="timeout",
        )
    text = backend.sidecar(last.ocr_pdf or b"", timeout_s=remaining).strip()

    from readur_spark.kernels.text import count_words_safely

    elapsed_ms = int((clock() - start) * 1000)
    return OcrLadderResult(
        text=text,
        confidence=OCR_CONFIDENCE,
        word_count=count_words_safely(text),
        strategy=attempted[-1],
        strategies_attempted=attempted,
        processing_time_ms=elapsed_ms,
    )


class StubOcrBackend:
    """Deterministic FAKE backend for environments without ocrmypdf
    (this sandbox): succeeds on the first rung and returns a clearly-
    marked stub text derived from the payload hash. NOT real OCR — it
    exists so the ladder's control flow and the OCR branch of corpus
    rollups stay exercised end-to-end (mirroring the multimodal decode
    stub policy, SURVEY.md §2); swap in OcrmypdfBackend on an image
    with the binary installed."""

    def available(self) -> bool:
        return True

    def run(self, pdf: bytes, args: list[str], timeout_s: float) -> BackendResult:
        return BackendResult(returncode=0, ocr_pdf=pdf)

    def sidecar(self, ocr_pdf: bytes, timeout_s: float) -> str:
        import hashlib

        digest = hashlib.sha256(ocr_pdf).hexdigest()[:16]
        return "ocr stub text %s" % digest


class OcrmypdfBackend:
    """Real subprocess backend (used when ocrmypdf exists on the
    executor image). Never exercised in this sandbox; the ladder above
    is the tested surface."""

    def available(self) -> bool:
        import shutil

        return shutil.which("ocrmypdf") is not None

    def run(self, pdf: bytes, args: list[str], timeout_s: float) -> BackendResult:
        import os
        import subprocess
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            src = os.path.join(td, "in.pdf")
            dst = os.path.join(td, "out.pdf")
            with open(src, "wb") as f:
                f.write(pdf)
            try:
                proc = subprocess.run(
                    ["ocrmypdf", *args, src, dst],
                    capture_output=True, timeout=timeout_s,
                )
            except subprocess.TimeoutExpired:
                return BackendResult(returncode=-9, stderr="timeout")
            out = None
            if proc.returncode == 0 and os.path.exists(dst):
                with open(dst, "rb") as f:
                    out = f.read()
            return BackendResult(
                returncode=proc.returncode,
                ocr_pdf=out,
                stderr=proc.stderr.decode("utf-8", "replace"),
                stdout=proc.stdout.decode("utf-8", "replace"),
            )

    def sidecar(self, ocr_pdf: bytes, timeout_s: float) -> str:
        import os
        import subprocess
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            src = os.path.join(td, "ocr.pdf")
            txt = os.path.join(td, "ocr.txt")
            with open(src, "wb") as f:
                f.write(ocr_pdf)
            proc = subprocess.run(
                ["ocrmypdf", "--sidecar", txt, src, "-"],
                capture_output=True, timeout=timeout_s,
            )
            if proc.returncode != 0 or not os.path.exists(txt):
                raise OcrLadderError(
                    "ocrmypdf text extraction failed: %s"
                    % proc.stderr.decode("utf-8", "replace"),
                    kind="failed",
                )
            with open(txt, "r") as f:
                return f.read()
