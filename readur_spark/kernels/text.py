"""Plain-text extraction, word counting, quality gates.

Reference semantics (yonasBSD/readur):
  - plain-text path incl. size gates + truncation suffix:
    src/ocr/enhanced.rs:1441-1480
  - word counting incl. sampling + camelCase fallback:
    src/ocr/enhanced.rs:1487-1558
  - PDF extraction-quality gate: src/ocr/enhanced.rs:923-976
  - OCR quality validation: src/ocr/enhanced.rs:1562-1597

Byte/char conventions (SURVEY.md §7 "hard parts" pin): the reference's
Rust `str.len()` is a UTF-8 *byte* length while `chars().count()` is a
character count. Wherever the reference uses `.len()` we measure UTF-8
bytes; wherever it iterates `chars()` we iterate Python characters.
Rust `char::is_alphanumeric` = Unicode Alphabetic ∪ Numeric, mapped to
Python `c.isalpha() or c.isnumeric()`.
"""

from __future__ import annotations

# src/ocr/enhanced.rs:1449 — 50 MB text file cap
MAX_TEXT_FILE_SIZE = 50 * 1024 * 1024
# src/ocr/enhanced.rs:1461 — 10 MB in-memory text cap
MAX_TEXT_CONTENT_SIZE = 10 * 1024 * 1024
# src/ocr/enhanced.rs:1464
TRUNCATION_SUFFIX = "... [TEXT TRUNCATED DUE TO SIZE]"


class ExtractError(Exception):
    """Carries the reference's error-message strings so the failure
    classifier (kernels.classify) sees the same substrings."""


def is_alnum_char(c: str) -> bool:
    """Rust char::is_alphanumeric (Alphabetic ∪ Numeric)."""
    return c.isalpha() or c.isnumeric()


# C-speed counting: str.translate deletes at native speed. ASCII alnum
# ([A-Za-z0-9]: exactly the ASCII chars where isalpha()/isnumeric() is
# true) is counted by length difference; only the (rare) non-ASCII
# residue is checked per-char. Was 54% of HTML-path CPU as a genexpr.
_DEL_ASCII_ALNUM = {c: None for c in range(128) if chr(c).isalpha() or chr(c).isnumeric()}
_DEL_ALL_ASCII = {c: None for c in range(128)}


def count_alnum_chars(text: str) -> int:
    stripped = text.translate(_DEL_ASCII_ALNUM)
    n = len(text) - len(stripped)
    rest = stripped.translate(_DEL_ALL_ASCII)  # non-ASCII chars only
    if rest:
        n += sum(1 for c in rest if c.isalpha() or c.isnumeric())
    return n


def utf8_len(text: str) -> int:
    return len(text.encode("utf-8", errors="surrogatepass"))


def read_plain_text(data: bytes, settings: dict | None = None) -> str:
    """text/plain branch of the MIME dispatch — src/ocr/enhanced.rs:1441-1469.

    Size gate (max_file_size_mb, default 50 MB — the reference's
    upload gate, src/config.rs:323 + routes/documents/crud.rs:167) →
    UTF-8 decode → 10 MB content truncation with suffix, else trim.
    Raises ExtractError with the reference's message shapes so
    classify_error() maps identically.
    """
    file_size = len(data)
    max_size = MAX_TEXT_FILE_SIZE
    if settings is not None and settings.get("max_file_size_mb"):
        max_size = int(settings["max_file_size_mb"]) * 1024 * 1024
    if file_size > max_size:
        # message shape from enhanced.rs:1451-1455 ("file too large" →
        # classify → file_too_large)
        raise ExtractError(
            "Text file too large: %.1f MB (max: %.1f MB). Consider splitting the file."
            % (file_size / (1024.0 * 1024.0), max_size / (1024.0 * 1024.0))
        )
    try:
        text = data.decode("utf-8")
    except UnicodeDecodeError:
        # tokio::fs::read_to_string errors on invalid UTF-8
        raise ExtractError("stream did not contain valid UTF-8")
    # enhanced.rs:1462-1467: `text.len()` is the UTF-8 byte length; the
    # truncation slice is a byte slice.
    if len(data) > MAX_TEXT_CONTENT_SIZE:
        head = data[:MAX_TEXT_CONTENT_SIZE].decode("utf-8", errors="ignore")
        return head + TRUNCATION_SUFFIX
    return text.strip()


def count_words_in_text(text: str) -> int:
    """src/ocr/enhanced.rs:1505-1558 — whitespace split with a
    continuous-text fallback (camelCase / letter↔digit transitions,
    else ⌈alnum/5⌉-ish)."""
    whitespace_words = len(text.split())

    # enhanced.rs:1510-1512: `text.len() > 15` is a byte length
    is_continuous_text = whitespace_words == 1 and utf8_len(text) > 15
    is_no_words = whitespace_words == 0 and text.strip() != ""

    if not (is_continuous_text or is_no_words):
        return whitespace_words

    alphanumeric_chars = count_alnum_chars(text)
    if alphanumeric_chars == 0:
        return 0

    camel_transitions = 0
    prev = None
    for curr in text:
        if prev is not None:
            if prev.islower() and curr.isupper():
                camel_transitions += 1
            elif (prev.isalpha() and curr.isnumeric()) or (
                prev.isnumeric() and curr.isalpha()
            ):
                camel_transitions += 1
        prev = curr

    if camel_transitions > 0:
        return camel_transitions + 1
    return max(alphanumeric_chars // 5, 1)


def count_words_safely(text: str) -> int:
    """src/ocr/enhanced.rs:1487-1502 — >1 MB (bytes): count on the
    first 100 KB (bytes) and extrapolate, cap 10 M."""
    data = text.encode("utf-8", errors="surrogatepass")
    if len(data) > 1_000_000:
        sample_size = 100_000
        sample = data[: min(sample_size, len(data))].decode("utf-8", errors="ignore")
        sample_words = count_words_in_text(sample)
        estimated_total = int(sample_words * (len(data) / sample_size))
        return min(estimated_total, 10_000_000)
    return count_words_in_text(text)


def is_text_extraction_quality_sufficient(
    text: str, word_count: int, file_size: int
) -> bool:
    """PDF quick-extraction quality gate — src/ocr/enhanced.rs:923-976.

    0 words → fail; <50 KB & ≥1 word → pass; ≥50 words → pass;
    density <5 words/KB & <10 words → fail; alnum ratio <30% (alnum
    chars / utf-8 bytes) → fail.
    """
    if word_count == 0:
        return False
    if file_size < 50_000 and word_count >= 1:
        return True

    file_size_kb = file_size / 1024.0
    word_density = word_count / file_size_kb if file_size_kb else 0.0

    MIN_WORD_DENSITY = 5.0
    MIN_WORDS_FOR_LARGE_FILES = 10
    SUBSTANTIAL_WORD_COUNT = 50

    if word_count >= SUBSTANTIAL_WORD_COUNT:
        return True
    if word_density < MIN_WORD_DENSITY and word_count < MIN_WORDS_FOR_LARGE_FILES:
        return False

    nbytes = utf8_len(text)
    alnum_ratio = (count_alnum_chars(text) / nbytes) if nbytes > 0 else 0.0
    if alnum_ratio < 0.3:
        return False
    return True


def validate_ocr_quality(
    text: str, confidence: float, word_count: int, min_confidence: float = 30.0
) -> bool:
    """src/ocr/enhanced.rs:1562-1597 — confidence ≥ threshold,
    word_count > 0, alnum ratio (alnum chars / utf-8 bytes) ≥ 30%."""
    if confidence < min_confidence:
        return False
    if word_count == 0:
        return False
    total_bytes = utf8_len(text)
    if total_bytes == 0:
        return False
    ratio = count_alnum_chars(text) / total_bytes
    if ratio < 0.3:
        return False
    return True
