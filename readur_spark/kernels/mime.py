"""Content-first MIME detection.

Reference semantics (yonasBSD/readur):
  - magic-bytes detection + server-type consistency + confidence
    lattice: src/mime_detection.rs:197-241 (types :27-63)
  - extension fallback: src/mime_detection.rs:272-294
  - trusted-server predicate: src/mime_detection.rs:300-308
  - compatibility rules: src/mime_detection.rs:314-332

The reference uses the `infer` crate (magic-byte table) and
`mime_guess` (extension table). We re-implement the subset of
signatures relevant to the corpus plus a text/HTML sniff: the
reference's only HTML awareness is the format sniff in
src/metadata_extraction.rs:162-164 (`<!DOCTYPE html` / `<html`), which
we promote into the detector because the Common-Crawl payload is
HTML-first (SURVEY.md §7 note — extension branch).
"""

from __future__ import annotations

# (magic-prefix, mime) in priority order — mirrors the `infer` crate's
# signature set for the corpus types (plus webp/gif for completeness).
_MAGIC: list[tuple[bytes, str]] = [
    (b"%PDF-", "application/pdf"),
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"II*\x00", "image/tiff"),
    (b"MM\x00*", "image/tiff"),
    (b"BM", "image/bmp"),
    (b"PK\x03\x04", "application/zip"),
    (b"PK\x05\x06", "application/zip"),
    (b"\x1f\x8b", "application/gzip"),
]

_EXT_MIME: dict[str, str] = {
    "pdf": "application/pdf",
    "png": "image/png",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "gif": "image/gif",
    "tif": "image/tiff",
    "tiff": "image/tiff",
    "bmp": "image/bmp",
    "txt": "text/plain",
    "text": "text/plain",
    "md": "text/markdown",
    "html": "text/html",
    "htm": "text/html",
    "xml": "text/xml",
    "json": "application/json",
    "csv": "text/csv",
    "zip": "application/zip",
    "gz": "application/gzip",
}

# src/mime_detection.rs:300-308
_UNTRUSTED_SERVER_TYPES = {
    "application/octet-stream",
    "application/binary",
    "binary/octet-stream",
    "",
    "unknown",
}

FALLBACK_MIME = "application/octet-stream"


def is_trusted_server_mime_type(mime_type: str) -> bool:
    """src/mime_detection.rs:300-308."""
    return mime_type not in _UNTRUSTED_SERVER_TYPES


def are_mime_types_compatible(type1: str, type2: str) -> bool:
    """src/mime_detection.rs:314-332 — exact, known aliases, or same
    primary type."""
    if type1 == type2:
        return True
    aliases = {
        ("image/jpeg", "image/jpg"),
        ("image/jpg", "image/jpeg"),
        ("image/tiff", "image/tif"),
        ("image/tif", "image/tiff"),
        ("text/plain", "text/txt"),
        ("text/txt", "text/plain"),
    }
    if (type1, type2) in aliases:
        return True
    p1, p2 = type1.split("/"), type2.split("/")
    return len(p1) == 2 and len(p2) == 2 and p1[0] == p2[0]


def _sniff_magic(content: bytes) -> str | None:
    # `%PDF-` tolerated after leading junk in the first 1 KB mirrors
    # is_valid_pdf (src/ocr/enhanced.rs:1618-1635); the infer crate is
    # prefix-only, but the extractor itself accepts junk-prefixed PDFs,
    # so the detector must route them to the PDF branch.
    for magic, mime in _MAGIC:
        if content.startswith(magic):
            return mime
    if b"%PDF-" in content[:1024]:
        return "application/pdf"
    return None


def _sniff_text(content: bytes) -> str | None:
    """HTML/text sniff over decoded content (extension branch; HTML
    markers from src/metadata_extraction.rs:162-164)."""
    try:
        head = content[:4096].decode("utf-8")
    except UnicodeDecodeError:
        return None
    lowered = head.lower()
    if "<!doctype html" in lowered or "<html" in lowered:
        return "text/html"
    return "text/plain"


def url_extension(url: str) -> str:
    """Lowercased extension of the url path (A19 —
    src/metadata_extraction.rs:37-42), '' if none."""
    path = url.split("?", 1)[0].split("#", 1)[0]
    name = path.rsplit("/", 1)[-1]
    if "." not in name:
        return ""
    return name.rsplit(".", 1)[-1].lower()


def is_allowed_file_type(filename: str, allowed_types: list[str]) -> bool:
    """A7 — src/services/file_service.rs:204-214: the ingest contract's
    extension gate, applied BEFORE any payload sniffing. Faithful to
    Path::extension semantics: no extension → rejected (False);
    extension lowercased and matched against the allow list."""
    ext = url_extension(filename)
    if not ext:
        return False
    return ext in allowed_types


def detect_from_extension(url: str) -> tuple[str, str, str]:
    """src/mime_detection.rs:272-294 → (mime, confidence, method)."""
    ext = url_extension(url)
    mime = _EXT_MIME.get(ext)
    if mime is not None:
        return mime, "medium", "extension"
    return FALLBACK_MIME, "low", "fallback"


def detect_mime(
    content: bytes, url: str = "", server_mime_type: str | None = None
) -> tuple[str, str, str]:
    """Content-first detection — src/mime_detection.rs:197-241.

    Returns (mime_type, confidence ∈ {low,medium,high,very_high},
    method ∈ {magic_bytes,server_provided,extension,fallback,hybrid}).
    Order: magic bytes (server agreement → very_high/hybrid; mismatch →
    trust the bytes) → trusted server type → extension → fallback.
    The text/HTML sniff extends the magic table for the web corpus.
    """
    if content:
        detected = _sniff_magic(content)
        if detected is None:
            detected = _sniff_text(content)
        if detected is not None:
            if server_mime_type is not None:
                if are_mime_types_compatible(detected, server_mime_type):
                    return detected, "very_high", "hybrid"
                return detected, "high", "magic_bytes"
            return detected, "high", "magic_bytes"

    if server_mime_type is not None and is_trusted_server_mime_type(server_mime_type):
        return server_mime_type, "high", "server_provided"

    return detect_from_extension(url)


def normalize_etag(etag: str) -> str:
    """ETag normalization for source-sync change detection —
    src/webdav_xml_parser.rs:538-560 (and the one-time backfill,
    migrations/20250620100020): trim, strip repeated weak indicators
    (`W/` / `w/`, re-trimming after each), then one level of
    surrounding quotes; a whitespace-only remainder normalizes to ""
    (webdav_xml_parser.rs:562-565 — e.g. '" "' → ''). Change detection
    compares normalized etags so quote/weak-prefix formatting
    differences never force re-downloads."""
    result = etag.strip()
    while result.startswith(("W/", "w/")):
        result = result[2:].strip()
    if result.startswith('"') and result.endswith('"') and len(result) > 1:
        result = result[1:-1]
    if result.strip() == "":
        return ""
    return result


def etag_is_weak(etag: str) -> bool:
    """webdav_xml_parser.rs:601-602."""
    t = etag.strip()
    return t.startswith("W/") or t.startswith("w/")


def compare_etags(a: str, b: str, mode: str = "smart") -> bool:
    """RFC 7232 comparison over normalized values —
    webdav_xml_parser.rs:623-666. weak: normalized equality regardless
    of weak markers; strong: equality AND neither weak; smart (the sync
    path's choice): weak comparison if either side is weak, else
    strong — which reduces to normalized equality in every branch, so
    the engine's join-on-normalized-etag (sync_change_plan) implements
    smart_compare exactly."""
    na, nb = normalize_etag(a), normalize_etag(b)
    if mode == "weak":
        return na == nb
    if mode == "strong":
        return na == nb and not etag_is_weak(a) and not etag_is_weak(b)
    # smart
    if etag_is_weak(a) or etag_is_weak(b):
        return na == nb
    return na == nb and not etag_is_weak(a) and not etag_is_weak(b)
