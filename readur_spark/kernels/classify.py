"""Failure classification and priority buckets.

Reference semantics (yonasBSD/readur):
  - error → failure_reason classifier: src/ocr/queue.rs:1193-1215
  - full failure_reason taxonomy: src/models/document.rs:51-87
  - failure stages: src/models/document.rs:89-103
  - size → priority buckets: src/ingestion/batch_ingest.rs:281-294
"""

from __future__ import annotations

# src/models/document.rs:51-87 — 17-value taxonomy (subset reachable in
# batch extraction; kept verbatim for schema parity)
FAILURE_REASONS = [
    "duplicate_content", "duplicate_filename", "unsupported_format",
    "file_too_large", "file_corrupted", "access_denied",
    "low_ocr_confidence", "ocr_timeout", "ocr_memory_limit",
    "pdf_parsing_error", "storage_quota_exceeded", "network_error",
    "permission_denied", "virus_detected", "invalid_structure",
    "policy_violation", "other",
]

FAILURE_STAGES = ["ingestion", "validation", "ocr", "storage", "processing", "sync"]


def classify_error(error_str: str) -> tuple[str, bool]:
    """src/ocr/queue.rs:1193-1215 — substring rules, first match wins.
    Returns (failure_reason, suppress_noise)."""
    s = error_str
    if "font encoding" in s or "missing unicode map" in s:
        return "pdf_parsing_error", True
    if "corrupted internal structure" in s or "corrupted" in s:
        return "file_corrupted", True
    if "timeout" in s or "timed out" in s:
        return "ocr_timeout", False
    if "memory" in s or "out of memory" in s:
        return "ocr_memory_limit", False
    if "panic" in s:
        return "pdf_parsing_error", True
    if "unsupported" in s:
        return "unsupported_format", False
    if "too large" in s or "file size" in s:
        return "file_too_large", False
    if "No extractable text" in s or "0 words" in s:
        return "low_ocr_confidence", False
    if "validation" in s or "document may have been modified" in s:
        return "other", False
    return "other", False


def calculate_priority(file_size: int) -> int:
    """src/ingestion/batch_ingest.rs:281-294 — size buckets drive
    processing order (replaces the reference's queue priority; we use
    it for repartitionByRange so small docs aren't stuck behind
    stragglers)."""
    MB = 1024 * 1024
    if file_size <= MB:
        return 10
    if file_size <= 5 * MB:
        return 8
    if file_size <= 10 * MB:
        return 6
    if file_size <= 50 * MB:
        return 4
    return 2
