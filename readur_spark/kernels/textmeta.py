"""Text / filename metadata extraction.

Reference semantics (yonasBSD/readur):
  - text metadata (counts, unicode flag, format sniff, English
    heuristic): src/metadata_extraction.rs:139-178
  - filename metadata (lowercased extension): src/metadata_extraction.rs:37-42
"""

from __future__ import annotations

# src/metadata_extraction.rs:168-170
ENGLISH_WORDS = [
    "the", "and", "or", "but", "in", "on", "at", "to", "for", "of", "with", "by",
]


def extract_text_metadata(data: bytes) -> dict:
    """src/metadata_extraction.rs:139-178. Note the reference counts
    *substring* occurrences of the common-English words (not word
    matches) and compares against word_count/20."""
    meta: dict = {}
    try:
        text = data.decode("utf-8")
    except UnicodeDecodeError:
        return meta

    char_count = len(text)
    word_count = len(text.split())
    line_count = len(text.splitlines())
    meta["character_count"] = char_count
    meta["word_count"] = word_count
    meta["line_count"] = line_count

    if any(ord(c) > 127 for c in text):
        meta["contains_unicode"] = True

    lstripped = text.lstrip()
    if lstripped.startswith("<?xml"):
        meta["text_format"] = "xml"
    elif lstripped.startswith("{") or lstripped.startswith("["):
        meta["text_format"] = "json"
    elif "<!DOCTYPE html" in text or "<html" in text:
        meta["text_format"] = "html"

    lowered = text.lower()
    english_count = sum(lowered.count(w) for w in ENGLISH_WORDS)
    if english_count > word_count // 20:
        meta["likely_language"] = "english"
    return meta
