"""Search-snippet generation with highlight offsets.

Reference semantics (yonasBSD/readur):
  - snippet loop: src/db/documents/search.rs:188-258
  - word-boundary finder: src/db/documents/helpers.rs:78-104

Offset convention pin (SURVEY.md §7 hard part 1): the reference mixes
Rust byte offsets (search.rs:207-231 — `find` on a lowercased copy)
with char-index boundary walks (helpers.rs:85-104). We pin *character*
offsets throughout: all (start_offset, end_offset, highlight start/end)
are Python str indices. For ASCII corpora the two coincide; for
non-ASCII the char convention is self-consistent and documented.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from readur_spark.kernels.settings import DEFAULT_SETTINGS

# src/models/settings.rs:327 — the per-user search_snippet_length knob
DEFAULT_SNIPPET_LENGTH = int(DEFAULT_SETTINGS["search_snippet_length"])
MAX_SNIPPETS_PER_TERM = 3  # search.rs:250-252
MAX_SNIPPETS_TOTAL = 5  # search.rs:257


@dataclass
class Snippet:
    text: str
    start_offset: int
    end_offset: int
    highlight_ranges: list[tuple[int, int]] = field(default_factory=list)


def is_word_boundary(c: str) -> bool:
    """helpers.rs:80-82 — whitespace or ASCII punctuation."""
    if c.isspace():
        return True
    o = ord(c)
    return (
        33 <= o <= 47 or 58 <= o <= 64 or 91 <= o <= 96 or 123 <= o <= 126
    )


def find_word_boundary(text: str, position: int, search_forward: bool) -> int:
    """helpers.rs:85-104 — walk from `position` to the nearest boundary
    char; forward returns text length when none, backward returns 0."""
    n = len(text)
    if n == 0:
        return 0
    start_pos = n - 1 if position >= n else position
    if search_forward:
        for i in range(start_pos, n):
            if is_word_boundary(text[i]):
                return i
        return n
    for i in range(start_pos, -1, -1):
        if is_word_boundary(text[i]):
            return i
    return 0


def generate_snippets(
    texts: list[tuple[str, str]],
    search_query: str,
    snippet_length: int = DEFAULT_SNIPPET_LENGTH,
) -> list[Snippet]:
    """search.rs:188-258 — for each (source, text) and each
    whitespace-split term: case-insensitive scan; snippet window
    centred on the match expanded to word boundaries; one highlight
    range per snippet; ≤3 snippets accumulated per term loop, ≤5 total.

    `texts` mirrors the reference's [("content", …), ("ocr_text", …)]
    pair; callers with a single text pass [("content", text)].
    """
    snippets: list[Snippet] = []
    search_terms = search_query.split()

    for _source, text in texts:
        if not text:
            continue
        text_lower = text.lower()
        for term in search_terms:
            term_lower = term.lower()
            start_pos = 0
            while True:
                match_pos = text_lower.find(term_lower, start_pos)
                if match_pos < 0:
                    break
                if match_pos >= snippet_length // 2:
                    snippet_start = find_word_boundary(
                        text, match_pos - snippet_length // 2, False
                    )
                else:
                    snippet_start = 0

                desired_end = snippet_start + snippet_length
                if desired_end < len(text):
                    snippet_end = find_word_boundary(text, desired_end, True)
                else:
                    snippet_end = len(text)

                highlight_start = match_pos - snippet_start
                highlight_end = highlight_start + len(term)

                snippets.append(
                    Snippet(
                        text=text[snippet_start:snippet_end],
                        start_offset=snippet_start,
                        end_offset=snippet_end,
                        highlight_ranges=[(highlight_start, highlight_end)],
                    )
                )

                start_pos = match_pos + len(term)
                # search.rs:250-252 — note: the reference checks the
                # *global* snippet count inside the per-term loop
                if len(snippets) >= MAX_SNIPPETS_PER_TERM:
                    break

    return snippets[:MAX_SNIPPETS_TOTAL]
