"""HTML main-content extraction (boilerplate stripping).

This branch is the engine's north-star extension for Common-Crawl-style
payloads: the reference (yonasBSD/readur) has no HTML extractor — its
only HTML awareness is the format sniff in
src/metadata_extraction.rs:162-164 and the A1 dispatch rejects
`text/html` (src/ocr/enhanced.rs:1481). The algorithm here follows the
published Readability / Boilerpipe / trafilatura family of text-density
heuristics:

  1. parse the DOM with the stdlib HTMLParser (tolerant of tag soup);
  2. segment into *blocks* at block-level container boundaries;
  3. score each block: word count, link density (chars of text inside
     <a> / total chars), tag-path class (article/main/p boosted,
     nav/header/footer/aside/form killed, li/td damped);
  4. keep blocks above an accept threshold, plus "candidate merging":
     low-scoring blocks sandwiched between accepted neighbours are
     kept (Boilerpipe's block-fusion rule);
  5. emit kept blocks' whitespace-normalized text joined by '\\n'.

Deterministic, pure-Python, no per-row I/O — vectorization happens one
level up (operators.extract runs this over Arrow record batches).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

# subtrees never contributing content
_KILL_TAGS = {
    "script", "style", "noscript", "iframe", "svg", "canvas",
    "form", "button", "select", "option", "textarea",
    "nav", "header", "footer", "aside",
}
# tags that delimit text blocks
_BLOCK_TAGS = {
    "p", "div", "article", "section", "main", "body",
    "h1", "h2", "h3", "h4", "h5", "h6",
    "li", "td", "th", "blockquote", "pre", "figcaption",
    "ul", "ol", "table", "tr",
}
# tag-path scoring (readability-style)
_BOOST_TAGS = {"article", "main", "p", "h1", "h2", "h3", "blockquote", "pre"}
_DAMP_TAGS = {"li", "td", "th", "figcaption"}

# boilerplate-indicating class/id tokens (readability's regex lists)
_NEGATIVE_HINT_RE = re.compile(
    r"comment|meta|footer|footnote|foot|nav|sidebar|sponsor|ad-|"
    r"advert|promo|banner|social|share|related|widget|menu|breadcrumb",
    re.IGNORECASE,
)
_POSITIVE_HINT_RE = re.compile(
    r"article|body|content|entry|hentry|main|page|post|text|blog|story",
    re.IGNORECASE,
)

_WS_RE = re.compile(r"\s+")

# void elements: no closing tag, never pushed on the open-tag stack
_VOID_TAGS = {
    "br", "img", "hr", "meta", "link", "input", "area", "base",
    "col", "embed", "source", "track", "wbr",
}

# acceptance thresholds (pinned by golden tests)
MIN_BLOCK_WORDS = 3
MAX_LINK_DENSITY = 0.333


class _Block:
    __slots__ = ("texts", "link_chars", "total_chars", "tag", "hint", "depth")

    def __init__(self, tag: str, hint: int, depth: int):
        self.texts: list[str] = []
        self.link_chars = 0
        self.total_chars = 0
        self.tag = tag
        self.hint = hint  # -1 negative, 0 neutral, +1 positive class/id hint
        self.depth = depth


class _ContentParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[_Block] = []
        self._kill_depth = 0
        self._anchor_depth = 0
        self._stack: list[str] = []
        self._hint_stack: list[int] = [0]
        self._current: _Block | None = None
        self._in_title = False
        self.title = ""

    # -- helpers
    def _open_block(self, tag: str) -> None:
        self._flush()
        self._current = _Block(tag, self._hint_stack[-1], len(self._stack))

    def _flush(self) -> None:
        b = self._current
        if b is not None and b.total_chars > 0:
            self.blocks.append(b)
        self._current = None

    @staticmethod
    def _hint_of(attrs) -> int:
        joined = " ".join(v for k, v in attrs if k in ("class", "id") and v)
        if not joined:
            return 0
        if _NEGATIVE_HINT_RE.search(joined):
            return -1
        if _POSITIVE_HINT_RE.search(joined):
            return 1
        return 0

    # -- HTMLParser hooks
    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        if tag == "title":
            self._in_title = True
            return
        if tag in _KILL_TAGS:
            self._kill_depth += 1
            self._flush()
            return
        if self._kill_depth:
            return
        hint = self._hint_of(attrs)
        parent_hint = self._hint_stack[-1]
        eff = hint if hint != 0 else parent_hint
        if tag == "a":
            self._anchor_depth += 1
        if tag in _VOID_TAGS:
            return  # no end tag; <br> is a soft break within the block
        if tag in _BLOCK_TAGS:
            self._stack.append(tag)
            self._hint_stack.append(eff)
            self._open_block(tag)
        else:
            self._hint_stack.append(eff)
            self._stack.append(tag)

    def handle_endtag(self, tag):
        tag = tag.lower()
        if tag == "title":
            self._in_title = False
            return
        if tag in _KILL_TAGS:
            if self._kill_depth:
                self._kill_depth -= 1
            return
        if self._kill_depth:
            return
        if tag == "a" and self._anchor_depth:
            self._anchor_depth -= 1
        if self._stack and tag in self._stack:
            # pop up to and including the matching tag (tolerates soup)
            while self._stack:
                t = self._stack.pop()
                if len(self._hint_stack) > 1:
                    self._hint_stack.pop()
                if t == tag:
                    break
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if self._in_title:
            self.title += data
            return
        if self._kill_depth:
            return
        # most inter-tag chunks are pure indentation — cheap C-level
        # strip rejects them before any regex runs
        if not data.strip():
            return
        # exact fast path: an ASCII chunk with no newline/tab/CR and no
        # double space has nothing for \s+ to collapse (non-ASCII
        # whitespace like \xa0 from &nbsp; forces the regex path)
        if (
            data.isascii()
            and "\n" not in data
            and "\t" not in data
            and "\r" not in data
            and "  " not in data
        ):
            stripped = data
        else:
            stripped = _WS_RE.sub(" ", data)
        if self._current is None:
            self._open_block(self._stack[-1] if self._stack else "body")
        b = self._current
        b.texts.append(stripped)
        n = len(stripped.strip())
        b.total_chars += n
        if self._anchor_depth:
            b.link_chars += n


def _block_score(b: _Block) -> float:
    text = "".join(b.texts).strip()
    words = len(text.split())
    if words == 0:
        return 0.0
    link_density = b.link_chars / b.total_chars if b.total_chars else 1.0
    score = float(words)
    if b.tag in _BOOST_TAGS:
        score *= 1.5
    elif b.tag in _DAMP_TAGS:
        score *= 0.7
    if b.hint > 0:
        score *= 1.5
    elif b.hint < 0:
        score *= 0.2
    if link_density > MAX_LINK_DENSITY:
        score *= 0.1
    return score


def extract_main_content(html: str) -> str:
    """Boilerplate-stripped main content, blocks joined with '\\n'.

    Returns '' when no block passes (pure-boilerplate page).
    """
    parser = _ContentParser()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        # tag-soup beyond HTMLParser's tolerance: fall back to tag-strip
        return _WS_RE.sub(" ", re.sub(r"<[^>]*>", " ", html)).strip()
    parser._flush()

    blocks = parser.blocks
    accepted = []
    norm_texts = []  # normalized once, reused by the output loop
    for b in blocks:
        text = _WS_RE.sub(" ", "".join(b.texts)).strip()
        norm_texts.append(text)
        if not text:
            accepted.append(False)
            continue
        words = len(text.split())
        link_density = b.link_chars / b.total_chars if b.total_chars else 1.0
        ok = (
            words >= MIN_BLOCK_WORDS
            and link_density <= MAX_LINK_DENSITY
            and b.hint >= 0
        )
        # boosted containers accept shorter blocks (headings inside
        # article bodies)
        if not ok and b.hint > 0 and words >= 1 and link_density <= MAX_LINK_DENSITY:
            ok = True
        accepted.append(ok)

    # Boilerpipe-style block fusion: a rejected block with accepted
    # neighbours on both sides (same or deeper depth) is re-accepted.
    for i in range(1, len(blocks) - 1):
        if not accepted[i] and accepted[i - 1] and accepted[i + 1]:
            b = blocks[i]
            link_density = b.link_chars / b.total_chars if b.total_chars else 1.0
            if b.hint >= 0 and link_density <= MAX_LINK_DENSITY:
                accepted[i] = True

    out: list[str] = []
    for text, ok in zip(norm_texts, accepted):
        if ok and text:
            out.append(text)
    return "\n".join(out)


def html_document_score(html: str) -> float:
    """Total accepted-content score — used by tests and QC metrics."""
    parser = _ContentParser()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        return 0.0
    parser._flush()
    return sum(_block_score(b) for b in parser.blocks)
