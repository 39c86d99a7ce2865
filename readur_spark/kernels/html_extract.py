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
    __slots__ = (
        "texts", "link_chars", "total_chars", "tag", "hint", "depth",
        "src_start", "src_end",
    )

    def __init__(self, tag: str, hint: int, depth: int):
        self.texts: list[str] = []
        self.link_chars = 0
        self.total_chars = 0
        self.tag = tag
        self.hint = hint  # -1 negative, 0 neutral, +1 positive class/id hint
        self.depth = depth
        # source char range [src_start, src_end) spanning the block's
        # first through last contributing data chunk — only the fast
        # tokenizer supplies positions (stdlib path leaves -1); the
        # north rule's span-offset contract rides on these
        self.src_start = -1
        self.src_end = -1


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
        # source coords of the data chunk about to be delivered —
        # written by _fast_feed before each handle_data call; None on
        # the stdlib path (spans then stay -1)
        self._src_pos: int | None = None
        self._src_end = 0

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
        if not attrs:  # the common case — _fast_attrs bails to []
            return 0
        joined = " ".join(v for k, v in attrs if k in ("class", "id") and v)
        if not joined:
            return 0
        if _NEGATIVE_HINT_RE.search(joined):
            return -1
        if _POSITIVE_HINT_RE.search(joined):
            return 1
        return 0

    # -- HTMLParser hooks
    # NOTE: no tag.lower() here — both feeders already deliver
    # lowercase tag names (html.parser lowercases by spec;
    # _fast_feed lowercases before dispatch). Pinned by the
    # uppercase-tags hostile golden.
    def handle_starttag(self, tag, attrs):
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
        if self._src_pos is not None:
            if b.src_start < 0:
                b.src_start = self._src_pos
            b.src_end = self._src_end


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


# ---- fast tokenizer --------------------------------------------------------
#
# html.parser's goahead/updatepos machinery was ~70% of HTML-path CPU
# after the other hot spots were fixed. This tokenizer drives the SAME
# _ContentParser handlers with one compiled regex sweep; equivalence
# with the stdlib path is pinned by tests over the synthetic corpus
# (byte-identical extract_main_content output) and hypothesis fuzzing
# keeps it total. `use_fast_tokenizer=False` selects the stdlib path.

_TOKEN_RE = re.compile(
    r"<!--.*?(?:-->|$)"                       # comments (unterminated: to EOF)
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"             # CDATA
    r"|<[!?][^>]*>?"                          # doctype / processing instr.
    r"|<\s*(/?)\s*([a-zA-Z][a-zA-Z0-9:._-]*)"  # 1: close-slash, 2: tag name
    r"((?:[^>\"']|\"[^\"]*\"|'[^']*')*)"      # 3: attribute blob
    r">?",
    re.DOTALL,
)

_ATTR_HINT_RE = re.compile(
    r"""\b(class|id)\s*=\s*("([^"]*)"|'([^']*)'|([^\s"'>]+))""", re.IGNORECASE
)

# raw-text elements: content runs to the matching close tag verbatim
_RAWTEXT = {"script", "style", "textarea", "title"}


def _fast_attrs(blob: str) -> list[tuple[str, str]]:
    """Only class/id reach _hint_of — parse just those (the stdlib
    parser hands over every attribute, but the handlers ignore the
    rest)."""
    if not blob:
        return []
    b = blob.lower()  # case-insensitive bail, matching _ATTR_HINT_RE
    if "class" not in b and "id" not in b:
        return []
    out = []
    for m in _ATTR_HINT_RE.finditer(blob):
        val = m.group(3) or m.group(4) or m.group(5) or ""
        out.append((m.group(1).lower(), val))
    return out


def _fast_feed(parser: "_ContentParser", html: str) -> None:
    import html as html_mod

    pos, n = 0, len(html)
    unescape = html_mod.unescape
    while pos < n:
        lt = html.find("<", pos)
        if lt < 0:
            data = html[pos:]
            if data:
                parser._src_pos, parser._src_end = pos, n
                parser.handle_data(unescape(data) if "&" in data else data)
            break
        if lt > pos:
            data = html[pos:lt]
            parser._src_pos, parser._src_end = pos, lt
            parser.handle_data(unescape(data) if "&" in data else data)
        m = _TOKEN_RE.match(html, lt)
        if m is None:
            # stray '<' is data (parser is tolerant)
            parser._src_pos, parser._src_end = lt, lt + 1
            parser.handle_data("<")
            pos = lt + 1
            continue
        tag = m.group(2)
        if tag:
            tag_l = tag.lower()
            if m.group(1):  # close tag
                parser.handle_endtag(tag_l)
            else:
                parser.handle_starttag(tag_l, _fast_attrs(m.group(3) or ""))
                is_self_closing = (m.group(3) or "").rstrip().endswith("/")
                if tag_l in _RAWTEXT and not is_self_closing:
                    # verbatim until the matching close tag
                    close = re.compile(
                        r"<\s*/\s*%s[^>]*>" % re.escape(tag_l), re.IGNORECASE
                    )
                    cm = close.search(html, m.end())
                    raw_end = cm.start() if cm else n
                    raw = html[m.end():raw_end]
                    if raw:
                        parser._src_pos, parser._src_end = m.end(), raw_end
                        parser.handle_data(
                            unescape(raw) if "&" in raw else raw
                        )
                    parser.handle_endtag(tag_l)
                    pos = cm.end() if cm else n
                    continue
        pos = m.end()


def _parse_and_select(html: str, use_fast_tokenizer: bool):
    """Shared parse + block-selection pass. Returns (blocks,
    norm_texts, accepted), or None when tag soup defeats the tokenizer
    (callers take the tag-strip fallback). Behavior-identical to the
    historical extract_main_content body — pinned by the frozen
    goldens."""
    parser = _ContentParser()
    try:
        if use_fast_tokenizer:
            _fast_feed(parser, html)
        else:
            parser.feed(html)
            parser.close()
    except Exception:
        return None
    parser._flush()

    blocks = parser.blocks
    accepted = []
    norm_texts = []  # normalized once, reused by the output loop
    for b in blocks:
        joined = "".join(b.texts)
        # same exact fast path as handle_data: nothing to collapse →
        # skip the regex (most blocks are a single normalized chunk)
        if (
            joined.isascii()
            and "\n" not in joined
            and "\t" not in joined
            and "\r" not in joined
            and "  " not in joined
        ):
            text = joined.strip()
        else:
            text = _WS_RE.sub(" ", joined).strip()
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
    return blocks, norm_texts, accepted


def extract_main_content(html: str, use_fast_tokenizer: bool = True) -> str:
    """Boilerplate-stripped main content, blocks joined with '\\n'.

    Returns '' when no block passes (pure-boilerplate page).
    """
    sel = _parse_and_select(html, use_fast_tokenizer)
    if sel is None:
        # tag-soup beyond the tokenizer's tolerance: fall back to tag-strip
        return _WS_RE.sub(" ", re.sub(r"<[^>]*>", " ", html)).strip()
    blocks, norm_texts, accepted = sel
    out: list[str] = []
    for text, ok in zip(norm_texts, accepted):
        if ok and text:
            out.append(text)
    return "\n".join(out)


def extract_main_content_spans(
    html: str,
) -> list[tuple[int, int, str]]:
    """Kept blocks WITH their source spans: (src_start, src_end,
    normalized_text) per emitted block, in emission order — src ranges
    are char offsets into the decoded html string covering the block's
    first through last contributing data chunk (markup between chunks
    included; that is the block's source extent, the span the north
    rule's fixtures pin). Join of the text fields == extract_main_
    content(html) by construction. Tag-soup fallback (and the stdlib
    tokenizer, which supplies no positions) yields spans of (-1, -1)
    over the whole stripped text."""
    sel = _parse_and_select(html, use_fast_tokenizer=True)
    if sel is None:
        txt = _WS_RE.sub(" ", re.sub(r"<[^>]*>", " ", html)).strip()
        return [(-1, -1, txt)] if txt else []
    blocks, norm_texts, accepted = sel
    return [
        (b.src_start, b.src_end, text)
        for b, text, ok in zip(blocks, norm_texts, accepted)
        if ok and text
    ]


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
