"""HTML → Markdown page rendering (structure-preserving extraction).

Where kernels/html_extract.py answers "which text is content?" (the
boilerplate-stripping, plain-text north-star branch), this kernel
answers "what did the content SAY structurally?": headings, lists,
links, emphasis, code, quotes, and tables survive as GitHub-flavored
markdown — the emission format modern webtext corpora keep because
markup structure is training signal, not noise. The reference has no
HTML branch (its HTML awareness ends at the format sniff,
src/metadata_extraction.rs:162-164); like html_extract this is
north-star surface.

Supported structure (everything else contributes bare text):
  - h1..h6 → '#'*n heading blocks
  - p / div / section / article boundaries → paragraph blocks
  - ul/ol + li → '- ' / 'N.' items, 2-space indent per nesting level;
    consecutive items of one list group into a single block
  - a[href] → [text](href); img[src] → ![alt](src)
  - b/strong → **..**, i/em → *..*, code → `..` (outside <pre>)
  - pre → fenced code block, inner whitespace verbatim
  - blockquote → '> ' prefix on every line it contains (nestable)
  - table → GitHub pipe table (kernels/tables.py rendering: first row
    header, cells normalized, pipes escaped); nested structure inside
    cells contributes plain text only
  - script/style/nav/header/footer/aside/form etc. are killed

Whitespace policy, deterministic by construction: inline runs are
whitespace-normalized; blocks join with one blank line; <pre> content
is the only place raw whitespace survives.

Pure Python over the tolerant stdlib HTMLParser — tag soup degrades to
best-effort text, never an exception. Vectorization happens one level
up (mapInPandas over Arrow batches, payload crosses Python once).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from readur_spark.kernels.tables import _to_markdown

_WS_RE = re.compile(r"\s+")

_KILL_TAGS = {
    "script", "style", "noscript", "iframe", "svg", "canvas",
    "button", "select", "option", "textarea", "title",
    "nav", "header", "footer", "aside", "form",
}
_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
# block boundaries that flush pending inline text as a paragraph
_PARA_TAGS = {"p", "div", "section", "article", "main", "body",
              "figcaption", "summary", "details", "dd", "dt"}
_INLINE_MARK = {"b": "**", "strong": "**", "i": "*", "em": "*",
                "code": "`"}


class _MdParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.out: list[tuple[str, int, str]] = []  # (kind, quote_depth, text)
        self._kill = 0
        self._quote = 0
        self._pre = 0
        self._pre_buf: list[str] = []
        self._inline: list[str] = []
        self._heading = 0
        self._lists: list[dict] = []   # {"ordered": bool, "n": int}
        self._links: list[str] = []
        # table state: stack of {"rows", "row", "cell"} (innermost last)
        self._tables: list[dict] = []

    # ---- emit helpers -------------------------------------------------
    def _text(self) -> str:
        s = _WS_RE.sub(" ", "".join(self._inline)).strip()
        self._inline = []
        return s

    def _flush(self, kind: str = "p") -> None:
        s = self._text()
        if not s:
            return
        if self._heading:
            self.out.append(("p", self._quote,
                             "#" * self._heading + " " + s))
        elif self._lists:
            depth = len(self._lists) - 1
            top = self._lists[-1]
            if top["ordered"]:
                top["n"] += 1
                marker = "%d. " % top["n"]
            else:
                marker = "- "
            self.out.append(("li", self._quote,
                             "  " * depth + marker + s))
        else:
            self.out.append((kind, self._quote, s))

    # ---- tag events ---------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _KILL_TAGS:
            self._kill += 1
            return
        if self._kill:
            return
        if self._tables:
            t = self._tables[-1]
            if tag == "table":
                self._tables.append({"rows": [], "row": None, "cell": None})
            elif tag == "tr":
                self._tbl_flush_row(t)
                t["row"] = []
            elif tag in ("td", "th"):
                if t["row"] is None:
                    t["row"] = []
                self._tbl_flush_cell(t)
                t["cell"] = []
            return
        if tag == "pre":
            self._flush()
            self._pre += 1
            return
        if self._pre:
            return
        if tag == "table":
            self._flush()
            self._tables.append({"rows": [], "row": None, "cell": None})
            return
        if tag in _HEADINGS:
            self._flush()
            self._heading = _HEADINGS[tag]
            return
        if tag in ("ul", "ol"):
            self._flush()
            self._lists.append({"ordered": tag == "ol", "n": 0})
            return
        if tag == "li":
            self._flush()
            return
        if tag == "blockquote":
            self._flush()
            self._quote += 1
            return
        if tag in _PARA_TAGS:
            self._flush()
            return
        if tag == "br":
            self._inline.append(" ")
            return
        if tag == "a":
            href = dict(attrs).get("href") or ""
            self._links.append(href)
            self._inline.append("[")
            return
        if tag == "img":
            a = dict(attrs)
            self._inline.append(
                "![%s](%s)" % (a.get("alt", ""), a.get("src", ""))
            )
            return
        mark = _INLINE_MARK.get(tag)
        if mark:
            self._inline.append(mark)

    def handle_endtag(self, tag: str) -> None:
        if tag in _KILL_TAGS:
            self._kill = max(self._kill - 1, 0)
            return
        if self._kill:
            return
        if self._tables:
            t = self._tables[-1]
            if tag in ("td", "th"):
                self._tbl_flush_cell(t)
            elif tag == "tr":
                self._tbl_flush_row(t)
            elif tag == "table":
                self._tbl_flush_row(t)
                done = self._tables.pop()
                rows = [r for r in done["rows"] if any(c for c in r)]
                if rows:
                    self.out.append(("p", self._quote, _to_markdown(rows)))
            return
        if tag == "pre":
            if self._pre:
                self._pre = 0
                body = "".join(self._pre_buf).strip("\n")
                self._pre_buf = []
                if body:
                    self.out.append(("pre", self._quote,
                                     "```\n" + body + "\n```"))
            return
        if self._pre:
            return
        if tag in _HEADINGS:
            self._flush()
            self._heading = 0
            return
        if tag in ("ul", "ol"):
            self._flush()
            if self._lists:
                self._lists.pop()
            return
        if tag == "li":
            self._flush()
            return
        if tag == "blockquote":
            self._flush()
            self._quote = max(self._quote - 1, 0)
            return
        if tag in _PARA_TAGS:
            self._flush()
            return
        if tag == "a":
            href = self._links.pop() if self._links else ""
            self._inline.append("](%s)" % href)
            return
        mark = _INLINE_MARK.get(tag)
        if mark:
            self._inline.append(mark)

    def handle_data(self, data: str) -> None:
        if self._kill:
            return
        if self._tables:
            t = self._tables[-1]
            if t["cell"] is not None:
                t["cell"].append(data)
            return
        if self._pre:
            self._pre_buf.append(data)
            return
        self._inline.append(data)

    # ---- table cell helpers (tables.py semantics, plain text) ---------
    @staticmethod
    def _tbl_flush_cell(t: dict) -> None:
        if t["cell"] is not None:
            t["row"].append(_WS_RE.sub(" ", "".join(t["cell"])).strip())
            t["cell"] = None

    @classmethod
    def _tbl_flush_row(cls, t: dict) -> None:
        cls._tbl_flush_cell(t)
        if t["row"] is not None:
            t["rows"].append(t["row"])
            t["row"] = None


def html_to_markdown(html: str) -> str:
    """Render a page to GitHub-flavored markdown. Blocks join with one
    blank line; consecutive list items of the same run join with single
    newlines; blockquote depth prefixes '> ' per level."""
    p = _MdParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # tag soup beyond HTMLParser's tolerance: keep what parsed
    p._flush()

    blocks: list[str] = []
    i, out = 0, p.out
    while i < len(out):
        kind, q, text = out[i]
        if kind == "li":
            items = [text]
            while i + 1 < len(out) and out[i + 1][0] == "li" \
                    and out[i + 1][1] == q:
                i += 1
                items.append(out[i][2])
            text = "\n".join(items)
        if q:
            text = "\n".join("> " * q + ln for ln in text.split("\n"))
        blocks.append(text)
        i += 1
    return "\n\n".join(blocks)
