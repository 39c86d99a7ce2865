"""HTML table → GitHub-markdown extraction (structure-preserving).

The main-content extractor (kernels/html_extract.py) flattens tables
into damped text blocks — right for boilerplate stripping, wrong for
a training corpus that wants tabular structure kept (table-QA /
table-to-text data keeps the grid). This kernel walks the same
tolerant stdlib HTMLParser and emits each <table> as a pipe table:
first row = header, `---` separator, cells whitespace-normalized with
`|` escaped. The reference has no HTML branch at all (its HTML
awareness ends at the format sniff, src/metadata_extraction.rs:162-164),
so like html_extract this is north-star surface, not parity surface.

Semantics, deterministic by construction:
  - tables are numbered by OPEN order (document order), so a nested
    table gets a larger index than its container;
  - a nested table's text belongs to the nested table only — the
    outer cell sees none of it (each data char lands in exactly one
    cell: the innermost open one);
  - rows are ragged-right-padded to the widest row; a table with no
    rows (or only empty rows) is dropped;
  - colspan/rowspan are ignored (each cell occupies one grid slot) —
    the lossy-but-stable choice every markdown converter makes.

Pure Python, no per-row I/O; vectorization happens one level up
(ml.multimodal-style mapInPandas over Arrow batches).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_WS_RE = re.compile(r"\s+")


class _TableParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.tables: list[tuple[int, list[list[str]]]] = []
        self._stack: list[dict] = []  # innermost last
        self._n_opened = 0

    # -- tag events ----------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "table":
            self._stack.append({"idx": self._n_opened, "rows": [],
                                "row": None, "cell": None,
                                "row_th": False, "th_flags": []})
            self._n_opened += 1
            return
        if not self._stack:
            return
        t = self._stack[-1]
        if tag == "tr":
            self._flush_row(t)
            t["row"] = []
        elif tag in ("td", "th"):
            if t["row"] is None:  # tag soup: cell outside <tr>
                t["row"] = []
            self._flush_cell(t)
            t["cell"] = []
            if tag == "th":
                t["row_th"] = True

    def handle_endtag(self, tag: str) -> None:
        if not self._stack:
            return
        t = self._stack[-1]
        if tag in ("td", "th"):
            self._flush_cell(t)
        elif tag == "tr":
            self._flush_row(t)
        elif tag == "table":
            self._flush_row(t)
            done = self._stack.pop()
            kept = [
                (r, th)
                for r, th in zip(done["rows"], done["th_flags"])
                if any(c for c in r)
            ]
            if kept:
                rows = [r for r, _ in kept]
                flags = [th for _, th in kept]
                self.tables.append((done["idx"], rows, flags))

    def handle_data(self, data: str) -> None:
        if self._stack and self._stack[-1]["cell"] is not None:
            self._stack[-1]["cell"].append(data)

    # -- helpers -------------------------------------------------------
    @staticmethod
    def _flush_cell(t: dict) -> None:
        if t["cell"] is not None:
            t["row"].append(_WS_RE.sub(" ", "".join(t["cell"])).strip())
            t["cell"] = None

    @classmethod
    def _flush_row(cls, t: dict) -> None:
        cls._flush_cell(t)
        if t["row"] is not None:
            t["rows"].append(t["row"])
            t["th_flags"].append(t["row_th"])
            t["row"] = None
            t["row_th"] = False


def _to_markdown(rows: list[list[str]]) -> str:
    ncols = max(len(r) for r in rows)
    grid = [r + [""] * (ncols - len(r)) for r in rows]

    def line(cells: list[str]) -> str:
        return "| " + " | ".join(c.replace("|", "\\|") for c in cells) + " |"

    out = [line(grid[0]), "| " + " | ".join(["---"] * ncols) + " |"]
    out.extend(line(r) for r in grid[1:])
    return "\n".join(out)


def extract_tables_markdown(html: str) -> list[tuple[int, str, int, int]]:
    """[(table_idx, markdown, n_rows, n_cols)] for every non-empty
    <table> in document-open order. table_idx is the open-order number
    among ALL tables (dropped-empty ones still consume an index, so
    indices are stable under content edits elsewhere in the page)."""
    p = _TableParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # tag-soup beyond HTMLParser's tolerance: keep what parsed
    out = []
    for idx, rows, _flags in sorted(p.tables, key=lambda t: t[0]):
        ncols = max(len(r) for r in rows)
        out.append((idx, _to_markdown(rows), len(rows), ncols))
    return out


def extract_tables_relational(
    html: str,
) -> list[tuple[int, int, int, str, str, bool]]:
    """WebTables-style relational tuples: [(table_idx, row_idx,
    col_idx, col_name, value, has_header)] for every DATA cell of
    every non-empty <table>, in document-open order.

    Header detection (the WDC Web Tables recipe's structural tier):
    the first kept row is the header iff it contains a <th> cell; its
    whitespace-normalized cells become `col_name` (falling back to
    `col{i}` for ragged columns the header doesn't cover). Tables
    without a <th> first row emit all rows as data under positional
    `col{i}` names with has_header=False. row_idx counts DATA rows
    only (0-based), so downstream relational consumers never see the
    header as a tuple."""
    p = _TableParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    out = []
    for idx, rows, flags in sorted(p.tables, key=lambda t: t[0]):
        ncols = max(len(r) for r in rows)
        grid = [r + [""] * (ncols - len(r)) for r in rows]
        has_header = bool(flags[0])
        if has_header:
            header = [
                grid[0][c] if grid[0][c] else f"col{c}"
                for c in range(ncols)
            ]
            data = grid[1:]
        else:
            header = [f"col{c}" for c in range(ncols)]
            data = grid
        for r, row in enumerate(data):
            for c in range(ncols):
                out.append((idx, r, c, header[c], row[c], has_header))
    return out
