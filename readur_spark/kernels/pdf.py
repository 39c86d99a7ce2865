"""PDF extraction kernels.

Reference semantics (yonasBSD/readur):
  - cascade quick→OCR→byte-scrape with confidences 95/85/50:
    src/ocr/enhanced.rs:816-919
  - quick text layer via `pdftotext -layout`, >5-word acceptance gate:
    src/ocr/enhanced.rs:1123-1260
  - byte-scrape last resort (BT/ET strings + printable-ASCII runs):
    src/ocr/enhanced.rs:1265-1366
  - header validation (%PDF- in first 1 KB): src/ocr/enhanced.rs:1618-1635
  - metadata scan: src/metadata_extraction.rs:84-136
  - 100 MB size cap: src/ocr/enhanced.rs:824-832

The reference shells out to poppler's pdftotext; this engine performs
the text-layer parse in-process (no subprocess on executors): object
streams are located, FlateDecode streams inflated with zlib, and
BT..ET text objects interpreted (Tj / TJ / ' / " show operators, Td /
TD / T* line moves). The parse is deterministic and is pinned by golden
tests; it is NOT a full PDF interpreter (no encryption, no CID fonts'
ToUnicode remapping) — such documents fall through the quality gate to
the byte-scrape path exactly like image-based PDFs do in the reference.
"""

from __future__ import annotations

import re
import zlib

MAX_PDF_SIZE = 100 * 1024 * 1024  # src/ocr/enhanced.rs:825


def is_valid_pdf(data: bytes) -> bool:
    """src/ocr/enhanced.rs:1618-1635 — find b"%PDF-" anywhere in the
    first 1 KB (tolerates leading junk bytes)."""
    if len(data) < 5:
        return False
    return b"%PDF-" in data[: min(len(data), 1024)]


# --- text-layer parse (the pdftotext replacement) -----------------------

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)(?:\r?\n)?endstream", re.DOTALL)
# dict immediately before `stream`
_DICT_BEFORE_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.DOTALL)

_ESCAPES = {
    ord("n"): "\n",
    ord("r"): "\r",
    ord("t"): "\t",
    ord("b"): "\b",
    ord("f"): "\f",
    ord("("): "(",
    ord(")"): ")",
    ord("\\"): "\\",
}


def _decode_pdf_string(raw: bytes) -> str:
    """PDF literal-string unescape: \\n \\r \\t \\b \\f \\( \\) \\\\,
    octal \\ddd, line continuations."""
    out: list[str] = []
    i, n = 0, len(raw)
    while i < n:
        b = raw[i]
        if b != 0x5C:  # backslash
            out.append(chr(b))
            i += 1
            continue
        i += 1
        if i >= n:
            break
        c = raw[i]
        if c in _ESCAPES:
            out.append(_ESCAPES[c])
            i += 1
        elif 0x30 <= c <= 0x37:  # octal, up to 3 digits
            j = i
            while j < n and j < i + 3 and 0x30 <= raw[j] <= 0x37:
                j += 1
            out.append(chr(int(raw[i:j], 8) & 0xFF))
            i = j
        elif c in (0x0A, 0x0D):  # line continuation
            i += 1
            if c == 0x0D and i < n and raw[i] == 0x0A:
                i += 1
        else:
            out.append(chr(c))
            i += 1
    return "".join(out)


def _iter_content_streams(data: bytes):
    """Yield candidate content streams, inflating FlateDecode ones."""
    pos = 0
    while True:
        m = _STREAM_RE.search(data, pos)
        if m is None:
            return
        body = m.group(1)
        # find the dict that precedes this `stream` keyword
        dict_m = None
        for dm in _DICT_BEFORE_STREAM_RE.finditer(data, max(0, m.start() - 2048), m.start() + 7):
            dict_m = dm
        flate = dict_m is not None and b"/FlateDecode" in dict_m.group(1)
        if flate:
            try:
                body = zlib.decompress(body)
            except zlib.error:
                pos = m.end()
                continue
        yield body
        pos = m.end()


_TOKEN_RE = re.compile(
    rb"\((?:[^()\\]|\\.)*\)"  # literal string
    rb"|<[0-9A-Fa-f\s]*>"  # hex string
    rb"|\[|\]"
    rb"|[-+]?\d*\.?\d+"  # number
    rb"|/[^\s/\[\]()<>{}%]*"  # name
    rb"|[A-Za-z'\"*]+"  # operator
)


def _extract_text_objects(content: bytes) -> list[str]:
    """Interpret BT..ET spans: collect shown strings (Tj / TJ / ' / ");
    Td / TD / T* / ' / " start a new line. TJ array elements are
    concatenated (kerning numbers ignored) — sufficient for layout-free
    documents; pinned by golden tests."""
    lines: list[str] = []
    pos = 0
    while True:
        bt = content.find(b"BT", pos)
        if bt < 0:
            break
        et = content.find(b"ET", bt + 2)
        if et < 0:
            et = len(content)
        span = content[bt + 2 : et]
        current: list[str] = []  # shown strings on the current line
        pending = ""  # last string operand awaiting a show operator
        in_array = False
        array_parts: list[str] = []

        def flush_line():
            if current:
                line = "".join(current)
                if line:
                    lines.append(line)
                current.clear()

        for tok_m in _TOKEN_RE.finditer(span):
            tok = tok_m.group(0)
            if tok.startswith(b"("):
                s = _decode_pdf_string(tok[1:-1])
                if in_array:
                    array_parts.append(s)
                else:
                    pending = s
            elif tok.startswith(b"<"):
                hexs = re.sub(rb"\s", b"", tok[1:-1])
                if len(hexs) % 2:
                    hexs += b"0"
                try:
                    s = bytes.fromhex(hexs.decode("ascii")).decode("latin-1")
                except ValueError:
                    s = ""
                if in_array:
                    array_parts.append(s)
                else:
                    pending = s
            elif tok == b"[":
                in_array = True
                array_parts = []
            elif tok == b"]":
                in_array = False
                pending = "".join(array_parts)
            elif tok in (b"Tj", b"TJ"):
                current.append(pending)
                pending = ""
            elif tok in (b"'", b'"'):
                flush_line()
                current.append(pending)
                pending = ""
            elif tok in (b"Td", b"TD", b"T*"):
                flush_line()
        flush_line()
        pos = et + 2
    return lines


def parse_pdf_text_layer(data: bytes) -> str:
    """In-process text-layer extraction (replaces the reference's
    `pdftotext -layout` subprocess — src/ocr/enhanced.rs:1136-1141).
    Returns lines joined with '\\n'; caller applies trim + the
    >5-word acceptance gate (enhanced.rs:1155)."""
    all_lines: list[str] = []
    for stream in _iter_content_streams(data):
        if b"BT" not in stream:
            continue
        all_lines.extend(_extract_text_objects(stream))
    # also handle non-stream inline content (malformed minimal PDFs)
    if not all_lines and b"BT" in data:
        all_lines.extend(_extract_text_objects(data))
    return "\n".join(all_lines)


# --- byte-scrape last resort --------------------------------------------


def extract_text_from_pdf_bytes(data: bytes) -> str:
    """Last-resort byte scrape — src/ocr/enhanced.rs:1265-1366.

    Two passes: (1) literal strings inside BT..ET text objects,
    (2) printable-ASCII runs (32..126) longer than 3 bytes. Combined,
    whitespace-split, words of length ≤1 dropped, joined with single
    spaces. Returns '' when nothing readable is found (the reference
    errors with "No readable text found in PDF").

    Deviation note: the reference's in_text_object state machine
    (enhanced.rs:1277-1296) toggles on *any* 'B'/'E' byte when a "BT"/
    "ET" pair exists anywhere in the file — an evident bug. We implement
    the documented intent (strings within BT..ET spans); the combined +
    cleaned output is what our golden fixtures pin.
    """
    # pass 1: BT..ET parenthesized strings
    parts: list[str] = []
    pos = 0
    while True:
        bt = data.find(b"BT", pos)
        if bt < 0:
            break
        et = data.find(b"ET", bt + 2)
        if et < 0:
            et = len(data)
        span = data[bt + 2 : et]
        current: list[str] = []
        i, n = 0, len(span)
        in_string = False
        escape = False
        while i < n:
            ch = span[i]
            if not in_string:
                if ch == 0x28:  # (
                    in_string = True
            else:
                if escape:
                    current.append(chr(ch))
                    escape = False
                elif ch == 0x5C:  # backslash
                    escape = True
                elif ch == 0x29:  # )
                    in_string = False
                    current.append(" ")
                else:
                    current.append(chr(ch))
            i += 1
        txt = "".join(current)
        if txt.strip():
            parts.append(txt)
        pos = et + 2
    extracted_text = " ".join(parts)

    # pass 2: printable-ASCII runs > 3 chars (enhanced.rs:1327-1346)
    ascii_words: list[str] = []
    current_word: list[str] = []
    for b in data:
        if 32 <= b <= 126:
            current_word.append(chr(b))
        else:
            if len(current_word) > 3:
                ascii_words.append("".join(current_word))
            current_word = []
    if len(current_word) > 3:
        ascii_words.append("".join(current_word))
    ascii_text = " ".join(ascii_words)

    final_text = extracted_text
    if ascii_text.strip():
        final_text = final_text + "\n" + ascii_text

    # enhanced.rs:1355-1359: split on whitespace, drop len≤1 tokens
    cleaned = " ".join(w for w in final_text.split() if len(w) > 1)
    return cleaned


# --- metadata -------------------------------------------------------------


def extract_pdf_metadata(data: bytes) -> dict:
    """src/metadata_extraction.rs:84-136 — header version, '/Type /Page'
    count, /Linearized, /Encrypt, /CreationDate, /Font, /Image|/XObject
    flags. String scans over lossy-decoded bytes, like the reference."""
    meta: dict = {}
    if len(data) >= 5 and data[:4] == b"%PDF":
        head = data[:20]
        nl = -1
        for i, b in enumerate(head):
            if b in (0x0A, 0x0D):
                nl = i
                break
        if nl > 0:
            try:
                header = data[:nl].decode("utf-8")
                if header.startswith("%PDF-"):
                    meta["pdf_version"] = header[len("%PDF-") :]
            except UnicodeDecodeError:
                pass
        content = data.decode("utf-8", errors="replace")
        page_count = content.count("/Type /Page")
        if page_count > 0:
            meta["page_count"] = page_count
        if "/Linearized" in content:
            meta["linearized"] = True
        if "/Encrypt" in content:
            meta["encrypted"] = True
        cs = content.find("/CreationDate")
        if cs >= 0:
            ds = content.find("(", cs)
            if ds >= 0:
                de = content.find(")", cs + (ds - cs))
                if de >= 0:
                    meta["pdf_creation_date"] = content[ds + 1 : de]
        if "/Font" in content:
            meta["contains_fonts"] = True
        if "/Image" in content or "/XObject" in content:
            meta["contains_images"] = True
    return meta
