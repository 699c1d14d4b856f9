"""PDF / layout parse — the document-format leg of the north rule's
extraction triad (HTML boilerplate strip, PDF/layout parse, DOM
heuristics).

A real (if minimal) PDF text extractor in pure Python — no third-party
PDF lib exists in this container, and none is needed for the text-layer
subset a corpus pipeline consumes: content streams are located by
scanning `N 0 obj ... stream/endstream` frames (no xref required —
robust to the truncated/garbage tails common in crawled PDFs),
FlateDecode is stdlib zlib, and the text operators (BT/ET, Td/TD/Tm
positioning, Tj/TJ showing, with PDF string escapes) are a small
grammar. Scanned/image-only PDFs simply yield no blocks here — their
page images route through the media recognition leg instead.

Layout reconstruction is the set-level part, and mirrors the
reference's detection geometry: glyph runs cluster into LINES by
y-proximity (the SegLink/CTPN line-grouping analog — segment combine
"Alg.1", docs/nizhan/SegLink/SegLink_t.md:97-103), lines order
top-to-bottom (PDF origin is bottom-left), runs within a line order
left-to-right — reading order as a deterministic sort, not an ML model.

Spark surface: one Arrow-batched mapInPandas over binary blobs
(SURVEY.md §2.9 discipline), schema (media_ref, page, x, y, text) per
block plus a reading-order document assembly.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# ---------------------------------------------------------------------------
# deterministic PDF fixture generator (S8 analog: plateGen's role —
# synthesize labeled inputs with known ground truth)
# ---------------------------------------------------------------------------


def build_pdf_bytes(pages: list[list[tuple[float, float, str]]]) -> bytes:
    """A valid minimal PDF: one FlateDecode content stream per page,
    each text run `(x, y, text)` emitted as `BT /F1 12 Tf x y Td (text)
    Tj ET`. Parentheses/backslashes in text are escaped per spec."""

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    objs: list[bytes] = []
    n_pages = len(pages)
    page_obj_ids = [3 + 2 * i for i in range(n_pages)]
    kids = " ".join(f"{i} 0 R" for i in page_obj_ids)
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())
    font_id = 3 + 2 * n_pages
    for i, runs in enumerate(pages):
        content = "\n".join(
            f"BT /F1 12 Tf {x:g} {y:g} Td ({esc(t)}) Tj ET" for x, y, t in runs
        ).encode("latin-1")
        comp = zlib.compress(content)
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {page_obj_ids[i] + 1} 0 R "
            f"/Resources << /Font << /F1 {font_id} 0 R >> >> >>".encode()
        )
        objs.append(
            f"<< /Length {len(comp)} /Filter /FlateDecode >>\nstream\n".encode()
            + comp
            + b"\nendstream"
        )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

_OBJ_HEAD_RE = re.compile(rb"(\d+)\s+0\s+obj\b")
_STREAM_START_RE = re.compile(rb"stream\r?\n")
_ENDSTREAM_RE = re.compile(rb"endstream")
_ENDOBJ_RE = re.compile(rb"endobj")
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\n?endstream", re.S)
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+0\s+R")
# text-block grammar: positioning + showing operators inside BT..ET.
# BT/ET must be recognized as standalone TOKENS outside string
# literals: the naive rb"BT(.*?)ET" truncates a block at an 'ET'
# inside a shown string — `(ET) Tj` — and drops its text entirely
# (hypothesis-found). _iter_bt_blocks below is the string-aware scan.


def _iter_bt_blocks(data: bytes):
    """Yield the inner bytes of each BT..ET text block. Tracks PDF
    string literals (balanced parens + backslash escapes, PDF 32000-1
    §7.3.4.2) so operator-lookalike bytes inside a string never open or
    close a block; BT/ET match only at token boundaries."""
    i, n = 0, len(data)
    start = None  # index just past the open block's BT token
    depth = 0  # paren nesting inside the current string literal
    while i < n:
        c = data[i : i + 1]
        if depth:
            if c == b"\\":
                i += 2
                continue
            if c == b"(":
                depth += 1
            elif c == b")":
                depth -= 1
            i += 1
            continue
        if c == b"(":
            depth = 1
            i += 1
            continue
        two = data[i : i + 2]
        if two in (b"BT", b"ET"):
            prev_ok = i == 0 or not data[i - 1 : i].isalnum()
            next_ok = i + 2 >= n or not data[i + 2 : i + 3].isalnum()
            if prev_ok and next_ok:
                if two == b"BT" and start is None:
                    start = i + 2
                elif two == b"ET" and start is not None:
                    yield data[start:i]
                    start = None
                i += 2
                continue
        i += 1
_TOK_RE = re.compile(
    rb"\(((?:\\.|[^\\()])*)\)\s*Tj"  # (string) Tj
    rb"|\[((?:\((?:\\.|[^\\()])*\)|[^\]])*)\]\s*TJ"  # [ ... ] TJ
    rb"|(-?[\d.]+)\s+(-?[\d.]+)\s+Td"  # x y Td (relative move)
    rb"|(-?[\d.]+)\s+(-?[\d.]+)\s+TD"  # x y TD (move + leading)
    rb"|(?:-?[\d.]+\s+){4}(-?[\d.]+)\s+(-?[\d.]+)\s+Tm",  # text matrix: e f
    re.S,
)
_TJ_STR_RE = re.compile(rb"\(((?:\\.|[^\\()])*)\)")
_ESCAPES = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f"}


def _unescape(raw: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1 : i + 2]
            # octal escape: only [0-7] digits count — \8 or \9 is a
            # literal-char escape per spec (and int(..., 8) would raise)
            if nxt in b"01234567":
                j = i + 1
                while j < len(raw) and j < i + 4 and raw[j : j + 1] in b"01234567":
                    j += 1
                out += bytes([int(raw[i + 1 : j], 8) & 0xFF])
                i = j
                continue
            # backslash-EOL is a line continuation (PDF 32000-1 §7.3.4.2):
            # both characters drop, \r\n counting as ONE end-of-line —
            # wrapped literal strings in real crawled PDFs must not gain
            # spurious newlines
            if nxt in (b"\n", b"\r"):
                i += 2
                if nxt == b"\r" and raw[i : i + 1] == b"\n":
                    i += 1
                continue
            out += _ESCAPES.get(nxt, nxt)
            i += 2
            continue
        out += c
        i += 1
    return out.decode("latin-1")


# a literal length is digits NOT followed by "<gen> R" — `/Length 5 0 R`
# is an indirect object reference, not a byte count
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)\b")


def _stream_payload(body: bytes) -> bytes | None:
    """Content-stream bytes of an object body. Prefer a LITERAL /Length
    (stream data is arbitrary binary and may contain 'endstream' byte
    runs); indirect /Length references (N 0 R) and absent lengths fall
    back to the delimiter scan."""
    start = body.find(b"stream")
    if start < 0:
        return None
    start += len(b"stream")
    if body[start : start + 2] == b"\r\n":
        start += 2
    elif body[start : start + 1] == b"\n":
        start += 1
    lm = _LENGTH_RE.search(body)
    if lm:
        n = int(lm.group(1))
        if start + n <= len(body):
            return body[start : start + n]
    sm = _STREAM_RE.search(body)
    return sm.group(1) if sm else None


def _scan_objects(buf: bytes) -> dict[int, bytes]:
    """Sequential object scan that honors a literal /Length while
    skipping stream bytes: compressed data is arbitrary binary and can
    contain 'endobj'/'endstream' byte runs — a plain non-greedy
    (.*?)endobj regex truncates such objects mid-stream and lets
    spurious 'N 0 obj' matches inside the binary clobber real entries."""
    objects: dict[int, bytes] = {}
    pos = 0
    while True:
        hm = _OBJ_HEAD_RE.search(buf, pos)
        if hm is None:
            break
        body_start = hm.end()
        em = _ENDOBJ_RE.search(buf, body_start)
        sm = _STREAM_START_RE.search(buf, body_start)
        if sm is not None and (em is None or sm.start() < em.start()):
            lm = _LENGTH_RE.search(buf, body_start, sm.start())
            skip_from = sm.end() + int(lm.group(1)) if lm else sm.end()
            es = _ENDSTREAM_RE.search(buf, min(skip_from, len(buf)))
            if es is not None:
                em = _ENDOBJ_RE.search(buf, es.end())
        num = int(hm.group(1))
        if em is None:
            objects.setdefault(num, buf[body_start:])
            break
        objects.setdefault(num, buf[body_start : em.start()])
        pos = em.end()
    return objects


def extract_pdf_text_blocks(buf: bytes | None) -> list[dict]:
    """-> [{page, x, y, text}] in stream order, or [] for anything that
    doesn't parse (crawl-corpus skip semantics, dataset.py:51-55)."""
    if buf is None or not bytes(buf).startswith(b"%PDF"):
        return []
    buf = bytes(buf)
    objects = _scan_objects(buf)

    # page objects in document order -> their content stream objects
    pages = []
    for num in sorted(objects):
        body = objects[num]
        if b"/Type /Page" in body and b"/Pages" not in body:
            cm = _CONTENTS_RE.search(body)
            if cm:
                pages.append(int(cm.group(1)))

    blocks: list[dict] = []
    for page_no, cobj in enumerate(pages):
        body = objects.get(cobj, b"")
        data = _stream_payload(body)
        if data is None:
            continue
        if b"/FlateDecode" in body:
            try:
                data = zlib.decompress(data)
            except zlib.error:
                # the /Length-sliced payload may be wrong (corrupt or
                # misdeclared length) — retry with the delimiter scan
                sm = _STREAM_RE.search(body)
                if sm is None:
                    continue
                try:
                    data = zlib.decompress(sm.group(1))
                except zlib.error:
                    continue
        for inner in _iter_bt_blocks(data):
            x = y = 0.0
            for tok in _TOK_RE.finditer(inner):
                if tok.group(1) is not None:  # Tj
                    blocks.append(
                        {"page": page_no, "x": x, "y": y, "text": _unescape(tok.group(1))}
                    )
                elif tok.group(2) is not None:  # TJ array: concat strings
                    txt = "".join(_unescape(s.group(1)) for s in _TJ_STR_RE.finditer(tok.group(2)))
                    blocks.append({"page": page_no, "x": x, "y": y, "text": txt})
                elif tok.group(3) is not None:  # Td: relative within block
                    x += float(tok.group(3))
                    y += float(tok.group(4))
                elif tok.group(5) is not None:  # TD
                    x += float(tok.group(5))
                    y += float(tok.group(6))
                else:  # Tm: absolute
                    x, y = float(tok.group(7)), float(tok.group(8))
    return blocks


def reading_order_text(blocks: list[dict], line_tol: float = 3.0) -> str:
    """Layout reconstruction: cluster runs into lines by y-proximity
    (per page), order lines top-to-bottom, runs left-to-right; lines
    join with '\\n', runs within a line with ' '. Deterministic — the
    A8 'segment combine' of the PDF leg."""
    out_lines: list[str] = []
    for page in sorted({b["page"] for b in blocks}):
        # total order (y desc, x asc, text asc): output is a pure
        # function of the block MULTISET, not of stream arrival order —
        # runs at identical coordinates would otherwise tie-break by
        # input order (caught by the permutation-invariance property test)
        runs = sorted(
            (b for b in blocks if b["page"] == page),
            key=lambda b: (-b["y"], b["x"], b["text"]),
        )
        current: list[dict] = []

        def flush():
            out_lines.append(
                " ".join(c["text"] for c in sorted(current, key=lambda c: (c["x"], c["text"])))
            )

        for r in runs:
            if current and abs(current[0]["y"] - r["y"]) > line_tol:
                flush()
                current = []
            current.append(r)
        if current:
            flush()
    return "\n".join(out_lines)


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

PDF_BLOCKS_SCHEMA = "media_ref string, page int, x double, y double, text string"


def gen_pdf_fixture(n: int = 16, seed: int = 42) -> list[tuple[str, list, bytes]]:
    """Deterministic labeled PDFs: (media_ref, ground-truth runs per
    page, bytes). Every 6th blob is corrupt (header-only or junk) to
    exercise the skip path. Layout varies: 1-3 pages, multi-run lines
    (same y, two x positions) to exercise line grouping, descending y
    body lines."""
    import random

    words = [
        "table", "scan", "filter", "join", "merge", "batch", "column", "row",
        "query", "index", "spark", "arrow", "layout", "stream", "page", "block",
    ]
    out = []
    for i in range(n):
        ref = f"pdf{i:06d}"
        if i % 6 == 5:
            # alternate corrupt variants BY CORRUPT SLOT: i%6==5 forces i
            # odd, so keying on i%2 made the non-PDF-header variant dead
            payload = b"%PDF-1.4\n(garbage" if (i // 6) % 2 else b"\x00notapdf"
            out.append((ref, [], payload))
            continue
        rng = random.Random(seed * 1000 + i)
        pages = []
        for p in range(1 + i % 3):
            runs = [(72.0, 720.0, f"heading {ref} p{p}")]
            y = 690.0
            for _ in range(2 + rng.randrange(3)):
                line = " ".join(rng.choice(words) for _ in range(4 + rng.randrange(4)))
                runs.append((72.0, y, line))
                if rng.random() < 0.5:  # second column run on the same line
                    runs.append((300.0, y, rng.choice(words) + " note"))
                y -= 18.0
            pages.append(runs)
        out.append((ref, pages, build_pdf_bytes(pages)))
    return out


def parse_pdf_layout(blobs: DataFrame) -> DataFrame:
    """(media_ref, content binary) -> one row per text block, stream
    order. Arrow-batched; unparseable blobs emit nothing."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, pgs, xs, ys, txts = [], [], [], [], []
            for ref, buf in zip(pdf["media_ref"], pdf["content"]):
                for b in extract_pdf_text_blocks(buf):
                    refs.append(ref)
                    pgs.append(b["page"])
                    xs.append(b["x"])
                    ys.append(b["y"])
                    txts.append(b["text"])
            yield pd.DataFrame({"media_ref": refs, "page": pgs, "x": xs, "y": ys, "text": txts})

    return blobs.mapInPandas(kernel, PDF_BLOCKS_SCHEMA)


def pdf_documents_text(blobs: DataFrame) -> DataFrame:
    """(media_ref, content) -> (media_ref, text) — full reading-order
    document text, one Arrow pass (parse + layout fused)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, txts = [], []
            for ref, buf in zip(pdf["media_ref"], pdf["content"]):
                blocks = extract_pdf_text_blocks(buf)
                if blocks:
                    refs.append(ref)
                    txts.append(reading_order_text(blocks))
            yield pd.DataFrame({"media_ref": refs, "text": txts})

    return blobs.mapInPandas(kernel, "media_ref string, text string")
