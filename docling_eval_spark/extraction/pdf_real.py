"""Real-PDF text extraction for the standard subset (SURVEY S6/K1 PDF
branch, upgrading the MiniPDF-only stub).

From-scratch parser over the public PDF 1.x format (ISO 32000 basics):

- object scan: ``N G obj … endobj`` without requiring a valid xref
  (robust to linearized/appended files);
- streams: raw or /FlateDecode (stdlib zlib);
- pages: /Type /Page dicts with /MediaBox + /Contents (direct or ref,
  single or array);
- content streams: BT…ET text blocks with the common operators —
  Tf Td TD Tm T* Tj TJ ' " — positions tracked via the text matrix
  (translation components only: rotation/skew degrade to position),
  literal ``(…)`` strings with escapes + nested parens, ``<hex>``
  strings (single-byte assumption: latin-1-ish simple fonts).

OUT OF SCOPE (degrades gracefully, never raises): CID/Type0 composite
fonts (multi-byte hex text comes out garbled, not crashed), encrypted
files, object streams (ObjStm), ToUnicode CMaps. Those need font
tables the sandbox cannot validate; the block/geometry plumbing is
identical when a full decoder lands.

Block model: each BT…ET run = one layout block; its bbox is the span
of baseline positions (crudely padded by the font size). Blocks feed
the same XY-cut reading order as MiniPDF.
"""

from __future__ import annotations

import re
import zlib

from docling_eval_spark.extraction.pdf_mini import LayoutBlock

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_MEDIABOX_RE = re.compile(
    rb"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s*\]"
)
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_CONTENTS_ARR_RE = re.compile(rb"/Contents\s*\[(.*?)\]", re.S)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")

# content-stream tokens: strings, hex strings, numbers, names, operators
_CS_TOKEN_RE = re.compile(
    rb"\((?:\\.|[^\\()])*\)"      # literal string (1-level; nested handled below)
    rb"|<[0-9A-Fa-f\s]*>"         # hex string
    rb"|/[^\s/\[\]()<>{}]*"       # name
    rb"|[-+]?\d*\.?\d+"           # number
    rb"|\[|\]"
    rb"|[A-Za-z'\"*]+",           # operator
)

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _read_literal_string(data: bytes, start: int) -> tuple[bytes, int]:
    """Parse a (possibly nested) literal string starting at '('."""
    out = bytearray()
    depth = 0
    i = start
    while i < len(data):
        ch = data[i : i + 1]
        if ch == b"\\":
            nxt = data[i + 1 : i + 2]
            if nxt.isdigit():  # octal escape, up to 3 digits
                j = i + 1
                oct_digits = b""
                while j < len(data) and data[j : j + 1].isdigit() and len(oct_digits) < 3:
                    oct_digits += data[j : j + 1]
                    j += 1
                out.append(int(oct_digits, 8) & 0xFF)
                i = j
                continue
            out += _ESCAPES.get(nxt, nxt)
            i += 2
            continue
        if ch == b"(":
            depth += 1
            if depth > 1:
                out += ch
        elif ch == b")":
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out += ch
        else:
            out += ch
        i += 1
    return bytes(out), i


def _decode_text(raw: bytes) -> str:
    return raw.decode("latin-1", errors="replace")


def _objects(data: bytes) -> dict[int, bytes]:
    return {int(m.group(1)): m.group(3) for m in _OBJ_RE.finditer(data)}


_LENGTH_RE = re.compile(rb"/Length\s+(\d+)\b")
_STREAM_START_RE = re.compile(rb"stream\r?\n")


def _stream_of(obj: bytes) -> bytes | None:
    sm = _STREAM_START_RE.search(obj)
    if not sm:
        return None
    lm = _LENGTH_RE.search(obj[: sm.start()])
    if lm:
        # slice by declared /Length — binary stream data may itself end
        # in \r or contain endstream-like bytes, which a delimiter
        # regex would clip (observed: zlib output ending in 0x0D lost
        # its last byte to the optional \r before \nendstream)
        raw = obj[sm.end() : sm.end() + int(lm.group(1))]
    else:
        m = _STREAM_RE.search(obj)
        if not m:
            return None
        raw = m.group(1)
    if b"/FlateDecode" in obj[: sm.start()]:
        try:
            return zlib.decompress(raw)
        except zlib.error:
            return None
    return raw


def _parse_content_stream(cs: bytes, page_no: int, page_h: float) -> list[LayoutBlock]:
    """BT…ET runs → blocks with baseline-tracked positions."""
    blocks: list[LayoutBlock] = []
    i = 0
    n = len(cs)
    in_text = False
    stack: list[float | bytes] = []
    tx = ty = 0.0       # current text position (translation)
    lx = ly = 0.0       # line start
    leading = 12.0
    font_size = 12.0
    parts: list[str] = []
    xs: list[float] = []
    ys: list[float] = []

    def show(txt: str) -> None:
        if txt:
            parts.append(txt)
            xs.append(tx)
            ys.append(ty)

    def flush() -> None:
        nonlocal parts, xs, ys
        text = "".join(parts).strip()
        if text and xs:
            top = page_h - (max(ys) + font_size)
            bottom = page_h - min(ys)
            blocks.append(
                LayoutBlock(
                    page_no=page_no,
                    label="text",
                    l=min(xs),
                    t=top,
                    r=max(xs) + 7.0 * max(len(p) for p in parts),
                    b=bottom,
                    text=text,
                )
            )
        parts, xs, ys = [], [], []

    while i < n:
        ch = cs[i : i + 1]
        if ch in b" \t\r\n":
            i += 1
            continue
        if ch == b"(":
            raw, i = _read_literal_string(cs, i)
            stack.append(raw)
            continue
        m = _CS_TOKEN_RE.match(cs, i)
        if not m:
            i += 1
            continue
        tok = m.group(0)
        i = m.end()
        if tok[:1] == b"<" and tok[-1:] == b">":
            hexs = re.sub(rb"\s", b"", tok[1:-1])
            if len(hexs) % 2:
                hexs += b"0"
            stack.append(bytes.fromhex(hexs.decode("ascii")))
        elif tok in (b"[", b"]"):
            pass  # TJ arrays: strings concatenate, kern numbers ignored
        elif re.fullmatch(rb"[-+]?\d*\.?\d+", tok):
            stack.append(float(tok))
        elif tok[:1] == b"/":
            stack.append(tok)
        else:  # operator
            op = tok
            if op == b"BT":
                in_text = True
                tx = ty = lx = ly = 0.0
                stack.clear()
            elif op == b"ET":
                flush()
                in_text = False
                stack.clear()
            elif not in_text:
                stack.clear()
            elif op == b"Tf" and len(stack) >= 1 and isinstance(stack[-1], float):
                font_size = float(stack[-1])
                stack.clear()
            elif op in (b"Td", b"TD") and len(stack) >= 2:
                dx, dy = float(stack[-2]), float(stack[-1])  # type: ignore[arg-type]
                lx, ly = lx + dx, ly + dy
                tx, ty = lx, ly
                if op == b"TD":
                    leading = -dy
                if abs(dy) > 0.1:
                    show(" ")
                stack.clear()
            elif op == b"Tm" and len(stack) >= 6:
                lx, ly = float(stack[-2]), float(stack[-1])  # type: ignore[arg-type]
                tx, ty = lx, ly
                stack.clear()
            elif op == b"T*":
                ly -= leading
                tx, ty = lx, ly
                show(" ")
                stack.clear()
            elif op == b"TL" and stack and isinstance(stack[-1], float):
                leading = float(stack[-1])
                stack.clear()
            elif op == b"Tj" and stack and isinstance(stack[-1], bytes):
                show(_decode_text(stack[-1]))
                stack.clear()
            elif op in (b"'", b'"') and stack:
                raw = next(
                    (s for s in reversed(stack) if isinstance(s, bytes)), b""
                )
                ly -= leading
                tx, ty = lx, ly
                show(" " + _decode_text(raw))
                stack.clear()
            elif op == b"TJ":
                texts = [s for s in stack if isinstance(s, bytes)]
                show("".join(_decode_text(s) for s in texts))
                stack.clear()
            else:
                stack.clear()
    flush()
    return blocks


def recover_table_blocks(
    blocks: list[LayoutBlock], min_cols: int = 2, min_rows: int = 2
) -> tuple[list[LayoutBlock], list[dict]]:
    """Lattice-alignment table recovery over parsed text blocks (the
    classic coordinate-clustering heuristic, cf. Tabula/Camelot
    stream mode; reference evaluates tables from PDFs as its headline
    benchmark, `table_evaluator.py:111-243`).

    Per page: cluster blocks by top coordinate into candidate rows; a
    maximal run of ≥ min_rows consecutive rows each holding ≥ min_cols
    cells is a table; the column lattice is the union of the run's
    left edges, and a row missing a lattice slot reads as the previous
    cell's col_span (stream-mode span inference). Those blocks become
    one grid (row 0 = column headers, like the synthetic HTML corpus)
    and leave the text flow. Single-column paragraph stacks never
    match (one cell per row < min_cols)."""
    grids: list[dict] = []
    keep: list[LayoutBlock] = []
    by_page: dict[int, list[LayoutBlock]] = {}
    for b in blocks:
        by_page.setdefault(b.page_no, []).append(b)
    for page_no in sorted(by_page):
        pblocks = by_page[page_no]
        rows_by_t: dict[float, list[LayoutBlock]] = {}
        for b in pblocks:
            rows_by_t.setdefault(round(b.t, 1), []).append(b)
        ts = sorted(rows_by_t)
        sig = {t: tuple(sorted(round(b.l, 1) for b in rows_by_t[t])) for t in ts}
        used: set[float] = set()
        i = 0
        while i < len(ts):
            # a table run = maximal stretch of consecutive y-rows that
            # each hold ≥ min_cols cells (single-block rows are body
            # text, never table rows). The column lattice is the UNION
            # of the run's x-starts; a row missing a lattice slot reads
            # as the previous cell's col_span — the stream-mode
            # recovery ambiguity (a truly empty cell and a span are
            # indistinguishable without rules/images), same call
            # Tabula's stream mode makes.
            j = i
            while j < len(ts) and len(sig[ts[j]]) >= min_cols:
                j += 1
            j -= 1
            if j - i + 1 >= min_rows:
                row_ts = ts[i : j + 1]
                used.update(row_ts)
                cols = sorted({x for t in row_ts for x in sig[t]})
                col_index = {x: k for k, x in enumerate(cols)}
                n_cols = len(cols)
                cells = []
                for r, t in enumerate(row_ts):
                    row_blocks = sorted(rows_by_t[t], key=lambda b: b.l)
                    anchors = [col_index[round(b.l, 1)] for b in row_blocks]
                    for k, blk in enumerate(row_blocks):
                        c = anchors[k]
                        nxt_c = anchors[k + 1] if k + 1 < len(anchors) else n_cols
                        span = max(1, nxt_c - c)
                        cells.append(
                            {
                                "text": blk.text,
                                "row_span": 1,
                                "col_span": span,
                                "start_row_offset_idx": r,
                                "end_row_offset_idx": r + 1,
                                "start_col_offset_idx": c,
                                "end_col_offset_idx": c + span,
                                "col_header": r == 0,
                                "row_header": False,
                            }
                        )
                grids.append(
                    {"num_rows": len(row_ts), "num_cols": n_cols, "cells": cells}
                )
                i = j + 1
            else:
                i = max(j + 1, i + 1)
        for t in ts:
            if t not in used:
                keep.extend(rows_by_t[t])
    return keep, grids


def parse_pdf(data: bytes) -> tuple[list[tuple[int, float, float]], list[LayoutBlock]]:
    """Real-PDF bytes → (pages=[(page_no,w,h)], layout blocks)."""
    if b"/Encrypt" in data[:2048] or b"/Encrypt" in data[-2048:]:
        raise NotImplementedError("encrypted PDFs are not supported")
    objs = _objects(data)
    pages: list[tuple[int, float, float]] = []
    blocks: list[LayoutBlock] = []
    page_no = 0
    for num in sorted(objs):
        obj = objs[num]
        if b"/Type" not in obj or b"/Page" not in obj or b"/Pages" in obj:
            continue
        page_no += 1
        mb = _MEDIABOX_RE.search(obj)
        w, h = (612.0, 792.0)
        if mb:
            w = float(mb.group(3)) - float(mb.group(1))
            h = float(mb.group(4)) - float(mb.group(2))
        pages.append((page_no, w, h))
        content_ids: list[int] = []
        arr = _CONTENTS_ARR_RE.search(obj)
        if arr:
            content_ids = [int(m.group(1)) for m in _REF_RE.finditer(arr.group(1))]
        else:
            m = _CONTENTS_RE.search(obj)
            if m:
                content_ids = [int(m.group(1))]
        for cid in content_ids:
            cs = _stream_of(objs.get(cid, b""))
            if cs:
                blocks.extend(_parse_content_stream(cs, page_no, h))
    if not pages:
        raise ValueError("no /Type /Page objects found")
    return pages, blocks
