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
# number-token classifier, precompiled: the tokenizer consults it once
# per non-string token, which dominated the re-module cache lookups
_CS_NUMBER_RE = re.compile(rb"[-+]?\d*\.?\d+")

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
        elif _CS_NUMBER_RE.fullmatch(tok):
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
    maximal run of >= min_rows STRONG rows (>= min_cols cells each) is
    a table; the column lattice is the union of the strong rows' left
    edges.

    Span inference (stream-mode, the same calls Tabula/Camelot make):
    - COL spans: a strong row missing a lattice slot reads as the
      previous cell's col_span (empty cell and span are
      indistinguishable without rules/images);
    - ROW spans: a WEAK interior row (fewer than min_cols blocks,
      strictly between strong rows) whose every block (a) anchors to
      the lattice and (b) sits in a column EMPTY in an adjacent strong
      row is a vertically-centered merged cell: it spans the maximal
      run of adjacent strong rows with no block in its column. A
      spanned slot also blocks horizontal col_span absorption across
      it. Weak rows failing (a) or (b) — ordinary body text, even when
      left-aligned with column 0 — terminate the run, preserving the
      pre-row-span behavior.

    Recovered blocks become one grid (row 0 = column headers, like the
    synthetic HTML corpus) and leave the text flow. Single-column
    paragraph stacks never match (one cell per row < min_cols)."""
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

        def emit_run(strong_ts: list[float], floater_ts: list[float]) -> None:
            cols = sorted({x for t in strong_ts for x in sig[t]})
            col_index = {x: k for k, x in enumerate(cols)}
            n_cols = len(cols)
            n_rows = len(strong_ts)
            anchors_by_row = [{col_index[x] for x in sig[t]} for t in strong_ts]
            used.update(strong_ts)
            used.update(floater_ts)
            covered: list[set[int]] = [set() for _ in range(n_rows)]
            cells: list[dict] = []
            for t_w in sorted(floater_ts):
                p = sum(1 for t in strong_ts if t < t_w) - 1  # row above
                for blk in sorted(rows_by_t[t_w], key=lambda b: b.l):
                    c = col_index[round(blk.l, 1)]

                    def empty(q: int) -> bool:
                        return (
                            0 <= q < n_rows
                            and c not in anchors_by_row[q]
                            and c not in covered[q]
                        )

                    if not (empty(p) and empty(p + 1)):
                        # a vertically-centered merged cell needs BOTH
                        # adjacent slots free; anything else is not a
                        # row span — demote to body text rather than
                        # emit an overlapping cell
                        keep.append(blk)
                        continue
                    lo, hi = p, p + 1
                    # SYMMETRIC growth only: a centered text line
                    # implies equal extent above and below — one-sided
                    # expansion would swallow every empty slot in the
                    # column (e.g. an unrelated gap rows away)
                    while lo - 1 >= 0 and empty(lo - 1) and hi + 1 < n_rows and empty(hi + 1):
                        lo -= 1
                        hi += 1
                    for q in range(lo, hi + 1):
                        covered[q].add(c)
                    cells.append(
                        {
                            "text": blk.text,
                            "row_span": hi - lo + 1,
                            "col_span": 1,
                            "start_row_offset_idx": lo,
                            "end_row_offset_idx": hi + 1,
                            "start_col_offset_idx": c,
                            "end_col_offset_idx": c + 1,
                            "col_header": False,
                            "row_header": False,
                        }
                    )
            for r, t in enumerate(strong_ts):
                row_blocks = sorted(rows_by_t[t], key=lambda b: b.l)
                anchors = [col_index[round(b.l, 1)] for b in row_blocks]
                for k, blk in enumerate(row_blocks):
                    c = anchors[k]
                    nxt_c = anchors[k + 1] if k + 1 < len(anchors) else n_cols
                    # a row-span cell occupying a slot bounds the
                    # horizontal absorption
                    blocked = [o for o in covered[r] if c < o < nxt_c]
                    stop = min(blocked) if blocked else nxt_c
                    span = max(1, stop - c)
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
            grids.append({"num_rows": n_rows, "num_cols": n_cols, "cells": cells})

        def floater_qualifies(
            t_w: float, strong_ts: list[float]
        ) -> bool:
            """Every block anchors to the strong lattice AND its
            column is empty in an adjacent strong row (what makes a
            merged cell a merged cell — body paragraphs left-aligned
            with column 0 fail this)."""
            lefts = {x for t in strong_ts for x in sig[t]}
            col_index = {x: k for k, x in enumerate(sorted(lefts))}
            anchors = {
                t: {col_index[x] for x in sig[t]} for t in strong_ts
            }
            p = sum(1 for t in strong_ts if t < t_w) - 1
            if not (0 <= p < len(strong_ts) - 1):
                return False  # not interior
            for blk in rows_by_t[t_w]:
                x = round(blk.l, 1)
                if x not in col_index:
                    return False
                c = col_index[x]
                above = c not in anchors[strong_ts[p]]
                below = c not in anchors[strong_ts[p + 1]]
                if not (above or below):
                    return False
            return True

        i = 0
        while i < len(ts):
            if len(sig[ts[i]]) < min_cols:
                i += 1
                continue
            # optimistic collection: strong rows extend the run; weak
            # rows are held pending until a later strong row proves
            # them interior, then validated as floaters
            strong_ts = [ts[i]]
            pending: list[float] = []
            weak_ts: list[float] = []
            j = i + 1
            broke_at = None
            while j < len(ts):
                t = ts[j]
                if len(sig[t]) >= min_cols:
                    strong_ts.append(t)
                    weak_ts.extend(pending)
                    pending = []
                    j += 1
                elif not pending:
                    pending.append(t)
                    j += 1
                else:  # two consecutive weak rows: end of table region
                    break
            # validate interior weak rows against the FULL lattice;
            # the first failure truncates the run just before it
            valid_floaters: list[float] = []
            for t_w in weak_ts:
                if floater_qualifies(t_w, strong_ts):
                    valid_floaters.append(t_w)
                else:
                    strong_ts = [t for t in strong_ts if t < t_w]
                    # truncation changes the lattice: floaters that
                    # qualified only via truncated-away rows (their
                    # column may not even exist any more) must
                    # re-qualify against the surviving run
                    valid_floaters = [
                        t
                        for t in valid_floaters
                        if t < t_w and floater_qualifies(t, strong_ts)
                    ]
                    broke_at = t_w
                    break
            if len(strong_ts) >= min_rows:
                emit_run(strong_ts, valid_floaters)
            if broke_at is not None:
                i = ts.index(broke_at) + 1
            else:
                last = max(strong_ts + valid_floaters) if strong_ts else ts[i]
                nxt = ts.index(last) + 1
                i = max(nxt, i + 1)
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
