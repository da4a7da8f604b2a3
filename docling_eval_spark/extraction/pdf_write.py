"""Minimal PDF 1.4 writer (fixture/datagen side of pdf_real.py).

Writes spec-compliant single-font PDFs — catalog/pages/page objects,
optional FlateDecode content streams, valid xref + trailer — so the
synthetic corpus can carry REAL PDF bytes whose ground-truth text is
known by construction. Each paragraph is one BT…ET block at a
descending y position, so extraction (parse → XY-cut order) recovers
``"\\n\\n".join(paragraphs)`` byte-identically.
"""

from __future__ import annotations

import zlib


def _escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def paragraphs_to_stream(paragraphs: list[str], font_size: int = 12) -> bytes:
    """One BT/ET block per paragraph, top-down placement."""
    y = 720
    parts = []
    for p in paragraphs:
        parts.append(
            f"BT /F1 {font_size} Tf 72 {y} Td ({_escape(p)}) Tj ET"
        )
        y -= 40
    return "\n".join(parts).encode("latin-1", errors="replace")


def write_pdf(page_streams: list[bytes], compress: bool = False) -> bytes:
    """Content streams (one per page) → complete PDF bytes."""
    objs: list[bytes] = []
    n_pages = len(page_streams)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())
    for i, cs in enumerate(page_streams):
        content_num = 4 + 2 * i
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {content_num} 0 R /Resources << /Font << /F1 "
                f"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> >> >> >>"
            ).encode()
        )
        body = zlib.compress(cs) if compress else cs
        filt = b"/Filter /FlateDecode " if compress else b""
        objs.append(
            b"<< "
            + filt
            + f"/Length {len(body)} >>\nstream\n".encode()
            + body
            + b"\nendstream"
        )
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, obj in enumerate(objs, 1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def table_to_stream(
    rows: list[list[str | tuple[str, int] | None]],
    y0: int,
    x0: int = 72,
    col_w: int = 110,
    row_h: int = 20,
) -> bytes:
    """Table lattice → one BT/ET op PER ANCHOR CELL on a rigid
    (x0 + c·col_w, y0 − r·row_h) grid — the alignment signature
    pdf_real.recover_table_blocks detects. ``None`` marks a lattice
    position covered by another cell's span (no text op is written
    there; recovery reads the gap back as the span). A ``(text, k)``
    tuple is a ROW-SPAN cell: its text op is written vertically
    CENTERED over k row bands (the way a merged cell's single text
    line sits in a real PDF); the covered positions in the following
    rows must be ``None``."""
    parts = []
    for r, cells in enumerate(rows):
        for c, cell in enumerate(cells):
            if cell is None:
                continue
            if isinstance(cell, tuple):
                text, k = cell
                if k % 2 != 0 and k != 1:
                    # an odd-span cell's center lands exactly ON a row
                    # band, so the fixture would silently cluster into
                    # that row instead of presenting as a merged cell —
                    # refuse rather than write a wrong ground truth
                    raise ValueError(
                        "odd row spans > 1 are not representable as "
                        "vertically-centered fixtures"
                    )
                y = y0 - r * row_h - (k - 1) * row_h / 2.0
            else:
                text, y = cell, y0 - r * row_h
            ys = f"{y:g}"
            parts.append(
                f"BT /F1 10 Tf {x0 + c * col_w} {ys} Td "
                f"({_escape(text)}) Tj ET"
            )
    return "\n".join(parts).encode("latin-1", errors="replace")


def simple_pdf(
    paragraph_pages: list[list[str]],
    compress: bool = False,
    table_pages: list[list[list[str]] | None] | None = None,
) -> bytes:
    """[[page1 paragraphs], [page2 …]] → PDF bytes. ``table_pages``
    optionally appends one unit-cell table (list of rows of cell
    strings) below each page's paragraphs."""
    streams = []
    for i, paras in enumerate(paragraph_pages):
        cs = paragraphs_to_stream(paras)
        tbl = table_pages[i] if table_pages else None
        if tbl:
            y0 = 720 - 40 * len(paras) - 40
            cs = cs + b"\n" + table_to_stream(tbl, y0)
        streams.append(cs)
    return write_pdf(streams, compress=compress)
