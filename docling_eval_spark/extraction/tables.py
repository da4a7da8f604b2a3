"""HTML <table> → span-aware cell grid.

Semantics parallel to the reference's HTML-table parser
(`/root/reference/docling_eval/benchmarks/utils.py:152-234`): walk
rows, fill a grid honoring rowspan/colspan occupancy, emit one record
per cell with ``(start_row, start_col, row_span, col_span, text,
col_header, row_header)``. Implemented from scratch on the regex lexer
(no bs4).

The cell schema matches the reference's ``TableCell``
(`tests/test_table_evaluator.py:18-30`) so TEDS (evaluators/teds.py)
consumes it directly.
"""

from __future__ import annotations

import html as _html
import re
from dataclasses import dataclass

_WS_RE = re.compile(r"[ \t\n\r\f\v]+")
_TAG_RE = re.compile(r"<(/?)(table|tr|td|th)\b([^>]*)>", re.I | re.S)
_ATTR_RE = re.compile(r"(rowspan|colspan)\s*=\s*(?:\"(\d+)\"|'(\d+)'|(\d+))", re.I)
_STRIP_TAGS_RE = re.compile(r"<[^>]*>")


@dataclass
class TableCell:
    text: str
    row_span: int
    col_span: int
    start_row_offset_idx: int
    end_row_offset_idx: int
    start_col_offset_idx: int
    end_col_offset_idx: int
    col_header: bool
    row_header: bool


@dataclass
class TableGrid:
    num_rows: int
    num_cols: int
    cells: list[TableCell]


def _spans(attrs: str) -> tuple[int, int]:
    rs, cs = 1, 1
    for m in _ATTR_RE.finditer(attrs):
        val = int(next(g for g in m.groups()[1:] if g))
        if m.group(1).lower() == "rowspan":
            rs = max(1, val)
        else:
            cs = max(1, val)
    return rs, cs


def _cell_text(raw: str) -> str:
    return _WS_RE.sub(" ", _html.unescape(_STRIP_TAGS_RE.sub(" ", raw))).strip()


def parse_table(table_html: str) -> TableGrid:
    """Parse one <table>...</table> fragment into a span-aware grid."""
    cells: list[TableCell] = []
    occupied: set[tuple[int, int]] = set()  # (row, col) taken by an earlier span
    row = -1
    col = 0
    cell_start: int | None = None
    cell_is_header = False
    cell_rs = cell_cs = 1
    max_col = 0

    def close_cell(end: int) -> None:
        nonlocal col, max_col
        if cell_start is None:
            return
        while (row, col) in occupied:
            col += 1
        text = _cell_text(table_html[cell_start:end])
        cells.append(
            TableCell(
                text=text,
                row_span=cell_rs,
                col_span=cell_cs,
                start_row_offset_idx=row,
                end_row_offset_idx=row + cell_rs,
                start_col_offset_idx=col,
                end_col_offset_idx=col + cell_cs,
                col_header=cell_is_header and row == 0,
                row_header=cell_is_header and row > 0 and col == 0,
            )
        )
        for r in range(row, row + cell_rs):
            for c in range(col, col + cell_cs):
                occupied.add((r, c))
        col += cell_cs
        max_col = max(max_col, col)

    for m in _TAG_RE.finditer(table_html):
        closing, name = m.group(1) == "/", m.group(2).lower()
        if name == "tr":
            close_cell(m.start())
            cell_start = None
            if not closing:
                row += 1
                col = 0
        elif name in ("td", "th"):
            close_cell(m.start())
            if closing:
                cell_start = None
            else:
                cell_start = m.end()
                cell_is_header = name == "th"
                cell_rs, cell_cs = _spans(m.group(3) or "")
        elif name == "table" and closing:
            close_cell(m.start())
            cell_start = None
            break
    close_cell(len(table_html))
    return TableGrid(num_rows=row + 1 if row >= 0 else 0, num_cols=max_col, cells=cells)


_GRAMMAR_SPAN_RE = re.compile(r"^(\d+)x(\d+)>(.*)$", re.S)


def parse_cell_grammar(s: str) -> TableGrid:
    """Plain-text cell grammar → span-aware grid (the PDF-path table
    encoding): rows separated by newlines, cells by ``' | '``; a cell
    may carry a ``RxC>`` span prefix (row_span x col_span); positions
    covered by an earlier span are omitted, exactly like HTML source.
    Row 0 cells are column headers (mirrors the synthetic corpus's
    all-<th> first rows). Same occupancy-fill semantics as parse_table,
    so TEDS consumes the result directly."""
    rows = s.split("\n")
    occupied: set[tuple[int, int]] = set()
    cells: list[TableCell] = []
    max_col = 0
    for r, row in enumerate(rows):
        c = 0
        for raw in row.split(" | "):
            raw = raw.strip()
            if not raw:
                continue
            rs = cs = 1
            m = _GRAMMAR_SPAN_RE.match(raw)
            if m:
                rs, cs = max(1, int(m.group(1))), max(1, int(m.group(2)))
                raw = m.group(3).strip()
            while (r, c) in occupied:
                c += 1
            cells.append(
                TableCell(
                    text=raw,
                    row_span=rs,
                    col_span=cs,
                    start_row_offset_idx=r,
                    end_row_offset_idx=r + rs,
                    start_col_offset_idx=c,
                    end_col_offset_idx=c + cs,
                    col_header=r == 0,
                    row_header=False,
                )
            )
            for rr in range(r, r + rs):
                for cc in range(c, c + cs):
                    occupied.add((rr, cc))
            c += cs
            max_col = max(max_col, c)
    return TableGrid(num_rows=len(rows), num_cols=max_col, cells=cells)


def extract_tables(html_text: str) -> list[TableGrid]:
    """All top-level tables in document order (nested tables flattened
    into their parent's cell text — adequate for the synthetic corpus)."""
    out: list[TableGrid] = []
    for m in re.finditer(r"<table\b[^>]*>(.*?)</table\s*>", html_text, re.I | re.S):
        out.append(parse_table(m.group(1)))
    return out
