"""The extraction kernel: raw page bytes → extracted document.

Pure functions (stdlib only). The same code runs (a) single-process as
the parity oracle in tests and (b) vectorized over Arrow batches inside
``mapInPandas`` (stage.py) — which is exactly the byte-identical-text
invariant the pipeline is graded on: both paths call this function.

Reference parallels:
- conversion dispatch on mimetype: `cli/main.py:115-237` + converter
  selection in `converters/conversion.py:31-158`;
- per-document output record: `benchmarks/dpbench/create.py:322-341`
  (document id, payload, status, mimetype columns).
"""

from __future__ import annotations

import hashlib
import re
from typing import Any

from docling_eval_spark.extraction.boilerplate import classify
from docling_eval_spark.extraction.html_lexer import lex_blocks
from docling_eval_spark.extraction.pdf_mini import (
    MAGIC as PDF_MINI_MAGIC,
    parse_minipdf,
    reading_order,
)
from docling_eval_spark.extraction.tables import extract_tables

# ASCII-only whitespace class — identical semantics in Python re, Spark
# (Java regex) and DuckDB (RE2) so the oracle SQL can reproduce it.
_WS_RE = re.compile(r"[ \t\n\r\f\v]+")

BLOCK_SEP = "\n\n"


def normalize_ws(s: str) -> str:
    """Collapse ASCII whitespace runs to single spaces and strip.

    The reference applies the same family of cleanups when assembling
    text (`benchmarks/dpbench/create.py:121`, `benchmarks/utils.py:182`,
    `cvat_annotation/create.py:300`).
    """
    return _WS_RE.sub(" ", s).strip()


def sniff_mimetype(data: bytes) -> str:
    if data.startswith(PDF_MINI_MAGIC) or data.startswith(b"%PDF"):
        return "application/pdf"
    return "text/html"


def _extract_html(data: bytes, charset_hint: str | None = None) -> dict[str, Any]:
    from docling_eval_spark.extraction.charset import decode_html

    html_text, enc, _src = decode_html(data, transport=charset_hint)
    blocks = lex_blocks(html_text)
    flags = classify(blocks)
    items: list[dict[str, Any]] = []
    title = ""
    for blk, is_content in zip(blocks, flags):
        txt = normalize_ws(blk.text)
        if not txt:
            continue
        if blk.in_head:
            if not title:
                title = txt
            continue
        if blk.in_table or blk.in_boiler:
            continue
        if is_content:
            items.append({"label": blk.label, "text": txt})
    tables = [
        {
            "num_rows": g.num_rows,
            "num_cols": g.num_cols,
            "cells": [vars(c) for c in g.cells],
        }
        for g in extract_tables(html_text)
    ]
    text = BLOCK_SEP.join(it["text"] for it in items)
    _add_charspans(items)
    return {"title": title, "items": items, "tables": tables, "text": text,
            "pages": [], "layout": [], "encoding": enc}


def _add_charspans(items: list[dict[str, Any]]) -> None:
    """Provenance char offsets of each item within the final text
    (ProvenanceItem.charspan semantics, reference
    `cvat_annotation/create.py:417`): [start, end) over the
    BLOCK_SEP-joined document text."""
    off = 0
    for it in items:
        end = off + len(it["text"])
        it["charspan"] = [off, end]
        off = end + len(BLOCK_SEP)


def _extract_pdf(data: bytes) -> dict[str, Any]:
    tables: list[dict[str, Any]] = []
    if data.startswith(PDF_MINI_MAGIC):
        pages, blocks = parse_minipdf(data)
    else:
        from docling_eval_spark.extraction.pdf_real import (
            parse_pdf,
            recover_table_blocks,
        )

        pages, blocks = parse_pdf(data)
        # real PDFs carry no labels: recover table lattices by
        # coordinate alignment, remove their cells from the text flow
        blocks, tables = recover_table_blocks(blocks)
    width = pages[0][1] if pages else 612.0
    ordered = reading_order(blocks, page_width=width)
    items = []
    layout = []
    for blk in ordered:
        if blk.label == "table":
            # table-labeled PDF blocks carry the cell grammar (reference
            # evaluates tables from PDFs too, `table_evaluator.py:111-243`);
            # like the HTML path, tables are structured grids and are
            # excluded from the text / items / layout streams
            from docling_eval_spark.extraction.tables import parse_cell_grammar

            g = parse_cell_grammar(blk.text)
            tables.append(
                {
                    "num_rows": g.num_rows,
                    "num_cols": g.num_cols,
                    "cells": [vars(c) for c in g.cells],
                }
            )
            continue
        txt = normalize_ws(blk.text)
        if not txt:
            continue
        items.append({"label": blk.label, "text": txt})
        layout.append(
            {
                "label": blk.label,
                "page_no": blk.page_no,
                "l": blk.l,
                "t": blk.t,
                "r": blk.r,
                "b": blk.b,
            }
        )
    text = BLOCK_SEP.join(it["text"] for it in items)
    _add_charspans(items)
    return {
        "title": "",
        "items": items,
        "tables": tables,
        "text": text,
        "pages": [{"page_no": p, "width": w, "height": h} for p, w, h in pages],
        "layout": layout,
    }


def extract_document(
    data: bytes, charset_hint: str | None = None
) -> dict[str, Any]:
    """Full extraction: bytes → {status, mimetype, encoding, title,
    text, items, tables, layout, pages, content_hash}. Never raises —
    failures come back as status='FAILURE' rows, matching the
    reference's failure-row convention
    (`tableformer_huggingface_otsl/create.py:243-259`).

    ``charset_hint`` is the transport-layer charset label (HTTP
    Content-Type — the WARC source surfaces it as ``http_charset``);
    the HTML path sniffs BOM/meta/fallback per WHATWG precedence
    (`extraction/charset.py`)."""
    try:
        mimetype = sniff_mimetype(data)
        doc = (
            _extract_pdf(data)
            if mimetype == "application/pdf"
            else _extract_html(data, charset_hint=charset_hint)
        )
        doc["mimetype"] = mimetype
        doc["status"] = "SUCCESS"
    except Exception as exc:  # failure row, not task failure
        doc = {
            "mimetype": "application/octet-stream",
            "status": "FAILURE",
            "title": "",
            "items": [],
            "tables": [],
            "text": "",
            "pages": [],
            "layout": [],
            "error": f"{type(exc).__name__}: {exc}",
        }
    doc.setdefault("error", "")
    doc.setdefault("encoding", "")  # PDF/failure rows: not a text decode
    doc["content_hash"] = hashlib.sha256(data).hexdigest()
    doc["text_md5"] = hashlib.md5(doc["text"].encode("utf-8")).hexdigest()
    return doc


def extract_text(data: bytes) -> str:
    """Main-content text only (the byte-identity surface)."""
    return extract_document(data)["text"]


def extract_text_ld(data: bytes, charset_hint: str | None = None) -> str:
    """Extractor B: link-density-only main-content text (see
    `boilerplate.classify_link_density`). Same lexer, same charset
    sniff, same BLOCK_SEP assembly as extractor A — ONLY the
    content/boilerplate rule differs, so A/B disagreement isolates
    the classification policy, not the parsing."""
    from docling_eval_spark.extraction.boilerplate import (
        classify_link_density,
    )
    from docling_eval_spark.extraction.charset import decode_html
    from docling_eval_spark.extraction.html_lexer import lex_blocks

    html_text, _enc, _src = decode_html(data, transport=charset_hint)
    blocks = lex_blocks(html_text)
    flags = classify_link_density(blocks)
    items = []
    for blk, is_content in zip(blocks, flags):
        if blk.in_head or blk.in_table:
            continue
        txt = normalize_ws(blk.text)
        if not txt or not is_content:
            continue
        items.append(txt)
    return BLOCK_SEP.join(items)
