"""Real-PDF content-stream extraction on spec-compliant fixtures
(built by a minimal from-scratch PDF writer — no PDF libs in the
container, so fixtures are generated from the public file format)."""

from __future__ import annotations

import zlib

import pytest

from docling_eval_spark.extraction.kernel import extract_document, extract_text
from docling_eval_spark.extraction.pdf_real import parse_pdf


def make_pdf(page_streams: list[bytes], compress: bool = False) -> bytes:
    """Minimal valid PDF: catalog → pages → page+content per stream."""
    objs: list[bytes] = []
    n_pages = len(page_streams)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    for i, cs in enumerate(page_streams):
        page_num, content_num = 3 + 2 * i, 4 + 2 * i
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


SIMPLE_CS = (
    b"BT /F1 12 Tf 72 720 Td (Hello real PDF world) Tj ET\n"
    b"BT /F1 12 Tf 72 680 Td (Second paragraph with) Tj 0 -14 Td "
    b"(a continued line) Tj ET"
)


def test_uncompressed_pdf_text():
    pdf = make_pdf([SIMPLE_CS])
    pages, blocks = parse_pdf(pdf)
    assert pages == [(1, 612.0, 792.0)]
    texts = [b.text for b in blocks]
    assert texts[0] == "Hello real PDF world"
    assert "Second paragraph with" in texts[1]
    assert "a continued line" in texts[1]
    # geometry: first block near y=720 from top-left → t = 792-732=60
    assert blocks[0].t == pytest.approx(792 - 720 - 12)
    assert blocks[0].l == 72.0


def test_flate_and_multipage_and_kernel_route():
    cs2 = b"BT /F1 10 Tf 100 700 Td (Page two content) Tj ET"
    pdf = make_pdf([SIMPLE_CS, cs2], compress=True)
    doc = extract_document(pdf)
    assert doc["status"] == "SUCCESS"
    assert doc["mimetype"] == "application/pdf"
    assert len(doc["pages"]) == 2
    assert "Hello real PDF world" in doc["text"]
    assert "Page two content" in doc["text"]
    # reading order: page 1 blocks before page 2
    assert doc["text"].index("Hello") < doc["text"].index("Page two")


def test_string_escapes_hex_and_tj_array():
    cs = (
        rb"BT /F1 12 Tf 72 700 Td (Escaped \(parens\) and \\ back\051) Tj ET"
        b"\nBT /F1 12 Tf 72 650 Td <48656C6C6F> Tj ET"
        b"\nBT /F1 12 Tf 72 600 Td [(A) -120 (B) -120 (C)] TJ ET"
    )
    pdf = make_pdf([cs])
    _, blocks = parse_pdf(pdf)
    texts = [b.text for b in blocks]
    assert texts[0] == "Escaped (parens) and \\ back)"
    assert texts[1] == "Hello"
    assert texts[2] == "ABC"


def test_degradation_paths():
    # garbage with a PDF magic but no page objects → FAILURE row
    doc = extract_document(b"%PDF-1.7 not really a pdf")
    assert doc["status"] == "FAILURE"
    assert "ValueError" in doc["error"]
    # encrypted marker → clearly-marked unsupported
    enc = make_pdf([SIMPLE_CS])[:-6] + b"/Encrypt 9 0 R\n%%EOF"
    assert extract_document(enc)["status"] == "FAILURE"
    # corrupt Flate stream degrades to empty text, not a crash
    pdf = make_pdf([SIMPLE_CS], compress=True).replace(b"stream\nx", b"stream\nZZ", 1)
    assert extract_text(pdf) == ""


def test_table_lattice_recovery():
    """Alignment-based table recovery (reference evaluates tables from
    PDFs, table_evaluator.py:111-243): per-cell text ops on a rigid
    grid come back as a unit-cell grid and leave the text flow."""
    from docling_eval_spark.extraction.pdf_write import simple_pdf

    paras = ["first paragraph of body text", "second paragraph of body text"]
    tbl = [["h0", "h1", "h2"], ["a0", "a1", "a2"], ["b0", "b1", "b2"]]
    pdf = simple_pdf([paras], table_pages=[tbl])
    doc = extract_document(pdf)
    assert doc["status"] == "SUCCESS"
    assert doc["text"] == "\n\n".join(paras)  # cells excluded from text
    assert len(doc["tables"]) == 1
    g = doc["tables"][0]
    assert (g["num_rows"], g["num_cols"]) == (3, 3)
    cells = {(c["start_row_offset_idx"], c["start_col_offset_idx"]): c for c in g["cells"]}
    assert cells[(0, 0)]["text"] == "h0" and cells[(0, 0)]["col_header"]
    assert cells[(2, 2)]["text"] == "b2" and not cells[(2, 2)]["col_header"]
    # paragraph-only PDFs must never false-positive into tables
    doc2 = extract_document(simple_pdf([paras + ["third one here"]]))
    assert doc2["tables"] == [] and doc2["status"] == "SUCCESS"


def test_table_recovery_with_colspan():
    """Stream-mode span inference: a missing lattice slot reads as the
    previous cell's col_span."""
    from docling_eval_spark.extraction.pdf_write import simple_pdf

    paras = ["leading paragraph of ordinary body text"]
    tbl = [["h0", "h1", "h2"], ["a0", "a1", None], ["b0", "b1", "b2"]]
    doc = extract_document(simple_pdf([paras], table_pages=[tbl]))
    assert doc["status"] == "SUCCESS" and len(doc["tables"]) == 1
    g = doc["tables"][0]
    assert (g["num_rows"], g["num_cols"]) == (3, 3)
    cells = {(c["start_row_offset_idx"], c["start_col_offset_idx"]): c for c in g["cells"]}
    assert cells[(1, 1)]["col_span"] == 2  # a1 spans the missing slot
    assert cells[(0, 1)]["col_span"] == 1
    from docling_eval_spark.evaluators.teds import is_complex_grid

    assert is_complex_grid(g)


def test_table_recovery_with_rowspan():
    """Stream-mode ROW-span recovery: a cell whose text sits
    vertically centered between two grid rows, with its column empty
    in both, reads back as a row_span=2 merged cell — and the gap it
    covers is NOT absorbed into a neighbor's col_span."""
    from docling_eval_spark.extraction.pdf_write import simple_pdf
    from docling_eval_spark.evaluators.teds import is_complex_grid

    paras = ["leading paragraph of ordinary body text"]
    # column 2 of rows 1-2 is one merged cell ("m") centered between
    # the two row bands
    tbl = [
        ["h0", "h1", "h2"],
        ["a0", "a1", ("m", 2)],
        ["b0", "b1", None],
        ["c0", "c1", "c2"],
    ]
    doc = extract_document(simple_pdf([paras], table_pages=[tbl]))
    assert doc["status"] == "SUCCESS" and len(doc["tables"]) == 1
    assert doc["text"] == paras[0]  # merged cell never leaks into text
    g = doc["tables"][0]
    assert (g["num_rows"], g["num_cols"]) == (4, 3)
    cells = {
        (c["start_row_offset_idx"], c["start_col_offset_idx"]): c
        for c in g["cells"]
    }
    m = cells[(1, 2)]
    assert m["text"] == "m" and m["row_span"] == 2
    assert m["end_row_offset_idx"] == 3 and m["col_span"] == 1
    # the spanned slot blocks horizontal absorption: a1/b1 stay span 1
    assert cells[(1, 1)]["col_span"] == 1
    assert cells[(2, 1)]["col_span"] == 1
    assert cells[(3, 2)]["text"] == "c2" and cells[(3, 2)]["row_span"] == 1
    assert is_complex_grid(g)

    # a weak row that is ordinary body text (left-aligned with column
    # 0, column occupied above and below) must still BREAK the run,
    # never be absorbed as a merged cell
    tbl2 = [["h0", "h1"], ["a0", "a1"]]
    paras2 = ["x" * 3]  # short para, lands at column-0 x
    pdf2 = simple_pdf([paras2], table_pages=[tbl2])
    doc2 = extract_document(pdf2)
    assert doc2["status"] == "SUCCESS"
    assert doc2["text"] == paras2[0]
    assert len(doc2["tables"]) == 1
    assert doc2["tables"][0]["num_rows"] == 2


def test_rowspan_cells_never_overlap():
    """Review repro: two merged cells in the same column must not
    expand into each other — growth is symmetric around the text's
    vertical center, and a floater with no free adjacent slot demotes
    to body text instead of overlapping."""
    from docling_eval_spark.extraction.pdf_write import simple_pdf

    paras = ["leading paragraph of ordinary body text"]
    # column 2: merged over rows 1-2 AND merged over rows 3-4
    tbl = [
        ["h0", "h1", "h2"],
        ["a0", "a1", ("mA", 2)],
        ["b0", "b1", None],
        ["c0", "c1", ("mB", 2)],
        ["d0", "d1", None],
        ["e0", "e1", "e2"],
    ]
    doc = extract_document(simple_pdf([paras], table_pages=[tbl]))
    assert doc["status"] == "SUCCESS" and len(doc["tables"]) == 1
    g = doc["tables"][0]
    assert (g["num_rows"], g["num_cols"]) == (6, 3)
    spans = {
        c["text"]: (
            c["start_row_offset_idx"],
            c["end_row_offset_idx"],
            c["start_col_offset_idx"],
        )
        for c in g["cells"]
    }
    assert spans["mA"] == (1, 3, 2)
    assert spans["mB"] == (3, 5, 2)
    # no slot is claimed twice
    occupied = set()
    for c in g["cells"]:
        for r in range(c["start_row_offset_idx"], c["end_row_offset_idx"]):
            for cc in range(c["start_col_offset_idx"], c["end_col_offset_idx"]):
                assert (r, cc) not in occupied, (r, cc)
                occupied.add((r, cc))


def test_rowspan_truncated_run_floater_requalifies():
    """Review repro: a floater anchored only to a column introduced by
    strong rows AFTER a run-breaking body-text row must not crash
    (KeyError) nor attach to the truncated run — the document stays
    SUCCESS and the body text survives."""
    from docling_eval_spark.extraction.pdf_write import (
        paragraphs_to_stream,
        table_to_stream,
        write_pdf,
    )

    # strong rows {x0, x0+110} at y=600, 580; a floater at x0+220
    # centered between them; a body-text row at 560 breaking the run;
    # a later strong row {x0, x0+110, x0+220} at 540 that alone
    # introduces the floater's column.
    cs = (
        paragraphs_to_stream(["leading paragraph of ordinary body text"])
        + b"\n"
        + table_to_stream([["p0", "p1"], ["q0", "q1"]], 600)
        + b"\n"
        + table_to_stream([[None, None, ("fx", 2)]], 600)
        + b"\n"
        + b"BT /F1 10 Tf 72 560 Td (body text row here) Tj ET\n"
        + table_to_stream([["r0", "r1", "r2"]], 540)
    )
    doc = extract_document(write_pdf([cs]))
    assert doc["status"] == "SUCCESS"
    assert "body text row here" in doc["text"]
