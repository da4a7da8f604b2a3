"""OTSL table-token-stream → span-aware grid (SURVEY K5).

OTSL (Optimized Table Structure Language, public docling format) is a
flat token stream describing a table lattice:

    <fcel>text   full cell        <ched>text  column-header cell
    <ecel>       empty cell       <rhed>text  row-header cell
    <lcel>       left-merge       <srow>text  section-row cell
    <ucel>       up-merge         <xcel>      2-D merge
    <nl>         row end          <loc_N>/<otsl> wrappers (ignored)

Span inference matches the reference parser
(`benchmarks/funsd/create.py:47-184`): a cell's col_span counts the
run of lcel/xcel to its right in the token lattice, row_span counts
the run of ucel/xcel below its column.

Output grid dicts plug straight into evaluators.teds. The inverse
(``grid_to_otsl``) exists so tests can round-trip arbitrary grids.

Spark surface: ``otsl_parse_stage`` — Arrow-batched kernel from an
OTSL string column to the table-grid struct (the VLM/model-output
ingestion path).
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from typing import Any

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame

_CELL_STARTS = {"<fcel>", "<ecel>", "<ched>", "<rhed>", "<srow>"}
_MERGES = {"<lcel>", "<ucel>", "<xcel>"}
_TOKEN_RE = re.compile(r"(<[^>]+>)")


def _tokens_and_texts(s: str) -> tuple[list[str], list[str]]:
    """(lattice tokens, mixed token/text stream), loc/otsl wrappers
    dropped — reference `extract_tokens_and_text`."""
    parts = [p for p in _TOKEN_RE.split(s) if p and p.strip()]
    keep = [
        p
        for p in parts
        if not (p.startswith("<loc_") or p in ("<otsl>", "</otsl>"))
    ]
    tokens = [p for p in keep if _TOKEN_RE.fullmatch(p)]
    return tokens, keep


def parse_otsl(s: str) -> dict[str, Any]:
    """OTSL string → grid dict {num_rows, num_cols, cells:[...]}."""
    tokens, mixed = _tokens_and_texts(s)
    rows: list[list[str]] = []
    cur: list[str] = []
    for t in tokens:
        if t == "<nl>":
            rows.append(cur)
            cur = []
        elif t in _CELL_STARTS or t in _MERGES:
            cur.append(t)
    if cur:
        rows.append(cur)

    def count_right(r: int, c: int) -> int:
        span = 0
        while c < len(rows[r]) and rows[r][c] in ("<lcel>", "<xcel>"):
            span += 1
            c += 1
        return span

    def count_down(r: int, c: int) -> int:
        span = 0
        while r < len(rows) and c < len(rows[r]) and rows[r][c] in ("<ucel>", "<xcel>"):
            span += 1
            r += 1
        return span

    cells: list[dict[str, Any]] = []
    r_idx = c_idx = 0
    for i, tok in enumerate(mixed):
        if tok in _CELL_STARTS:
            text = ""
            if tok != "<ecel>" and i + 1 < len(mixed) and not _TOKEN_RE.fullmatch(
                mixed[i + 1]
            ):
                text = mixed[i + 1].strip()
            col_span = 1 + count_right(r_idx, c_idx + 1)
            row_span = 1 + count_down(r_idx + 1, c_idx)
            cells.append(
                {
                    "text": text,
                    "row_span": row_span,
                    "col_span": col_span,
                    "start_row_offset_idx": r_idx,
                    "end_row_offset_idx": r_idx + row_span,
                    "start_col_offset_idx": c_idx,
                    "end_col_offset_idx": c_idx + col_span,
                    "col_header": tok == "<ched>",
                    "row_header": tok == "<rhed>",
                }
            )
        if tok in _CELL_STARTS or tok in _MERGES:
            c_idx += 1
        elif tok == "<nl>":
            r_idx += 1
            c_idx = 0
    return {
        "num_rows": len(rows),
        "num_cols": max((len(r) for r in rows), default=0),
        "cells": cells,
    }


def grid_to_otsl(grid: dict[str, Any]) -> str:
    """Inverse: grid dict → OTSL string (round-trip testing + synthetic
    model-output generation)."""
    nrows, ncols = grid.get("num_rows") or 0, grid.get("num_cols") or 0
    lattice = [["<ecel>"] * ncols for _ in range(nrows)]
    texts: dict[tuple[int, int], str] = {}
    for c in grid.get("cells") or []:
        r0, c0 = c["start_row_offset_idx"], c["start_col_offset_idx"]
        tok = "<ched>" if c.get("col_header") else (
            "<rhed>" if c.get("row_header") else
            ("<fcel>" if (c.get("text") or "") else "<ecel>")
        )
        lattice[r0][c0] = tok
        if c.get("text"):
            texts[(r0, c0)] = c["text"]
        for rr in range(r0, r0 + (c.get("row_span") or 1)):
            for cc in range(c0, c0 + (c.get("col_span") or 1)):
                if (rr, cc) == (r0, c0):
                    continue
                if rr == r0:
                    lattice[rr][cc] = "<lcel>"
                elif cc == c0:
                    lattice[rr][cc] = "<ucel>"
                else:
                    lattice[rr][cc] = "<xcel>"
    out: list[str] = ["<otsl>"]
    for r in range(nrows):
        for c in range(ncols):
            out.append(lattice[r][c])
            if (r, c) in texts:
                out.append(texts[(r, c)])
        out.append("<nl>")
    out.append("</otsl>")
    return "".join(out)


_GRID_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("num_rows", T.IntegerType()),
        T.StructField("num_cols", T.IntegerType()),
        T.StructField(
            "cells",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("text", T.StringType()),
                        T.StructField("row_span", T.IntegerType()),
                        T.StructField("col_span", T.IntegerType()),
                        T.StructField("start_row_offset_idx", T.IntegerType()),
                        T.StructField("end_row_offset_idx", T.IntegerType()),
                        T.StructField("start_col_offset_idx", T.IntegerType()),
                        T.StructField("end_col_offset_idx", T.IntegerType()),
                        T.StructField("col_header", T.BooleanType()),
                        T.StructField("row_header", T.BooleanType()),
                    ]
                )
            ),
        ),
    ]
)


def otsl_parse_stage(df: DataFrame, otsl_col: str = "otsl") -> DataFrame:
    """(url, otsl string) → (url, num_rows, num_cols, cells)."""
    src = df.select("url", otsl_col)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, s in zip(pdf["url"], pdf[otsl_col]):
                g = parse_otsl(s if s is not None else "")
                rows.append(
                    {
                        "url": url,
                        "num_rows": g["num_rows"],
                        "num_cols": g["num_cols"],
                        "cells": [tuple(c.values()) for c in g["cells"]],
                    }
                )
            yield pd.DataFrame(rows, columns=["url", "num_rows", "num_cols", "cells"])

    return src.mapInPandas(kernel, schema=_GRID_SCHEMA)
