"""Per-benchmark ground-truth annotation mappers (K3 family).

The reference ships one format-specific GT builder per benchmark, each
a Python switch from the benchmark's raw annotation labels onto the
canonical DocItemLabel set:

- DPBench     — ``benchmarks/dpbench/create.py:97-240`` (13-way switch
  incl. the Index→2-col-table reconstruction)
- OmniDocBench — ``benchmarks/omnidocbench/create.py:113-251`` (20-way
  switch, poly→bbox with GT-page rescaling)
- DocLayNet v1 — ``benchmarks/doclaynet_v1/create.py:94-173``
  (``category_map`` 1..11, COCO ltwh boxes)
- TableFormer-OTSL — ``benchmarks/tableformer_huggingface_otsl/
  create.py:92-200`` (one full-page table per record)

Spark-first re-expression: each mapper is a STAGE over a DataFrame of
raw annotation rows, emitting the repo's canonical GT item shape
(doc_id, idx, label, l/t/r/b top-left px, text, table_html). The label
switch is a broadcast literal map (``F.element_at(create_map, ...)``)
— codegen'd JVM-side, the Spark idiom for a reference-side Python
dict — and bbox math is pure column algebra over the coordinate
arrays (``F.aggregate`` folds), so no row ever enters Python. Rows
whose label has no mapping are dropped, mirroring the reference's
``else: return`` / error-log-and-skip behavior.

Table-bearing items carry ``table_html``; grid conversion downstream
is K4 (``extraction.tables.parse_table``), exactly as the reference
funnels every HTML table through
``convert_html_table_into_docling_tabledata``.
"""

from __future__ import annotations

from itertools import chain

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

__all__ = [
    "DPBENCH_LABEL_MAP",
    "OMNIDOCBENCH_LABEL_MAP",
    "DOCLAYNET_CATEGORY_MAP",
    "dpbench_gt_items",
    "omnidocbench_gt_items",
    "doclaynet_gt_items",
    "tableformer_otsl_gt_items",
]

# reference dpbench/create.py:137-240 — raw category → DocItemLabel
DPBENCH_LABEL_MAP = {
    "Header": "page_header",
    "Footer": "page_footer",
    "Paragraph": "text",
    "Index": "document_index",
    "List": "list_item",
    "Caption": "caption",
    "Equation": "formula",
    "Figure": "picture",
    "Table": "table",
    "Chart": "picture",
    "Footnote": "footnote",
    "Heading1": "section_header",  # add_heading(level=1)
}

# reference omnidocbench/create.py:152-245 — category_type → DocItemLabel
OMNIDOCBENCH_LABEL_MAP = {
    "title": "section_header",  # add_heading(level=1)
    "text_block": "text",
    "text_mask": "text",
    "table": "table",
    "table_caption": "caption",
    "table_footnote": "footnote",
    "table_mask": "text",
    "figure": "picture",
    "figure_caption": "caption",
    "figure_footnote": "footnote",
    "equation_isolated": "formula",
    "equation_caption": "caption",
    "code_txt": "text",
    "abandon": "text",
    "need_mask": "text",
    "header": "page_header",
    "footer": "page_footer",
    "reference": "text",
    "page_footnote": "footnote",
    "page_number": "page_footer",
}

# reference doclaynet_v1/create.py:94-106 — COCO category id → label
DOCLAYNET_CATEGORY_MAP = {
    1: "caption",
    2: "footnote",
    3: "formula",
    4: "list_item",
    5: "page_footer",
    6: "page_header",
    7: "picture",
    8: "section_header",
    9: "table",
    10: "text",
    11: "title",
}


def _lit_map(d: dict) -> Column:
    """A Python dict as a literal map column — the broadcast-dict
    idiom: the map is a constant in the generated code, no join."""
    return F.create_map(*chain.from_iterable((F.lit(k), F.lit(v)) for k, v in d.items()))


def _arr_min(arr: Column) -> Column:
    return F.array_min(arr)


def _arr_max(arr: Column) -> Column:
    return F.array_max(arr)


def dpbench_gt_items(df: DataFrame, doc_col: str = "doc_id") -> DataFrame:
    """DPBench annotation rows → canonical GT items.

    Expects columns: ``doc_id, idx, category, coordinates
    array<struct<x:double,y:double>>, text, html, page_width,
    page_height``. Coordinates are page-normalized (0..1) polygon
    points; the bbox is their min/max envelope scaled by the page size
    (reference ``dpbench/create.py:108-127``). Newlines in text
    flatten to spaces except for Index items, whose raw text is
    rebuilt into the reference's 2-column last-token table
    (``create.py:146-189``) as HTML."""
    label = F.element_at(_lit_map(DPBENCH_LABEL_MAP), F.col("category"))
    xs = F.transform("coordinates", lambda c: c["x"])
    ys = F.transform("coordinates", lambda c: c["y"])
    # Index → 2-col table: per text line, col0 = all tokens but the
    # last, col1 = last token (the reference's page-index heuristic)
    index_rows = F.transform(
        F.split(F.col("text"), "\n"),
        lambda line: F.concat(
            F.lit("<tr><td>"),
            F.array_join(
                F.slice(
                    F.split(line, " "), F.lit(1),
                    F.greatest(F.size(F.split(line, " ")) - 1, F.lit(0)),
                ),
                " ",
            ),
            F.lit("</td><td>"),
            F.element_at(F.split(line, " "), -1),
            F.lit("</td></tr>"),
        ),
    )
    index_html = F.concat(
        F.lit("<table>"), F.array_join(index_rows, ""), F.lit("</table>")
    )
    return (
        df.withColumn("label", label)
        .filter(F.col("label").isNotNull())
        .select(
            F.col(doc_col).alias("doc_id"),
            F.col("idx").cast("int").alias("idx"),
            "label",
            (_arr_min(xs) * F.col("page_width")).alias("l"),
            (_arr_min(ys) * F.col("page_height")).alias("t"),
            (_arr_max(xs) * F.col("page_width")).alias("r"),
            (_arr_max(ys) * F.col("page_height")).alias("b"),
            F.when(
                F.col("label") == "document_index", F.col("text")
            ).otherwise(F.regexp_replace("text", "\n", " ")).alias("text"),
            F.when(F.col("label") == "table", F.col("html"))
            .when(F.col("label") == "document_index", index_html)
            .alias("table_html"),
        )
    )


def omnidocbench_gt_items(df: DataFrame, doc_col: str = "doc_id") -> DataFrame:
    """OmniDocBench ``layout_dets`` rows → canonical GT items.

    Expects columns: ``doc_id, idx, category_type, poly array<double>
    (x0 y0 x1 y1 x2 y2 x3 y3, GT-image px), text, html, page_width,
    page_height, gt_width, gt_height``. The bbox is the poly envelope
    rescaled from the GT image onto the render page (reference
    ``omnidocbench/create.py:115-146``); items with no text carry the
    reference's ``&lt;omitted text for {label}&gt;`` placeholder
    (``create.py:122-124`` — the entity-escaped literal is verbatim)."""
    label = F.element_at(_lit_map(OMNIDOCBENCH_LABEL_MAP), F.col("category_type"))
    xs = F.array(*[F.element_at("poly", i) for i in (1, 3, 5, 7)])
    ys = F.array(*[F.element_at("poly", i) for i in (2, 4, 6, 8)])
    sx = F.col("page_width") / F.col("gt_width")
    sy = F.col("page_height") / F.col("gt_height")
    return (
        df.withColumn("label", label)
        .filter(F.col("label").isNotNull())  # reference logs + skips
        .select(
            F.col(doc_col).alias("doc_id"),
            F.col("idx").cast("int").alias("idx"),
            "label",
            (_arr_min(xs) * sx).alias("l"),
            (_arr_min(ys) * sy).alias("t"),
            (_arr_max(xs) * sx).alias("r"),
            (_arr_max(ys) * sy).alias("b"),
            F.coalesce(
                F.col("text"),
                F.concat(
                    F.lit("&lt;omitted text for "),
                    F.col("category_type"),
                    F.lit("&gt;"),
                ),
            ).alias("text"),
            F.when(F.col("label") == "table", F.col("html")).alias("table_html"),
        )
    )


def doclaynet_gt_items(df: DataFrame, doc_col: str = "doc_id") -> DataFrame:
    """DocLayNet v1 COCO annotation rows → canonical GT items.

    Expects columns: ``doc_id, idx, category_id int, box array<double>
    (COCO ltwh, px in the original page), content, page_width,
    page_height, new_width, new_height``. Boxes convert ltwh→ltrb
    (reference ``doclaynet_v1/create.py:109-117``) and scale to the
    render size (``scale_to_size``); orientation stays top-left (the
    repo's canonical bbox convention — the reference flips to
    bottom-left only because docling-core stores that origin)."""
    label = F.element_at(_lit_map(DOCLAYNET_CATEGORY_MAP), F.col("category_id"))
    sx = F.col("new_width") / F.col("page_width")
    sy = F.col("new_height") / F.col("page_height")
    bx = F.element_at("box", 1)
    by = F.element_at("box", 2)
    bw = F.element_at("box", 3)
    bh = F.element_at("box", 4)
    return (
        df.withColumn("label", label)
        .filter(F.col("label").isNotNull())
        .select(
            F.col(doc_col).alias("doc_id"),
            F.col("idx").cast("int").alias("idx"),
            "label",
            (bx * sx).alias("l"),
            (by * sy).alias("t"),
            ((bx + bw) * sx).alias("r"),
            ((by + bh) * sy).alias("b"),
            F.col("content").alias("text"),
            F.lit(None).cast("string").alias("table_html"),
        )
    )


def tableformer_otsl_gt_items(df: DataFrame, doc_col: str = "filename") -> DataFrame:
    """TableFormer/HuggingFace-OTSL records → canonical GT items (one
    ``table`` item per record).

    Expects columns: ``filename, html array<string>, width, height,
    table_bbox array<double> (ltrb px, nullable)``. The table HTML is
    the fragment join wrapped in ``<table>`` tags (reference
    ``tableformer_huggingface_otsl/create.py:168-171``); the bbox is
    ``table_bbox`` when present, else the full image
    (``create.py:173-181``), kept in top-left orientation."""
    has_bbox = F.col("table_bbox").isNotNull() & (F.size("table_bbox") == 4)
    return df.select(
        F.col(doc_col).alias("doc_id"),
        F.lit(0).alias("idx"),
        F.lit("table").alias("label"),
        F.when(has_bbox, F.element_at("table_bbox", 1)).otherwise(F.lit(0.0)).alias("l"),
        F.when(has_bbox, F.element_at("table_bbox", 2)).otherwise(F.lit(0.0)).alias("t"),
        F.when(has_bbox, F.element_at("table_bbox", 3))
        .otherwise(F.col("width").cast("double")).alias("r"),
        F.when(has_bbox, F.element_at("table_bbox", 4))
        .otherwise(F.col("height").cast("double")).alias("b"),
        F.lit(None).cast("string").alias("text"),
        F.concat(
            F.lit("<table>"), F.array_join("html", ""), F.lit("</table>")
        ).alias("table_html"),
    )
