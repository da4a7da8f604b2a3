"""Per-benchmark GT annotation mappers vs the reference's label
switches (dpbench/create.py, omnidocbench/create.py,
doclaynet_v1/create.py, tableformer_huggingface_otsl/create.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from docling_eval_spark.extraction.tables import parse_table
from docling_eval_spark.sources.benchmark_gt import (
    DOCLAYNET_CATEGORY_MAP,
    DPBENCH_LABEL_MAP,
    OMNIDOCBENCH_LABEL_MAP,
    doclaynet_gt_items,
    dpbench_gt_items,
    omnidocbench_gt_items,
    tableformer_otsl_gt_items,
)


def _dp_row(idx, category, text="some text", html=None, coords=None):
    return {
        "doc_id": "d1",
        "idx": idx,
        "category": category,
        "coordinates": coords or [
            {"x": 0.1, "y": 0.2}, {"x": 0.5, "y": 0.2},
            {"x": 0.5, "y": 0.4}, {"x": 0.1, "y": 0.4},
        ],
        "text": text,
        "html": html,
        "page_width": 1000.0,
        "page_height": 800.0,
    }


DP_SCHEMA = (
    "doc_id string, idx int, category string, "
    "coordinates array<struct<x:double,y:double>>, text string, "
    "html string, page_width double, page_height double"
)


def test_dpbench_full_label_switch(spark):
    """Every branch of the reference's 13-way switch, incl. the
    unknown-label drop (dpbench/create.py:137-240)."""
    cats = list(DPBENCH_LABEL_MAP) + ["SomethingElse"]
    rows = [_dp_row(i, c) for i, c in enumerate(cats)]
    out = dpbench_gt_items(spark.createDataFrame(rows, DP_SCHEMA))
    got = {r["idx"]: r["label"] for r in out.collect()}
    # unknown category dropped (reference: else → return)
    assert len(cats) - 1 not in got
    for i, c in enumerate(cats[:-1]):
        assert got[i] == DPBENCH_LABEL_MAP[c]
    # the two picture-producing categories agree
    assert DPBENCH_LABEL_MAP["Figure"] == DPBENCH_LABEL_MAP["Chart"] == "picture"


def test_dpbench_bbox_and_text_flatten(spark):
    out = dpbench_gt_items(
        spark.createDataFrame([_dp_row(0, "Paragraph", text="a\nb")], DP_SCHEMA)
    ).collect()[0]
    # polygon envelope × page size (create.py:108-127)
    assert (out["l"], out["t"], out["r"], out["b"]) == (100.0, 160.0, 500.0, 320.0)
    assert out["text"] == "a b"  # newline flattened for non-Index


def test_dpbench_index_two_col_table(spark):
    """Index text lines become the 2-column last-token table
    (create.py:146-189); the emitted HTML parses to that grid via the
    repo's own K4 parser."""
    txt = "alpha beta 3\ngamma 7"
    out = dpbench_gt_items(
        spark.createDataFrame([_dp_row(0, "Index", text=txt)], DP_SCHEMA)
    ).collect()[0]
    assert out["label"] == "document_index"
    assert out["text"] == txt  # Index keeps raw newlines
    grid = parse_table(out["table_html"])
    texts = {(c.start_row_offset_idx, c.start_col_offset_idx): c.text for c in grid.cells}
    assert texts == {
        (0, 0): "alpha beta", (0, 1): "3",
        (1, 0): "gamma", (1, 1): "7",
    }


def test_dpbench_table_html_passthrough(spark):
    html = "<table><tr><td>x</td></tr></table>"
    out = dpbench_gt_items(
        spark.createDataFrame([_dp_row(0, "Table", html=html)], DP_SCHEMA)
    ).collect()[0]
    assert out["table_html"] == html
    # non-table items carry no table_html
    out2 = dpbench_gt_items(
        spark.createDataFrame([_dp_row(0, "Caption")], DP_SCHEMA)
    ).collect()[0]
    assert out2["table_html"] is None


OD_SCHEMA = (
    "doc_id string, idx int, category_type string, poly array<double>, "
    "text string, html string, page_width double, page_height double, "
    "gt_width double, gt_height double"
)


def _od_row(idx, cat, text="t", html=None, poly=None):
    return {
        "doc_id": "d1", "idx": idx, "category_type": cat,
        "poly": poly or [10.0, 20.0, 50.0, 20.0, 50.0, 80.0, 10.0, 80.0],
        "text": text, "html": html,
        "page_width": 200.0, "page_height": 400.0,
        "gt_width": 100.0, "gt_height": 200.0,
    }


def test_omnidocbench_full_label_switch(spark):
    """All 20 branches of omnidocbench/create.py:152-245 plus the
    log-and-skip branch for unknown labels."""
    cats = list(OMNIDOCBENCH_LABEL_MAP) + ["mystery"]
    rows = [_od_row(i, c) for i, c in enumerate(cats)]
    out = omnidocbench_gt_items(spark.createDataFrame(rows, OD_SCHEMA))
    got = {r["idx"]: r["label"] for r in out.collect()}
    assert len(cats) - 1 not in got  # unknown skipped
    for i, c in enumerate(cats[:-1]):
        assert got[i] == OMNIDOCBENCH_LABEL_MAP[c]
    # spot-check the reference's grouping decisions
    assert OMNIDOCBENCH_LABEL_MAP["page_number"] == "page_footer"
    assert OMNIDOCBENCH_LABEL_MAP["equation_caption"] == "caption"
    assert OMNIDOCBENCH_LABEL_MAP["abandon"] == "text"


def test_omnidocbench_poly_rescale_and_placeholder(spark):
    out = omnidocbench_gt_items(
        spark.createDataFrame([_od_row(0, "figure", text=None)], OD_SCHEMA)
    ).collect()[0]
    # GT-image px rescaled onto the 2× render page (create.py:126-146)
    assert (out["l"], out["t"], out["r"], out["b"]) == (20.0, 40.0, 100.0, 160.0)
    # missing text → the reference's entity-escaped placeholder
    assert out["text"] == "&lt;omitted text for figure&gt;"


DLN_SCHEMA = (
    "doc_id string, idx int, category_id int, box array<double>, "
    "content string, page_width double, page_height double, "
    "new_width double, new_height double"
)


def test_doclaynet_category_map_and_ltwh(spark):
    rows = [
        {
            "doc_id": "d1", "idx": i, "category_id": cid,
            "box": [10.0, 20.0, 30.0, 40.0], "content": f"c{cid}",
            "page_width": 100.0, "page_height": 200.0,
            "new_width": 200.0, "new_height": 400.0,
        }
        for i, cid in enumerate(list(DOCLAYNET_CATEGORY_MAP) + [99])
    ]
    out = doclaynet_gt_items(spark.createDataFrame(rows, DLN_SCHEMA))
    got = {r["idx"]: r for r in out.collect()}
    assert len(rows) - 1 not in got  # unmapped id 99 dropped
    for i, cid in enumerate(DOCLAYNET_CATEGORY_MAP):
        assert got[i]["label"] == DOCLAYNET_CATEGORY_MAP[cid]
    # ltwh→ltrb then ×2 scale (create.py:109-117 + scale_to_size)
    r0 = got[0]
    assert (r0["l"], r0["t"], r0["r"], r0["b"]) == (20.0, 40.0, 80.0, 120.0)


TF_SCHEMA = (
    "filename string, html array<string>, width double, height double, "
    "table_bbox array<double>"
)


def test_tableformer_otsl_table_item(spark):
    rows = [
        {"filename": "a.png",
         "html": ["<tr><td>1</td><td>2</td></tr>", "<tr><td>3</td><td>4</td></tr>"],
         "width": 640.0, "height": 480.0, "table_bbox": [5.0, 6.0, 600.0, 400.0]},
        {"filename": "b.png", "html": ["<tr><td>x</td></tr>"],
         "width": 320.0, "height": 240.0, "table_bbox": None},
    ]
    out = {r["doc_id"]: r for r in
           tableformer_otsl_gt_items(spark.createDataFrame(rows, TF_SCHEMA)).collect()}
    a, b = out["a.png"], out["b.png"]
    assert a["label"] == b["label"] == "table"
    # bbox honored when present, else full image (create.py:173-181)
    assert (a["l"], a["t"], a["r"], a["b"]) == (5.0, 6.0, 600.0, 400.0)
    assert (b["l"], b["t"], b["r"], b["b"]) == (0.0, 0.0, 320.0, 240.0)
    # fragment join wrapped in <table> (create.py:168-171), parseable by K4
    grid = parse_table(a["table_html"])
    assert {(c.start_row_offset_idx, c.start_col_offset_idx): c.text for c in grid.cells} == {
        (0, 0): "1", (0, 1): "2", (1, 0): "3", (1, 1): "4",
    }


def test_benchmark_gt_no_python_in_plan(spark):
    """All four mappers are pure column algebra — no Python eval node
    anywhere in their plans (the broadcast-dict label switch is a
    literal map in codegen)."""
    dfs = [
        dpbench_gt_items(spark.createDataFrame([_dp_row(0, "Paragraph")], DP_SCHEMA)),
        omnidocbench_gt_items(
            spark.createDataFrame([_od_row(0, "title")], OD_SCHEMA)
        ),
        doclaynet_gt_items(spark.createDataFrame(
            [{"doc_id": "d", "idx": 0, "category_id": 1,
              "box": [0.0, 0.0, 1.0, 1.0], "content": "c",
              "page_width": 1.0, "page_height": 1.0,
              "new_width": 1.0, "new_height": 1.0}], DLN_SCHEMA)),
        tableformer_otsl_gt_items(spark.createDataFrame(
            [{"filename": "f", "html": ["<tr><td>a</td></tr>"],
              "width": 1.0, "height": 1.0, "table_bbox": None}], TF_SCHEMA)),
    ]
    for df in dfs:
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan and "MapInPandas" not in plan
