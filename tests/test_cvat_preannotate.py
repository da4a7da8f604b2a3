"""CVAT preannotation writer (VERDICT r4 #4): write → parse round-trip
through the repo's own CVAT XML reader, plus the project-properties
sidecar shape."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F

from docling_eval_spark.sources.cvat_preannotate import (
    DOC_LINK_LABELS,
    TABLE_COMPONENT_LABELS,
    cvat_project_properties,
    write_cvat_preannotations,
    write_cvat_project_properties,
)
from docling_eval_spark.sources.cvat_xml import read_cvat_annotations


def _boxes_df(spark, n_images=7, boxes_per_image=3):
    rows = []
    for i in range(n_images):
        name = f"doc_abc{i:02d}_page_000001.png"
        for b in range(boxes_per_image):
            rows.append(
                (
                    name,
                    800.0,
                    1000.0,
                    ["text", "table", "picture"][b % 3],
                    b,                      # box_id fixes z-order
                    10.0 * b + i,
                    20.0 * b + i,
                    10.0 * b + i + 50.0,
                    20.0 * b + i + 40.0,
                )
            )
    return spark.createDataFrame(
        rows,
        "image_name string, page_width double, page_height double, "
        "label string, box_id int, l double, t double, r double, b double",
    )


def test_preannotate_roundtrip(spark, tmp_path):
    tasks = str(tmp_path / "tasks")
    df = _boxes_df(spark)
    summary = write_cvat_preannotations(df, tasks, bucket_size=3).collect()
    # 7 images / bucket_size 3 → tasks 00,01,02 with 3+3+1 images
    by_bucket = {r["bucket_id"]: (r["n_images"], r["n_boxes"]) for r in summary}
    assert by_bucket == {0: (3, 9), 1: (3, 9), 2: (1, 3)}
    for r in summary:
        assert os.path.basename(r["file"]) == (
            f"task_{r['bucket_id']:02}_preannotate.xml"
        )
        assert os.path.exists(r["file"])

    # round-trip through the repo's CVAT reader: identical box set
    back = read_cvat_annotations(spark, f"{tasks}/*.xml")
    got = sorted(
        (r["image_name"], r["page_width"], r["page_height"], r["label"],
         r["l"], r["t"], r["r"], r["b"])
        for r in back.collect()
    )
    want = sorted(
        (r["image_name"], r["page_width"], r["page_height"], r["label"],
         r["l"], r["t"], r["r"], r["b"])
        for r in df.collect()
    )
    assert got == want


def test_preannotate_xml_attrs_and_escaping(spark, tmp_path):
    """Box attributes match the reference emitter (utils.py:173-174)
    and attribute values are XML-escaped."""
    tasks = str(tmp_path / "tasks")
    df = spark.createDataFrame(
        [("pg \"quoted\" & <odd>.png", 10.0, 20.0, "text", 0, 1.0, 2.0, 3.0, 4.0)],
        "image_name string, page_width double, page_height double, "
        "label string, box_id int, l double, t double, r double, b double",
    )
    write_cvat_preannotations(df, tasks, bucket_size=200).collect()
    with open(os.path.join(tasks, "task_00_preannotate.xml")) as fh:
        xml = fh.read()
    assert 'source="docling"' in xml and 'occluded="0"' in xml
    assert 'xtl="1.0"' in xml and 'ybr="4.0"' in xml and 'z_order="0"' in xml
    # escaped name survives the round-trip
    back = read_cvat_annotations(spark, f"{tasks}/*.xml").collect()
    assert back[0]["image_name"] == 'pg "quoted" & <odd>.png'


def test_preannotate_default_order_without_box_id(spark, tmp_path):
    """Without box_id, z_order falls back to (t,l,r,b,label) — stable
    across partitionings."""
    rows = [
        ("img.png", 100.0, 100.0, "text", 5.0, 9.0, 15.0, 19.0),
        ("img.png", 100.0, 100.0, "table", 1.0, 2.0, 11.0, 12.0),
        ("img.png", 100.0, 100.0, "picture", 1.0, 1.0, 11.0, 11.0),
    ]
    schema = (
        "image_name string, page_width double, page_height double, "
        "label string, l double, t double, r double, b double"
    )
    outs = []
    for nparts in (1, 3):
        tasks = str(tmp_path / f"tasks{nparts}")
        df = spark.createDataFrame(rows, schema).repartition(nparts)
        write_cvat_preannotations(df, tasks, bucket_size=10).collect()
        back = read_cvat_annotations(spark, f"{tasks}/*.xml")
        outs.append(
            [  # box_id carries the written z_order
                (r["box_id"], r["label"])
                for r in sorted(back.collect(), key=lambda r: r["box_id"])
            ]
        )
    assert outs[0] == outs[1]
    assert outs[0] == [(0, "picture"), (1, "table"), (2, "text")]


def test_preannotate_custom_image_col_and_dim_conflict(spark, tmp_path):
    """image_col != default must work end-to-end (review regression:
    the kernel once hardcoded 'image_name'); conflicting dims for one
    image collapse to ONE <image> element (max dims), never two."""
    tasks = str(tmp_path / "tasks")
    df = spark.createDataFrame(
        [
            ("p1.png", 800.0, 1000.0, "text", 0, 1.0, 2.0, 3.0, 4.0),
            ("p1.png", 800.0, 1001.0, "table", 1, 5.0, 6.0, 7.0, 8.0),
        ],
        "img string, page_width double, page_height double, "
        "label string, box_id int, l double, t double, r double, b double",
    )
    summary = write_cvat_preannotations(
        df, tasks, bucket_size=10, image_col="img"
    ).collect()
    assert [(r["n_images"], r["n_boxes"]) for r in summary] == [(1, 2)]
    back = read_cvat_annotations(spark, f"{tasks}/*.xml").collect()
    assert len(back) == 2  # no box duplication across forked ids
    assert {r["image_name"] for r in back} == {"p1.png"}
    assert {r["page_height"] for r in back} == {1001.0}  # max wins


def test_project_properties_shape(tmp_path):
    props = cvat_project_properties()
    by_name = {p["name"]: p for p in props}
    # every rectangle doc label + table components + polyline links
    assert by_name["table"]["type"] == "rectangle"
    for lbl in TABLE_COMPONENT_LABELS:
        assert by_name[lbl]["type"] == "rectangle"
    for lbl in DOC_LINK_LABELS:
        assert by_name[lbl]["type"] == "polyline"
    # attribute parity with the reference's EMITTED output
    assert by_name["section_header"]["attributes"][0]["name"] == "level"
    assert by_name["list_item"]["attributes"][0]["name"] == "level"
    pic_attrs = {a["name"]: a for a in by_name["picture"]["attributes"]}
    assert pic_attrs["picture-class"]["default_value"] == "other"
    assert "json" in pic_attrs
    # the reference's dead formula/code branches emit NO attributes
    assert by_name["formula"]["attributes"] == []
    assert by_name["code"]["attributes"] == []
    # colors are #rrggbb
    for p in props:
        assert len(p["color"]) == 7 and p["color"][0] == "#"
    # sidecar write round-trips as JSON
    path = str(tmp_path / "project.json")
    write_cvat_project_properties(path)
    with open(path) as fh:
        assert json.load(fh) == props


def test_image_col_collision_raises(spark, tmp_path):
    """A custom image_col alongside an existing image_name column
    would produce two image_name columns after the rename and crash
    downstream with AMBIGUOUS_REFERENCE — rejected up front."""
    import pytest

    from docling_eval_spark.sources.cvat_preannotate import (
        write_cvat_preannotations,
    )

    df = spark.createDataFrame(
        [("a.png", "other.png", 100.0, 100.0, "text", 1.0, 2.0, 3.0, 4.0)],
        "img string, image_name string, page_width double, "
        "page_height double, label string, l double, t double, "
        "r double, b double",
    )
    with pytest.raises(ValueError, match="image_name"):
        write_cvat_preannotations(df, str(tmp_path), image_col="img")
