"""CVAT-style annotation XML → boxes DataFrame (SURVEY S7).

The reference parses CVAT annotation XML with xmltodict
(`cvat_annotation/create.py:834-839`) into per-image box/polyline
dicts. Spark-first shape: read whole XML files with the binaryFile
source (one row per annotation file — these are small sidecar files,
not the data plane), parse with stdlib ElementTree inside an
Arrow-batched kernel, explode to one row per box.

Output: (file, image_name, page_width, page_height, label, box_id,
l, t, r, b) — joins directly against the spatial operators
(operators/spatial.py) for the point-in-box / IoU recovery flows the
reference builds on CVAT data (J6/J7).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

CVAT_BOX_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("image_name", T.StringType()),
        T.StructField("page_width", T.DoubleType()),
        T.StructField("page_height", T.DoubleType()),
        T.StructField("label", T.StringType()),
        T.StructField("box_id", T.IntegerType()),
        T.StructField("l", T.DoubleType()),
        T.StructField("t", T.DoubleType()),
        T.StructField("r", T.DoubleType()),
        T.StructField("b", T.DoubleType()),
    ]
)


def parse_cvat_xml(data: bytes, file: str = "") -> list[dict]:
    """One annotation XML → box rows (pure function; malformed files
    yield an empty list rather than raising — sidecar hygiene)."""
    try:
        root = ET.fromstring(data)
    except ET.ParseError:
        return []
    rows: list[dict] = []
    for image in root.iter("image"):
        name = image.get("name", "")
        w = float(image.get("width", 0) or 0)
        h = float(image.get("height", 0) or 0)
        box_id = 0
        for box in image.iter("box"):
            rows.append(
                {
                    "file": file,
                    "image_name": name,
                    "page_width": w,
                    "page_height": h,
                    "label": box.get("label", ""),
                    "box_id": box_id,
                    "l": float(box.get("xtl", 0) or 0),
                    "t": float(box.get("ytl", 0) or 0),
                    "r": float(box.get("xbr", 0) or 0),
                    "b": float(box.get("ybr", 0) or 0),
                }
            )
            box_id += 1
        # polylines → their bounding box (the reference walks polyline
        # points into enclosing boxes; the bbox is what J6 consumes)
        for poly in image.iter("polyline"):
            pts = [
                tuple(float(c) for c in p.split(","))
                for p in (poly.get("points", "") or "").split(";")
                if "," in p
            ]
            if not pts:
                continue
            xs, ys = [p[0] for p in pts], [p[1] for p in pts]
            rows.append(
                {
                    "file": file,
                    "image_name": name,
                    "page_width": w,
                    "page_height": h,
                    "label": poly.get("label", ""),
                    "box_id": box_id,
                    "l": min(xs),
                    "t": min(ys),
                    "r": max(xs),
                    "b": max(ys),
                }
            )
            box_id += 1
    return rows


def _find_box(boxes: list[dict], x: float, y: float) -> int:
    """Smallest-area box containing the point, -1 if none — the same
    min-area point-in-box rule as the reference's find_box
    (`cvat_annotation/create.py:68-90`) and operators/spatial.py J6."""
    best, area = -1, float("inf")
    for i, b in enumerate(boxes):
        if b["l"] <= x <= b["r"] and b["t"] <= y <= b["b"]:
            # abs on BOTH extents: a degenerate annotation (r<l or
            # b<t) must not get a negative area that always wins the
            # min-area rule (it can't contain the point anyway under
            # the l<=x<=r, t<=y<=b guard, but keep the area honest)
            a = abs(b["r"] - b["l"]) * abs(b["b"] - b["t"])
            if a < area:
                best, area = i, a
    return best


def parse_cvat_ground_truth(data: bytes, file: str = "") -> list[dict]:
    """CVAT annotation XML → ORDERED ground-truth item rows via the
    merged-box reading-order walk (reference
    `cvat_annotation/create.py:514-800`):

    - every polyline's points map to box ids by the min-area
      point-in-box rule;
    - the polyline labeled ``reading_order`` (one per image) dictates
      item order; boxes already emitted are skipped (the reference's
      ``already_added`` guard);
    - polylines labeled ``merge`` whose FIRST boxid is the current box
      append their remaining boxes to the current item (one logical
      item spanning several rectangles) and mark them added. A tail
      box that was ALREADY emitted (visited earlier in reading order)
      is not folded again, and repeated polyline points never
      duplicate an id inside ``merged_box_ids`` — a box belongs to
      exactly one GT item. (The reference's get_next_provs folds
      uncritically, `create.py:375-424`, which can double-count a box
      under adversarial annotations; this is a deliberate tightening.)

    Output rows: (file, image_name, order_idx, box_id, label,
    l, t, r, b, merged_box_ids). Images without a reading_order
    polyline yield no rows (the reference skips those annotations)."""
    try:
        root = ET.fromstring(data)
    except ET.ParseError:
        return []
    out: list[dict] = []
    for image in root.iter("image"):
        name = image.get("name", "")
        boxes = [
            {
                "label": bx.get("label", ""),
                "l": float(bx.get("xtl", 0) or 0),
                "t": float(bx.get("ytl", 0) or 0),
                "r": float(bx.get("xbr", 0) or 0),
                "b": float(bx.get("ybr", 0) or 0),
            }
            for bx in image.iter("box")
        ]
        if not boxes:
            continue
        ro_boxids: list[int] | None = None
        merges: list[list[int]] = []
        for poly in image.iter("polyline"):
            pts = [
                tuple(float(c) for c in p.split(","))
                for p in (poly.get("points", "") or "").split(";")
                if "," in p
            ]
            boxids = [
                bid
                for bid in (_find_box(boxes, x, y) for x, y in pts)
                if bid >= 0
            ]
            plabel = poly.get("label", "")
            if plabel == "reading_order" and ro_boxids is None:
                ro_boxids = boxids
            elif plabel == "merge":
                merges.append(boxids)
        if ro_boxids is None:
            continue
        already: set[int] = set()
        order_idx = 0
        for boxid in ro_boxids:
            if boxid in already:
                continue
            already.add(boxid)
            merged = [boxid]
            for m in merges:
                if len(m) > 1 and m[0] == boxid:
                    for b2 in m[1:]:
                        if b2 in already or b2 in merged:
                            continue
                        already.add(b2)
                        merged.append(b2)
            b = boxes[boxid]
            out.append(
                {
                    "file": file,
                    "image_name": name,
                    "order_idx": order_idx,
                    "box_id": boxid,
                    "label": b["label"],
                    "l": b["l"],
                    "t": b["t"],
                    "r": b["r"],
                    "b": b["b"],
                    "merged_box_ids": merged,
                }
            )
            order_idx += 1
    return out


CVAT_GT_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("image_name", T.StringType()),
        T.StructField("order_idx", T.IntegerType()),
        T.StructField("box_id", T.IntegerType()),
        T.StructField("label", T.StringType()),
        T.StructField("l", T.DoubleType()),
        T.StructField("t", T.DoubleType()),
        T.StructField("r", T.DoubleType()),
        T.StructField("b", T.DoubleType()),
        T.StructField("merged_box_ids", T.ArrayType(T.IntegerType())),
    ]
)


def read_cvat_ground_truth(spark: SparkSession, glob: str) -> DataFrame:
    """Glob of CVAT XML files → ordered GT item rows (K3 surface). The
    walk is per-annotation-file local (bounded sidecars), so the kernel
    runs shuffle-free; downstream ARD consumes order_idx directly."""
    files = spark.read.format("binaryFile").load(glob).select("path", "content")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in CVAT_GT_SCHEMA.fields]
        for pdf in batches:
            rows: list[dict] = []
            for path, content in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_cvat_ground_truth(bytes(content), file=path))
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(kernel, schema=CVAT_GT_SCHEMA)


def read_cvat_annotations(spark: SparkSession, glob: str) -> DataFrame:
    """Glob of CVAT XML files → box rows."""
    files = spark.read.format("binaryFile").load(glob).select("path", "content")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in CVAT_BOX_SCHEMA.fields]
        for pdf in batches:
            rows: list[dict] = []
            for path, content in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_cvat_xml(bytes(content), file=path))
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(kernel, schema=CVAT_BOX_SCHEMA)
