"""CVAT preannotation writer — the annotation-tool INPUT side of the
CVAT surface (reference: `benchmarks/cvat_annotation/preannotate.py`:
project properties :34-155, per-page preannotation XML :156-306).

`sources/cvat_xml.py` reads CVAT XML back (S7); this module produces
it: given a boxes DataFrame (one row per predicted box, image-pixel
top-left-origin coords — the same shape `read_cvat_annotations`
returns), emit the reference's bucket-of-200-images task files
``task_{NN}_preannotate.xml`` plus the CVAT project-properties JSON
that configures the annotation UI.

Spark-first shape: the reference walks documents in a Python loop and
flushes a list per bucket; here image ids and bucket ids are assigned
with window functions (the W5 shard-bucketing pattern), the frame is
grouped per bucket, and ONE grouped-map kernel writes each bucket's
XML file — every bucket lands in exactly one task, written once,
from whichever executor owns the group. Task files are annotation-
tool sidecars (hundreds of images each), so per-bucket files are the
scale unit the tool itself imposes, not a Spark limitation.

Parity notes:
- box XML attributes match the reference emitter byte-for-byte
  (`utils.py:173-174`): label/source/occluded/xtl/ytl/xbr/ybr with
  ``z_order`` = per-image box ordinal.
- the reference's FORMULA/CODE attribute branches compare an enum to
  a LIST (``item == [DocItemLabel.FORMULA]`` — always False), so its
  emitted properties never carry those attributes; this writer
  matches the emitted shape, not the dead code.
- docling_core's per-label RGB table is not bundled (container
  constraint); rectangle colors derive from a stable md5 of the label
  name instead. Colors are a UI hint — every structural field
  (names, types, attributes) matches the reference output.
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Iterator
from xml.sax.saxutils import quoteattr

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, Window

from docling_eval_spark.extraction.serializers import MARKDOWN_LABELS

# reference `cvat_annotation/utils.py:14-42` — link labels drawn as
# polylines, with the reference's exact colors (they are part of the
# annotation-spec contract, like the benchmark label maps)
DOC_LINK_LABELS: dict[str, tuple[int, int, int]] = {
    "reading_order": (255, 0, 0),
    "to_caption": (0, 255, 0),
    "to_footnote": (0, 255, 0),
    "to_value": (0, 255, 0),
    "merge": (255, 0, 255),
    "group": (255, 255, 0),
}

# reference `cvat_annotation/utils.py:44-65`
TABLE_COMPONENT_LABELS: dict[str, tuple[int, int, int]] = {
    "table_row": (255, 0, 0),
    "table_column": (0, 255, 0),
    "table_group": (0, 0, 255),
}

# the picture-class select values the reference pulls from
# PictureClassificationLabel; "other" is the default
PICTURE_CLASSES = [
    "bar_chart", "bar_code", "chemistry_markush_structure",
    "chemistry_molecular_structure", "flow_chart", "icon",
    "line_chart", "logo", "map", "other", "pie_chart", "qr_code",
    "remote_sensing", "screenshot", "signature", "stamp",
]


def rgb_to_hex(r: int, g: int, b: int) -> str:
    return f"#{r:02x}{g:02x}{b:02x}"


def _label_color(label: str) -> str:
    d = hashlib.md5(label.encode()).digest()
    return rgb_to_hex(d[0], d[1], d[2])


def cvat_project_properties() -> list[dict]:
    """The CVAT project label-properties list (reference
    `preannotate.py:34-155`): one rectangle entry per document item
    label (with the level / picture-class / json attributes), one
    rectangle entry per table component, one polyline entry per link
    label."""
    results: list[dict] = []
    for label in sorted(MARKDOWN_LABELS):
        entry: dict = {
            "name": label,
            "color": _label_color(label),
            "type": "rectangle",
            "attributes": [],
        }
        if label in ("list_item", "section_header"):
            entry["attributes"].append(
                {
                    "name": "level",
                    "input_type": "number",
                    "mutable": True,
                    "values": ["1", "10", "1"],
                    "default_value": "1",
                }
            )
        if label == "picture":
            entry["attributes"].append(
                {
                    "name": "picture-class",
                    "input_type": "select",
                    "mutable": True,
                    "values": list(PICTURE_CLASSES),
                    "default_value": "other",
                }
            )
            entry["attributes"].append(
                {
                    "name": "json",
                    "mutable": True,
                    "input_type": "text",
                    "values": [""],
                    "default_value": "",
                }
            )
        results.append(entry)
    for label, (r, g, b) in TABLE_COMPONENT_LABELS.items():
        results.append(
            {
                "name": label,
                "color": rgb_to_hex(r, g, b),
                "type": "rectangle",
                "attributes": [],
            }
        )
    for label, (r, g, b) in DOC_LINK_LABELS.items():
        results.append(
            {
                "name": label,
                "color": rgb_to_hex(r, g, b),
                "type": "polyline",
                "attributes": [],
            }
        )
    return results


def write_cvat_project_properties(path: str) -> None:
    """Driver-side sidecar write (one small JSON per project)."""
    with open(path, "w") as fw:
        fw.write(json.dumps(cvat_project_properties(), indent=2))


_TASK_SCHEMA = T.StructType(
    [
        T.StructField("bucket_id", T.IntegerType()),
        T.StructField("n_images", T.IntegerType()),
        T.StructField("n_boxes", T.LongType()),
        T.StructField("file", T.StringType()),
    ]
)


def write_cvat_preannotations(
    boxes: DataFrame,
    tasks_dir: str,
    bucket_size: int = 200,
    image_col: str = "image_name",
) -> DataFrame:
    """Boxes frame → per-bucket ``task_{NN}_preannotate.xml`` files
    under ``tasks_dir``; returns (bucket_id, n_images, n_boxes, file)
    — one row per task written.

    Expected columns: ``image_col`` (unique per page image; renamed to
    ``image_name`` internally and in the output XML),
    ``page_width``/``page_height`` (image pixel dims; if box rows
    disagree for one image the max wins — one ``<image>`` element per
    name, never two), ``label``, ``l``/``t``/``r``/``b``
    (top-left-origin pixel coords) — exactly what
    `read_cvat_annotations` yields, so write∘read round-trips.
    Optional ``box_id`` fixes the per-image box order (z_order);
    otherwise boxes order by (t, l, r, b, label).

    Image ids are 1-based sequential in image-name order and buckets
    hold ``bucket_size`` consecutive images (reference
    `preannotate.py:165-186`). The id-assignment window is a global
    sort over DISTINCT image names — metadata-cardinality (one row
    per page image, not per box), the same trade W5's shard bucketing
    makes."""
    import os

    os.makedirs(tasks_dir, exist_ok=True)
    if image_col != "image_name":  # kernel + join key use one name
        if "image_name" in boxes.columns:
            # renaming would leave TWO image_name columns and every
            # later reference would raise AMBIGUOUS_REFERENCE
            raise ValueError(
                f"image_col={image_col!r} conflicts with an existing "
                "'image_name' column; drop or rename it first"
            )
        boxes = boxes.withColumnRenamed(image_col, "image_name")
    has_box_id = "box_id" in boxes.columns
    order = (
        [F.col("box_id").asc()]
        if has_box_id
        else [F.col(c).asc() for c in ("t", "l", "r", "b", "label")]
    )

    # ONE id per image NAME (CVAT rejects duplicate frames): if box
    # rows disagree on an image's dims (mixed upstream render DPIs),
    # the max wins deterministically rather than forking the image
    # into two <image> elements
    images = (
        boxes.groupBy("image_name")
        .agg(
            F.max("page_width").alias("page_width"),
            F.max("page_height").alias("page_height"),
        )
        .withColumn(
            "__img_id",
            F.row_number().over(Window.orderBy(F.col("image_name").asc())),
        )
        .withColumn(
            "bucket_id",
            ((F.col("__img_id") - 1) / bucket_size).cast("int"),
        )
    )
    w_img = Window.partitionBy("image_name").orderBy(*order)
    ordered = (
        boxes.drop("page_width", "page_height")
        .withColumn("__z", F.row_number().over(w_img) - 1)
        .join(images, "image_name")
    )

    def write_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(pdf["bucket_id"].iloc[0])
        path = os.path.join(tasks_dir, f"task_{bucket:02}_preannotate.xml")
        parts = ['<?xml version="1.0" encoding="utf-8"?>', "<annotations>"]
        n_img = 0
        for (img_id, name, w, h), g in sorted(
            pdf.groupby(["__img_id", "image_name", "page_width", "page_height"],
                        sort=False).indices.items()
        ):
            n_img += 1
            sub = pdf.iloc[g].sort_values("__z")
            parts.append(
                f'<image id="{int(img_id)}" name={quoteattr(str(name))} '
                f'width="{int(w)}" height="{int(h)}">'
            )
            for lab, bl, bt, br, bb, z in zip(
                sub["label"], sub["l"], sub["t"], sub["r"], sub["b"], sub["__z"]
            ):
                parts.append(
                    f'<box label={quoteattr(str(lab))} source="docling" '
                    f'occluded="0" xtl="{bl}" ytl="{bt}" '
                    f'xbr="{br}" ybr="{bb}" z_order="{int(z)}">'
                    "</box>"
                )
            parts.append("</image>")
        parts.append("</annotations>")
        with open(path, "w") as fw:
            fw.write("\n".join(parts) + "\n")
        return pd.DataFrame(
            {
                "bucket_id": [bucket],
                "n_images": [n_img],
                "n_boxes": [len(pdf)],
                "file": [path],
            }
        )

    cols = ["image_name", "page_width", "page_height", "label",
            "l", "t", "r", "b", "__z", "__img_id", "bucket_id"]
    return (
        ordered.select(*cols)
        .groupBy("bucket_id")
        .applyInPandas(write_bucket, schema=_TASK_SCHEMA)
    )
