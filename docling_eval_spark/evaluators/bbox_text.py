"""Bbox-matched text metrics (SURVEY J4, reference
`evaluators/bbox_text_evaluator.py:143-290`).

Per document: pick the side with fewer boxes as pivot (default); map
every "other" box to its argmax-IoU pivot box (strict-greater argmax →
first maximal index; NO threshold — a 0-IoU box still maps, matching
the reference); many-to-one; unmatched TRUE boxes become orphan
matches with empty predictions. Per match: six token-level metrics on
the concatenated tokenized texts; dataset rollup via evaluators.stats.

Spark shape: the per-document O(N·M) IoU matrix runs as vectorized
NumPy inside an Arrow-batched kernel (both box sets ride in the row —
narrow map, no shuffle until the stats rollup).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

from docling_eval_spark.evaluators.layout import iou_matrix
from docling_eval_spark.evaluators.text_metrics import token_metrics, tokenize

METRIC_KEYS = ["bleu", "f1_score", "precision", "recall", "edit_distance", "meteor"]


def match_bboxes(
    true_items: list[dict[str, Any]],
    pred_items: list[dict[str, Any]],
    pivot: str | None = None,
) -> list[dict[str, list]]:
    """Reference `_match_bboxes` semantics on (text, l, t, r, b) items."""
    if pivot is not None:
        assert pivot in ("true", "pred")
    boxes = {
        "true": np.array(
            [[i["l"], i["t"], i["r"], i["b"]] for i in true_items], dtype=float
        ).reshape(-1, 4),
        "pred": np.array(
            [[i["l"], i["t"], i["r"], i["b"]] for i in pred_items], dtype=float
        ).reshape(-1, 4),
    }
    texts = {
        "true": [i.get("text") or "" for i in true_items],
        "pred": [i.get("text") or "" for i in pred_items],
    }
    if pivot is None:
        pivot = "true" if len(boxes["true"]) <= len(boxes["pred"]) else "pred"
    other = "pred" if pivot == "true" else "true"

    pivot_mappings: dict[int, list[int]] = {}
    matched_other: set[int] = set()
    if len(boxes[other]) and len(boxes[pivot]):
        ious = iou_matrix(boxes[other], boxes[pivot])
        # strict-greater scan == np.argmax (first maximal index)
        best = np.argmax(ious, axis=1)
        for other_id, pivot_id in enumerate(best):
            pivot_mappings.setdefault(int(pivot_id), []).append(other_id)
            matched_other.add(other_id)

    orphan_trues = [
        t
        for t in range(len(boxes["true"]))
        if (pivot == "true" and t not in pivot_mappings)
        or (pivot == "pred" and t not in matched_other)
    ]

    matches: list[dict[str, list]] = []
    for pivot_id, other_ids in pivot_mappings.items():
        other_tokens: list[str] = []
        for oid in other_ids:
            other_tokens.extend(tokenize(texts[other][oid]))
        matches.append(
            {
                f"{pivot}_tokens": tokenize(texts[pivot][pivot_id]),
                f"{other}_tokens": other_tokens,
            }
        )
    for t in orphan_trues:
        matches.append(
            {"true_tokens": tokenize(texts["true"][t]), "pred_tokens": []}
        )
    return matches


def evaluate_document(
    true_items: list[dict[str, Any]], pred_items: list[dict[str, Any]]
) -> list[dict[str, float]]:
    return [
        token_metrics(m["true_tokens"], m["pred_tokens"])
        for m in match_bboxes(true_items, pred_items)
    ]


# ---------------------------------------------------------------- stage

_OUT = T.StructType(
    [T.StructField("url", T.StringType()), T.StructField("match_id", T.IntegerType())]
    + [T.StructField(k, T.DoubleType()) for k in METRIC_KEYS]
)


def bbox_text_stage(
    df: DataFrame, gt_col: str = "gt_layout_text", pred_col: str = "pred_layout_text"
) -> DataFrame:
    """Input: url + two array<struct(text,l,t,r,b)> columns → one row
    per bbox match with the six metrics."""
    src = df.select("url", F.col(gt_col).alias("gt"), F.col(pred_col).alias("pred"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, gt, pred in zip(pdf["url"], pdf["gt"], pdf["pred"]):
                gt = [dict(i) for i in (gt if gt is not None else [])]
                pred = [dict(i) for i in (pred if pred is not None else [])]
                for mid, scores in enumerate(evaluate_document(gt, pred)):
                    rows.append({"url": url, "match_id": mid, **scores})
            yield pd.DataFrame(rows, columns=[f.name for f in _OUT.fields])

    return src.mapInPandas(kernel, schema=_OUT)
