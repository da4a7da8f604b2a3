"""Layout-box agreement metrics: greedy IoU matching, per-image mAP,
corpus mAP.

Reference parallels:
- IoU (`evaluators/layout_evaluator.py:253-267`);
- greedy label-matched matching with area-weighted average IoU at
  thresholds {.5,.75,.9,.95} (`layout_evaluator.py:269-338`). The
  reference zips the all-preds weight list against the matches-only
  IoU list — positional truncation and all (`:305-307`); reproduced
  bug-for-bug so numbers line up;
- per-image mAP: fresh COCO-style metric per image
  (`layout_evaluator.py:192-238`);
- corpus mAP: one metric updated over the whole dataset
  (`layout_evaluator.py:163-190`), rebuilt here as the two-stage
  distributed algorithm of SURVEY §4.2: stage 1 emits per-detection
  match rows from a grouped kernel, stage 2 builds global per-class
  PR curves.

AP semantics are standard COCO (pycocotools/torchmetrics defaults):
IoU thresholds 0.50:0.05:0.95, 101-point interpolated precision,
greedy score-descending matching, classes without ground truth
excluded from the mean.

Scale: stage-1 matching is embarrassingly parallel per page. Stage 2
reduces detections to a per-(label, iou_thr, score-bin) TP/FP
histogram in one map-side-combining hash aggregation — no per-class
detection list is ever collected or sorted, so no group grows with
corpus size (see corpus_ap_table). The exact full-sort kernel is kept
behind ``exact=True`` as the small-data oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

IOU_THRESHOLDS = [0.5 + 0.05 * i for i in range(10)]
# i/100.0 exactly (np.linspace accumulates a half-ulp drift on some
# points, which breaks float-equality parity with SQL oracles that
# compute i/100.0)
REC_THRESHOLDS = np.arange(101) / 100.0


# ---------------------------------------------------------------- kernels


def iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """IoU of every box in a (N×4 ltrb) against every box in b (M×4)."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)))
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def greedy_label_matched_iou(
    pred_boxes: np.ndarray,
    pred_labels: np.ndarray,
    gt_boxes: np.ndarray,
    gt_labels: np.ndarray,
    iou_thresh: float = 0.5,
) -> dict:
    """Reference `_compute_average_iou_with_labels` semantics, incl.
    the weights/ious positional-zip quirk (`layout_evaluator.py:305-307`)."""
    matched_gt: set[int] = set()
    ious: list[float] = []
    weights: list[float] = []
    ious_mat = iou_matrix(pred_boxes, gt_boxes)
    for p in range(len(pred_boxes)):
        weights.append(
            abs(
                float(
                    (pred_boxes[p, 2] - pred_boxes[p, 0])
                    * (pred_boxes[p, 3] - pred_boxes[p, 1])
                )
            )
        )
        for g in range(len(gt_boxes)):
            if g not in matched_gt and pred_labels[p] == gt_labels[g]:
                iou = float(ious_mat[p, g])
                if iou >= iou_thresh:
                    matched_gt.add(g)
                    ious.append(iou)
                    break
    wsum = sum(weights)
    avg_iou = (
        sum(w * v for w, v in zip(weights, ious)) / wsum if wsum > 0 else 0.0
    )
    return {
        "average_iou": avg_iou,
        "unmatched_gt": len(gt_boxes) - len(matched_gt),
        "matched_gt": len(ious),
    }


def _match_detections(
    pred_boxes: np.ndarray,
    pred_labels: np.ndarray,
    pred_scores: np.ndarray,
    gt_boxes: np.ndarray,
    gt_labels: np.ndarray,
    iou_thr: float,
) -> np.ndarray:
    """COCO greedy matching at one threshold → tp flag per detection
    (detections ordered score-descending within each class)."""
    tp = np.zeros(len(pred_boxes), dtype=bool)
    ious = iou_matrix(pred_boxes, gt_boxes)
    for label in np.unique(pred_labels):
        p_idx = np.where(pred_labels == label)[0]
        p_idx = p_idx[np.argsort(-pred_scores[p_idx], kind="stable")]
        g_idx = np.where(gt_labels == label)[0]
        taken = np.zeros(len(g_idx), dtype=bool)
        for p in p_idx:
            best, best_iou = -1, iou_thr
            for k, g in enumerate(g_idx):
                if not taken[k] and ious[p, g] >= best_iou:
                    best, best_iou = k, ious[p, g]
            if best >= 0:
                taken[best] = True
                tp[p] = True
    return tp


def average_precision(scores: np.ndarray, tp: np.ndarray, n_gt: int) -> float:
    """COCO 101-point interpolated AP for one (class, threshold).

    Tie-aware: detections sharing a score form one PR point (threshold
    semantics, as sklearn's precision_recall_curve). With all-distinct
    scores this is exactly the classic per-detection curve; with ties
    the classic curve depends on the arbitrary sort order within the
    tie (partition order in a distributed run) — this version is
    deterministic, and it is the fixpoint the score-histogram sketch
    (`corpus_ap_table`) converges to.
    """
    if n_gt == 0:
        return float("nan")
    if len(scores) == 0:
        return 0.0
    order = np.argsort(-scores, kind="stable")
    s_sorted = scores[order]
    tp_c = np.cumsum(tp[order])
    fp_c = np.cumsum(~tp[order])
    # keep only the last point of each tied-score run
    last = np.ones(len(s_sorted), dtype=bool)
    last[:-1] = s_sorted[:-1] != s_sorted[1:]
    tp_c, fp_c = tp_c[last], fp_c[last]
    return _ap_from_curve(tp_c, fp_c, n_gt)


def _ap_from_curve(tp_c: np.ndarray, fp_c: np.ndarray, n_gt: int) -> float:
    """AP from cumulative TP/FP counts at score-descending PR points."""
    recall = tp_c / n_gt
    precision = tp_c / np.maximum(tp_c + fp_c, 1e-12)
    # precision envelope (monotone non-increasing from the right)
    for i in range(len(precision) - 1, 0, -1):
        precision[i - 1] = max(precision[i - 1], precision[i])
    idx = np.searchsorted(recall, REC_THRESHOLDS, side="left")
    return float(
        np.mean(np.where(idx < len(precision), precision[np.minimum(idx, len(precision) - 1)], 0.0))
    )


def image_map(
    pred_boxes: np.ndarray,
    pred_labels: np.ndarray,
    pred_scores: np.ndarray,
    gt_boxes: np.ndarray,
    gt_labels: np.ndarray,
) -> dict:
    """Per-image mAP / mAP@50 / mAP@75 (fresh metric per image, like
    `layout_evaluator.py:192-238`). Classes = union of GT classes."""
    classes = np.unique(gt_labels)
    if len(classes) == 0:
        return {"map": -1.0, "map_50": -1.0, "map_75": -1.0}
    per_thr: dict[float, list[float]] = {t: [] for t in IOU_THRESHOLDS}
    for thr in IOU_THRESHOLDS:
        tp = _match_detections(
            pred_boxes, pred_labels, pred_scores, gt_boxes, gt_labels, thr
        )
        for label in classes:
            sel = pred_labels == label
            ap = average_precision(
                pred_scores[sel], tp[sel], int(np.sum(gt_labels == label))
            )
            if not np.isnan(ap):
                per_thr[thr].append(ap)
    all_aps = [np.mean(v) for v in per_thr.values() if v]
    return {
        "map": float(np.mean(all_aps)) if all_aps else -1.0,
        "map_50": float(np.mean(per_thr[0.5])) if per_thr[0.5] else -1.0,
        "map_75": float(np.mean(per_thr[0.75])) if per_thr[0.75] else -1.0,
    }


# ---------------------------------------------------------------- Spark stages

_LAYOUT_EVAL_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("map_val", T.DoubleType()),
        T.StructField("map_50", T.DoubleType()),
        T.StructField("map_75", T.DoubleType()),
        T.StructField("avg_iou_50", T.DoubleType()),
        T.StructField("avg_iou_75", T.DoubleType()),
        T.StructField("avg_iou_90", T.DoubleType()),
        T.StructField("avg_iou_95", T.DoubleType()),
    ]
)


def _boxes_of(arr, with_scores: bool) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    items = arr if arr is not None else []
    boxes = np.array(
        [[it["l"], it["t"], it["r"], it["b"]] for it in items], dtype=float
    ).reshape(-1, 4)
    labels = np.array([it["label"] for it in items], dtype=object)
    scores = (
        np.array([float(it.get("score", 1.0) or 1.0) for it in items], dtype=float)
        if with_scores
        else np.ones(len(items))
    )
    return boxes, labels, scores


def layout_image_stage(
    df: DataFrame, gt_col: str = "gt_layout", pred_col: str = "pred_layout"
) -> DataFrame:
    """Per-document layout metrics; embarrassingly parallel map over
    array columns (no shuffle — both box sets ride in the row)."""
    src = df.select(F.col("url"), F.col(gt_col).alias("gt"), F.col(pred_col).alias("pred"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, gt, pred in zip(pdf["url"], pdf["gt"], pdf["pred"]):
                gb, gl, _ = _boxes_of(gt, with_scores=False)
                pb, pl, ps = _boxes_of(pred, with_scores=True)
                m = image_map(pb, pl, ps, gb, gl)
                row = {"url": url, "map_val": m["map"], "map_50": m["map_50"], "map_75": m["map_75"]}
                for thr, name in [(0.5, "avg_iou_50"), (0.75, "avg_iou_75"), (0.9, "avg_iou_90"), (0.95, "avg_iou_95")]:
                    row[name] = greedy_label_matched_iou(pb, pl, gb, gl, thr)["average_iou"]
                rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in _LAYOUT_EVAL_SCHEMA.fields])

    return src.mapInPandas(kernel, schema=_LAYOUT_EVAL_SCHEMA)


_DET_SCHEMA = T.StructType(
    [
        T.StructField("label", T.StringType()),
        T.StructField("iou_thr", T.DoubleType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("tp", T.BooleanType()),
    ]
)


def corpus_detections_stage(
    df: DataFrame, gt_col: str = "gt_layout", pred_col: str = "pred_layout"
) -> DataFrame:
    """Stage 1 of corpus mAP: per-image matching → detection rows
    (label, iou_thr, score, tp). Narrow map, no shuffle."""
    src = df.select(F.col(gt_col).alias("gt"), F.col(pred_col).alias("pred"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"label": [], "iou_thr": [], "score": [], "tp": []}
            for gt, pred in zip(pdf["gt"], pdf["pred"]):
                gb, gl, _ = _boxes_of(gt, with_scores=False)
                pb, pl, ps = _boxes_of(pred, with_scores=True)
                for thr in IOU_THRESHOLDS:
                    tp = _match_detections(pb, pl, ps, gb, gl, thr)
                    out["label"].extend(pl.tolist())
                    out["iou_thr"].extend([thr] * len(pl))
                    out["score"].extend(ps.tolist())
                    out["tp"].extend(tp.tolist())
            yield pd.DataFrame(out)

    return src.mapInPandas(kernel, schema=_DET_SCHEMA)


def corpus_gt_counts(df: DataFrame, gt_col: str = "gt_layout") -> DataFrame:
    """GT box count per class — one explode + hash agg."""
    return (
        df.select(F.explode(F.col(gt_col)).alias("it"))
        .groupBy(F.col("it.label").alias("label"))
        .agg(F.count("*").alias("n_gt"))
    )


_AP_SCHEMA = T.StructType(
    [
        T.StructField("label", T.StringType()),
        T.StructField("iou_thr", T.DoubleType()),
        T.StructField("ap", T.DoubleType()),
    ]
)


SCORE_BINS = 100_000  # 1e-5-wide bins: exact for ≤4-decimal scores


def corpus_ap_table(
    df: DataFrame,
    gt_col: str = "gt_layout",
    pred_col: str = "pred_layout",
    exact: bool = False,
) -> DataFrame:
    """Per-(label, iou_thr) corpus AP table.

    Default (sketch) path — the 100-TB design: detections are binned
    by score (1e-5-wide bins) and reduced to a per-(label, thr, bin)
    TP/FP histogram in ONE map-side-combining hash aggregation — no
    per-class detection list is ever materialized or sorted, so no
    group grows with corpus size (bounded by SCORE_BINS regardless of
    row count). The PR curve per (label, thr) is then built from the
    ≤SCORE_BINS histogram rows in a bounded Arrow kernel. Detections
    tied within a bin form one PR point — *identical* to the exact
    kernel whenever distinct scores never share a bin (always true for
    scores quantized to ≤4 decimals, e.g. model confidences), and a
    ≤1e-5-score-resolution approximation otherwise.

    ``exact=True`` keeps the round-1 shape (full per-(label,thr)
    detection list sorted in one kernel) as the small-data oracle the
    sketch is tested against.
    """
    dets = corpus_detections_stage(df, gt_col, pred_col)
    gt_counts = corpus_gt_counts(df, gt_col)

    if exact:

        def ap_kernel(key, pdf):  # no hints: PySpark's eval-type
            # inference warns on partially-inferable grouped-map hints
            label, thr = key
            n_gt = int(pdf["n_gt"].iloc[0]) if len(pdf) else 0
            ap = average_precision(
                pdf["score"].to_numpy(), pdf["tp"].to_numpy(), n_gt
            )
            return pd.DataFrame({"label": [label], "iou_thr": [thr], "ap": [ap]})

        joined = dets.join(F.broadcast(gt_counts), "label", "inner")
        aps = joined.groupBy("label", "iou_thr").applyInPandas(
            ap_kernel, schema=_AP_SCHEMA
        )
    else:
        hist = (
            dets.withColumn(
                "bin",
                F.least(
                    F.floor(F.col("score") * SCORE_BINS), F.lit(SCORE_BINS - 1)
                ).cast("int"),
            )
            .groupBy("label", "iou_thr", "bin")
            .agg(
                F.sum(F.when(F.col("tp"), 1).otherwise(0)).alias("tp_n"),
                F.count("*").alias("n"),
            )
            .join(F.broadcast(gt_counts), "label", "inner")
        )

        def hist_ap_kernel(key, pdf):  # no hints (see ap_kernel)
            label, thr = key
            n_gt = int(pdf["n_gt"].iloc[0]) if len(pdf) else 0
            p = pdf.sort_values("bin", ascending=False)
            tp_c = p["tp_n"].to_numpy().cumsum()
            all_c = p["n"].to_numpy().cumsum()
            ap = (
                float("nan")
                if n_gt == 0
                else (_ap_from_curve(tp_c, all_c - tp_c, n_gt) if len(p) else 0.0)
            )
            return pd.DataFrame({"label": [label], "iou_thr": [thr], "ap": [ap]})

        aps = hist.groupBy("label", "iou_thr").applyInPandas(
            hist_ap_kernel, schema=_AP_SCHEMA
        )

    # classes with GT but zero detections must contribute AP=0 at every
    # threshold (no detection row → no group above)
    spark = df.sparkSession
    thr_df = spark.createDataFrame(
        [(t,) for t in IOU_THRESHOLDS], schema="iou_thr double"
    )
    return (
        gt_counts.crossJoin(F.broadcast(thr_df))
        .join(aps, ["label", "iou_thr"], "left")
        .withColumn("ap", F.coalesce("ap", F.lit(0.0)))
        .select("label", "iou_thr", "ap")
    )


def per_class_ap(ap_table: DataFrame) -> DataFrame:
    """Per-class AP (averaged over IoU thresholds), sorted descending —
    the reference's per-class table (`layout_evaluator.py:68-71,240-241`)."""
    return (
        ap_table.groupBy("label")
        .agg(F.avg("ap").alias("ap"))
        .orderBy(F.desc("ap"), "label")
    )


def corpus_map(
    df: DataFrame,
    gt_col: str = "gt_layout",
    pred_col: str = "pred_layout",
    exact: bool = False,
) -> DataFrame:
    """Corpus mAP: returns (mAP, mAP@50, mAP@75) one-row DataFrame,
    averaged from the per-(label, thr) AP table (see corpus_ap_table
    for the sketch-vs-exact story)."""
    aps = corpus_ap_table(df, gt_col, pred_col, exact=exact)
    return map_from_ap_table(aps)


def map_from_ap_table(aps: DataFrame) -> DataFrame:
    """(mAP, mAP@50, mAP@75) from an already-computed (label, iou_thr,
    ap) table — lets evaluate() persist the tiny AP table once and
    derive every downstream consumer (stats JSON, per-class report)
    from the written rows instead of re-running the detection kernel."""
    return aps.agg(
        F.avg("ap").alias("map"),
        F.avg(F.when(F.col("iou_thr") == 0.5, F.col("ap"))).alias("map_50"),
        F.avg(F.when(F.col("iou_thr") == 0.75, F.col("ap"))).alias("map_75"),
    )
