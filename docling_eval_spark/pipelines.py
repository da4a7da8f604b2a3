"""Three-phase pipeline mirroring the reference CLI
(`cli/main.py:456-563`: evaluate -t {create|evaluate|visualize}).

- **create**    — pages table → benchmark dataset: run the extraction
  kernel, keep ground truth + prediction side by side (the reference's
  GroundTruthDocument/PredictedDocument pre-join, SURVEY J1), write
  sharded parquet (+ per-bucket lineage when requested).
- **evaluate**  — dataset → per-document metric rows + dataset stats,
  one modality per call: markdown_text, table_structure (TEDS),
  layout (per-image + corpus mAP), reading_order (ARD), bbox_text.
- **visualize** — metric rows → report files (json/md/svg/html) via
  reporting.reports.

Each phase is a plain function over DataFrames (composable, testable);
cli.py provides the argv surface.
"""

from __future__ import annotations

from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from docling_eval_spark.evaluators.bbox_text import bbox_text_stage
from docling_eval_spark.evaluators.layout import corpus_map, layout_image_stage
from docling_eval_spark.evaluators.reading_order import ard_stage
from docling_eval_spark.evaluators.stats import compute_stats
from docling_eval_spark.evaluators.teds import teds_stage
from docling_eval_spark.evaluators.text_metrics import METRIC_COLS, text_metrics_stage
from docling_eval_spark.extraction.stage import extract_stage
from docling_eval_spark.reporting.reports import (
    delta_row_col_report,
    save_comparison_html,
    write_metric_report,
)
from docling_eval_spark.sources.pages_source import read_pages, write_sharded

MODALITIES = ["markdown_text", "table_structure", "layout", "reading_order", "bbox_text"]


# ------------------------------------------------------------------ create


def create_dataset(
    spark: SparkSession,
    pages_path: str,
    output_dir: str,
    buckets: int | None = 16,
    records_per_shard: int = 1000,
    perturb: float | None = None,
) -> None:
    """pages (url, warc_ts, html, text, lang) → benchmark dataset.

    One narrow extraction map + one equi-join with the GT columns;
    output sharded like the reference's SHARD_SIZE=1000 writer
    (`benchmarks/utils.py:377-403`). ``perturb`` plugs the K10 model
    slot: a seeded noise stage produces pred_text/pred_tables/
    pred_layout prediction columns so evaluators measure a non-trivial
    model instead of identity."""
    pages = read_pages(spark, pages_path)
    ex = extract_stage(pages)
    if perturb is not None:
        from docling_eval_spark.extraction.perturb import perturb_stage

        ex = perturb_stage(ex, p=perturb)
    dataset = ex.join(
        pages.select("url", F.col("text").alias("gt_text"), "lang", "warc_ts"),
        "url",
    )
    write_sharded(
        dataset,
        output_dir,
        records_per_shard=records_per_shard,
        bucket_by_url=buckets,
    )


def read_dataset(spark: SparkSession, dataset_dir: str) -> DataFrame:
    return spark.read.parquet(dataset_dir)


# ---------------------------------------------------------------- evaluate


def evaluate_markdown_text(ds: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Per-doc text metrics (gt_text vs extracted_text) + stats rows
    (reference markdown_text_evaluator semantics; our extracted text IS
    the markdown body for text-label docs)."""
    pred_col = "pred_text" if "pred_text" in ds.columns else "extracted_text"
    per_doc = text_metrics_stage(
        ds.select("url", "gt_text", F.col(pred_col).alias("pred")),
        true_col="gt_text",
        pred_col="pred",
    )
    stats = None
    for m in METRIC_COLS:
        s = compute_stats(per_doc, m).withColumn("metric", F.lit(m))
        stats = s if stats is None else stats.unionByName(s)
    return per_doc, stats


def evaluate_table_structure(
    ds: DataFrame, gt_tables_col: str = "tables", pred_tables_col: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """TEDS per table + all/simple/complex stats
    (`table_evaluator.py:150-172`). With a synthetic-identity dataset
    the GT and pred table columns coincide; a model stage (K10 slot)
    would populate a separate pred column."""
    if pred_tables_col is None:
        pred_tables_col = "pred_tables" if "pred_tables" in ds.columns else "tables"
    per_table = teds_stage(
        ds.select(
            "url",
            F.col(gt_tables_col).alias("gt_tables"),
            F.col(pred_tables_col).alias("pred_tables"),
        ).filter(F.size(gt_tables_col) > 0)
    )
    stats = (
        compute_stats(per_table, "teds").withColumn("split", F.lit("all"))
        .unionByName(
            compute_stats(per_table.filter(~F.col("is_complex")), "teds").withColumn(
                "split", F.lit("simple")
            )
        )
        .unionByName(
            compute_stats(per_table.filter(F.col("is_complex")), "teds").withColumn(
                "split", F.lit("complex")
            )
        )
        .unionByName(
            compute_stats(per_table, "teds_struct").withColumn(
                "split", F.lit("struct")
            )
        )
    )
    return per_table, stats


def evaluate_layout(
    ds: DataFrame, gt_col: str = "layout", pred_col: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """Per-image mAP + avg-IoU columns, corpus mAP row."""
    if pred_col is None:
        pred_col = "pred_layout" if "pred_layout" in ds.columns else "layout"
    src = ds.select(
        "url", F.col(gt_col).alias("gt_layout"), F.col(pred_col).alias("pred_layout")
    ).filter(F.size("gt_layout") > 0)
    per_image = layout_image_stage(src, "gt_layout", "pred_layout")
    corpus = corpus_map(src, "gt_layout", "pred_layout")
    return per_image, corpus


def evaluate_reading_order(ds: DataFrame) -> tuple[DataFrame, DataFrame]:
    """ARD over item orders. Prediction = extraction order; ground
    truth = charspan order (identical for our kernel ⇒ ARD 1.0 unless
    a model reorders) — the pred_order array is derived per document
    from the items' rank by charspan, matching W1 semantics."""
    with_order = ds.select(
        "url",
        F.expr(
            "transform(array_sort(transform(items, (it, i) -> struct(it.charspan[0] as s, i as idx))), x -> x.idx)"
        ).alias("pred_order"),
        # bbox areas for the weighted variant (MiniPDF docs carry
        # layout boxes 1:1 with items; HTML docs get unit weights)
        F.when(
            F.size("layout") == F.size("items"),
            F.expr("transform(layout, b -> (b.r - b.l) * (b.b - b.t))"),
        )
        .otherwise(F.expr("transform(items, it -> 1.0D)"))
        .alias("areas"),
    ).filter(F.size("pred_order") > 0)
    per_doc = ard_stage(with_order, "pred_order", areas_col="areas")
    stats = compute_stats(per_doc, "ard_norm").withColumn(
        "metric", F.lit("ard_norm")
    ).unionByName(
        compute_stats(per_doc, "w_ard_norm").withColumn("metric", F.lit("w_ard_norm"))
    )
    return per_doc, stats


def evaluate_bbox_text(ds: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Bbox-matched text metrics over layout items (MiniPDF docs)."""
    src = ds.filter(F.size("layout") > 0).select(
        "url",
        F.expr(
            "transform(arrays_zip(items, layout), p -> struct(p.items.text as text,"
            " p.layout.l as l, p.layout.t as t, p.layout.r as r, p.layout.b as b))"
        ).alias("gt"),
    )
    per_match = bbox_text_stage(src.withColumn("pred", F.col("gt")), "gt", "pred")
    stats = None
    for m in METRIC_COLS:
        s = compute_stats(per_match, m).withColumn("metric", F.lit(m))
        stats = s if stats is None else stats.unionByName(s)
    return per_match, stats


def evaluate(
    spark: SparkSession, dataset_dir: str, modality: str, output_dir: str
) -> None:
    ds = read_dataset(spark, dataset_dir)
    fn = {
        "markdown_text": evaluate_markdown_text,
        "table_structure": evaluate_table_structure,
        "layout": evaluate_layout,
        "reading_order": evaluate_reading_order,
        "bbox_text": evaluate_bbox_text,
    }[modality]
    per_row, rollup = fn(ds)
    out = Path(output_dir)
    per_row.write.mode("overwrite").parquet(str(out / f"evaluation_{modality}"))
    rollup.coalesce(1).write.mode("overwrite").json(
        str(out / f"evaluation_{modality}_stats")
    )


# --------------------------------------------------------------- visualize


def visualize(
    spark: SparkSession, dataset_dir: str, evaluation_dir: str, modality: str, output_dir: str
) -> None:
    """Metric parquet → report files (the reference's txt/png/html
    sinks, SURVEY S10-S12)."""
    per_row = spark.read.parquet(f"{evaluation_dir}/evaluation_{modality}")
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    value_cols = {
        "markdown_text": METRIC_COLS,
        "table_structure": ["teds", "teds_struct"],
        "layout": ["map_val", "map_50", "map_75"],
        "reading_order": ["ard_norm", "w_ard_norm"],
        "bbox_text": METRIC_COLS,
    }[modality]
    for c in value_cols:
        write_metric_report(per_row, c, str(out), f"{modality}_{c}")
    if modality == "table_structure":
        delta_row_col_report(per_row).coalesce(1).write.mode("overwrite").json(
            str(out / "delta_row_col")
        )
    if modality == "markdown_text":
        ds = read_dataset(spark, dataset_dir)
        save_comparison_html(
            ds, str(out / "comparison.html"), gt_col="gt_text",
            pred_col="extracted_text", key_col="url",
        )
