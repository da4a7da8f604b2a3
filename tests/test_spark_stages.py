"""DataFrame stages vs the pure-Python kernels (metric-value parity,
SURVEY §5.2.3)."""

from __future__ import annotations

import statistics

import pyspark.sql.functions as F
import pytest

from docling_eval_spark.datagen.pages import gen_page, pages_dataframe
from docling_eval_spark.evaluators.layout import corpus_map, image_map, layout_image_stage
from docling_eval_spark.evaluators.reading_order import ard_norm_py, ard_stage
from docling_eval_spark.evaluators.stats import compute_stats, histogram_table
from docling_eval_spark.evaluators.teds import teds_score, teds_stage
from docling_eval_spark.evaluators.text_metrics import text_metrics, text_metrics_stage
from docling_eval_spark.extraction.stage import extract_stage

import numpy as np


def test_stats_stage_matches_statistics_module(spark):
    vals = [0.12, 0.33, 0.47, 0.52, 0.61, 0.61, 0.78, 0.94, 0.08, 0.44]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    row = compute_stats(df, "v").collect()[0]
    assert row["total"] == len(vals)
    assert row["mean"] == pytest.approx(statistics.mean(vals), abs=1e-12)
    assert row["median"] == pytest.approx(statistics.median(vals), abs=1e-12)
    assert row["std"] == pytest.approx(statistics.stdev(vals), abs=1e-12)
    hist, _ = np.histogram(vals, bins=20, range=(0, 1))
    assert row["hist"] == hist.tolist()
    assert len(row["bins"]) == 21


def test_stats_scale_mode_matches_default(spark):
    """Counting-histogram stats (scale_mode) == default path: exact
    median (odd/even/duplicate cases), mean/std to float tolerance,
    identical histogram — grouped and ungrouped."""
    rng = np.random.RandomState(5)
    rows = [
        (["g1", "g2", "g3"][i % 3], round(float(v), 3))
        for i, v in enumerate(rng.uniform(0, 1, 257))
    ] + [("g1", 0.25), ("g1", 0.25), ("g2", 0.999)]
    df = spark.createDataFrame(rows, "g string, v double")
    for groups in ([], ["g"]):
        base = {
            tuple(r[c] for c in groups): r
            for r in compute_stats(df, "v", groups or None).collect()
        }
        scale = {
            tuple(r[c] for c in groups): r
            for r in compute_stats(df, "v", groups or None, scale_mode=True).collect()
        }
        assert base.keys() == scale.keys()
        for k in base:
            assert scale[k]["total"] == base[k]["total"]
            assert scale[k]["median"] == base[k]["median"]  # exact
            assert scale[k]["mean"] == pytest.approx(base[k]["mean"], abs=1e-12)
            assert scale[k]["std"] == pytest.approx(base[k]["std"], abs=1e-12)
            assert scale[k]["hist"] == base[k]["hist"]


def test_stats_scale_mode_empty_input_sentinels(spark):
    """Ungrouped counting stats over EMPTY input must return the one
    sentinel row (-1 stats, zero hist), not an ANSI DIVIDE_BY_ZERO
    task failure (mean was an unguarded __sum/total)."""
    from docling_eval_spark.evaluators.stats import compute_stats

    df = spark.createDataFrame([], "v double")
    r = compute_stats(df, "v", scale_mode=True).collect()[0]
    assert r["total"] == 0
    assert r["mean"] == -1.0 and r["median"] == -1.0 and r["std"] == -1.0
    assert list(r["hist"]) == [0] * 20


def test_stats_scale_mode_constant_group_std_zero(spark):
    """Regression: a constant-valued group's uncentered variance dips
    epsilon-negative under float rounding → sqrt gave NaN (and coalesce
    does not replace NaN). Must be exactly 0.0 like the default path."""
    df = spark.createDataFrame([("g", 0.001)] * 5 + [("h", 0.3)] * 3, "g string, v double")
    rows = {r["g"]: r for r in compute_stats(df, "v", ["g"], scale_mode=True).collect()}
    assert rows["g"]["std"] == 0.0
    assert rows["h"]["std"] == 0.0


def test_histogram_table_cumsum(spark):
    df = spark.createDataFrame([(v / 10.0,) for v in range(10)], "v double")
    tbl = histogram_table(compute_stats(df, "v")).orderBy("bin").collect()
    assert len(tbl) == 20
    assert tbl[0]["acc_pct"] == 0.0  # strictly-earlier-bins semantics
    # values 0.0..0.9 land in even bins 0..18; at bin 10, earlier bins
    # hold 0.0-0.4 → acc 50%
    assert tbl[10]["acc_pct"] == pytest.approx(50.0)
    assert tbl[19]["inv_acc_pct"] == pytest.approx(0.0, abs=1e-9)


def test_ard_stage_matches_oracle(spark):
    rows = [
        ([0, 1, 2, 3], [1.0, 2.0, 3.0, 4.0]),
        ([3, 2, 1, 0], [5.0, 5.0, 5.0, 5.0]),
        ([2, 0, 1], [1.0, 9.0, 2.0]),
        ([], []),
    ]
    df = spark.createDataFrame(rows, "pred_order array<int>, areas array<double>")
    got = ard_stage(df).collect()
    for r, (po, ar) in zip(got, rows):
        a, w = ard_norm_py(po, ar)
        assert r["ard_norm"] == pytest.approx(a, abs=1e-12)
        assert r["w_ard_norm"] == pytest.approx(w, abs=1e-12)


def test_text_metrics_stage_matches_kernel(spark):
    pairs = [
        ("the quick brown fox jumps over the lazy dog today", "the quick brown fox jumps over a lazy dog today"),
        ("alpha beta gamma", "alpha beta gamma"),
        ("one two three four five six seven", "seven six five four three two one"),
        ("", "something"),
    ]
    df = spark.createDataFrame(pairs, "text string, extracted_text string")
    got = {(r["text"], r["extracted_text"]): r for r in text_metrics_stage(df).collect()}
    for t, p in pairs:
        oracle = text_metrics(t, p)
        row = got[(t, p)]
        for k, v in oracle.items():
            assert row[k] == pytest.approx(v, abs=1e-12), (k, t, p)


def test_teds_stage_identity_on_generated_tables(spark):
    pages = pages_dataframe(spark, 60, partitions=3)
    ex = extract_stage(pages).select("url", "tables")
    paired = ex.select(
        "url",
        F.col("tables").alias("gt_tables"),
        F.col("tables").alias("pred_tables"),
    )
    rows = teds_stage(paired).collect()
    assert len(rows) > 10
    for r in rows:
        assert r["teds"] == 1.0
        assert r["teds_struct"] == 1.0
        assert r["true_nrows"] == r["pred_nrows"]


def test_teds_stage_perturbed_matches_kernel(spark):
    gt = dict(
        num_rows=2,
        num_cols=2,
        cells=[
            dict(text="a", row_span=1, col_span=1, start_row_offset_idx=0,
                 end_row_offset_idx=1, start_col_offset_idx=0, end_col_offset_idx=1,
                 col_header=True, row_header=False),
            dict(text="b", row_span=1, col_span=1, start_row_offset_idx=0,
                 end_row_offset_idx=1, start_col_offset_idx=1, end_col_offset_idx=2,
                 col_header=True, row_header=False),
            dict(text="c", row_span=1, col_span=1, start_row_offset_idx=1,
                 end_row_offset_idx=2, start_col_offset_idx=0, end_col_offset_idx=2,
                 col_header=False, row_header=False),
        ],
    )
    import copy

    pred = copy.deepcopy(gt)
    pred["cells"][2]["text"] = "zz"
    expected = teds_score(gt, pred)

    cell_t = (
        "struct<text:string,row_span:int,col_span:int,start_row_offset_idx:int,"
        "end_row_offset_idx:int,start_col_offset_idx:int,end_col_offset_idx:int,"
        "col_header:boolean,row_header:boolean>"
    )
    tbl_t = f"struct<num_rows:int,num_cols:int,cells:array<{cell_t}>>"

    def to_tuple(g):
        return (
            g["num_rows"],
            g["num_cols"],
            [tuple(c.values()) for c in g["cells"]],
        )

    df = spark.createDataFrame(
        [("u", [to_tuple(gt)], [to_tuple(pred)])],
        f"url string, gt_tables array<{tbl_t}>, pred_tables array<{tbl_t}>",
    )
    row = teds_stage(df).collect()[0]
    assert row["teds"] == expected
    assert row["teds_struct"] == 1.0


def _layout_rows():
    return [
        (
            "u1",
            [("text", 1, 0.0, 0.0, 10.0, 10.0), ("table", 1, 20.0, 20.0, 30.0, 30.0)],
            [("text", 1, 0.0, 0.0, 10.0, 10.0, 0.9), ("table", 1, 20.0, 20.0, 30.0, 30.0, 0.8)],
        ),
        (
            "u2",
            [("text", 1, 0.0, 0.0, 10.0, 10.0)],
            [("text", 1, 0.0, 2.5, 10.0, 12.5, 0.7)],
        ),
    ]


_GT_T = "array<struct<label:string,page_no:int,l:double,t:double,r:double,b:double>>"
_PR_T = "array<struct<label:string,page_no:int,l:double,t:double,r:double,b:double,score:double>>"


def test_layout_image_stage_matches_kernel(spark):
    df = spark.createDataFrame(
        _layout_rows(), f"url string, gt_layout {_GT_T}, pred_layout {_PR_T}"
    )
    got = {r["url"]: r for r in layout_image_stage(df).collect()}
    assert got["u1"]["map_val"] == pytest.approx(1.0)
    assert got["u2"]["map_val"] == pytest.approx(0.3)
    assert got["u2"]["map_50"] == pytest.approx(1.0)
    # oracle cross-check via the pure kernel
    m = image_map(
        np.array([[0, 2.5, 10, 12.5]]),
        np.array(["text"], dtype=object),
        np.array([0.7]),
        np.array([[0, 0, 10, 10]]),
        np.array(["text"], dtype=object),
    )
    assert got["u2"]["map_75"] == pytest.approx(m["map_75"])


def test_corpus_map(spark):
    df = spark.createDataFrame(
        _layout_rows(), f"url string, gt_layout {_GT_T}, pred_layout {_PR_T}"
    )
    row = corpus_map(df).collect()[0]
    # corpus: class text has 2 GT; dets: tp@.9 (u1), and u2 det tp only ≤.6;
    # class table: 1 GT, 1 tp at all thresholds
    assert row["map_50"] == pytest.approx((1.0 + 1.0) / 2)
    # at thr=0.75 the u2 det is fp: text AP = 51/101 ... plus table 1.0
    assert row["map_75"] == pytest.approx((51 / 101 + 1.0) / 2, abs=1e-9)


def test_corpus_map_sketch_matches_exact(spark):
    """The score-histogram sketch (100-TB path) must agree with the
    exact full-sort kernel to float precision on quantized scores."""
    df = spark.createDataFrame(
        _layout_rows(), f"url string, gt_layout {_GT_T}, pred_layout {_PR_T}"
    )
    sk = corpus_map(df).collect()[0]
    ex = corpus_map(df, exact=True).collect()[0]
    for k in ("map", "map_50", "map_75"):
        assert sk[k] == pytest.approx(ex[k], abs=1e-12)


def test_web_ingest_composition_order(spark):
    """web_ingest: one row per url (latest wins), blocked domains gone
    BEFORE text work, PII masked, entropy computed on the SCRUBBED text."""
    import pyspark.sql.functions as F
    from docling_eval_spark.pipelines import web_ingest

    fetches = spark.createDataFrame(
        [
            ("https://a.good.com/1", 1, "old text"),
            ("https://a.good.com/1", 2, "mail me@x.io now"),   # latest
            ("https://b.bad.com/2", 1, "never seen"),
            ("https://c.good.com/3", 1, "plain prose here"),
        ],
        "url string, crawl_ts int, text string",
    )
    blocked = spark.createDataFrame([("bad.com",)], "domain string")
    out = {r.url: r for r in web_ingest(fetches, blocked).collect()}
    assert set(out) == {"https://a.good.com/1", "https://c.good.com/3"}
    a = out["https://a.good.com/1"]
    assert a.crawl_ts == 2 and a.scrubbed_text == "mail <EMAIL> now"
    assert a.n_emails == 1
    c = out["https://c.good.com/3"]
    assert c.n_emails == c.n_ips == c.n_phones == 0
    assert c.scrubbed_text == "plain prose here" and c.entropy > 0
