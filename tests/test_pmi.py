"""PMI collocations: hand values, min-count gate, determinism."""

from __future__ import annotations

import math

from docling_eval_spark.operators.text_analysis import pmi_collocations


def test_pmi_hand_value(spark):
    # corpus: "a b" ×4, "a c" ×4 → T=16 unigrams, B=8 bigrams
    # c(a)=8, c(b)=4, c(ab)=4 → PMI(a,b) = ln(4·16²/(8·8·4)) = ln 4
    rows = [(i, "a b") for i in range(4)] + [(10 + i, "a c") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["ga"], r["gb"]): r
        for r in pmi_collocations(df, min_count=1, k=10).collect()
    }
    ab = got[("a", "b")]
    assert ab["c_ab"] == 4
    assert ab["pmi_micro"] == round(math.log(4) * 1e6)
    assert got[("a", "c")]["pmi_micro"] == ab["pmi_micro"]


def test_pmi_min_count_drops_rare(spark):
    rows = [(1, "x y x y x y"), (2, "rare pair")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = pmi_collocations(df, min_count=2, k=10).collect()
    pairs = {(r["ga"], r["gb"]) for r in got}
    assert ("rare", "pair") not in pairs
    assert ("x", "y") in pairs


def test_pmi_no_cross_document_bigrams(spark):
    # last token of doc 1 + first token of doc 2 must NOT pair
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    got = pmi_collocations(df, min_count=1, k=10).collect()
    pairs = {(r["ga"], r["gb"]) for r in got}
    assert pairs == {("alpha", "beta"), ("gamma", "delta")}


def test_pmi_partition_invariance(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = [tuple(r) for r in pmi_collocations(docs, min_count=3, k=20).collect()]
    b = [
        tuple(r)
        for r in pmi_collocations(docs.repartition(11), min_count=3, k=20).collect()
    ]
    assert a == b and len(a) == 20
