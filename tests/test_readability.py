"""Readability (Flesch / FK grade): hand values + Spark↔twin parity."""

from __future__ import annotations

from docling_eval_spark.operators.quality_rules import readability, readability_py


def test_readability_hand_value():
    """'The cat sat on the mat. It was happy there!' — w=10, s=2,
    syllables the/cat/sat/on/the/mat=6, it=1, was=1, happy=2, there=2
    → y=12; Flesch = 206.835 − 1.015·5 − 84.6·1.2 = 100.240;
    FK = 0.39·5 + 11.8·1.2 − 15.59 = 0.520."""
    r = readability_py("The cat sat on the mat. It was happy there!")
    assert r == {
        "n_words": 10,
        "n_sentences": 2,
        "n_syllables": 12,
        "flesch_milli": 100240,
        "fk_grade_milli": 520,
    }


def test_readability_negative_flesch_floor_semantics():
    """Dense polysyllabic text drives reading ease negative; the
    shifted integer division must floor (not truncate toward zero)."""
    txt = "incomprehensibility " * 30  # 1 sentence, 30 words, 8 syl each
    r = readability_py(txt)
    assert r["n_words"] == 30 and r["n_sentences"] == 1
    # y/w = 8 → 206.835 − 1.015·30 − 84.6·8 = −500.415 → floor milli
    assert r["n_syllables"] == 240
    assert r["flesch_milli"] == -500415
    # FK = 0.39·30 + 11.8·8 − 15.59 = 90.51
    assert r["fk_grade_milli"] == 90510


def test_readability_empty_and_wordless():
    assert readability_py("")["flesch_milli"] == 0
    assert readability_py("   \n\t ")["n_words"] == 0
    assert readability_py("...!!!")["n_sentences"] == 0


def test_readability_no_terminator_is_one_sentence():
    r = readability_py("just a fragment with no end punctuation")
    assert r["n_sentences"] == 1


def test_readability_spark_matches_twin(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = {r["doc_id"]: r for r in readability(docs.limit(60)).collect()}
    src = {r["doc_id"]: r["text"] for r in docs.limit(60).collect()}
    assert out
    for doc_id, row in out.items():
        exp = readability_py(src[doc_id])
        got = {k: row[k] for k in exp}
        assert got == exp, doc_id


def test_readability_spark_edge_rows(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "..."), (3, "The cat sat on the mat. It was happy there!")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in readability(df).collect()}
    assert rows[1]["flesch_milli"] == 0 and rows[1]["n_words"] == 0
    assert rows[2]["n_sentences"] == 0 and rows[2]["flesch_milli"] == 0
    assert rows[3]["flesch_milli"] == 100240
