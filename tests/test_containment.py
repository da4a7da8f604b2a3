"""Containment (asymmetric near-dup) classification."""

from __future__ import annotations

import pyspark.sql.functions as F

from docling_eval_spark.operators.dedup import char_shingles, containment_pairs


def _pairs(spark, rows):
    df = spark.createDataFrame(rows, "id_l long, t_l string, t_r string")
    return df.select(
        "id_l",
        char_shingles("t_l", 5).alias("sh_l"),
        char_shingles("t_r", 5).alias("sh_r"),
    )


def test_containment_classification_branches(spark):
    article = (
        "the committee voted on tuesday to approve the new funding measure "
        "after a long debate over the budget implications for next year"
    )
    quote_page = (
        "breaking news roundup \n" + article + "\n subscribe for more updates "
        "and follow our coverage of the city council all week long"
    )
    rows = [
        (1, article, article),          # dup
        (2, article, quote_page),       # l contained in r
        (3, quote_page, article),       # r contained in l
        (4, article, "completely different text about gardening and soil ph"),
    ]
    got = {
        r["id_l"]: r
        for r in containment_pairs(_pairs(spark, rows)).collect()
    }
    assert got[1]["relation"] == "dup"
    assert got[1]["c_lr_micro"] == got[1]["c_rl_micro"] == 1_000_000
    assert got[2]["relation"] == "l_in_r"
    assert got[2]["c_lr_micro"] == 1_000_000  # every article shingle in page
    assert got[2]["c_rl_micro"] < 900_000
    assert got[3]["relation"] == "r_in_l"
    assert got[4]["relation"] == "none"


def test_containment_empty_side_is_zero(spark):
    rows = [(1, "", "some text here"), (2, "some text here", "")]
    got = {
        r["id_l"]: r
        for r in containment_pairs(_pairs(spark, rows)).collect()
    }
    assert got[1]["c_lr_micro"] == 0 and got[1]["relation"] == "none"
    assert got[2]["c_rl_micro"] == 0 and got[2]["relation"] == "none"


def test_containment_jaccard_blind_spot(spark):
    """The motivating case: full article inside a 4x-bigger page —
    Jaccard low (would NOT flag at 0.8), containment exact 1.0."""
    art = " ".join(f"sentence number {i} of the original article" for i in range(20))
    page = art + " " + " ".join(f"unrelated boilerplate chunk {i}" for i in range(80))
    got = containment_pairs(_pairs(spark, [(1, art, page)])).collect()[0]
    inter_over_union_bound = got["c_rl_micro"]  # |∩|/|r| ≥ jaccard
    assert got["c_lr_micro"] == 1_000_000
    assert inter_over_union_bound < 800_000  # Jaccard ≤ this < 0.8
    assert got["relation"] == "l_in_r"


def test_containment_half_prefix_is_exact_subset(spark):
    """Shingles of a normalized prefix are a subset of the full text's
    shingles — the engineered 'half' family in the gated query relies
    on this invariant."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = docs.select(
        F.col("doc_id").alias("id_l"),
        char_shingles("text", 5).alias("sh_r"),  # full on the RIGHT
        F.expr("substring(text, 1, length(text) DIV 2)").alias("__h"),
    ).select(
        "id_l", "sh_r", char_shingles("__h", 5).alias("sh_l")
    ).filter(F.length("__h") >= 20)
    out = containment_pairs(base)
    bad = out.filter(F.col("c_lr_micro") != 1_000_000).count()
    assert bad == 0
    assert out.count() > 0
