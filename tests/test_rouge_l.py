"""ROUGE-L: brute-force DP cross-check, hand values, Spark stage."""

from __future__ import annotations

import itertools
import random

from docling_eval_spark.evaluators.text_metrics import (
    lcs_len,
    rouge_l_counts,
    rouge_l_stage,
)


def _lcs_brute(a: list[str], b: list[str]) -> int:
    """Classic O(mn) scalar DP — the reference for the vectorized
    max-accumulate kernel."""
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0] * (len(b) + 1)
        for j, y in enumerate(b, 1):
            cur[j] = prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1])
        prev = cur
    return prev[-1]


def test_lcs_matches_bruteforce_exhaustive_small():
    alphabet = "abc"
    for la in range(0, 5):
        for lb in range(0, 4):
            for a in itertools.product(alphabet, repeat=la):
                for b in itertools.product(alphabet, repeat=lb):
                    assert lcs_len(list(a), list(b)) == _lcs_brute(
                        list(a), list(b)
                    ), (a, b)


def test_lcs_matches_bruteforce_random():
    rng = random.Random(42)
    for _ in range(200):
        a = [rng.choice("wxyz") for _ in range(rng.randint(0, 30))]
        b = [rng.choice("wxyz") for _ in range(rng.randint(0, 30))]
        assert lcs_len(a, b) == _lcs_brute(a, b)


def test_rouge_l_hand_values():
    # CLRS: LCS("ABCBDAB","BDCABA") = 4
    assert lcs_len(list("ABCBDAB"), list("BDCABA")) == 4
    got = rouge_l_counts("the cat sat", "the big cat sat down")
    assert got == {
        "lcs": 3,
        "rouge_l_p_micro": 1_000_000,
        "rouge_l_r_micro": 600_000,  # 3/5
        "rouge_l_f_micro": 750_000,  # 2·3/(5+3)
    }
    assert rouge_l_counts("", "anything")["rouge_l_f_micro"] == 0
    assert rouge_l_counts("x", "")["lcs"] == 0


def test_rouge_l_subsequence_invariant():
    ref = "one two three four five six seven eight nine ten"
    hyp = "one four seven ten"  # subsequence → lcs = len(hyp)
    got = rouge_l_counts(hyp, ref)
    assert got["lcs"] == 4 and got["rouge_l_p_micro"] == 1_000_000


def test_rouge_l_token_cap():
    ref = " ".join(f"t{i}" for i in range(600))
    got = rouge_l_counts(ref, ref, max_tokens=512)
    assert got["lcs"] == 512 and got["rouge_l_f_micro"] == 1_000_000


def test_rouge_l_stage_matches_kernel(spark):
    import pyspark.sql.functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = docs.select(
        F.col("doc_id").alias("id"),
        F.col("text").alias("hyp"),
        F.reverse(F.col("text")).alias("ref"),  # hard, non-trivial LCS
    ).limit(25)
    out = {r["id"]: r for r in rouge_l_stage(pairs, "hyp", "ref").collect()}
    src = {r["id"]: r for r in pairs.collect()}
    for k, row in out.items():
        exp = rouge_l_counts(src[k]["hyp"], src[k]["ref"])
        assert {c: row[c] for c in exp} == exp, k
