"""Distributed BPE merge induction (Sennrich et al. 2016, public).

Byte-pair-encoding tokenizer training is the classic two-scale job:
the CORPUS is huge but is touched exactly once (a word-frequency
count — one shuffle with map-side combine); every merge iteration
after that runs over the WORD table (unique words × frequency), which
is orders of magnitude smaller than the corpus (Heaps' law), so the
sequential part of the algorithm never re-reads the data.

Per merge iteration:

- adjacent symbol pairs are exploded from each word's current symbol
  sequence, weighted by word frequency, and summed (one small shuffle
  with partial aggregation);
- the argmax pair is collected to the driver (ONE row per iteration —
  the merge decision is inherently sequential, exactly as in
  single-node trainers);
- the merge is applied to every word with a greedy leftmost
  non-overlapping fold (a SQL higher-order ``aggregate`` over the
  symbol list — pure column algebra, no Python), and the word table is
  re-persisted so plans never nest across iterations.

Symbols are kept as a single ``\\x1f``-separated string column (the
separator is a control char that the whitespace tokenizer can never
emit inside a token), which makes the fold reproducible bit-for-bit in
any engine — the DuckDB oracle replays every iteration including the
tie-break (freq DESC, then pair lexicographic) and the ``</w>``
end-of-word marker.

Reference scope: DS4SD/docling-eval contains no tokenizer code (its
tokenization is NLTK word_tokenize inside evaluators, e.g.
docling_eval/evaluators/markdown_text_evaluator.py); tokenizer
training is pipeline capability beyond the reference surface.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from docling_eval_spark.operators.text_analysis import tokens_col

SEP = "\x1f"
EOW = "</w>"


def word_symbol_table(
    df: DataFrame,
    text_col: str = "text",
    lowercase: bool = True,
    min_freq: int = 1,
) -> DataFrame:
    """(word, freq, s): the word-frequency table with each word's
    initial symbol string — its characters joined by SEP, with the
    ``</w>`` end-of-word marker as the final symbol.

    This is the only corpus-scale pass: explode + one counting shuffle
    (map-side combine). ``min_freq`` prunes hapax noise at scale
    (documented deviation from classic BPE when > 1)."""
    tok = F.explode(tokens_col(text_col)).alias("word")
    words = df.select(tok)
    if lowercase:
        words = words.select(F.lower(F.col("word")).alias("word"))
    words = words.groupBy("word").agg(F.count("*").cast("long").alias("freq"))
    if min_freq > 1:
        words = words.filter(F.col("freq") >= min_freq)
    s = F.concat(
        F.lit(SEP),
        F.array_join(F.split(F.col("word"), ""), SEP),
        F.lit(SEP + EOW),
    )
    return words.withColumn("s", s)


def _syms(col):
    return F.filter(F.split(col, SEP), lambda x: x != "")


def _pair_counts(words: DataFrame) -> DataFrame:
    """(l, r, freq): adjacent-pair frequencies over the word table."""
    sy = _syms(F.col("s"))
    # sequence(1, 0) DESCENDS in Spark — guard single-symbol words
    idx = F.when(
        F.size(sy) >= 2, F.sequence(F.lit(1), F.size(sy) - 1)
    ).otherwise(F.array().cast("array<int>"))
    pairs = F.transform(
        idx,
        lambda j: F.struct(
            F.element_at(sy, j).alias("l"),
            F.element_at(sy, j + 1).alias("r"),
        ),
    )
    return (
        words.select(F.col("freq"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").cast("long").alias("freq"))
    )


def _apply_merge(words: DataFrame, left: str, right: str) -> DataFrame:
    """Greedy leftmost non-overlapping merge of (left, right) in every
    word's symbol string — the exact single-node BPE apply step, as a
    string fold: append the right symbol WITHOUT a separator when the
    accumulator ends in SEP+left (symbol boundary guaranteed: symbols
    never contain SEP), else append SEP+symbol. A just-merged symbol
    can never re-merge within the iteration because the accumulator
    then ends in SEP+left+right, not SEP+left."""
    folded = F.aggregate(
        _syms(F.col("s")),
        F.lit(""),
        lambda acc, x: F.when(
            acc.endswith(SEP + left) & (x == F.lit(right)), F.concat(acc, x)
        ).otherwise(F.concat(acc, F.lit(SEP), x)),
    )
    return words.withColumn("s", folded)


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    merges: int = 8,
    lowercase: bool = True,
    min_freq: int = 1,
) -> DataFrame:
    """(rank, left, right, merged, freq): the first ``merges`` BPE
    merge rules learned from the corpus, in order. Ties broken
    deterministically: highest freq, then (left, right) lexicographic
    — identical under any partitioning and replayable by the oracle.

    Stops early (fewer rows) if the word table runs out of adjacent
    pairs. The returned merge table IS the tokenizer artifact: apply
    the rules in rank order to encode new text."""
    if merges < 1:
        raise ValueError("merges must be >= 1")
    spark = df.sparkSession
    words = word_symbol_table(df, text_col, lowercase, min_freq).persist()
    words.count()
    learned: list[tuple[int, str, str, str, int]] = []
    try:
        for rank in range(1, merges + 1):
            top = (
                _pair_counts(words)
                .orderBy(F.desc("freq"), F.asc("l"), F.asc("r"))
                .limit(1)
                .collect()
            )
            if not top:
                break
            l, r, freq = top[0].l, top[0].r, top[0].freq
            learned.append((rank, l, r, l + r, freq))
            nxt = _apply_merge(words, l, r).persist()
            nxt.count()  # materialize so iteration plans never nest
            words.unpersist()
            words = nxt
    finally:
        words.unpersist()
    return spark.createDataFrame(
        learned,
        "rank int, left string, right string, merged string, freq long",
    )


def bpe_encode(
    df: DataFrame,
    merge_rules: list[tuple[str, str]],
    text_col: str = "text",
    lowercase: bool = True,
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply learned merge rules (in rank order) to every document,
    adding ``out_col`` as the array of BPE symbols per whitespace
    token (with ``</w>`` markers), flattened across the document.

    Scale shape: the rule list is a plan literal (tokenizers are a few
    thousand rules); the encode is a chain of per-row folds — a narrow
    map, no shuffle. For very long rule lists prefer re-chunking the
    chain with localCheckpoint at the caller."""
    word_syms = F.transform(
        tokens_col(text_col) if not lowercase else F.transform(
            tokens_col(text_col), lambda x: F.lower(x)
        ),
        lambda w: F.concat(
            F.lit(SEP), F.array_join(F.split(w, ""), SEP), F.lit(SEP + EOW)
        ),
    )
    def _merge_lambda(left: str, right: str):
        def apply_one(s):
            return F.aggregate(
                F.filter(F.split(s, SEP), lambda x: x != ""),
                F.lit(""),
                lambda acc, x: F.when(
                    acc.endswith(SEP + left) & (x == F.lit(right)),
                    F.concat(acc, x),
                ).otherwise(F.concat(acc, F.lit(SEP), x)),
            )

        return apply_one

    col = word_syms
    for left, right in merge_rules:
        col = F.transform(col, _merge_lambda(left, right))
    flat = F.flatten(
        F.transform(col, lambda s: F.filter(F.split(s, SEP), lambda x: x != ""))
    )
    return df.withColumn(out_col, flat)
