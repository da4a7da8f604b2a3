"""Gopher-style document quality rules and repetition signals.

The published Gopher quality-filter rules (Rae et al. 2021, "Scaling
Language Models: Methods, Analysis & Insights from Training Gopher",
§A1.1.1 — public paper) as pure column algebra, plus the classic
repetition signal (most-frequent n-gram mass). A 100-TB corpus sweep
needs these as narrow codegen maps — no Python, no shuffle except the
one hash aggregation inside top-bigram counting.

Every rule is expressible in ANSI SQL, so the driver's DuckDB gate
checks the flags value-exactly (`__spark_entry__._SQL_GOPHER`).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from docling_eval_spark.operators.text_analysis import tokens_col

# Gopher §A1.1.1 thresholds (public)
MIN_WORDS = 50
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MAX_SYMBOL_WORD_RATIO = 0.1
MIN_ALPHA_WORD_RATIO = 0.8
REQUIRED_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
MIN_STOPWORD_HITS = 2
MAX_BULLET_LINE_RATIO = 0.9
MAX_ELLIPSIS_LINE_RATIO = 0.3


def gopher_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document Gopher rule columns + the combined ``passes_gopher``
    flag. One narrow projection; every expression is whole-stage
    codegen (tokens array is built once per row)."""
    t = F.col(text_col)
    toks = tokens_col(t)
    n_words = F.size(toks)
    # mean word length over the token characters only
    word_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    mean_wl = F.when(n_words > 0, word_chars / n_words).otherwise(0.0)
    # symbols: '#' and the '...' / '…' ellipses, per Gopher
    n_symbols = F.regexp_count(t, F.lit("#")) + F.regexp_count(
        t, F.lit(r"\.\.\.|…")
    )
    sym_ratio = F.when(n_words > 0, n_symbols / n_words).otherwise(0.0)
    alpha_words = F.size(F.filter(toks, lambda x: x.rlike("[A-Za-zÀ-ÿ]")))
    alpha_ratio = F.when(n_words > 0, alpha_words / n_words).otherwise(0.0)
    low_toks = F.transform(toks, F.lower)
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(low_toks),
            F.array(*[F.lit(w) for w in REQUIRED_STOPWORDS]),
        )
    )
    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    bullet_lines = F.size(
        F.filter(lines, lambda x: F.trim(x).rlike("^([-*•]|[0-9]+[.)])"))
    )
    ellipsis_lines = F.size(
        F.filter(lines, lambda x: F.trim(x).rlike("(\\.\\.\\.|…)$"))
    )
    return df.select(
        "*",
        n_words.alias("g_n_words"),
        F.round(mean_wl, 6).alias("g_mean_word_len"),
        F.round(sym_ratio, 6).alias("g_symbol_ratio"),
        F.round(alpha_ratio, 6).alias("g_alpha_ratio"),
        stop_hits.cast("int").alias("g_stopword_hits"),
        F.round(
            F.when(n_lines > 0, bullet_lines / n_lines).otherwise(0.0), 6
        ).alias("g_bullet_ratio"),
        F.round(
            F.when(n_lines > 0, ellipsis_lines / n_lines).otherwise(0.0), 6
        ).alias("g_ellipsis_ratio"),
    ).withColumn(
        "passes_gopher",
        (F.col("g_n_words") >= MIN_WORDS)
        & (F.col("g_n_words") <= MAX_WORDS)
        & (F.col("g_mean_word_len") >= MIN_MEAN_WORD_LEN)
        & (F.col("g_mean_word_len") <= MAX_MEAN_WORD_LEN)
        & (F.col("g_symbol_ratio") <= MAX_SYMBOL_WORD_RATIO)
        & (F.col("g_alpha_ratio") >= MIN_ALPHA_WORD_RATIO)
        & (F.col("g_stopword_hits") >= MIN_STOPWORD_HITS)
        & (F.col("g_bullet_ratio") <= MAX_BULLET_LINE_RATIO)
        & (F.col("g_ellipsis_ratio") <= MAX_ELLIPSIS_LINE_RATIO),
    )


def top_bigram_fraction(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """(id, n_bigrams, top_count, top_fraction): mass of the single
    most frequent token bigram — the classic repetition filter signal
    (Gopher §A1.1.2 'duplicate n-grams').

    ZERO shuffles: a document's tokens already ride in its row (they
    came out of one text cell), so the bigram multiset is a bounded
    in-row array — sort it and take the longest equal run with one SQL
    ``aggregate`` fold. The first cut of this operator exploded
    bigrams through two hash aggregations; the narrow form computes
    identical values with no exchange at all."""
    toks = tokens_col(F.col(text_col))
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws("␟", a, b),
    )
    runs = F.aggregate(
        F.sort_array(bigrams),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")),
            ).alias("best"),
        ),
    )
    out = df.select(
        F.col(id_col).alias("id"),
        F.size(bigrams).cast("long").alias("n_bigrams"),
        runs["best"].alias("top_count"),
    ).filter(F.col("n_bigrams") > 0)
    return out.select(
        "id",
        "n_bigrams",
        "top_count",
        F.round(F.col("top_count") / F.col("n_bigrams"), 6).alias("top_fraction"),
    )


# ---------------------------------------------------------------------
# Readability (Flesch 1948 / Kincaid 1975) — public formulas:
#   reading_ease = 206.835 − 1.015·(words/sentences) − 84.6·(syll/words)
#   fk_grade     = 0.39·(words/sentences) + 11.8·(syll/words) − 15.59
# Syllables use the classic vowel-group heuristic: per word,
# max(1, count of [aeiouy]+ runs) on the lowercased token.
#
# Engine-exactness: words/sentences/syllables are exact BIGINTs from
# pure column algebra; each score is ONE exact integer division in
# milli units over the common denominator s·w, shifted by a constant
# offset so the numerator is provably positive (reading ease is
# bounded below by 206.835 − 1.015·w − 84.6·max_word_len > −10⁴ on
# 2000-char docs) — truncation-toward-zero then equals floor in both
# engines, so no float round() is involved anywhere.

_READ_OFFSET = 10_000_000  # milli-units; > any |score| reachable at cap


def readability(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc readability → (id, n_words, n_sentences, n_syllables,
    flesch_milli, fk_grade_milli). Zero shuffle, zero Python: one
    narrow codegen projection (the 100-TB-sweep shape, like
    ``gopher_flags``). Empty/wordless docs emit 0 counts and 0 scores.
    """
    t = F.expr(f"lower(substring({text_col}, 1, 2000))")
    words = F.filter(F.split(t, r"[ \t\n\r\f\v]+"), lambda x: x != "")
    w = F.size(words).cast("bigint")
    s = F.size(
        F.filter(F.split(t, r"[.!?]+"), lambda x: F.trim(x) != "")
    ).cast("bigint")
    y = F.aggregate(
        words,
        F.lit(0).cast("bigint"),
        lambda acc, x: acc
        + F.greatest(
            F.lit(1).cast("bigint"),
            F.regexp_count(x, F.lit("[aeiouy]+")).cast("bigint"),
        ),
    )
    k = _READ_OFFSET
    flesch = F.expr(
        f"CASE WHEN n_words > 0 AND n_sentences > 0 THEN "
        f"(206835 * n_sentences * n_words - 1015 * n_words * n_words "
        f" - 84600 * n_syllables * n_sentences "
        f" + {k} * n_sentences * n_words) "
        f"DIV (n_sentences * n_words) - {k} ELSE 0 END"
    )
    fk = F.expr(
        f"CASE WHEN n_words > 0 AND n_sentences > 0 THEN "
        f"(390 * n_words * n_words + 11800 * n_syllables * n_sentences "
        f" - 15590 * n_sentences * n_words "
        f" + {k} * n_sentences * n_words) "
        f"DIV (n_sentences * n_words) - {k} ELSE 0 END"
    )
    return (
        df.select(
            F.col(id_col),
            w.alias("n_words"),
            s.alias("n_sentences"),
            y.alias("n_syllables"),
        )
        .withColumn("flesch_milli", flesch.cast("bigint"))
        .withColumn("fk_grade_milli", fk.cast("bigint"))
    )


def readability_py(text: str) -> dict[str, int]:
    """Pure-Python twin of :func:`readability` (identical algebra)."""
    import re as _re

    t = (text or "")[:2000].lower()
    words = [x for x in _re.split(r"[ \t\n\r\f\v]+", t) if x != ""]
    w = len(words)
    s = len([x for x in _re.split(r"[.!?]+", t) if x.strip() != ""])
    y = sum(max(1, len(_re.findall(r"[aeiouy]+", x))) for x in words)
    k = _READ_OFFSET
    if w > 0 and s > 0:
        flesch = (206835 * s * w - 1015 * w * w - 84600 * y * s + k * s * w) // (s * w) - k
        fk = (390 * w * w + 11800 * y * s - 15590 * s * w + k * s * w) // (s * w) - k
    else:
        flesch = fk = 0
        y = y if w else 0
    return {
        "n_words": w,
        "n_sentences": s,
        "n_syllables": y,
        "flesch_milli": flesch,
        "fk_grade_milli": fk,
    }
