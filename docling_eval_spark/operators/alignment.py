"""Cross-lingual document alignment by rare-token blocking
(bitext candidate mining — the CCAligned / WikiMatrix shape, public:
El-Kishky et al. 2020, Schwenk et al. 2021).

Mining parallel documents out of a web crawl is a quadratic problem
(every source-language doc against every target-language doc) made
tractable by BLOCKING: only documents that share a sufficiently RARE
token can be candidates, and a token with document frequency <=
``max_df`` can produce at most ``max_df**2`` candidate pairs. The
document-frequency cap is therefore simultaneously the recall knob and
the hard bound on shuffle fanout — the hot-token (boilerplate) case
that would go quadratic at 100 TB is excluded by construction, not by
hoping AQE saves the reducer.

Plan shape:

- one pass per side to build (doc, rare-token) postings: explode
  distinct tokens, one counting shuffle for global df, filter df <=
  max_df (the df table is token-keyed and tiny after the cap);
- the candidate join is token-keyed src x tgt — bounded by the cap;
- pair scoring is a (src,tgt)-keyed count; integer-micro Jaccard over
  each side's rare-token set size keeps the ranking engine-exact;
- top-1 per source doc via min_by on the (-score, tgt) total order.

Reference scope: DS4SD/docling-eval has no alignment or mining code;
this is training-data pipeline capability beyond the reference
surface.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from docling_eval_spark.operators.text_analysis import tokens_col


def rare_token_postings(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    lang_col: str = "lang",
    max_df: int = 5,
    ngram: int = 1,
) -> DataFrame:
    """(id, lang, tok, n_rare): one row per (document, rare blocking
    unit), where rare means global document frequency <= ``max_df``
    across the whole input and the unit is a lowercased token
    (``ngram=1``) or a space-joined n-gram of consecutive tokens —
    n-grams are the practical choice on corpora whose unigram
    vocabulary is saturated (every word everywhere), exactly like the
    8-gram choice in decontamination scans. ``n_rare`` is the
    document's rare-unit count (the Jaccard denominator half, carried
    along so the scorer never re-scans). Units are deduplicated per
    document."""
    if max_df < 1:
        raise ValueError("max_df must be >= 1")
    if ngram < 1:
        raise ValueError("ngram must be >= 1")
    low = F.transform(tokens_col(text_col), lambda x: F.lower(x))
    if ngram == 1:
        units = low
    else:
        from docling_eval_spark.functions import let_col

        def grams(tk):
            n = F.size(tk)
            idx = F.when(
                n >= ngram, F.sequence(F.lit(1), n - (ngram - 1))
            ).otherwise(F.array().cast("array<int>"))
            return F.transform(
                idx, lambda j: F.array_join(F.slice(tk, j, ngram), " ")
            )

        units = let_col(low, grams)
    toks = df.select(
        F.col(id_col).alias("id"),
        F.col(lang_col).alias("lang"),
        F.explode(F.array_distinct(units)).alias("tok"),
    )
    dfreq = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_df)
    )
    rare = toks.join(F.broadcast(dfreq.select("tok")), "tok")
    sizes = rare.groupBy("id").agg(F.count("*").alias("n_rare"))
    return rare.join(sizes, "id").select("id", "lang", "tok", "n_rare")


def bitext_candidates(
    df: DataFrame,
    id_col: str,
    src_lang: str,
    tgt_lang: str,
    text_col: str = "text",
    lang_col: str = "lang",
    max_df: int = 5,
    min_shared: int = 2,
    ngram: int = 1,
) -> DataFrame:
    """(src_id, tgt_id, n_shared, jaccard_micro): cross-lingual
    candidate pairs — documents in ``src_lang`` x ``tgt_lang`` sharing
    >= ``min_shared`` rare tokens, scored by integer-micro Jaccard
    over the two rare-token sets:

        jaccard_micro = 1e6 * shared DIV (n_src + n_tgt - shared)

    The token-keyed join is the only src-x-tgt contact and its fanout
    per token is bounded by ``max_df`` on each side.

    The postings table is persisted: both language branches filter it,
    and each unpersisted branch re-runs the full tokenize + df-census
    pipeline (the plan audit counted 4 text scans)."""
    post = rare_token_postings(
        df, id_col, text_col, lang_col, max_df, ngram
    ).persist()
    src = post.filter(F.col("lang") == src_lang).select(
        F.col("id").alias("src_id"), "tok", F.col("n_rare").alias("n_src")
    )
    tgt = post.filter(F.col("lang") == tgt_lang).select(
        F.col("id").alias("tgt_id"), "tok", F.col("n_rare").alias("n_tgt")
    )
    pairs = (
        src.join(tgt, "tok")
        .groupBy("src_id", "tgt_id")
        .agg(
            F.count("*").cast("long").alias("n_shared"),
            F.first("n_src").alias("n_src"),
            F.first("n_tgt").alias("n_tgt"),
        )
        .filter(F.col("n_shared") >= min_shared)
    )
    return pairs.select(
        "src_id",
        "tgt_id",
        "n_shared",
        F.expr("1000000 * n_shared DIV (n_src + n_tgt - n_shared)")
        .cast("long")
        .alias("jaccard_micro"),
    )


def align_top1(candidates: DataFrame) -> DataFrame:
    """(src_id, tgt_id, n_shared, jaccard_micro): the best target per
    source document — highest jaccard_micro, ties broken on the
    smallest tgt_id (a total order, so deterministic under any
    partitioning). One keyed agg, no window sort."""
    best = candidates.groupBy("src_id").agg(
        F.min(
            F.struct(
                (-F.col("jaccard_micro")).alias("neg"),
                F.col("tgt_id").alias("t"),
                F.col("n_shared").alias("s"),
            )
        ).alias("b")
    )
    return best.select(
        "src_id",
        F.col("b.t").alias("tgt_id"),
        F.col("b.s").alias("n_shared"),
        (-F.col("b.neg")).cast("long").alias("jaccard_micro"),
    )
