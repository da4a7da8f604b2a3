"""Differential prod-vs-portable hash-path tests (VERDICT r4 #3).

``simhash`` and ``token_ngram_hash_col``/``contamination_check`` each
ship two token-hash modes: the PRODUCTION default (JVM ``xxhash64``)
and a PORTABLE polynomial twin the DuckDB oracle can recompute
bit-for-bit. The oracle gate only ever exercises the portable path;
these tests close the asymmetry by running BOTH paths over the real
sf0.01 documents corpus and asserting the *decisions* agree.

What "agree" means differs by operator:

- contamination: hash-set MEMBERSHIP of exact n-gram matches — a true
  8-gram hit collides in both fields by construction and false hits
  are ~|bench|/field (≤2⁻³¹ per window); the full (id, n_grams,
  n_hits) row set must be identical.
- simhash: an APPROXIMATE sketch — different token-hash functions
  legitimately disagree on borderline Hamming-2/3 pairs (measured at
  sf0.01: 14 pairs common, 3 prod-only, 9 portable-only, every
  disagreement at distance ≥2). The invariants that must hold under
  ANY hash choice: (a) identical normalized text ⇒ Hamming 0 under
  both paths (the converse fails — unrelated docs can coincide on all
  64 majority signs under one hash), and (b) documents that ARE
  near-duplicates by construction (one appended token) pair under
  both paths.
"""

from __future__ import annotations

import pyspark.sql.functions as F

SF_DIR = "/root/testdata/sf0.01"


def test_contamination_prod_portable_same_decisions(spark):
    from docling_eval_spark.operators.text_analysis import contamination_check

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    bench = docs.filter(F.col("doc_id") % 50 == 0)

    def run(portable):
        return sorted(
            (r["id"], r["n_grams"], r["n_hits"])
            for r in contamination_check(
                docs, bench, "doc_id", n=8, portable=portable
            ).collect()
        )

    prod, portable = run(False), run(True)
    assert prod == portable
    # the decision is non-trivial on this corpus: the planted benchmark
    # docs are fully covered, others are not all zero or all hit
    full = [r for r in prod if r[1] > 0 and r[1] == r[2]]
    assert len(full) >= len([r for r in prod if r[0] % 50 == 0]) // 2
    assert any(r[2] == 0 for r in prod)


def test_simhash_prod_portable_decision_invariants(spark):
    from docling_eval_spark.operators.dedup import simhash, simhash_near_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    # plant ground-truth near-dups: 20 docs re-issued under new ids
    # with ONE extra token — a one-token edit flips few simhash bits,
    # so BOTH paths must pair each copy with its original
    planted = (
        docs.filter(F.col("doc_id") < 20)
        .select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zqxj")).alias("text"),
        )
    )
    # and 10 VERBATIM copies — exact duplicates for the d=0 invariant
    exact_copies = docs.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(planted).unionByName(exact_copies)

    def pairs_at(portable, max_hamming):
        sh = simhash(corpus, "doc_id", portable=portable)
        p = simhash_near_pairs(sh, max_hamming=max_hamming)
        return {
            tuple(sorted((r["id_l"], r["id_r"]))) for r in p.collect()
        }

    # one appended token flips |margin|<=1 bits; on the corpus's short
    # docs (11-87 tokens) the measured planted distances reach 8 under
    # both paths, so the ground-truth check runs at d<=10 — the point
    # is BOTH paths make the same "these are near-dups" call, not the
    # web-production d<=3 cutoff (which needs longer documents)
    prod10, port10 = pairs_at(False, 10), pairs_at(True, 10)
    wanted = {(i, i + 1_000_000) for i in range(20)}
    assert wanted <= prod10, sorted(wanted - prod10)
    assert wanted <= port10, sorted(wanted - port10)

    # exact token-sequence duplicates ⇒ Hamming 0 under ANY token
    # hash, so they must appear in BOTH paths' d=0 pair sets. (The d=0
    # sets themselves are NOT hash-invariant: unrelated docs whose 64
    # majority votes happen to share signs collide under one hash but
    # not the other — sign coincidence, not duplication.)
    from docling_eval_spark.operators.dedup import _norm

    by_digest = (
        corpus.select("doc_id", F.md5(_norm("text")).alias("d"))
        .groupBy("d")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") >= 2)
        .collect()
    )
    exact_pairs = {
        tuple(sorted((a, b)))
        for r in by_digest
        for i, a in enumerate(r["ids"])
        for b in r["ids"][i + 1 :]
    }
    assert exact_pairs, "fixture lost its exact duplicates"
    prod0, port0 = pairs_at(False, 0), pairs_at(True, 0)
    assert exact_pairs <= prod0, sorted(exact_pairs - prod0)[:5]
    assert exact_pairs <= port0, sorted(exact_pairs - port0)[:5]


def test_dup_ngram_prod_portable_same_decisions(spark):
    """dup_ngram_stats decisions are exact-match semantics like
    contamination: a shared 8-gram collides in both hash fields by
    construction, and cross-field false collisions are ~N/field per
    gram — so the full (id, n_grams, n_dup, dup_micro) row set must
    be identical between the prod xxhash64 path and the portable
    polynomial path on the sf0.01 corpus."""
    from docling_eval_spark.operators.text_analysis import dup_ngram_stats

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    rows = lambda p: {  # noqa: E731
        tuple(r) for r in dup_ngram_stats(docs, "doc_id", portable=p).collect()
    }
    prod, port = rows(False), rows(True)
    assert prod == port
    assert any(r[2] > 0 for r in prod), "fixture has no duplicated 8-grams"


def test_shingle_sig_arrow_sql_bit_identical(spark):
    """The Arrow numpy minhash front half must reproduce the expression
    twin (the oracle-documented shape) BIT-FOR-BIT: same window fold
    ``(acc·B + c) mod p``, same first-occurrence shingle dedup, same
    permutation minima — including the edge rows (empty text,
    whitespace-only text, text shorter than k, non-ASCII code points).
    """
    from docling_eval_spark.operators.dedup import shingle_sig_table

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    edge = spark.createDataFrame(
        [(90001, ""), (90002, "ab"), (90003, "   "), (90004, "é漢xé漢x test")],
        ["doc_id", "text"],
    )
    docs = docs.unionByName(edge)
    a = shingle_sig_table(docs, "doc_id", engine="arrow").orderBy("id").collect()
    s = shingle_sig_table(docs, "doc_id", engine="sql").orderBy("id").collect()
    assert len(a) == len(s) and len(a) > 0
    for ra, rs in zip(a, s):
        assert ra.id == rs.id
        assert list(ra.shingles) == list(rs.shingles)
        assert list(ra.signature) == list(rs.signature)
    # edge semantics pinned: empty/short texts
    by_id = {r.id: r for r in a}
    assert by_id[90001].shingles == [] and by_id[90003].shingles == []
    assert len(by_id[90002].shingles) == 1  # one clamped window
    p = (1 << 31) - 1
    assert by_id[90001].signature == [p] * 30  # empty → all-p signature


def test_bucket_assign_arrow_sql_bit_identical(spark):
    """The Arrow LSH bucket kernel must agree with the unrolled
    ``bucket_col`` expression twin on every row: the cumsum fold
    reproduces the expression's left-to-right float addition order, so
    the sign bits (and hence bucket ids) are identical."""
    import pyspark.sql.functions as F

    from docling_eval_spark.operators.similarity import (
        bucket_assign,
        bucket_col,
        hyperplanes,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    dim = len(e.select("embedding").first()[0])
    nullrow = spark.createDataFrame(
        [(990002, None)], schema=e.schema
    )  # NULL vector: every twin sign test fails -> bucket 0
    e = e.unionByName(nullrow)
    planes = hyperplanes(dim, 12, seed=7)
    arrow = bucket_assign(e, "embedding", planes).select("vec_id", "bucket")
    sql = e.withColumn("bucket", bucket_col("embedding", planes)).select(
        "vec_id", "bucket"
    )
    a = {r.vec_id: r.bucket for r in arrow.collect()}
    s = {r.vec_id: r.bucket for r in sql.collect()}
    assert a == s and len(a) > 0
    assert len(set(a.values())) > 1  # buckets actually split the corpus


def test_token_ngram_table_arrow_sql_bit_identical(spark):
    """The Arrow token-n-gram kernel must reproduce the expression twin
    bit-for-bit in BOTH hash modes — portable (per-code-point folds,
    including non-BMP code points: Spark's split('')/ascii are
    code-point semantics matching Python ord, probed 𝄞→119070) and
    prod (JVM xxhash64 token hashes, window fold in the kernel) — plus
    the short-doc (< n tokens) and empty-text edges."""
    import pyspark.sql.functions as F

    from docling_eval_spark.operators.text_analysis import (
        token_ngram_hash_table,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    edge = spark.createDataFrame(
        [
            (90001, ""),
            (90002, "one two three"),  # < n tokens
            (90003, "a 𝄞clef😀 b c d e f g h astral token mix"),
            (90004, "  padded   whitespace\tand\nnewlines " + "tok " * 12),
            (90005, None),  # NULL text: twin emits (0, []) like a short doc
        ],
        ["doc_id", "text"],
    )
    docs = docs.unionByName(edge)
    for portable in (True, False):
        a = (
            token_ngram_hash_table(docs, "doc_id", portable=portable)
            .orderBy("id")
            .collect()
        )
        s = (
            token_ngram_hash_table(
                docs, "doc_id", portable=portable, engine="sql"
            )
            .orderBy("id")
            .collect()
        )
        assert len(a) == len(s) and len(a) > 0
        for ra, rs in zip(a, s):
            assert ra.id == rs.id
            assert ra.n_grams == rs.n_grams
            ga = None if ra.grams is None else list(ra.grams)
            gs = None if rs.grams is None else list(rs.grams)
            assert ga == gs, (portable, ra.id)
    by_id = {r.id: r for r in a}
    assert by_id[90001].n_grams == 0 and by_id[90001].grams == []
    assert by_id[90002].n_grams == 0 and by_id[90002].grams == []
    assert by_id[90003].n_grams > 0
    assert by_id[90005].n_grams == 0 and by_id[90005].grams == []


def test_cosine_assign_arrow_sql_bit_identical(spark):
    """The Arrow pairwise-cosine kernel must agree bit-for-bit with the
    cosine_col expression twin (cumsum == the expression's left-fold
    addition order; sqrt/divide are single IEEE ops), including the
    zero-norm guard."""
    import pyspark.sql.functions as F

    from docling_eval_spark.operators.similarity import cosine_assign

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    dim = len(e.select("embedding").first()[0])
    zero = spark.createDataFrame(
        [(990001, [0.0] * dim)], ["vec_id", "embedding"]
    )
    e = e.unionByName(zero).unionByName(
        spark.createDataFrame([(990003, None)], schema=e.schema)
    )
    pairs = (
        e.select(F.col("vec_id").alias("id_l"), F.col("embedding").alias("v_l"))
        .crossJoin(
            e.select(
                F.col("vec_id").alias("id_r"), F.col("embedding").alias("v_r")
            ).filter(F.col("id_r") % 7 == 0)
        )
    )
    a = {
        (r.id_l, r.id_r): r.cosine
        for r in cosine_assign(
            pairs, "v_l", "v_r", keep=["id_l", "id_r"]
        ).collect()
    }
    s = {
        (r.id_l, r.id_r): r.cosine
        for r in cosine_assign(
            pairs, "v_l", "v_r", engine="sql", keep=["id_l", "id_r"]
        ).collect()
    }
    assert len(a) == len(s) > 0
    diffs = [k for k in a if a[k] != s[k]]
    assert diffs == []
    zero_pairs = [v for (l_, r_), v in a.items() if l_ == 990001]
    assert zero_pairs and all(v == 0.0 for v in zero_pairs)


def test_bpe_encode_arrow_sql_bit_identical(spark):
    """The memoized Arrow BPE encoder must reproduce the expression
    fold chain symbol-for-symbol — including a left==right rule over a
    repeated-char run (non-overlapping leftmost semantics), multi-rule
    chains where an earlier merge feeds a later rule, and NULL text."""
    import pyspark.sql.functions as F

    from docling_eval_spark.operators.bpe import bpe_encode

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    edge = spark.createDataFrame(
        [
            (90001, "aaa aaaa baaab"),      # left==right runs
            (90002, "the the theology"),    # merged symbol prefix reuse
            (90003, ""),
            (90004, None),
        ],
        ["doc_id", "text"],
    )
    docs = docs.unionByName(edge)
    rules = [("a", "a"), ("t", "h"), ("th", "e"), ("e", "</w>")]
    a = (
        bpe_encode(docs, rules, engine="arrow")
        .select("doc_id", "bpe_tokens")
        .orderBy("doc_id")
        .collect()
    )
    s = (
        bpe_encode(docs, rules, engine="sql")
        .select("doc_id", "bpe_tokens")
        .orderBy("doc_id")
        .collect()
    )
    assert len(a) == len(s) > 0
    for ra, rs in zip(a, s):
        assert ra.doc_id == rs.doc_id
        ta = None if ra.bpe_tokens is None else list(ra.bpe_tokens)
        ts = None if rs.bpe_tokens is None else list(rs.bpe_tokens)
        assert ta == ts, ra.doc_id
    by_id = {r.doc_id: r for r in a}
    assert list(by_id[90001].bpe_tokens)[:3] == ["aa", "a", "</w>"]
    assert by_id[90004].bpe_tokens is None


def test_bpe_train_arrow_sql_identical_rules(spark):
    """BPE training must learn the IDENTICAL rule sequence (rank, pair,
    merged symbol, frequency) under the Arrow pair-count/merge kernels
    and the expression twins — the frequencies are exact integers and
    the tie-break is total, so any divergence is a kernel bug."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("text")
    from docling_eval_spark.operators.bpe import bpe_train

    a = [tuple(r) for r in bpe_train(docs, merges=6, engine="arrow").collect()]
    s = [tuple(r) for r in bpe_train(docs, merges=6, engine="sql").collect()]
    assert a == s and len(a) == 6


def test_mlm_mask_arrow_sql_bit_identical(spark):
    """The Arrow MLM-mask kernel must reproduce every deterministic
    hash decision of the expression twin — selection, 80/10/10 branch,
    replacement vocab pick, label positions — byte-for-byte across the
    real corpus plus empty/NULL-text edges."""
    from docling_eval_spark.operators.training import mlm_mask

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    edge = spark.createDataFrame(
        [(90001, ""), (90002, None), (90003, "one two three four five")],
        ["doc_id", "text"],
    )
    docs = docs.unionByName(edge)
    vocab = ["alpha", "beta", "gamma", "delta"]
    a = mlm_mask(docs, "doc_id", vocab, engine="arrow").orderBy("id").collect()
    s = mlm_mask(docs, "doc_id", vocab, engine="sql").orderBy("id").collect()
    assert len(a) == len(s) > 0
    for ra, rs in zip(a, s):
        assert tuple(ra) == tuple(rs), (ra.id, tuple(ra), tuple(rs))
    # the masking is non-trivial on this corpus
    assert any(r.n_selected > 0 for r in a)
    assert any("[MASK]" in r.masked_text for r in a)
