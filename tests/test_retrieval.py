"""Retrieval operators: salted exact top-k, impact-ordered inverted
index, fixed-point BM25, anchor-text extraction/rollup."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from docling_eval_spark.operators.retrieval import (
    bm25_topk,
    inverted_index,
    topk_per_key,
)
from docling_eval_spark.operators.web_ops import (
    anchor_text_rollup,
    extract_anchors,
)

# ---------------------------------------------------------- topk_per_key


def test_topk_salted_equals_unsalted(spark):
    """The salted two-phase prune is EXACT: any n_salt yields the
    same rows and ranks as the plain single-window top-k."""
    rows = [(f"k{i % 7}", i * 37 % 101, f"id{i:03d}") for i in range(500)]
    df = spark.createDataFrame(rows, ["key", "score", "id"])
    order = [F.col("score").desc(), F.col("id").asc()]

    def run(n_salt):
        out = topk_per_key(df, ["key"], order, 5, salt_col="id", n_salt=n_salt)
        return sorted(map(tuple, out.collect()))

    base = run(1)
    assert len(base) == 7 * 5
    assert run(16) == base
    assert run(3) == base


def test_topk_fewer_rows_than_k(spark):
    df = spark.createDataFrame([("a", 1, "x"), ("a", 2, "y")], ["key", "s", "id"])
    out = topk_per_key(
        df, ["key"], [F.col("s").desc(), F.col("id").asc()], 10, salt_col="id"
    ).collect()
    assert sorted((r.key, r.s, r.rank) for r in out) == [("a", 1, 2), ("a", 2, 1)]


# -------------------------------------------------------- inverted_index


def test_inverted_index_hand_case(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana banana banana cherry"),
            (3, "Apple cherry"),
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    out = inverted_index(docs, "doc_id", k_postings=2)
    rows = {(r.term, r.rank): (r.id, r.tf, r.doc_count) for r in out.collect()}
    # apple: doc1 tf=2, doc3 tf=1 (lowercased); df=2
    assert rows[("apple", 1)] == (1, 2, 2)
    assert rows[("apple", 2)] == (3, 1, 2)
    # banana: doc2 tf=3 beats doc1 tf=1; df=2
    assert rows[("banana", 1)] == (2, 3, 2)
    assert rows[("banana", 2)] == (1, 1, 2)
    # cherry tie tf=1: id asc → doc2 first
    assert rows[("cherry", 1)] == (2, 1, 2)
    assert rows[("cherry", 2)] == (3, 1, 2)
    assert len(rows) == 6


def test_inverted_index_cap_keeps_exact_doc_count(spark):
    """Capping postings must not touch the collection statistic."""
    docs = spark.createDataFrame(
        [(i, "common " * (i + 1)) for i in range(10)], ["doc_id", "text"]
    )
    out = inverted_index(docs, "doc_id", k_postings=3).collect()
    assert len(out) == 3  # capped postings
    assert all(r.doc_count == 10 for r in out)  # exact df
    # impact order: highest tf first
    assert [r.id for r in sorted(out, key=lambda r: r.rank)] == [9, 8, 7]


def test_inverted_index_plan_stays_jvm(spark):
    docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    plan = inverted_index(docs, "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


# ------------------------------------------------------------------ bm25


def _bm25_expected(corpus, queries, k1_milli=1200, b_milli=750):
    """Independent integer-math mirror of the fixed-point contract."""
    n = len(corpus)
    dls = {i: len(t.split()) for i, t in corpus.items()}
    total = sum(dls.values())
    avgdl_milli = (1000 * total) // n
    tf = {}
    for i, t in corpus.items():
        for w in t.lower().split():
            tf[(w, i)] = tf.get((w, i), 0) + 1
    scores = {}
    for qid, qtext in queries.items():
        qtf = {}
        for w in qtext.lower().split():
            qtf[w] = qtf.get(w, 0) + 1
        for term, qn in qtf.items():
            dfreq = sum(1 for (w, _i) in tf if w == term)
            if dfreq == 0:
                continue
            idf_micro = round(math.log((2 * n + 2) / (2 * dfreq + 1)) * 1e6)
            for (w, i), f in tf.items():
                if w != term:
                    continue
                norm = (1000 - b_milli) + (b_milli * 1000 * dls[i]) // avgdl_milli
                denom = 1000 * f + (k1_milli * norm) // 1000
                wf = (f * (1000 + k1_milli) * 1_000_000) // denom
                scores[(qid, i)] = scores.get((qid, i), 0) + qn * (
                    (idf_micro * wf) // 1_000_000
                )
    return scores


def test_bm25_matches_integer_mirror(spark):
    corpus = {
        1: "fast hash join over table",
        2: "slow table scan table table",
        3: "hash hash hash partition",
        4: "window sort merge",
        5: "the quick brown fox",
    }
    queries = {"q1": "hash table", "q2": "table table scan", "q3": "absent"}
    docs = spark.createDataFrame(list(corpus.items()), ["doc_id", "text"])
    qdf = spark.createDataFrame(list(queries.items()), ["query_id", "qtext"])
    out = bm25_topk(docs, qdf, "doc_id", k=10)
    got = {(r.query_id, r.id): r.score_micro for r in out.collect()}
    assert got == _bm25_expected(corpus, queries)
    # ranking is by (score desc, id asc)
    ranks = {(r.query_id, r.id): r.rank for r in out.collect()}
    q1 = sorted(
        ((s, i) for (q, i), s in got.items() if q == "q1"),
        key=lambda t: (-t[0], t[1]),
    )
    assert [ranks[("q1", i)] for _s, i in q1] == list(range(1, len(q1) + 1))


def test_bm25_duplicate_query_terms_weight_qtf(spark):
    docs = spark.createDataFrame([(1, "x y"), (2, "x x")], ["doc_id", "text"])
    single = spark.createDataFrame([("q", "x")], ["query_id", "qtext"])
    double = spark.createDataFrame([("q", "x x")], ["query_id", "qtext"])
    s1 = {r.id: r.score_micro for r in bm25_topk(docs, single, "doc_id").collect()}
    s2 = {r.id: r.score_micro for r in bm25_topk(docs, double, "doc_id").collect()}
    assert s2 == {i: 2 * v for i, v in s1.items()}


def test_bm25_plan_stays_jvm(spark):
    docs = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    qdf = spark.createDataFrame([("q", "a")], ["query_id", "qtext"])
    plan = (
        bm25_topk(docs, qdf, "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan


# --------------------------------------------------------------- anchors


_PAGE = (
    "<html><body>"
    '<a href="https://ext.example/abs">Absolute <b>Link</b></a>'
    "<A HREF='//cdn.example/pr'>proto\n relative</A>"
    '<a class="nav" href="/rooted">rooted  here</a>'
    '<a href="relative.html">skipped</a>'
    '<a href="#frag">skipped too</a>'
    '<a href="https://img.example/i"><img src="x.png"/></a>'
    "<a name='no-href'>not a link</a>"
    "</body></html>"
)


def test_extract_anchors_cases(spark):
    df = spark.createDataFrame(
        [("https://h.example:8080/p", bytearray(_PAGE, "utf8"))], ["url", "html"]
    )
    got = {
        (r.dst, r.anchor) for r in extract_anchors(df).collect()
    }
    assert got == {
        ("https://ext.example/abs", "Absolute Link"),
        ("https://cdn.example/pr", "proto relative"),
        ("https://h.example:8080/rooted", "rooted here"),
        ("https://img.example/i", ""),
    }


def test_extract_anchors_keeps_duplicate_edges(spark):
    html = '<a href="/a">one</a><a href="/a">two</a><a href="/a">one</a>'
    df = spark.createDataFrame(
        [("http://s.example/", bytearray(html, "utf8"))], ["url", "html"]
    )
    rows = extract_anchors(df).collect()
    assert len(rows) == 3
    assert sorted(r.anchor for r in rows) == ["one", "one", "two"]


def test_anchor_rollup_counts_distinct_hosts(spark):
    mk = lambda host, n: (  # noqa: E731
        f"https://{host}/page{n}",
        bytearray('<a href="https://t.example/">home page</a>', "utf8"),
    )
    df = spark.createDataFrame(
        [mk("a.example", 1), mk("a.example", 2), mk("b.example", 1)],
        ["url", "html"],
    )
    out = anchor_text_rollup(extract_anchors(df)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.dst, r.anchor, r.n_anchors, r.n_src_hosts) == (
        "https://t.example/",
        "home page",
        3,
        2,
    )


def test_extract_anchors_plan_stays_jvm(spark):
    df = spark.createDataFrame([("http://a/", b"")], ["url", "html"])
    plan = (
        extract_anchors(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
