"""Mojibake repair, registered-domain (PSL-lite), page metadata."""

from __future__ import annotations

import pyspark.sql.functions as F

from docling_eval_spark.operators.text_analysis import mojibake_repair
from docling_eval_spark.operators.web_ops import (
    domain_rollup,
    page_metadata,
    registered_domain_col,
)

# -------------------------------------------------------------- mojibake


def _garble(s: str) -> str:
    """UTF-8 bytes mis-decoded as Latin-1 — the corruption under test."""
    return s.encode("utf-8").decode("latin-1")


def test_mojibake_repair_recovers_original(spark):
    originals = [
        "café résumé",              # 2-byte seqs
        "naïve — em dash",               # incl. a 3-byte seq
        "Über straße",                   # leading garbled char
    ]
    rows = [(i, _garble(s)) for i, s in enumerate(originals)]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = {r.id: r for r in mojibake_repair(df).collect()}
    for i, s in enumerate(originals):
        assert out[i].was_mojibake is True
        assert out[i].repaired_text == s


def test_mojibake_repair_leaves_clean_text_alone(spark):
    clean = [
        (0, "plain ascii text"),
        (1, "réel français déjà correct"),  # real Latin-1 prose
        (2, "中文 text beyond latin1"),                  # CJK — guard 2
        (3, None),
        (4, ""),
    ]
    df = spark.createDataFrame(clean, ["id", "text"])
    out = {r.id: r for r in mojibake_repair(df).collect()}
    for i, s in clean:
        assert out[i].was_mojibake is False
        assert out[i].repaired_text == s


def test_mojibake_signature_gate_not_fooled_by_invalid_bytes(spark):
    # Matches the signature but is NOT valid UTF-8 when re-encoded:
    # lead byte without a valid continuation sequence following.
    bad = "price Ã© ok but also Ã aloneÿÿ"
    df = spark.createDataFrame([(0, bad)], ["id", "text"])
    r = mojibake_repair(df).collect()[0]
    assert r.was_mojibake is False
    assert r.repaired_text == bad


def test_mojibake_plan_stays_jvm(spark):
    df = spark.createDataFrame([(0, "x")], ["id", "text"])
    plan = mojibake_repair(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan


# ------------------------------------------------------ registered domain


def test_registered_domain_cases(spark):
    cases = {
        "https://www.example.co.uk/p": "example.co.uk",
        "https://a.b.shop.com.au/": "shop.com.au",
        "http://news.example.com/x": "example.com",
        "http://example.org/": "example.org",
        "https://deep.sub.domain.example.org/": "example.org",
        "http://10.1.2.3/path": "10.1.2.3",
        "http://localhost/": "localhost",
        "https://example.com:8080/q": "example.com",  # host_col drops port
    }
    df = spark.createDataFrame([(u,) for u in cases], ["url"])
    got = {
        r.url: r.dom
        for r in df.select(
            "url", registered_domain_col("url").alias("dom")
        ).collect()
    }
    assert got == cases


def test_domain_rollup_counts(spark):
    urls = [
        "https://www.shop.co.uk/1",
        "https://api.shop.co.uk/2",
        "https://shop.co.uk/3",
        "https://other.com/1",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = {r.domain: (r.n_pages, r.n_hosts) for r in domain_rollup(df).collect()}
    assert got == {"shop.co.uk": (3, 3), "other.com": (1, 1)}


# --------------------------------------------------------- page metadata

_HEAD_PAGE = (
    "<html LANG='en-GB'><head>"
    "<title>  A\n  Spaced   Title </title>"
    '<link type="x" rel="canonical" href="/canon/path">'
    "<meta name='robots' content='nofollow, noindex'>"
    "</head><body>hi</body></html>"
)


def test_page_metadata_full(spark):
    df = spark.createDataFrame(
        [("https://h.example:8080/page", bytearray(_HEAD_PAGE, "utf8"))],
        ["url", "html"],
    )
    r = page_metadata(df).collect()[0]
    assert r.title == "A Spaced Title"
    assert r.html_lang == "en-gb"
    assert r.canonical_url == "https://h.example:8080/canon/path"
    assert r.meta_noindex is True


def test_page_metadata_absent_signals(spark):
    df = spark.createDataFrame(
        [("http://a.example/", bytearray(b"<html><body>no head</body></html>"))],
        ["url", "html"],
    )
    r = page_metadata(df).collect()[0]
    assert r.title is None
    assert r.html_lang is None
    assert r.canonical_url is None
    assert r.meta_noindex is False


def test_page_metadata_absolute_canonical_and_attr_order(spark):
    html = '<link href="https://canon.example/x" rel="canonical"><title>t</title>'
    df = spark.createDataFrame(
        [("http://src.example/", bytearray(html, "utf8"))], ["url", "html"]
    )
    r = page_metadata(df).collect()[0]
    assert r.canonical_url == "https://canon.example/x"
    assert r.title == "t"


def test_page_metadata_plan_stays_jvm(spark):
    df = spark.createDataFrame([("http://a/", b"")], ["url", "html"])
    plan = page_metadata(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan
