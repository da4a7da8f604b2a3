"""Unit pins for the HTML lexer's block semantics.

The lexer is the hottest kernel stage and was rewritten for speed
(token cache + block reuse); these cases pin the exact block-stream
semantics the byte-identity suite depends on, so any future
optimization must reproduce them verbatim.
"""

from __future__ import annotations

from docling_eval_spark.extraction.html_lexer import (
    _TAG_CACHE,
    _TAG_CACHE_MAX_ENTRIES,
    _TAG_CACHE_MAX_TOKEN,
    lex_blocks,
)


def sig(blocks):
    return [
        (b.label, b.text, b.num_words, b.link_words, b.in_boiler, b.in_table)
        for b in blocks
    ]


def texts(blocks):
    return [b.text for b in blocks]


def test_basic_blocks_and_labels():
    bs = lex_blocks("<h1>Title</h1><p>Body text here</p><li>item</li>")
    assert [(b.label, b.text) for b in bs] == [
        ("title", "Title"),
        ("text", "Body text here"),
        ("list_item", "item"),
    ]


def test_whitespace_only_block_dropped():
    assert texts(lex_blocks("<p>x</p><p> \n\t </p><p>y</p>")) == ["x", "y"]


def test_raw_skip_regions():
    # script/style/svg/noscript content never becomes text, including
    # markup-looking strings inside them
    assert texts(lex_blocks("<script>var a='<p>no</p>';</script>after")) == [
        "after"
    ]
    assert texts(lex_blocks("<style>p{color:red}</style>t")) == ["t"]
    assert texts(lex_blocks("<svg><text>no</text></svg>yes")) == ["yes"]
    # self-closing raw tag does NOT open a skip region
    assert texts(lex_blocks("<script src=x/>kept")) == ["kept"]
    # stray closing raw tag outside a region is a no-op
    assert texts(lex_blocks("</script>kept too")) == ["kept too"]
    # unterminated region swallows to EOF
    assert texts(lex_blocks("<script>never closed")) == []


def test_anchor_word_accounting():
    (b,) = lex_blocks("<p><a href='#'>two words</a> free text</p>")
    assert (b.num_words, b.link_words) == (4, 2)
    # nested anchors: inner close leaves outer open
    (b,) = lex_blocks("<p><a><a>in</a>still linked</a>out</p>")
    assert (b.num_words, b.link_words) == (4, 3)
    # self-closing <a/> opens nothing
    (b,) = lex_blocks("<p><a/>plain</p>")
    assert (b.num_words, b.link_words) == (1, 0)


def test_boiler_and_table_context():
    bs = lex_blocks("<nav><p>menu</p></nav><p>body</p>")
    assert [(b.text, b.in_boiler) for b in bs] == [("menu", True), ("body", False)]
    bs = lex_blocks("<table><tr><td>cell</td></tr></table><p>out</p>")
    assert [(b.text, b.in_table) for b in bs] == [("cell", True), ("out", False)]


def test_head_title_context():
    bs = lex_blocks("<head><title>T</title></head>B")
    assert [(b.text, b.in_head) for b in bs] == [("T", True), ("B", False)]


def test_entities_unescaped_before_word_count():
    (b,) = lex_blocks("<p>&amp; &lt;tag&gt; &#65;</p>")
    assert b.text == "& <tag> A"
    assert b.num_words == 3


def test_case_insensitive_tags_and_comments():
    assert texts(lex_blocks("<P>UP</P>")) == ["UP"]
    assert texts(lex_blocks("<!-- <p>c</p> --><p>t</p>")) == ["t"]
    assert texts(lex_blocks("x<?php echo 1 ?>y<![CDATA[z]]>w")) == ["xyw"]


def test_stray_lt_dropped_from_text():
    # an unmatched '<' cannot start any token; the tokenizer skips it
    bs = lex_blocks("a < b")
    assert "".join(texts(bs)) == "a  b"


def test_label_stack_nesting():
    bs = lex_blocks("<li>outer<p>inner</p>tail</li>")
    assert [(b.label, b.text) for b in bs] == [
        ("list_item", "outer"),
        ("text", "inner"),
        ("list_item", "tail"),
    ]


def test_tag_cache_only_holds_short_tokens():
    long_tag = "<p data-x='" + "y" * 100 + "'>long</p>"
    lex_blocks(long_tag)
    assert all(len(k) <= _TAG_CACHE_MAX_TOKEN for k in _TAG_CACHE)
    assert len(_TAG_CACHE) <= _TAG_CACHE_MAX_ENTRIES
    # cached and uncached paths agree for the same logical tag
    assert texts(lex_blocks(long_tag)) == ["long"]
    assert texts(lex_blocks("<p>short</p>")) == ["short"]
