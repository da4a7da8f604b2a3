"""Regex-based HTML lexer → flat block stream.

From-scratch tokenizer (no bs4/lxml dependency — executors only need
the stdlib). Produces a stream of *text blocks*, each annotated with
the features the boilerplate classifier needs: word count, link word
count, label (derived from the enclosing tag), and ancestor flags
(nav/header/footer/aside/form).

Design parallel (not a port): the reference delegates parsing to the
docling converter (`converters/conversion.py:31-158`); here the lexer
is the first stage of our own extraction kernel.
"""

from __future__ import annotations

import html as _html
import re
from dataclasses import dataclass, field

# Tags whose entire content is never document text.
_RAW_SKIP = {"script", "style", "noscript", "template", "svg", "iframe"}

# Tags that delimit text blocks (HTML block-level display).
_BLOCK_TAGS = {
    "address", "article", "aside", "blockquote", "body", "br", "caption",
    "dd", "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer",
    "form", "h1", "h2", "h3", "h4", "h5", "h6", "head", "header", "hr",
    "html", "li", "main", "nav", "ol", "p", "pre", "section", "table",
    "tbody", "td", "tfoot", "th", "thead", "title", "tr", "ul",
}

# Ancestor tags that force boilerplate classification (Readability-style
# structural prior on top of the density rules).
_BOILER_ANCESTORS = ("nav", "header", "footer", "aside", "form")

# Enclosing tag → block label (DocItemLabel vocabulary of the reference,
# see /root/reference/docling_eval/benchmarks/dpbench/create.py:97-240).
_LABEL_FOR_TAG = {
    "h1": "title",
    "h2": "section_header",
    "h3": "section_header",
    "h4": "section_header",
    "h5": "section_header",
    "h6": "section_header",
    "li": "list_item",
    "figcaption": "caption",
    "caption": "caption",
    "pre": "code",
    "blockquote": "text",
    "p": "text",
}

_TOKEN_RE = re.compile(
    r"<!--.*?-->"            # comments
    r"|<!\[CDATA\[.*?\]\]>"  # cdata
    r"|<![^>]*>"             # doctype / other declarations
    r"|<\?[^>]*>"            # processing instructions
    r"|</?[a-zA-Z][^>]*>"    # open/close tags
    r"|[^<]+",               # text run
    re.S,
)

_TAG_NAME_RE = re.compile(r"</?\s*([a-zA-Z][a-zA-Z0-9]*)")
_WORD_RE = re.compile(r"\S+")


@dataclass
class Block:
    """One text block with the classifier's feature set."""

    label: str = "text"
    parts: list[str] = field(default_factory=list)
    num_words: int = 0
    link_words: int = 0
    in_boiler: bool = False  # under nav/header/footer/aside/form
    in_table: bool = False
    in_head: bool = False

    @property
    def text(self) -> str:
        return "".join(self.parts)

    @property
    def link_density(self) -> float:
        return self.link_words / self.num_words if self.num_words else 0.0


# Per exact tag token: (name, closing, self_closing, kind, label_tag)
# where kind pre-resolves every set membership the loop would test —
# 0 other, 1 raw-skip, 2 anchor, 3 block — and label_tag is the name
# iff it carries a block label. Bare tags (`<td>`, `</tr>`, …) repeat
# millions of times across a corpus while attribute-laden tags
# (href=…) are near-unique, so the cache is capped by token length
# and entry count — bounded memory per worker, ~hit-everything for
# the tokens that dominate the stream.
_TAG_CACHE: dict[str, tuple[str, bool, bool, int, str | None]] = {}
_TAG_CACHE_MAX_TOKEN = 32
_TAG_CACHE_MAX_ENTRIES = 4096
_KIND_OTHER, _KIND_RAW_SKIP, _KIND_ANCHOR, _KIND_BLOCK = 0, 1, 2, 3


def _tag_info(t: str) -> tuple[str, bool, bool, int, str | None]:
    m = _TAG_NAME_RE.match(t)
    name = m.group(1).lower() if m else ""
    if name in _RAW_SKIP:
        kind = _KIND_RAW_SKIP
    elif name == "a":
        kind = _KIND_ANCHOR
    elif name in _BLOCK_TAGS:
        kind = _KIND_BLOCK
    else:
        kind = _KIND_OTHER
    return (name, t[1] == "/", t.endswith("/>"), kind,
            name if name in _LABEL_FOR_TAG else None)


def lex_blocks(html_text: str) -> list[Block]:
    """Scan HTML into a list of non-empty text blocks with features.

    Single forward pass; O(len(html)). Whitespace inside a block is
    preserved here and normalized later (kernel.normalize_ws) so the
    block boundary logic stays independent of the text contract.
    """
    blocks: list[Block] = []
    cur = Block()
    anchor_depth = 0
    boiler_depth = 0
    table_depth = 0
    head_depth = 0
    skip_until: str | None = None  # inside <script>/<style>/...
    # tag context for labeling: innermost labeling tag currently open
    label_stack: list[str] = []
    tag_cache = _TAG_CACHE
    word_findall = _WORD_RE.findall
    unescape = _html.unescape

    def flush() -> None:
        # A block survives iff it holds at least one word: parts with
        # zero words are whitespace-only (word count and the survival
        # probe use the same \S+ class on the same unescaped text, and
        # joining whitespace-only parts cannot mint a word), so the old
        # `or _WORD_RE.search(cur.text)` re-scan was provably redundant.
        # The empty current block is REUSED rather than reallocated —
        # every call site re-seeds label/context flags right after —
        # which skips ~one dataclass build per block tag.
        nonlocal cur
        if cur.num_words:
            blocks.append(cur)
            cur = Block()
        elif cur.parts:  # whitespace-only: drop text, reuse the object
            cur.parts.clear()

    for tok in _TOKEN_RE.finditer(html_text):
        t = tok.group(0)
        if t[0] == "<" and t[1] != "!" and t[1] != "?":
            info = tag_cache.get(t)
            if info is None:
                info = _tag_info(t)
                if (
                    len(t) <= _TAG_CACHE_MAX_TOKEN
                    and len(tag_cache) < _TAG_CACHE_MAX_ENTRIES
                ):
                    tag_cache[t] = info
            name, closing, self_closing, kind, label_tag = info
            if skip_until is not None:
                if closing and name == skip_until:
                    skip_until = None
                continue
            if kind == _KIND_RAW_SKIP and not closing and not self_closing:
                skip_until = name
                continue
            if kind == _KIND_ANCHOR:
                if closing:
                    anchor_depth = max(0, anchor_depth - 1)
                elif not self_closing:
                    anchor_depth += 1
                continue
            if kind == _KIND_BLOCK:
                flush()
                if name in _BOILER_ANCESTORS:
                    boiler_depth += (-1 if closing else 1)
                    boiler_depth = max(0, boiler_depth)
                if name == "table":
                    table_depth += (-1 if closing else 1)
                    table_depth = max(0, table_depth)
                if name in ("head", "title"):
                    head_depth += (-1 if closing else 1)
                    head_depth = max(0, head_depth)
                if label_tag is not None:
                    if closing:
                        if label_stack and label_stack[-1] == name:
                            label_stack.pop()
                    elif not self_closing:
                        label_stack.append(name)
                # re-seed the fresh block's context after stack updates
                cur.in_boiler = boiler_depth > 0
                cur.in_table = table_depth > 0
                cur.in_head = head_depth > 0
                cur.label = (
                    _LABEL_FOR_TAG.get(label_stack[-1], "text")
                    if label_stack
                    else "text"
                )
            continue
        if t[0] == "<":  # comment / cdata / doctype / PI token
            continue
        if skip_until is not None:
            continue
        text = unescape(t)
        words = len(word_findall(text))
        cur.parts.append(text)
        cur.num_words += words
        if anchor_depth > 0:
            cur.link_words += words
    flush()
    return blocks
