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


def _tag_name(tok: str) -> str:
    m = _TAG_NAME_RE.match(tok)
    return m.group(1).lower() if m else ""


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

    def flush() -> None:
        nonlocal cur
        if cur.num_words > 0 or _WORD_RE.search(cur.text):
            blocks.append(cur)
        cur = Block(
            label=_LABEL_FOR_TAG.get(label_stack[-1], "text")
            if label_stack
            else "text",
            in_boiler=boiler_depth > 0,
            in_table=table_depth > 0,
            in_head=head_depth > 0,
        )

    for tok in _TOKEN_RE.finditer(html_text):
        t = tok.group(0)
        if t.startswith("<") and not t.startswith("<!") and not t.startswith("<?"):
            name = _tag_name(t)
            closing = t.startswith("</")
            self_closing = t.endswith("/>")
            if skip_until is not None:
                if closing and name == skip_until:
                    skip_until = None
                continue
            if name in _RAW_SKIP and not closing and not self_closing:
                skip_until = name
                continue
            if name == "a":
                if closing:
                    anchor_depth = max(0, anchor_depth - 1)
                elif not self_closing:
                    anchor_depth += 1
                continue
            if name in _BLOCK_TAGS:
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
                if name in _LABEL_FOR_TAG:
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
        if t.startswith("<!") or t.startswith("<?"):
            continue
        if skip_until is not None:
            continue
        text = _html.unescape(t)
        words = len(_WORD_RE.findall(text))
        cur.parts.append(text)
        cur.num_words += words
        if anchor_depth > 0:
            cur.link_words += words
    flush()
    return blocks
