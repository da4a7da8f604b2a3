"""Boilerplate classification over the lexed block stream.

Implements the published Boilerpipe *NumWordsRulesClassifier* decision
tree (Kohlschütter, Fankhauser, Nejdl: "Boilerplate Detection using
Shallow Text Features", WSDM 2010) — a context-sensitive rule on
(link density, word counts) of the previous/current/next block —
augmented with two Readability-style structural priors that take
precedence:

1. blocks under <nav>/<header>/<footer>/<aside>/<form> are boilerplate;
2. blocks inside <head>/<title> or inside <table> are not main text
   (tables are extracted separately as structured grids).

All thresholds are the public Boilerpipe constants.
"""

from __future__ import annotations

from docling_eval_spark.extraction.html_lexer import Block

# Public Boilerpipe NumWordsRulesClassifier thresholds.
_MAX_LINK_DENSITY = 0.333333
_PREV_LINK_DENSITY = 0.555556


def _is_content_by_rules(prev: Block | None, cur: Block, nxt: Block | None) -> bool:
    prev_words = prev.num_words if prev else 0
    prev_ld = prev.link_density if prev else 0.0
    next_words = nxt.num_words if nxt else 0

    if cur.link_density > _MAX_LINK_DENSITY:
        return False
    if prev_ld <= _PREV_LINK_DENSITY:
        if cur.num_words > 16:
            return True
        if next_words > 15:
            return True
        return prev_words > 4
    if cur.num_words > 40:
        return True
    return next_words > 17


def classify(blocks: list[Block]) -> list[bool]:
    """Return a content/boilerplate flag per block (True = content).

    Context blocks (prev/next) for the density rules are the adjacent
    *candidate* blocks — head/table/structural-boiler blocks are
    removed from the sequence first, matching Boilerpipe's behavior of
    classifying over the visible text-block stream.
    """
    candidates = [
        b for b in blocks if not (b.in_head or b.in_table or b.in_boiler)
    ]
    flags = {
        id(b): _is_content_by_rules(
            candidates[i - 1] if i > 0 else None,
            b,
            candidates[i + 1] if i + 1 < len(candidates) else None,
        )
        for i, b in enumerate(candidates)
    }
    return [flags.get(id(b), False) for b in blocks]


def classify_link_density(
    blocks: list[Block], max_link_density: float = _MAX_LINK_DENSITY
) -> list[bool]:
    """Readability-core LINK-DENSITY-ONLY classifier — the second,
    independent extractor family ("extractor B") next to the
    Boilerpipe NumWordsRules tree above: a block is content iff its
    word-level link density is <= ``max_link_density``. No word-count
    context rules, and NO structural nav/header/footer prior — the
    disagreement between the two families on linkless short chrome
    (logos, copyright footers) is exactly what the extractor-agreement
    evaluation measures (docling-eval's converter-comparison
    discipline turned on the extraction stage itself). Head/table
    blocks are still excluded by the kernel, as for extractor A."""
    return [b.link_density <= max_link_density for b in blocks]
