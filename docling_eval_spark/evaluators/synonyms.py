"""Static synonym table for the METEOR synonym-alignment stage.

The reference scores METEOR through NLTK, whose third alignment stage
matches words sharing a WordNet synset (`markdown_text_evaluator.py:216`
in the reference; NLTK `meteor_score.py`). WordNet is not available in
this container, so this module bundles a small, fixed table of common
English synonym groups (ordinary dictionary knowledge — no external
data). Two tokens align in the synonym stage iff they map to the same
group id.

This is a strict subset of WordNet: every match made here is one NLTK
would also make, so repo-METEOR (exact + Porter + static synonyms) is
a LOWER BOUND on NLTK-METEOR for inputs whose only divergence is
synonymy, and the deviation per sentence pair is bounded by the effect
of the WordNet-only matches (each missed match reduces m by 1 in both
precision m/len(hyp) and recall m/len(ref); see COVERAGE.md §F10 for
the committed fixed-sentence delta table).
"""

from __future__ import annotations

_GROUPS: list[list[str]] = [
    ["big", "large", "huge"],
    ["small", "little", "tiny"],
    ["fast", "quick", "rapid", "speedy"],
    ["slow", "sluggish"],
    ["begin", "start", "commence"],
    ["end", "finish", "conclude"],
    ["buy", "purchase"],
    ["sell", "vend"],
    ["happy", "glad", "joyful"],
    ["sad", "unhappy", "sorrowful"],
    ["smart", "intelligent", "clever"],
    ["stupid", "dumb", "foolish"],
    ["beautiful", "pretty", "lovely"],
    ["ugly", "hideous"],
    ["rich", "wealthy", "affluent"],
    ["poor", "impoverished"],
    ["old", "ancient", "aged"],
    ["new", "novel", "modern"],
    ["hard", "difficult", "tough"],
    ["easy", "simple"],
    ["important", "significant", "crucial"],
    ["wrong", "incorrect", "erroneous"],
    ["right", "correct", "accurate"],
    ["make", "create", "produce"],
    ["destroy", "demolish", "wreck"],
    ["show", "display", "exhibit"],
    ["hide", "conceal"],
    ["help", "assist", "aid"],
    ["stop", "halt", "cease"],
    ["speak", "talk"],
    ["see", "observe", "view"],
    ["get", "obtain", "acquire"],
    ["give", "provide", "supply"],
    ["keep", "retain", "preserve"],
    ["choose", "select", "pick"],
    ["answer", "reply", "response"],
    ["question", "query"],
    ["error", "mistake", "fault"],
    ["result", "outcome"],
    ["method", "approach", "technique"],
    ["goal", "aim", "objective", "target"],
    ["idea", "concept", "notion"],
    ["job", "occupation", "employment"],
    ["car", "automobile"],
    ["house", "home", "dwelling"],
    ["road", "street"],
    ["child", "kid"],
    ["doctor", "physician"],
    ["illness", "disease", "sickness"],
    ["famous", "renowned", "celebrated"],
    ["strange", "odd", "weird"],
    ["near", "close", "nearby"],
    ["far", "distant", "remote"],
    ["whole", "entire", "complete"],
    ["part", "portion", "segment"],
    ["many", "numerous"],
    ["few", "scarce"],
    ["often", "frequently"],
    ["seldom", "rarely"],
    ["maybe", "perhaps", "possibly"],
]

SYNONYM_GROUP: dict[str, int] = {
    w: i for i, grp in enumerate(_GROUPS) for w in grp
}


def synonym_key(token: str) -> int | None:
    """Group id if the (lowercased) token is in the table, else None."""
    return SYNONYM_GROUP.get(token.lower())
