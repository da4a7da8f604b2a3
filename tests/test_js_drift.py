"""Jensen–Shannon domain drift: twin parity, bounds, invariances."""

from __future__ import annotations

import math
import re
from collections import Counter

from docling_eval_spark.operators.text_analysis import js_drift

LN2_MICRO = 693147


def _round_half_away(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def js_drift_py(docs: list[tuple[str, str]]) -> dict[str, tuple[int, int]]:
    """Pure-Python twin (identical micro-nat quantization + clamps)."""
    cnt: dict[str, Counter] = {}
    for g, t in docs:
        toks = [x for x in re.split(r"[ \t\n\r\f\v]+", (t or "").strip()) if x]
        cnt.setdefault(g, Counter()).update(toks)
    out = {}
    total = Counter()
    for c in cnt.values():
        total.update(c)
    t_all = sum(total.values())
    for g, c in cnt.items():
        a_tot = sum(c.values())
        b_tot = t_all - a_tot
        if b_tot == 0:
            out[g] = (a_tot, 0)
            continue
        s1 = s2 = sb = 0
        for t, a in c.items():
            b = total[t] - a
            den = a * b_tot + b * a_tot
            s1 += a * _round_half_away(
                math.log(2.0 * (a * b_tot) / den) * 1e6
            )
            if b > 0:
                s2 += b * _round_half_away(
                    math.log(2.0 * (b * a_tot) / den) * 1e6
                )
            sb += b
        js = max(s1, 0) // (2 * a_tot) + max(
            s2 + (b_tot - sb) * LN2_MICRO, 0
        ) // (2 * b_tot)
        out[g] = (a_tot, js)
    return out


def test_js_identical_groups_near_zero():
    docs = [("a", "x y z x y"), ("b", "x y z x y")]
    got = js_drift_py(docs)
    for g in ("a", "b"):
        assert got[g][1] <= 2  # quantization slack only


def test_js_disjoint_groups_is_ln2():
    docs = [("a", "x x x"), ("b", "y y y")]
    got = js_drift_py(docs)
    # disjoint supports: JS = ln 2 exactly
    for g in ("a", "b"):
        assert abs(got[g][1] - LN2_MICRO) <= 2


def test_js_bounds_and_hand_mixture():
    # P = {x: 1}, Q = {x: .5, y: .5}:
    # m(x) = .75, m(y) = .25
    # JS = .5·[1·ln(1/.75)] + .5·[.5·ln(.5/.75) + .5·ln(.5/.25)]
    expect = 0.5 * math.log(4 / 3) + 0.5 * (
        0.5 * math.log(2 / 3) + 0.5 * math.log(2)
    )
    docs = [("p", "x x"), ("q", "x y")]
    got = js_drift_py(docs)
    assert abs(got["p"][1] / 1e6 - expect) < 3e-6
    assert abs(got["q"][1] / 1e6 - expect) < 3e-6
    assert 0 <= got["p"][1] <= LN2_MICRO


def test_js_single_group_emits_zero():
    assert js_drift_py([("only", "a b c")])["only"] == (3, 0)


def test_js_spark_matches_twin(spark):
    docs_df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = {
        r["source"]: (r["n_tokens"], r["js_micro"])
        for r in js_drift(docs_df).collect()
    }
    raw = [(r["source"], r["text"]) for r in docs_df.collect()]
    expect = js_drift_py(raw)
    assert rows == expect


def test_js_spark_single_group_guard(spark):
    df = spark.createDataFrame(
        [(1, "a", "x y z"), (2, "a", "x y")], "doc_id long, source string, text string"
    )
    rows = js_drift(df).collect()
    assert len(rows) == 1 and rows[0]["js_micro"] == 0
