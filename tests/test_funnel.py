"""Ordered funnel: time-ordering semantics + hand counts."""

from __future__ import annotations

from datetime import datetime

from docling_eval_spark.operators.temporal import funnel_steps


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, datetime(2026, 1, 1, 0, 0, s)) for u, t, s in rows],
        "user_id long, event_type string, ts timestamp",
    )


def test_funnel_ordering_is_enforced(spark):
    rows = [
        # user 1: full ordered chain
        (1, "view", 1), (1, "click", 2), (1, "purchase", 3),
        # user 2: click BEFORE view, purchase after → reaches view only
        # (no click at-or-after the first view)
        (2, "click", 1), (2, "view", 2), (2, "purchase", 3),
        # user 3: view+click, no purchase
        (3, "view", 1), (3, "click", 5),
        # user 4: never views (click/purchase only) → not even step 1
        (4, "click", 1), (4, "purchase", 2),
    ]
    got = {
        r["step"]: (r["n_users"], r["conv_ppm"])
        for r in funnel_steps(
            _ev(spark, rows), ["view", "click", "purchase"]
        ).collect()
    }
    assert got["view"] == (3, 1_000_000)
    assert got["click"] == (2, 666_666)
    assert got["purchase"] == (1, 333_333)


def test_funnel_same_timestamp_counts(spark):
    # ts >= prev is inclusive: simultaneous view+click chains
    rows = [(1, "view", 1), (1, "click", 1), (1, "purchase", 1)]
    got = {
        r["step"]: r["n_users"]
        for r in funnel_steps(
            _ev(spark, rows), ["view", "click", "purchase"]
        ).collect()
    }
    assert got == {"view": 1, "click": 1, "purchase": 1}


def test_funnel_later_view_can_unlock_chain(spark):
    # earliest view at t=5; the click at t=3 does NOT count, the one
    # at t=6 does — min-at-or-after semantics, not "any click"
    rows = [(1, "click", 3), (1, "view", 5), (1, "click", 6), (1, "purchase", 7)]
    got = {
        r["step"]: r["n_users"]
        for r in funnel_steps(
            _ev(spark, rows), ["view", "click", "purchase"]
        ).collect()
    }
    assert got == {"view": 1, "click": 1, "purchase": 1}


def test_funnel_empty_first_step_zero_ppm(spark):
    rows = [(1, "click", 1)]
    got = funnel_steps(_ev(spark, rows), ["view", "click"]).collect()
    assert all(r["n_users"] == 0 and r["conv_ppm"] == 0 for r in got)
