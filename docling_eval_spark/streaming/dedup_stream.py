"""Streaming exact-dedup — the incremental-crawl twin of
``operators.dedup.exact_dedup`` (SURVEY §2.10 family).

A crawl never arrives at once: each micro-batch carries new pages, and
a page duplicated ACROSS batches must be dropped the second time it
appears. ``applyInPandasWithState`` keyed by the normalized-text
digest holds one tiny state row per distinct digest (first id +
running count); the first occurrence is emitted, every later copy
only bumps the count.

State-lifetime contract: by default "seen" is forever (NoTimeout) —
the crawl-dedup semantics, state size = distinct documents, the same
cardinality the batch dedup's shuffle carries. That is fine for
``availableNow`` replays and bounded crawls, but UNBOUNDED for a true
continuous crawl: a query that runs for months accrues one state row
per distinct page ever seen. For that shape pass ``state_ttl_ms`` —
each digest's state then expires ``state_ttl_ms`` after the last
sighting (processing-time timeout; the sliding-window dedup rule
"a copy only counts as a duplicate within the TTL of the previous
sighting"), bounding state to the digests active inside one TTL
window. A page re-crawled AFTER its state expired is re-emitted —
exactly the semantics a freshness-bounded crawl wants, and the reason
TTL is opt-in rather than the default. (On a cluster, pair a TTL run
with the RocksDB state store —
``spark.sql.streaming.stateStore.providerClass`` — so even the
in-window state lives off-heap; nothing in this operator depends on
which store is configured.)

The per-group kernel streams its Arrow chunks: it takes the winner
from the first non-empty chunk and accumulates ``len()`` per chunk,
never concatenating the group into one pandas frame — a
boilerplate-hot digest with 10^6 copies in one micro-batch costs one
chunk of memory at a time, the same skew case the batch
``exact_dedup`` collapses map-side.

Batch twin / oracle: ``exact_dedup`` over the union of all batches
keeps the min-id row; the streaming version keeps the FIRST-ARRIVED
row instead (arrival order replaces id order — the streaming-natural
winner rule; with one batch and one partition per digest they agree).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# the SAME normalization as the batch twin — imported, not re-inlined,
# so the streaming digest can never drift from exact_dedup's
from docling_eval_spark.operators.dedup import _norm

DEDUP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("digest", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("first_id", T.StringType()),
        T.StructField("n_seen", T.LongType()),
    ]
)

_EMPTY_OUT = pd.DataFrame(columns=[f.name for f in DEDUP_OUT_SCHEMA.fields])


def _make_dedup_fn(state_ttl_ms: int | None):
    def _dedup_fn(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (digest,) = key
        if state.hasTimedOut:  # TTL expiry callback: forget the digest
            state.remove()
            yield _EMPTY_OUT
            return
        # Stream the chunks: winner = first row of the first non-empty
        # chunk, count accumulates per chunk — the group is never
        # materialized whole (hot-digest skew safety).
        have_winner = False
        winner_id: str | None = None
        winner_text: str | None = None
        n = 0
        for chunk in batches:
            if not have_winner and len(chunk):
                first = chunk.iloc[0]
                rid = first["id"]
                # preserve a NULL id (the batch twin keeps all-null-id
                # groups with NULL id; never fabricate the str 'None')
                winner_id = None if pd.isna(rid) else str(rid)
                winner_text = first["text"]
                have_winner = True
            n += len(chunk)
        if state.exists:
            first_id, seen = state.get
            state.update((first_id, seen + n))
            if state_ttl_ms is not None:
                state.setTimeoutDuration(state_ttl_ms)
            yield _EMPTY_OUT
            return
        # first time this digest is seen: emit the first-arrived row,
        # remember it (forever, or for one TTL window past the last
        # sighting when state_ttl_ms is set)
        state.update((winner_id, n))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        yield pd.DataFrame(
            {"digest": [digest], "id": [winner_id], "text": [winner_text]}
        )

    return _dedup_fn


def dedup_stream(
    pages: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming DataFrame of (id, text, ...) → first-occurrence rows
    (digest, id, text); later copies of the same normalized text are
    suppressed, including ACROSS micro-batches.

    ``state_ttl_ms=None`` (default): exact dedup, state never expires
    (bounded inputs / availableNow replays). ``state_ttl_ms=N``:
    sliding-window dedup for continuous crawls — a digest unseen for
    N ms of processing time is forgotten and its next sighting is
    re-emitted; state size is bounded by the digests active in one
    window (see module docstring for the full contract).

    Trigger caveat: the TTL mode wants a processing-time trigger (its
    natural continuous-crawl deployment). Under ``availableNow`` the
    engine keeps scheduling micro-batches while any processing-time
    timeout is pending, so a replay run does not terminate promptly —
    use the default (NoTimeout) mode for bounded replays."""
    keyed = pages.select(
        F.md5(_norm(text_col)).alias("digest"),
        F.col(id_col).cast("string").alias("id"),
        F.col(text_col).alias("text"),
    ).groupBy("digest")
    timeout = (
        GroupStateTimeout.NoTimeout
        if state_ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return keyed.applyInPandasWithState(
        _make_dedup_fn(state_ttl_ms),
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
