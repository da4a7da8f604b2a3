"""Streaming exact-dedup — the incremental-crawl twin of
``operators.dedup.exact_dedup`` (SURVEY §2.10 family).

A crawl never arrives at once: each micro-batch carries new pages, and
a page duplicated ACROSS batches must be dropped the second time it
appears. ``applyInPandasWithState`` keyed by the normalized-text
digest holds one tiny state row per distinct digest (first id +
running count); the first occurrence is emitted, every later copy
only bumps the count. State never times out — "seen" is forever, the
crawl-dedup semantics (state size = distinct documents, the same
cardinality the batch dedup's shuffle carries).

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


def _dedup_fn(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (digest,) = key
    rows = pd.concat(list(batches))
    if state.exists:
        first_id, n = state.get
        state.update((first_id, n + len(rows)))
        yield pd.DataFrame(columns=[f.name for f in DEDUP_OUT_SCHEMA.fields])
        return
    # first time this digest is seen: emit the first row of the batch
    # (micro-batch arrival order), remember it forever
    winner = rows.iloc[0]
    state.update((str(winner["id"]), len(rows)))
    yield pd.DataFrame(
        {"digest": [digest], "id": [winner["id"]], "text": [winner["text"]]}
    )


def dedup_stream(
    pages: DataFrame, id_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """Streaming DataFrame of (id, text, ...) → first-occurrence rows
    (digest, id, text); later copies of the same normalized text are
    suppressed, including ACROSS micro-batches."""
    keyed = pages.select(
        F.md5(_norm(text_col)).alias("digest"),
        F.col(id_col).cast("string").alias("id"),
        F.col(text_col).alias("text"),
    ).groupBy("digest")
    return keyed.applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
