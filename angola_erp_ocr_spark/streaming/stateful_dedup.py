"""Stateful streaming exact-dedup: a custom stateful operator via
``applyInPandasWithState`` (§2.10 extension; the training-data-pipeline
op the batch ``dedup.exact_duplicates`` can't express over an unbounded
stream).

Semantics: documents arrive continuously; the FIRST document carrying a
given text hash is emitted (within a micro-batch, the minimum id wins —
deterministic); every later duplicate — in the same batch or any future
batch — is suppressed. Keyed state is one boolean per text hash, bounded
by the number of distinct texts, checkpointed with the query, and restored
across restarts (a re-started stream keeps suppressing duplicates of
everything it has already emitted).

Scale notes: state is partitioned by the md5 key across executors — the
same one-shuffle geometry as the batch operator; state size is O(distinct
texts) × ~1 boolean + key. For corpora where that outgrows the state
store, swap the full-md5 key for a (prefix-bucket, md5) composite and add
a TTL (``GroupStateTimeout.ProcessingTimeTimeout``) — the hook is the
``timeout`` parameter below.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEDUP_OUT = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("text", T.StringType(), True),
    T.StructField("text_hash", T.StringType(), False),
])

_STATE = T.StructType([T.StructField("seen", T.BooleanType(), False)])


def _dedup_group(key: Tuple[str], pdfs: Iterator[pd.DataFrame],
                 state: Any) -> Iterator[pd.DataFrame]:
    """One text-hash group per micro-batch: emit the min-id doc iff the
    hash was never seen before; mark seen."""
    first: pd.DataFrame | None = None
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        cand = pdf.loc[[pdf["doc_id"].idxmin()]]
        if first is None or cand["doc_id"].iloc[0] < first["doc_id"].iloc[0]:
            first = cand
    if state.exists or first is None:
        return
    state.update((True,))
    yield first[["doc_id", "text", "text_hash"]]


def streaming_exact_dedup(stream: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text",
                          timeout: str = "NoTimeout") -> DataFrame:
    """stream(doc_id, text, ...) → first-seen rows only (see module doc)."""
    keyed = stream.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        F.md5(F.col(text_col)).alias("text_hash"),
    )
    return keyed.groupBy("text_hash").applyInPandasWithState(
        _dedup_group,
        outputStructType=DEDUP_OUT,
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=timeout,
    )
