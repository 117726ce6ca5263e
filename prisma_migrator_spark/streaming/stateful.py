"""Custom stateful streaming operators (``applyInPandasWithState``).

Beyond the built-in windowed aggregations (:mod:`windows`), a
training-data ingest pipeline needs *custom* per-key state that the
declarative operators can't express — e.g. a running per-user profile
that survives across micro-batches, or in-stream duplicate
suppression keyed on a content fingerprint.

Scale shape: state lives in Spark's state store — per-key, hash-
partitioned on the grouping key across executors, checkpointed
incrementally; each micro-batch touches only the keys present in the
batch. The user function sees Arrow-batched pandas frames (never
row-at-a-time Python), and nothing is ever driver-side.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterable, Iterator

from pyspark.sql import DataFrame

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

#: Output / state schemas for :func:`running_user_totals`.
_TOTALS_OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
_TOTALS_STATE_SCHEMA = "n bigint, total double"


def _update_totals(
    key: tuple[Any, ...],
    pdfs: Iterable["pd.DataFrame"],
    state: Any,
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, total))
    yield pd.DataFrame(
        [{"user_id": key[0], "n_events": n, "total_value": total}]
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (n_events, total_value) maintained across
    micro-batches — the custom-stateful-operator shape. Emits the
    updated running totals for every user seen in each batch.

    Works on a streaming DataFrame (incremental, stateful) and is
    equivalent to ``groupBy(user_id).agg(count, sum)`` over the full
    history once the stream is drained — the property the test
    asserts.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=_TOTALS_OUTPUT_SCHEMA,
        stateStructType=_TOTALS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_DEDUP_OUTPUT_SCHEMA = (
    "fingerprint string, doc_id bigint, first_seen boolean"
)
_DEDUP_STATE_SCHEMA = "seen boolean"


def _update_seen(
    key: tuple[Any, ...],
    pdfs: Iterable["pd.DataFrame"],
    state: Any,
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    seen = state.exists
    out = []
    for pdf in pdfs:
        for doc_id in pdf["doc_id"]:
            out.append(
                {"fingerprint": key[0], "doc_id": int(doc_id), "first_seen": not seen}
            )
            seen = True
    state.update((True,))
    yield pd.DataFrame(out)


def streaming_dedup_first_seen(docs_with_fp: DataFrame) -> DataFrame:
    """In-stream exact dedup: the first document carrying each content
    fingerprint is flagged ``first_seen=True``; every later arrival
    (same batch or any future batch) is ``False``. Downstream filters
    on the flag — an incremental form of
    :func:`prisma_migrator_spark.llm.dedup.dedupe_exact`. Input needs
    a ``fingerprint`` column (see ``content_fingerprint``)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return docs_with_fp.groupBy("fingerprint").applyInPandasWithState(
        _update_seen,
        outputStructType=_DEDUP_OUTPUT_SCHEMA,
        stateStructType=_DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
