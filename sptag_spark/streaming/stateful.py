"""Custom stateful streaming operator: cross-batch exact dedup.

A 100 TB ingestion pipeline must not re-admit documents (or vectors) it has
already accepted — across micro-batches, not just within one. Spark's
dropDuplicates on a stream keeps unbounded state keyed by the dedup column;
this operator does the same thing through applyInPandasWithState so the
state shape is explicit and extensible (e.g. carrying first-seen timestamps
or replacing the seen-set with a bloom filter at scale).

Semantics: rows are grouped by their dedup key; the first row of a key ever
seen (ascending by `order_col` within the batch for determinism) is emitted,
every later arrival of the same key is dropped. This is the streaming twin
of operators/dedup.py dedup_exact_groups (keep group_min, drop the rest) and
of the reference's meta-mapping "a key maps to one vector" upsert discipline
(`src/Core/VectorIndex.cpp:246` — there newest wins because ids are
positional; in an append-only ingest feed first-wins is the useful policy).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import BooleanType, StructField, StructType

_STATE_SCHEMA = StructType([StructField("seen", BooleanType())])


def _first_wins(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        # key already admitted in an earlier batch — drop everything
        for _ in pdfs:
            pass
        return
    first: pd.DataFrame | None = None
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        cand = pdf.sort_values("_order").head(1)
        if first is None or cand["_order"].iloc[0] < first["_order"].iloc[0]:
            first = cand
    if first is not None:
        state.update((True,))
        yield first.drop(columns=["_order"])


def streaming_first_wins_dedup(
    stream: DataFrame,
    key_col: str,
    order_col: str,
) -> DataFrame:
    """First-wins cross-batch dedup on a streaming DataFrame.

    Emits each key's first-ever row (smallest order_col in its arrival
    batch); subsequent arrivals — same batch or any later one — are dropped.
    State per key is one boolean; at 100 TB key-space you would swap the
    per-key GroupState for a partitioned bloom-filter table, same plan
    shape."""
    import pyspark.sql.functions as F

    cols = [c for c in stream.columns]
    out_schema = StructType.fromJson(stream.schema.jsonValue())
    withorder = stream.withColumn("_order", F.col(order_col).cast("long"))
    return (
        withorder.groupBy(key_col)
        .applyInPandasWithState(
            _first_wins,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        .select(*cols)
    )
