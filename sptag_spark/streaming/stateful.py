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
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    StructField,
    StructType,
)

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


# -- cross-batch NEAR-dup candidates (stateful MinHash-LSH) ------------------

# parallel arrays: admitted docs in this LSH bucket and their full MinHash
# signatures
_ND_STATE = StructType(
    [
        StructField("ids", ArrayType(LongType())),
        StructField("sigs", ArrayType(ArrayType(LongType()))),
    ]
)


def _near_dup_bucket(threshold: float, max_bucket: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        ids: list[int]
        sigs: list[list[int]]
        ids, sigs = (
            (list(state.get[0]), [list(s) for s in state.get[1]])
            if state.exists
            else ([], [])
        )
        out_a, out_b, out_j = [], [], []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            for _, row in pdf.sort_values("doc_id").iterrows():
                # plain-int lists: GroupState round-trips through Pyrolite,
                # which cannot unpickle numpy scalars
                did = int(row["doc_id"])
                sig = [int(x) for x in row["sig"]]
                sv = np.asarray(sig)
                for sid, ssig in zip(ids, sigs):
                    if sid == did:
                        continue
                    est = float((np.asarray(ssig) == sv).mean())
                    if est >= threshold:
                        out_a.append(min(sid, did))
                        out_b.append(max(sid, did))
                        out_j.append(est)
                if len(ids) < max_bucket:
                    ids.append(did)
                    sigs.append(sig)
        state.update((ids, sigs))
        if out_a:
            yield pd.DataFrame(
                {"doc_a": out_a, "doc_b": out_b, "est_jaccard": out_j}
            )

    return fn


def streaming_near_dup_candidates(
    stream: DataFrame,
    threshold: float = 0.6,
    bands: int = 4,
    n_hashes: int = 16,
    max_bucket: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-batch NEAR-duplicate candidate pairs over a document stream —
    the streaming twin of operators/dedup.py minhash_near_dup_pairs.

    Each doc's MinHash signature is banded; state lives per (band, band-hash)
    LSH bucket and holds the signatures admitted to that bucket so far. A new
    arrival is compared against its bucket's residents: signature-agreement
    ≥ threshold emits a candidate pair (doc_a < doc_b, est_jaccard = matching
    signature fraction — the standard MinHash Jaccard estimate). The same
    pair can surface from several bands; downstream consumers dedupe with
    dropDuplicates([doc_a, doc_b]) (itself streaming-native).

    Scale: state per bucket is capped at max_bucket signatures (8·n_hashes
    bytes each); bucket keys are 64-bit hashes, so state shards evenly across
    executors. The est-jaccard compare is O(residents · n_hashes) per
    arrival — the LSH banding keeps residents small exactly the way the
    batch operator's band join does.
    """
    import pyspark.sql.functions as F

    from sptag_spark.functions.text import seeded_min_hash, token_shingles

    rows_per_band = n_hashes // bands
    shingles = token_shingles(F.col(text_col))
    sig = F.array(*[seeded_min_hash(shingles, s) for s in range(n_hashes)])
    sigd = stream.select(
        F.col(id_col).cast("long").alias("doc_id"), sig.alias("sig")
    ).filter(~F.exists("sig", lambda x: x.isNull()))
    banded = sigd.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.lit(b),
                            *[
                                F.col("sig")[i]
                                for i in range(
                                    b * rows_per_band, (b + 1) * rows_per_band
                                )
                            ],
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "sig", F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket"))
    return banded.groupBy("band", "bucket").applyInPandasWithState(
        _near_dup_bucket(threshold, max_bucket),
        outputStructType="doc_a long, doc_b long, est_jaccard double",
        stateStructType=_ND_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
