"""SQ8 scalar quantization — the int8 vector-storage path, Spark-first.

The reference stores vectors natively as Int8/UInt8/Int16 value types
(`AnnService/inc/Core/DefinitionList.h:6-9`) and computes distances on them
in float (`DistanceUtils.h:26-43`); production deployments quantize float
embeddings to int8 upstream to cut storage/IO 4x (SPACEV1B itself ships as
100-dim int8, `datasets/SPACEV1B/README.md:9-14`). This module is that
upstream step plus the search that serves it: per-dimension affine
quantization (classic SQ8, the faiss ScalarQuantizer layout) of
`array<float>` columns into `array<smallint>` codes.

Spark shape mirrors index/pq.py: training statistics come from ONE map-only
partial pass (per-partition min/max, driver combine — the vectors never
move); encode and search are Arrow-batched NumPy kernels with the
(lo, scale) arrays riding a broadcast. The asymmetric search dequantizes
candidates in-kernel and scores against the float query — no precision lost
on the query side — then ranks through the same one-shuffle
`topk_per_query` tail as every other serve path. Composable with IVF/SPANN
routing exactly like PQ codes (the code column simply replaces the vector
column in a posting table).

At 100 TB: codes are 4x smaller than float32 on the wire AND in parquet
(dictionary/bit-packing applies to smallint arrays), so a brute code scan
reads a quarter of the bytes; the per-dim (lo, hi) pair is 2xD floats —
broadcastable forever.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from sptag_spark.index.ann import topk_per_query

LEVELS = 255  # codes occupy 0..255 inclusive


@dataclass
class SQParams:
    """Per-dimension affine range: decode(c) = lo + c * scale."""

    lo: np.ndarray  # (dim,)
    scale: np.ndarray  # (dim,); 0 where the dimension is constant

    @property
    def dim(self) -> int:
        return len(self.lo)


def train_sq(vectors: DataFrame) -> SQParams:
    """Per-dimension (min, max) over the corpus in one map-only pass.

    Each partition reduces to a single (lo, hi) row — 2xD floats reach the
    driver per partition, never a vector. The reference's analog is the
    value-type declaration at index creation (`CoreInterface.h:19`): the
    quantization range is an index-level constant, fixed at build."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lo = None
        hi = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(pdf["vector"].tolist(), dtype=np.float64)
            bl, bh = V.min(axis=0), V.max(axis=0)
            lo = bl if lo is None else np.minimum(lo, bl)
            hi = bh if hi is None else np.maximum(hi, bh)
        if lo is not None:
            yield pd.DataFrame({"lo": [lo.tolist()], "hi": [hi.tolist()]})

    parts = vectors.select("vector").mapInPandas(
        kernel, schema="lo array<double>, hi array<double>"
    ).collect()
    if not parts:
        raise ValueError("train_sq: empty vector table")
    lo = np.min([np.asarray(r["lo"]) for r in parts], axis=0)
    hi = np.max([np.asarray(r["hi"]) for r in parts], axis=0)
    return SQParams(lo=lo, scale=(hi - lo) / LEVELS)


def sq_encode(vectors: DataFrame, params: SQParams) -> DataFrame:
    """(id, codes array<smallint>): affine-quantized vectors, map-only.
    Values outside the trained range (possible for post-train adds) clamp
    to the boundary codes rather than wrapping."""
    sc = vectors.sparkSession.sparkContext
    bc = sc.broadcast((params.lo, params.scale))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lo, scale = bc.value
        inv = np.zeros_like(scale)
        nz = scale > 0
        inv[nz] = 1.0 / scale[nz]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(pdf["vector"].tolist(), dtype=np.float64)
            codes = np.clip(np.rint((V - lo) * inv), 0, LEVELS).astype(np.int16)
            yield pd.DataFrame(
                {"id": pdf["id"].to_numpy(), "codes": list(codes)}
            )

    return vectors.select("id", "vector").mapInPandas(
        kernel, schema="id long, codes array<smallint>"
    )


def sq_decode(codes: DataFrame, params: SQParams) -> DataFrame:
    """(id, vector): dequantized floats — GetSample over int8 storage.
    Reconstruction error is bounded by scale/2 per dimension."""
    sc = codes.sparkSession.sparkContext
    bc = sc.broadcast((params.lo, params.scale))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lo, scale = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.array(pdf["codes"].tolist(), dtype=np.float64)
            V = (lo + C * scale).astype(np.float32)
            yield pd.DataFrame({"id": pdf["id"].to_numpy(), "vector": list(V)})

    return codes.select("id", "codes").mapInPandas(
        kernel, schema="id long, vector array<float>"
    )


def sq_search(
    codes: DataFrame,
    queries: DataFrame,
    params: SQParams,
    k: int = 10,
    metric: str = "l2",
    rerank: int = 0,
    vectors: DataFrame | None = None,
    q_rows: list | None = None,
) -> DataFrame:
    """Asymmetric top-k over SQ8 codes: dequantize candidates in-kernel,
    score against the FLOAT query (no query-side quantization error), rank
    via the one-shuffle topk_per_query tail. Returns
    (query_id, rank, id, dist).

    rerank > 0 adds the exact-refine stage (same shape as
    ivf_pq_search's): top `rerank` by quantized distance, exact distances
    for just those ids against the float table, re-rank to k — restores
    the self-hit guarantee where the quantization grid could cost it."""
    from sptag_spark.operators.knn import _exact_pair_dists

    q_all = (
        q_rows
        if q_rows is not None
        else queries.select("query_id", "vector").collect()
    )
    qmap = {
        int(r["query_id"]): np.asarray(r["vector"], dtype=np.float64)
        for r in q_all
    }
    sc = codes.sparkSession.sparkContext
    bc = sc.broadcast((params.lo, params.scale))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lo, scale = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.array(pdf["codes"].tolist(), dtype=np.float64)
            V = lo + C * scale
            out = []
            for qid, q in qmap.items():
                d = _exact_pair_dists(V, q, metric)
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": np.full(len(d), qid, np.int64),
                            "id": pdf["id"].to_numpy(),
                            "dist": d,
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    # map-side partial top-k before anything shuffles: only n_partitions x
    # |Q| x n rows reach the rank stage (the exact kernel's discipline)
    n = max(rerank, k)

    def kernel_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in kernel(batches):
            g = pdf.sort_values(["query_id", "dist", "id"]).groupby(
                "query_id", sort=False
            )
            yield g.head(n).reset_index(drop=True)

    scored = codes.mapInPandas(
        kernel_topk, schema="query_id long, id long, dist double"
    )
    if rerank <= 0:
        return topk_per_query(scored, k, n_queries=len(q_all))
    if vectors is None:
        raise ValueError("rerank > 0 requires the full-vector table")
    from pyspark.sql import functions as F

    shortlist = topk_per_query(
        scored, n, with_rank=False, n_queries=len(q_all)
    ).select("query_id", "id")
    exact_cand = vectors.select("id", "vector").join(
        F.broadcast(shortlist), "id"
    )

    def exact_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sptag_spark.functions.npgroup import group_slices

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(pdf["vector"].tolist(), dtype=np.float64)
            qids = pdf["query_id"].to_numpy(dtype=np.int64)
            dist = np.empty(len(pdf))
            for idx in group_slices(qids):
                dist[idx] = _exact_pair_dists(
                    V[idx], qmap[int(qids[idx[0]])], metric
                )
            yield pd.DataFrame(
                {"query_id": qids, "id": pdf["id"].to_numpy(), "dist": dist}
            )

    refined = exact_cand.mapInPandas(
        exact_kernel, schema="query_id long, id long, dist double"
    )
    return topk_per_query(refined, k, n_queries=len(q_all))
