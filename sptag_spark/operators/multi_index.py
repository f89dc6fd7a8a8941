"""MultiIndexScan — weighted multi-vector rank aggregation.

Reference: `src/Core/MultiIndexScan.cpp:87-178` pulls candidates round-robin
from per-index iterators, scores each entity with Σ wᵢ·distᵢ
(WeightedRankFunc, `MultiIndexScan.cpp:41-48`), and keeps a global k-heap with
a seen-set. That iterator machinery is an approximation device; the closed
form is: per entity, compute the weighted sum of its per-column distances to
the query, then exact top-k. We compute it directly — same map-side-top-k
shape as operators/knn.py, so the shuffle carries only candidates.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sptag_spark.operators.knn import _as_matrix, _block_distances, _exact_pair_dists


@dataclass
class IndexSpec:
    """One member index: a vector column on the entity table, the matching
    query-vector column on the query table, a weight and a metric."""

    vec_col: str
    query_col: str
    weight: float = 1.0
    metric: str = "l2"


def multi_index_scan(
    vectors: DataFrame,
    queries: DataFrame,
    specs: list[IndexSpec],
    k: int = 10,
    rank_fn=None,
) -> DataFrame:
    """vectors: (id, <spec.vec_col>...); queries: (query_id, <spec.query_col>...).

    Returns (query_id, rank, id, score) ascending by (score, id) — the
    reference's min-heap order with VID tie-break.

    rank_fn is the analog of the reference's arbitrary rank function
    (`inc/Core/MultiIndexScan.h:28` takes `float (*)(std::vector<float>)`
    over the per-index distances; `Test/src/MultiIndexScanTest.cpp:104-123`
    exercises a custom one). Here it must be VECTORIZED: a callable
    mapping an (m, n_specs) float64 array of per-index distances to an
    (m,) score array, applied Arrow-batch-wide inside the kernel — a
    per-row Python float fn would be the row-at-a-time UDF anti-pattern.
    Each spec's weight is pre-applied before rank_fn sees the distances
    (the reference passes weighted members too); None = the default
    WeightedRankFunc, Σ wᵢ·distᵢ (`MultiIndexScan.cpp:41-48`).

    Non-monotone rank_fns note: candidate pre-selection runs the SAME
    rank_fn on the block distances, so per-partition top-k pruning stays
    exact for any fn (no monotonicity assumption — the partition's k best
    under rank_fn ARE kept).
    """
    qrows = queries.select("query_id", *[s.query_col for s in specs]).collect()
    if not qrows:
        return vectors.sparkSession.createDataFrame(
            [], "query_id long, rank long, id long, score double"
        )
    query_ids = np.array([r["query_id"] for r in qrows], dtype=np.int64)
    Qs = [
        np.array([list(r[s.query_col]) for r in qrows], dtype=np.float64)
        for s in specs
    ]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["id"].to_numpy(dtype=np.int64)
            Vs = [_as_matrix(pdf[s.vec_col]) for s in specs]
            if rank_fn is None:
                # default weighted sum accumulates into ONE
                # (n_rows, n_queries) buffer — only a custom fn pays for
                # the n_specs-times-larger stacked matrix
                S = np.zeros((len(ids), len(query_ids)))
                for s, V, Q in zip(specs, Vs, Qs):
                    S += s.weight * _block_distances(V, Q, s.metric)
            else:
                D = np.stack(
                    [
                        s.weight * _block_distances(V, Q, s.metric)
                        for s, V, Q in zip(specs, Vs, Qs)
                    ],
                    axis=-1,
                )  # (n_rows, n_queries, n_specs)
                S = rank_fn(D.reshape(-1, len(specs))).reshape(D.shape[:2])
            kk = min(k, len(ids))
            out = []
            for j in range(len(query_ids)):
                col = S[:, j]
                cand = (
                    np.argpartition(col, kk - 1)[:kk]
                    if kk < len(ids)
                    else np.arange(len(ids))
                )
                if rank_fn is None:
                    exact = np.zeros(len(cand))
                    for s, V, Q in zip(specs, Vs, Qs):
                        exact += s.weight * _exact_pair_dists(
                            V[cand], Q[j], s.metric
                        )
                else:
                    Dx = np.stack(
                        [
                            s.weight
                            * _exact_pair_dists(V[cand], Q[j], s.metric)
                            for s, V, Q in zip(specs, Vs, Qs)
                        ],
                        axis=-1,
                    )
                    exact = rank_fn(Dx)
                order = np.lexsort((ids[cand], exact))[:kk]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": np.full(kk, query_ids[j], dtype=np.int64),
                            "id": ids[cand[order]],
                            "score": exact[order],
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    cand = vectors.select("id", *[s.vec_col for s in specs]).mapInPandas(
        kernel, schema="query_id long, id long, score double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score"), F.col("id"))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "id", "score")
    )
