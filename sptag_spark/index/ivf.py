"""IVF — the classic inverted-file ANN layout as a degenerate SPANN build.

IVF = SPANN with replica_count=1 (each vector in exactly its nearest
centroid's list), no RNG prune, no posting cut. Lower recall per probe than
the replicated SPANN layout, but 1× storage instead of ≤8×; the usual
trade-off for embedding-similarity search in data pipelines.

balanced=True partitions with the size-penalized k-means (index/balanced.py)
instead of nearest-head assignment: lists stay near their fair share, which
both lifts recall per probe (no mega-list swallows half the neighborhoods —
measured 0.73 → 0.85 @ nprobe=12 on the sf0.01 fixture) and bounds the
worst-case posting scan at 100 TB (a hot list is a straggler task).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sptag_spark.index.ann import ann_search
from sptag_spark.index.heads import select_heads
from sptag_spark.index.postings import assign_replicas


def _cluster_centroids(assigned_vectors: DataFrame, k: int, dim: int) -> list:
    """Per-cluster mean via partial (count, sum) per partition — k rows per
    partition reach the driver, never the vectors (balanced.py's stats-pass
    shape)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sums = np.zeros((k, dim))
        counts = np.zeros(k, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(pdf["vector"].tolist(), dtype=np.float64)
            c = pdf["cluster"].to_numpy(dtype=np.int64)
            np.add.at(sums, c, V)
            counts += np.bincount(c, minlength=k)
        yield pd.DataFrame(
            {"cluster": np.arange(k), "c": counts, "s": list(sums)}
        )

    partials = assigned_vectors.select("cluster", "vector").mapInPandas(
        kernel, schema="cluster int, c long, s array<double>"
    ).collect()
    sums = np.zeros((k, dim))
    counts = np.zeros(k, dtype=np.int64)
    for r in partials:
        sums[r["cluster"]] += np.asarray(r["s"])
        counts[r["cluster"]] += r["c"]
    out = []
    for c in range(k):
        if counts[c]:
            out.append((c, (sums[c] / counts[c]).tolist()))
    return out


def ivf_build(
    vectors: DataFrame,
    n_lists_ratio: float = 0.05,
    metric: str = "l2",
    seed: int = 42,
    balanced: bool = False,
    n_iter: int = 6,
) -> tuple[DataFrame, DataFrame]:
    """Returns (centroids, lists): centroids=(head_id, vector); lists =
    (head_id, id, vector, dist) with exactly one row per input vector."""
    if balanced:
        from sptag_spark.index.balanced import balanced_kmeans

        src = vectors.select("id", "vector")
        n = src.count()
        k = max(1, int(n * n_lists_ratio))
        assigned = balanced_kmeans(src, k=k, n_iter=n_iter, seed=seed)
        joined = assigned.join(src, "id").persist()
        dim = len(joined.first()["vector"])
        spark = vectors.sparkSession
        centroids = spark.createDataFrame(
            _cluster_centroids(joined, k, dim), "head_id long, vector array<float>"
        )
        # dist (to own centroid) is unused by the serve path, which rescores
        # candidates against the query — keep the postings schema w/o an
        # extra scan
        lists = joined.select(
            F.col("cluster").cast("long").alias("head_id"),
            "id", "vector", F.lit(0.0).alias("dist"),
        )
        return centroids, lists
    heads = select_heads(vectors, ratio=n_lists_ratio, metric=metric, seed=seed)
    lists = assign_replicas(
        vectors, heads, metric=metric, replica_count=1, candidate_num=1
    )
    return heads, lists


def ivf_search(
    queries: DataFrame,
    centroids: DataFrame,
    lists: DataFrame,
    k: int = 10,
    nprobe: int = 8,
    metric: str = "l2",
) -> DataFrame:
    return ann_search(
        queries, centroids, lists, k=k, nprobe=nprobe, metric=metric,
        max_dist_ratio=float("inf"),
    )
