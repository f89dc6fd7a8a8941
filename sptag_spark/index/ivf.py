"""IVF — the classic inverted-file ANN layout as a degenerate SPANN build.

IVF = SPANN with replica_count=1 (each vector in exactly its nearest
centroid's list), no RNG prune, no posting cut. Lower recall per probe than
the replicated SPANN layout, but 1× storage instead of ≤8×; the usual
trade-off for embedding-similarity search in data pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from sptag_spark.index.ann import ann_search
from sptag_spark.index.heads import select_heads
from sptag_spark.index.postings import assign_replicas


def ivf_build(
    vectors: DataFrame,
    n_lists_ratio: float = 0.05,
    metric: str = "l2",
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Returns (centroids, lists): centroids=(head_id, vector); lists =
    (head_id, id, vector, dist) with exactly one row per input vector."""
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
