"""Balanced k-means — the size-regularized clustering BKT is named for.

Reference: `Common/BKTree.h:219-330,466-499` — assignment is
argmin_k( dist(v, center_k) + lambda · count_k ), where count_k is the
running size of cluster k; lambda is auto-tuned (`RefineLambda`,
`BKTree.h:333-463`) so cluster sizes stay balanced. MLlib's KMeans has no
balance constraint, so this is a custom iterative DataFrame loop — the
reference's thread-partial + merge k-means statistics (`BKTree.h:466-499`)
map exactly onto Spark partial aggregation.

Iteration shape (each pass = ONE map-only job, no shuffle):
1. broadcast (centers, lambda) in the kernel closure;
2. per row: penalized argmin → cluster id (NumPy block), counts accumulated
   within the partition pass;
3. the kernel emits its PARTIAL per-cluster (count, vector-sum) — k rows per
   partition, the reference's thread-partial statistics
   (`BKTree.h:466-499`) — and the driver merges k×partitions rows into new
   centers. No join, no posexplode, no per-row shuffle; a final assign pass
   materializes (id, cluster).

This is also the BalancedDataPartition tool (`src/BalancedDataPartition/
main.cpp`) — the cluster assignment is the partition key for sharding.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from sptag_spark.operators.knn import _as_matrix


def _penalized_assign(
    V: np.ndarray, centers: np.ndarray, lam: float, local: np.ndarray
) -> np.ndarray:
    """Greedy within-pass penalized argmin — counts accumulate DURING the
    pass (per partition), like the reference's newCounts accumulation;
    penalizing with the previous iteration's final counts oscillates (the
    emptiest cluster swallows everything next pass)."""
    d = (
        -2.0 * (V @ centers.T)
        + (centers**2).sum(1)[None, :]
        + (V**2).sum(1)[:, None]
    )
    assign = np.empty(len(V), dtype=np.int32)
    for r in range(len(V)):
        a = int((d[r] + lam * local).argmin())
        assign[r] = a
        local[a] += 1.0
    return assign


def _assign_kernel(bc, lam: float):
    """bc: Broadcast of the centers matrix — at head-selection scale
    (k up to ~0.1·N) the centers are executor-memory-sized, and a closure
    would re-ship them per task where the broadcast lands once per node."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        centers = bc.value
        local = np.zeros(len(centers))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = _as_matrix(pdf["vector"])
            assign = _penalized_assign(V, centers, lam, local)
            yield pd.DataFrame(
                {"id": pdf["id"].to_numpy(), "cluster": assign}
            )

    return kernel


def _stats_kernel(bc, lam: float):
    """Map-only statistics pass: emits this partition's per-cluster partial
    (count, vector-sum) — k rows, not n. Centers via Broadcast (see
    _assign_kernel)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        centers = bc.value
        k = len(centers)
        local = np.zeros(k)
        sums = np.zeros_like(centers)
        counts = np.zeros(k, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = _as_matrix(pdf["vector"])
            assign = _penalized_assign(V, centers, lam, local)
            np.add.at(sums, assign, V)
            counts += np.bincount(assign, minlength=k)
        yield pd.DataFrame(
            {
                "cluster": np.arange(k, dtype=np.int32),
                "c": counts,
                "s": list(sums),
            }
        )

    return kernel


def balanced_kmeans(
    vectors: DataFrame,
    k: int,
    n_iter: int = 8,
    lam: float | None = None,
    seed: int = 42,
) -> DataFrame:
    """Returns (id, cluster INT). lam=None auto-scales the penalty to the
    data's distance magnitude (a simplified DynamicFactorSelect): lambda =
    avg_pairwise_dist_scale / (n/k), so a cluster at 2× its fair share pays
    roughly one average distance unit."""
    sample = np.array(
        [
            list(r["vector"])
            for r in vectors.select("vector").limit(1024).collect()
        ],
        dtype=np.float64,
    )
    n = vectors.count()
    rng = np.random.default_rng(seed)
    centers = sample[rng.choice(len(sample), size=min(k, len(sample)), replace=False)]
    if len(centers) < k:
        centers = np.vstack([centers] * (k // len(centers) + 1))[:k]
    dim = centers.shape[1]
    src = vectors.select("id", "vector")
    sc = vectors.sparkSession.sparkContext
    # build-time parallelism guard (assign_replicas has the same): the
    # stats/assign kernels' parallelism is the input split count, and a
    # compact parquet arrives as 1-2 row-group splits that would serialize
    # every Lloyd pass on two cores; one repartition amortizes over all
    # n_iter passes. Real large tables have more splits than cores.
    if src.rdd.getNumPartitions() < sc.defaultParallelism:
        src = src.repartition(sc.defaultParallelism)
    # partition count AFTER the guard — lam is calibrated to the per-
    # partition fair share, so it must see the partitioning the kernels
    # actually run with (reading it pre-repartition weakened the penalty
    # by the repartition factor)
    n_parts = max(src.rdd.getNumPartitions(), 1)
    if lam is None:
        d = (
            -2.0 * (sample @ centers.T)
            + (centers**2).sum(1)[None, :]
            + (sample**2).sum(1)[:, None]
        )
        # fair share PER PARTITION (counts accumulate within a partition pass)
        lam = float(np.maximum(d, 0).mean()) / max(n / (k * n_parts), 1.0)
    for _ in range(n_iter):
        bc = sc.broadcast(centers)
        # Arrow transfer (toPandas), NOT collect(): the partials are
        # k×partitions rows each carrying a d-double sum array; Py4J Row
        # marshalling of that payload was the dominant cost of the whole
        # loop at large k (measured ~100 MB/iteration at k=6400, 32
        # partitions, d=64 — most of a 165 s build)
        pdf = src.mapInPandas(
            _stats_kernel(bc, lam),
            schema="cluster int, c long, s array<double>",
        ).toPandas()
        bc.destroy()
        sums = np.zeros((k, dim))
        counts = np.zeros(k, dtype=np.int64)
        cl = pdf["cluster"].to_numpy()
        np.add.at(sums, cl, np.stack(pdf["s"].to_numpy()))
        np.add.at(counts, cl, pdf["c"].to_numpy())
        nonempty = counts > 0
        centers = centers.copy()
        centers[nonempty] = sums[nonempty] / counts[nonempty, None]
    # the final assignment pass's broadcast must OUTLIVE this function (the
    # returned plan is lazy) — no destroy; Spark GCs it with the context
    return src.mapInPandas(
        _assign_kernel(sc.broadcast(centers), lam),
        schema="id long, cluster int",
    )


def cluster_sizes(assigned: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    return assigned.groupBy("cluster").agg(F.count("*").alias("n"))
