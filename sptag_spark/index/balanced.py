"""Balanced k-means — the size-regularized clustering BKT is named for.

Reference: `Common/BKTree.h:219-330,466-499` — assignment is
argmin_k( dist(v, center_k) + lambda · count_k ), where count_k is the
running size of cluster k; lambda is auto-tuned (`RefineLambda`,
`BKTree.h:333-463`) so cluster sizes stay balanced. MLlib's KMeans has no
balance constraint, so this is a custom iterative DataFrame loop — the
reference's thread-partial + merge k-means statistics (`BKTree.h:466-499`)
map exactly onto Spark partial aggregation.

Iteration shape (each pass = one mapInPandas + one groupBy):
1. broadcast (centers, counts) in the kernel closure;
2. per row: penalized argmin → cluster id (NumPy block);
3. groupBy(cluster): count + element-wise vector sum (F.aggregate over a
   zipped array column would also work; posexplode keeps it shuffle-light on
   wide dims) → new centers and counts on the driver (k×dim doubles — tiny).

This is also the BalancedDataPartition tool (`src/BalancedDataPartition/
main.cpp`) — the cluster assignment is the partition key for sharding.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from sptag_spark.operators.knn import _as_matrix


def _assign_kernel(centers: np.ndarray, lam: float):
    """Penalized assignment with counts accumulated greedily DURING the pass
    (per partition), like the reference's within-pass newCounts accumulation —
    penalizing with the previous iteration's final counts oscillates (the
    emptiest cluster swallows everything next pass)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = np.zeros(len(centers))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = _as_matrix(pdf["vector"])
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
            yield pd.DataFrame(
                {"id": pdf["id"].to_numpy(), "cluster": assign}
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
    n_parts = max(vectors.rdd.getNumPartitions(), 1)
    if lam is None:
        d = (
            -2.0 * (sample @ centers.T)
            + (centers**2).sum(1)[None, :]
            + (sample**2).sum(1)[:, None]
        )
        # fair share PER PARTITION (counts accumulate within a partition pass)
        lam = float(np.maximum(d, 0).mean()) / max(n / (k * n_parts), 1.0)
    assigned = None
    for _ in range(n_iter):
        assigned = vectors.select("id", "vector").mapInPandas(
            _assign_kernel(centers, lam), schema="id long, cluster int"
        )
        # new centers: element-wise mean per cluster — posexplode + groupBy
        # gives map-side partial sums (the reference's thread-partial merge,
        # BKTree.h:466-499); the collected aggregate is only k×dim rows.
        from pyspark.sql import functions as F

        joined = assigned.join(vectors.select("id", "vector"), "id")
        stats = (
            joined.select("cluster", F.posexplode("vector").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.sum("val").alias("s"), F.count("*").alias("c"))
            .collect()
        )
        for r in stats:
            centers[r["cluster"], r["pos"]] = r["s"] / r["c"]
    return assigned


def cluster_sizes(assigned: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    return assigned.groupBy("cluster").agg(F.count("*").alias("n"))
