"""Semantic corpus clustering — embedding-space curation for training data.

The cluster-then-curate pattern (SemDeDup, Abbas et al. 2023; cluster-based
data selection generally): k-means over document embeddings partitions the
corpus into semantic buckets, which then drive per-bucket dedup thresholds,
sampling rates, or manual inspection via exemplar documents. The engine
side is exactly our balanced k-means (`index/balanced.py` — the same
size-penalized Lloyd loop SPANN heads use, `BKTree.h:245`), joined back to
the documents table.

Scale shape: the embedding table clusters with the map-only balanced-kmeans
loop (centroids broadcast, one stats-pass per iteration); per-cluster
summaries are one groupBy over (cluster, scalar) rows; exemplars are an
argmin-by-cluster over the same scored pass. The documents table joins in
only for the k exemplar previews — a broadcast of k ids, never a corpus
shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def semantic_clusters(
    embeddings: DataFrame,
    k: int = 16,
    n_iter: int = 4,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Cluster (id, vector) rows into k semantic buckets.

    Returns (assigned, scored):
      assigned = (id, cluster)
      scored   = (id, cluster, own_dist, best_other_dist) — each vector's
                 L2² to its own centroid and to the nearest OTHER centroid,
                 computed in one map-only pass with the centroid matrix on
                 a broadcast. own < best_other is the separation signal
                 curation decisions lean on (a vector violating it sits on
                 a cluster boundary)."""
    from sptag_spark.index.balanced import balanced_kmeans
    from sptag_spark.index.ivf import _cluster_centroids

    src = embeddings.select("id", "vector")
    assigned = balanced_kmeans(src, k=k, n_iter=n_iter, seed=seed)
    joined = assigned.join(src, "id")
    dim = len(src.first()["vector"])
    cents = _cluster_centroids(joined, k, dim)
    cluster_ids = np.array([c for c, _ in cents], dtype=np.int64)
    C = np.array([v for _, v in cents], dtype=np.float64)
    bc = src.sparkSession.sparkContext.broadcast((cluster_ids, C))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cids, cent = bc.value
        pos = {int(c): i for i, c in enumerate(cids)}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(pdf["vector"].tolist(), dtype=np.float64)
            # (n, k) squared distances via the BLAS identity
            d2 = (
                (V * V).sum(1)[:, None]
                - 2.0 * (V @ cent.T)
                + (cent * cent).sum(1)[None, :]
            )
            own_idx = np.array(
                [pos[int(c)] for c in pdf["cluster"]], dtype=np.int64
            )
            rows = np.arange(len(V))
            own = d2[rows, own_idx]
            d2[rows, own_idx] = np.inf
            other = d2.min(axis=1)
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(),
                    "cluster": pdf["cluster"].to_numpy(),
                    "own_dist": np.maximum(own, 0.0),
                    "best_other_dist": np.maximum(other, 0.0),
                }
            )

    scored = joined.select("id", "cluster", "vector").mapInPandas(
        kernel,
        schema="id long, cluster int, own_dist double, best_other_dist double",
    )
    # hier-path balanced_kmeans pins its coarse assignment and attaches the
    # handle to `assigned`; scored derives from it, so carry the handle —
    # the owner releases via resources.release once scored is materialized
    from sptag_spark.resources import carry_artifacts

    return assigned, carry_artifacts(scored, assigned)


def cluster_exemplars(scored: DataFrame, docs: DataFrame | None = None) -> DataFrame:
    """One exemplar per cluster: the member closest to its centroid
    ((own_dist, id) min — deterministic tie-break). With `docs`, attach the
    exemplar's text via a broadcast of the k winning ids."""
    from pyspark.sql import Window

    w = Window.partitionBy("cluster").orderBy("own_dist", "id")
    ex = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("cluster", F.col("id").alias("exemplar_id"), "own_dist")
    )
    if docs is not None:
        ex = ex.join(
            F.broadcast(docs.select(F.col("doc_id").alias("exemplar_id"), "text")),
            "exemplar_id",
            "left",
        )
    return ex


def cluster_summary(scored: DataFrame) -> DataFrame:
    """Per-cluster curation stats: size, mean distance to centroid
    (compactness), and the fraction of members closer to their own centroid
    than to any other (separation — 1.0 means a clean bucket)."""
    return scored.groupBy("cluster").agg(
        F.count("*").alias("n_docs"),
        F.avg("own_dist").alias("avg_own_dist"),
        F.avg(
            (F.col("own_dist") <= F.col("best_other_dist")).cast("double")
        ).alias("separation"),
    )
