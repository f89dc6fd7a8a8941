"""Head selection — the SPANN centroid layer, Spark-first.

Reference: SPANN SelectHead (`src/Core/SPANN/SPANNIndex.cpp:579-705`) builds a
BKT over all vectors and walks it to pick ~`Ratio` (default 0.12-0.16) of the
vectors as "heads"; every other vector is assigned to nearby heads' posting
lists. The BKT walk is an approximation of "pick well-spread representative
vectors"; the Spark-native equivalent is sampled MLlib KMeans (distributed,
scales to any N) followed by snapping each centroid to its nearest actual
vector (SPANN heads are real vectors, which is what makes the head index
searchable with the same distance semantics).

At 100 TB: KMeans trains on a sample (MLlib does the iteration distributed),
the snap step is one knn() call (map-side top-1 kernel over the full table),
and the resulting heads table is small enough to broadcast — SPANN itself
assumes heads fit in RAM (`SPANN/Index.h:46-59`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sptag_spark.operators.knn import knn

DEFAULT_HEAD_RATIO = 0.12  # SPANN Ratio (docs/GettingStart.md buildconfig)


def select_heads(
    vectors: DataFrame,
    ratio: float = DEFAULT_HEAD_RATIO,
    metric: str = "l2",
    seed: int = 42,
    max_heads: int = 1 << 20,
    sample_rows: int = 200_000,
) -> DataFrame:
    """Pick ~ratio·N real vectors as heads. Returns (head_id, vector) where
    head_id is the chosen vector's id in the base table.

    KMeans over a bounded sample (training cost is O(sample·k·iters),
    independent of N), then snap each centroid to the nearest true vector.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    n = vectors.count()
    k = max(1, min(int(n * ratio), max_heads))
    frac = min(1.0, sample_rows / max(n, 1))
    sample = vectors if frac >= 1.0 else vectors.sample(frac, seed=seed)
    feats = sample.select(
        array_to_vector(F.col("vector").cast("array<double>")).alias("features")
    )
    # 10 Lloyd iterations is plenty for head placement — heads only need to
    # cover the space, not converge; recall is governed by replicas + nprobe.
    model = KMeans(k=k, seed=seed, maxIter=10).fit(feats)
    centers = model.clusterCenters()
    spark = vectors.sparkSession
    centers_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        "query_id long, vector array<float>",
    )
    # snap: nearest true vector per centroid (top-1 knn, centroids as queries)
    snapped = knn(vectors, centers_df, k=1, metric=metric)
    head_ids = snapped.select(F.col("id").alias("head_id")).distinct()
    return head_ids.join(
        vectors.select(F.col("id").alias("head_id"), "vector"), "head_id"
    )
