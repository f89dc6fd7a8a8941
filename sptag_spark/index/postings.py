"""Posting-list construction — SPANN's SSD layer as a partitioned table.

Reference: ApproximateRNG (`src/Core/VectorIndex.cpp:847-884`, called from
`ExtraFullGraphSearcher.h:681`) searches the head index with every base
vector, keeps up to `ReplicaCount` (8) nearest heads per vector after the RNG
prune rule (`RelativeNeighborhoodGraph.h:18-35`: candidate head j, scanned in
ascending distance order, is accepted iff for every already-accepted head i,
rng_factor · d(head_i, head_j) ≥ d(v, head_j) — i.e. j is not "behind" an
accepted head), then cuts each posting to `PostingPageLimit` pages keeping the
nearest members (`ExtraFullGraphSearcher.h:747-760`).

Spark shape: one mapInPandas pass over the big table with the (small, by
SPANN's own design) heads matrix broadcast in the closure — BLAS block
distances, per-row candidate RNG prune (c×c, c=candidate_num) — then a window
rank per head for the posting cut. Written out with partitionBy(head_id),
Parquet partition pruning replaces SPANN's SSD seek: a query that routes to
h heads reads exactly h directories.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sptag_spark.operators.knn import _as_matrix, _block_distances

REPLICA_COUNT = 8  # SPANN ReplicaCount
CANDIDATE_NUM = 32  # heads considered per vector before RNG prune
RNG_FACTOR = 1.0  # RNGFactor (ParameterDefinitionList)
POSTING_LIMIT = 1000  # members kept per posting (PostingPageLimit analog)


def _rng_prune(
    cand_dists: np.ndarray, head_head: np.ndarray, replica: int, rng_factor: float
) -> list[int]:
    """Indices (into the candidate list) surviving the RNG rule, ≤ replica.
    cand_dists: ascending distances v→candidate-head; head_head[i, j]:
    distance between candidate heads i and j."""
    accepted: list[int] = []
    for j in range(len(cand_dists)):
        ok = True
        for i in accepted:
            if rng_factor * head_head[i, j] < cand_dists[j]:
                ok = False
                break
        if ok:
            accepted.append(j)
            if len(accepted) >= replica:
                break
    return accepted


def assign_replicas(
    vectors: DataFrame,
    heads: DataFrame,
    metric: str = "l2",
    replica_count: int = REPLICA_COUNT,
    candidate_num: int = CANDIDATE_NUM,
    rng_factor: float = RNG_FACTOR,
) -> DataFrame:
    """(head_id, id, vector, dist): every vector assigned to 1..replica_count
    heads. Head vectors ride along so postings are self-contained, like
    SPANN's posting records `(vid, vector)` (`ExtraFullGraphSearcher.h:60-110`).
    """
    hrows = heads.select("head_id", "vector").collect()
    head_ids = np.array([r["head_id"] for r in hrows], dtype=np.int64)
    H = np.array([list(r["vector"]) for r in hrows], dtype=np.float64)
    # Heads ride a BROADCAST variable, not the task closure: the head set is
    # ~0.1·N (tens of GB at billion scale — the same per-node footprint the
    # reference's in-memory head index has), and a closure re-ships it with
    # every task while a broadcast lands once per executor.
    # Head-head distances: precompute the full h×h block only while it is
    # small; past that it is O(h²) memory (impossible at ≥1M heads) and the
    # RNG prune only ever reads the c×c candidate block, which is cheap to
    # compute per row from H directly.
    HH = _block_distances(H, H, metric) if len(head_ids) <= 4096 else None
    bc = vectors.sparkSession.sparkContext.broadcast((head_ids, H, HH))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        head_ids, H, HH = bc.value
        # The assignment is fully VECTORIZED across rows — a per-row Python
        # loop (argpartition + lexsort + c×c gather per vector) measured 128k
        # interpreter iterations per ×64 build and dominated wall time. Rows
        # are processed in bounded sub-blocks so the (b, c, c) head-head and
        # (b, c, d) gather temporaries stay tens of MB per worker.
        SUB = 512
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = _as_matrix(pdf["vector"])
            ids = pdf["id"].to_numpy(dtype=np.int64)
            # object array of float32 numpy cells — gathered (not boxed into
            # Python lists) for the output column; Arrow serializes the
            # numeric arrays directly
            vec_arr = pdf["vector"].to_numpy()
            c = min(candidate_num, len(head_ids))
            for s in range(0, len(ids), SUB):
                Vb = V[s : s + SUB]
                D = _block_distances(Vb, H, metric)  # (b, h)
                b = len(Vb)
                if c < len(head_ids):
                    cand = np.argpartition(D, c - 1, axis=1)[:, :c]
                else:
                    cand = np.broadcast_to(
                        np.arange(len(head_ids)), (b, len(head_ids))
                    ).copy()
                d_c = np.take_along_axis(D, cand, 1)
                hid_c = head_ids[cand]
                # per-row (dist, head_id) ascending order — two STABLE
                # argsorts ≡ np.lexsort((head_ids, dist)) rowwise
                o1 = np.argsort(hid_c, axis=1, kind="stable")
                d1 = np.take_along_axis(d_c, o1, 1)
                c1 = np.take_along_axis(cand, o1, 1)
                o2 = np.argsort(d1, axis=1, kind="stable")
                d2 = np.take_along_axis(d1, o2, 1)
                c2 = np.take_along_axis(c1, o2, 1)
                h2 = head_ids[c2]
                # (b, c, c) candidate head-head distances
                if HH is not None:
                    hh = HH[c2[:, :, None], c2[:, None, :]]
                else:
                    G = H[c2]  # (b, c, d)
                    if metric == "l2":
                        sq = (G * G).sum(-1)
                        hh = (
                            sq[:, :, None]
                            + sq[:, None, :]
                            - 2.0 * np.einsum("bid,bjd->bij", G, G)
                        )
                        np.maximum(hh, 0.0, out=hh)
                    elif metric == "cosine":
                        Gn = G / np.maximum(
                            np.linalg.norm(G, axis=-1, keepdims=True), 1e-300
                        )
                        hh = 1.0 - np.einsum("bid,bjd->bij", Gn, Gn)
                        np.maximum(hh, 0.0, out=hh)
                    else:  # ip
                        hh = -np.einsum("bid,bjd->bij", G, G)
                # greedy RNG prune, vectorized over rows: candidate j (in
                # ascending (dist, id) order) is accepted iff no already-
                # accepted i has rng·d(head_i, head_j) < d(v, head_j) and
                # the replica budget is open — identical to the sequential
                # early-exit loop, iterated j=0..c-1 across all rows at once
                acc = np.zeros((b, c), dtype=bool)
                acc_cnt = np.zeros(b, dtype=np.int64)
                for j in range(c):
                    viol = acc & (
                        rng_factor * hh[:, :, j] < d2[:, j][:, None]
                    )
                    ok = ~viol.any(axis=1) & (acc_cnt < replica_count)
                    acc[:, j] = ok
                    acc_cnt += ok
                rows, cols = np.nonzero(acc)
                if len(rows) == 0:
                    continue
                yield pd.DataFrame(
                    {
                        "head_id": h2[rows, cols],
                        "id": ids[s + rows],
                        "vector": vec_arr[s + rows],
                        "dist": d2[rows, cols],
                    }
                )

    src = vectors.select("id", "vector")
    # The assignment kernel is CPU-bound (N×h BLAS block per row-batch), so
    # its parallelism is the INPUT partition count — and a compact parquet
    # (tens of MB per 100k vectors) arrives as one or two
    # maxPartitionBytes-sized splits, serializing the whole build on one
    # core (measured 85 s → 7 s on a 128k×15k-head build). A real 100 TB
    # table has orders of magnitude more splits than cores and skips this.
    par = src.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < par:
        src = src.repartition(par)
    return src.mapInPandas(
        kernel, schema="head_id long, id long, vector array<float>, dist double"
    )


def cut_postings(postings: DataFrame, limit: int = POSTING_LIMIT) -> DataFrame:
    """Posting truncation: keep the `limit` nearest members per head
    (`ExtraFullGraphSearcher.h:747-760`)."""
    w = Window.partitionBy("head_id").orderBy(F.col("dist"), F.col("id"))
    return (
        postings.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= limit)
        .drop("_rn")
    )


def build_postings(
    vectors: DataFrame,
    heads: DataFrame,
    metric: str = "l2",
    replica_count: int = REPLICA_COUNT,
    posting_limit: int = POSTING_LIMIT,
) -> DataFrame:
    return cut_postings(
        assign_replicas(vectors, heads, metric, replica_count), posting_limit
    )


def write_postings(postings: DataFrame, path: str) -> None:
    """Persist partitioned by head_id with zstd — the Parquet translation of
    SPANN's page-aligned, optionally-zstd posting files (`Options.h:82-88`).
    Partition pruning on head_id is the SSD seek."""
    (
        postings.write.mode("overwrite")
        .partitionBy("head_id")
        .option("compression", "zstd")
        .parquet(path)
    )


def posting_stats(postings: DataFrame) -> DataFrame:
    """Posting-size histogram (`ExtraFullGraphSearcher.h:628-760` prints the
    same): (head_id, n_members, avg_dist)."""
    return postings.groupBy("head_id").agg(
        F.count("*").alias("n_members"),
        F.round(F.avg("dist"), 4).alias("avg_dist"),
    )


def replica_stats(postings: DataFrame) -> DataFrame:
    """Replica-count distribution: how many heads each vector landed in."""
    per_vec = postings.groupBy("id").agg(F.count("*").alias("n_replicas"))
    return per_vec.groupBy("n_replicas").agg(F.count("*").alias("n_vectors"))
