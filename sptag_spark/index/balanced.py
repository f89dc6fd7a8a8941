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


def _assign_kernel(bc, lam: float, with_vector: bool = False):
    """bc: Broadcast of the centers matrix — at head-selection scale
    (k up to ~0.1·N) the centers are executor-memory-sized, and a closure
    would re-ship them per task where the broadcast lands once per node.
    with_vector=True passes the vector column through — the hierarchical
    path consumes (id, vector, cluster) directly so the cell stage never
    joins the assignment back to the vector table."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        centers = bc.value
        local = np.zeros(len(centers))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = _as_matrix(pdf["vector"])
            assign = _penalized_assign(V, centers, lam, local)
            out = {"id": pdf["id"].to_numpy(), "cluster": assign}
            if with_vector:
                out["vector"] = pdf["vector"]
            yield pd.DataFrame(out)

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
    flat_max_k: int = 2048,
    should_abort=None,
    _emit_vector: bool = False,
) -> DataFrame:
    """Returns (id, cluster INT). lam=None auto-scales the penalty to the
    data's distance magnitude (a simplified DynamicFactorSelect): lambda =
    avg_pairwise_dist_scale / (n/k), so a cluster at 2× its fair share pays
    roughly one average distance unit.

    Above flat_max_k the build goes HIERARCHICAL (balanced_kmeans_hier):
    the flat loop is O(n·k·d·iters) — the same quadratic-in-n wall the ×64
    head build hit (SCALING.md), and the reference's own BKT is a
    hierarchy of small-k balanced splits, never one flat large-k solve
    (`Common/BKTree.h:219-330` splits per node). Below the threshold the
    flat path is untouched, so test-scale clusterings are byte-identical.

    should_abort: optional zero-arg callable checked once per Lloyd pass
    (IAbortOperation parity — the reference checks inside BuildTrees'
    iteration loops, `Common/BKTree.h:347,384,490`); raises
    ExternalAbortError, no partial structure escapes."""
    if k > flat_max_k:
        return balanced_kmeans_hier(
            vectors, k, n_iter, lam, seed, should_abort, flat_max_k
        )
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
        # floor at a small positive value: a degenerate sample of identical
        # vectors gives mean distance 0 → lam 0 → the greedy argmin dumps
        # every row into cluster 0; with any positive lam the count penalty
        # round-robins ties across clusters instead (real corpora do carry
        # duplicate embeddings)
        lam = max(lam, 1e-12)
    from sptag_spark.errors import check_abort

    for _ in range(n_iter):
        check_abort(should_abort)
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
    schema = "id long, cluster int"
    if _emit_vector:
        schema = f"id long, cluster int, vector {dict(src.dtypes)['vector']}"
    return src.mapInPandas(
        _assign_kernel(sc.broadcast(centers), lam, with_vector=_emit_vector),
        schema=schema,
    )


def _local_balanced_lloyd(
    V: np.ndarray, kk: int, n_iter: int, seed: int
) -> np.ndarray:
    """In-memory penalized Lloyd over one coarse cell's rows — the same
    greedy size-penalized assignment as the distributed loop, run where
    the cell fits one task. Returns the final assignment (len(V),) in
    [0, kk)."""
    rng = np.random.default_rng(seed)
    kk = max(1, min(kk, len(V)))
    centers = V[rng.choice(len(V), size=kk, replace=False)].astype(np.float64)
    d = (
        -2.0 * (V @ centers.T)
        + (centers**2).sum(1)[None, :]
        + (V**2).sum(1)[:, None]
    )
    # floor: a cell of identical vectors has mean distance 0 → lam 0 →
    # every row lands in sub-center 0, breaking the hier path's "exactly k
    # non-empty clusters" contract; any positive lam makes the count
    # penalty round-robin the ties instead (tests pin counts.min() > 0)
    lam = max(float(np.maximum(d, 0).mean()) / max(len(V) / kk, 1.0), 1e-12)
    assign = np.zeros(len(V), dtype=np.int32)
    for _ in range(n_iter + 1):
        assign = _penalized_assign(V, centers, lam, np.zeros(kk))
        sums = np.zeros_like(centers)
        counts = np.zeros(kk, dtype=np.int64)
        np.add.at(sums, assign, V)
        counts += np.bincount(assign, minlength=kk)
        nonempty = counts > 0
        centers = centers.copy()
        centers[nonempty] = sums[nonempty] / counts[nonempty, None]
    return assign


def balanced_kmeans_hier(
    vectors: DataFrame,
    k: int,
    n_iter: int = 8,
    lam: float | None = None,
    seed: int = 42,
    should_abort=None,
    flat_max_k: int = 2048,
) -> DataFrame:
    """Two-level balanced k-means for large k — balance WITHIN coarse
    cells, mirroring index/heads.py hier_kmeans (and the reference's BKT,
    which is recursively-split small-k clusterings, `Common/BKTree.h`).

    Level 1: the flat distributed loop with k1 ≈ √k centers (cheap — the
    per-pass cost is n·k1·d). Because level 1 is itself BALANCED, cells
    arrive ≈ equal-sized, so the per-cell sub-cluster quota is honest.
    Level 2: ONE shuffle groups rows by coarse cell and each cell runs the
    in-memory penalized Lloyd for its quota of sub-centers inside its own
    task — k1 independent solves of size (n/k1 rows × k/k1 centers)
    instead of one n×k solve: per-row work drops from k to √k centers,
    and the solves parallelize across the cluster instead of iterating
    n_iter synchronized full-data passes. Cell size is n/k1 ≈ n/√k rows —
    bounded per-task memory that SHRINKS relative to n as k grows with it
    (head-selection's regime, k = ratio·n).

    Global ids are offset-encoded (cumsum of per-cell quotas), so exactly
    k non-empty clusters come back when every cell has ≥ its quota rows.
    """
    import math

    from pyspark.sql import functions as F

    # k1 is capped at flat_max_k so the coarse call ALWAYS takes the flat
    # path (which honors _emit_vector; a recursive hier coarse would drop
    # the vector column the cell stage needs). Above flat_max_k² total
    # clusters this yields wider cells (k/flat_max_k sub-centers each)
    # rather than a third level — still per-cell-bounded work.
    k1 = max(2, min(int(math.isqrt(k)), flat_max_k))
    # the coarse assignment CARRIES the vector column (_emit_vector) — the
    # cell stage groups (id, vector, cluster) directly, so the vector
    # table is never shuffle-joined back to its assignment; the one
    # vector-payload shuffle is the unavoidable groupBy(cell) itself
    coarse = balanced_kmeans(
        vectors, k1, n_iter, lam, seed, flat_max_k=flat_max_k,
        should_abort=should_abort, _emit_vector=True,
    ).persist()
    counts_rows = coarse.groupBy("cluster").count().collect()  # k1 rows
    counts = np.zeros(k1, dtype=np.int64)
    for r in counts_rows:
        counts[r["cluster"]] = r["count"]
    # largest-remainder allocation of k sub-clusters ∝ cell size (same
    # discipline as hier_kmeans), capped by cell population
    quota = k * counts / max(counts.sum(), 1)
    k_c = np.floor(quota).astype(np.int64)
    k_c[counts > 0] = np.maximum(k_c[counts > 0], 1)
    k_c = np.minimum(k_c, counts)
    rem = k - int(k_c.sum())
    order = np.argsort(-(quota - np.floor(quota)))
    while rem > 0:  # one sub-center at a time, capacity-capped
        progressed = False
        for c in order:
            if rem <= 0:
                break
            if counts[c] > k_c[c]:
                k_c[c] += 1
                rem -= 1
                progressed = True
        if not progressed:  # fewer rows than k in total
            break
    while rem < 0:  # the ≥1-per-cell bump overshot (many tiny cells)
        over = np.where(k_c > 1, k_c - quota, -np.inf)
        c = int(np.argmax(over))
        if not np.isfinite(over[c]):
            break
        k_c[c] -= 1
        rem += 1
    offsets = np.concatenate([[0], np.cumsum(k_c)]).astype(np.int64)
    spark = vectors.sparkSession
    bc_kc = spark.sparkContext.broadcast((k_c, offsets))

    def cell_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        kc, offs = bc_kc.value
        cell = int(pdf["cluster"].iloc[0])
        kk = int(kc[cell])
        if kk <= 0 or len(pdf) == 0:
            return pd.DataFrame({"id": [], "cluster": []}).astype(
                {"id": np.int64, "cluster": np.int32}
            )
        V = _as_matrix(pdf["vector"])
        sub = _local_balanced_lloyd(V, kk, n_iter, seed + 1 + cell)
        return pd.DataFrame(
            {
                "id": pdf["id"].to_numpy(dtype=np.int64),
                "cluster": (offs[cell] + sub).astype(np.int32),
            }
        )

    from sptag_spark.resources import attach_artifacts

    # the coarse assignment stays persisted for the returned plan's
    # lifetime; the owner calls resources.release(result) once the
    # assignment is consumed (tests/test_resources.py pins no leak)
    return attach_artifacts(
        coarse.groupBy("cluster").applyInPandas(
            cell_kernel, schema="id long, cluster int"
        ),
        [coarse],
    )


def cluster_sizes(assigned: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    return assigned.groupBy("cluster").agg(F.count("*").alias("n"))
