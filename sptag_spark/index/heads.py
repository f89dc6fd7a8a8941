"""Head selection — the SPANN centroid layer, Spark-first.

Reference: SPANN SelectHead (`src/Core/SPANN/SPANNIndex.cpp:579-705`) builds a
BKT over all vectors and walks it to pick ~`Ratio` (default 0.12-0.16) of the
vectors as "heads"; every other vector is assigned to nearby heads' posting
lists. The BKT walk is an approximation of "pick well-spread representative
vectors"; the Spark-native equivalent is k-means over a bounded sample
followed by snapping each centroid to its nearest actual vector (SPANN
heads are real vectors, which is what makes the head index searchable with
the same distance semantics).

At 100 TB: centroid training cost is bounded by the sample size by design
(SPANN likewise trains its head structure on sampled data —
`BKTree.h:16` Samples=1000 per split), so it runs as blocked-BLAS Lloyd
iterations on the driver; the full-data passes — the centroid snap (one
knn() top-1 kernel) and posting assignment — stay distributed. The
resulting heads table is small enough to broadcast: SPANN itself assumes
heads fit in RAM (`SPANN/Index.h:46-59`).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

DEFAULT_HEAD_RATIO = 0.12  # SPANN Ratio (docs/GettingStart.md buildconfig)


def lloyd_kmeans(
    X: np.ndarray, k: int, iters: int = 10, seed: int = 42
) -> np.ndarray:
    """Blocked-BLAS Lloyd on an in-memory sample. Returns (k, d) centers.

    Distances use ||x||²-2xᵀc+||c||² with row blocks sized so the block×k
    distance matrix stays ~200 MB regardless of k. 10 iterations — heads
    only need to cover the space, not converge; recall is governed by
    replicas + nprobe."""
    rng = np.random.default_rng(seed)
    k = min(k, len(X))
    centers = X[rng.choice(len(X), size=k, replace=False)].astype(np.float64)
    block = max(256, int(2.5e7 / max(k, 1)))
    for _ in range(iters):
        c2 = (centers**2).sum(1)
        sums = np.zeros_like(centers)
        counts = np.zeros(k, dtype=np.int64)
        for s in range(0, len(X), block):
            B = X[s : s + block]
            assign = (-2.0 * (B @ centers.T) + c2[None, :]).argmin(1)
            np.add.at(sums, assign, B)
            counts += np.bincount(assign, minlength=k)
        nonempty = counts > 0
        centers[nonempty] = sums[nonempty] / counts[nonempty, None]
    return centers


def hier_kmeans(
    X: np.ndarray, k: int, iters: int = 10, seed: int = 42,
    flat_max_k: int = 4096,
) -> np.ndarray:
    """Two-level Lloyd for large k — the Spark-side analog of the
    reference's own HIERARCHICAL head structure (SelectHead walks a BKT,
    not a flat k-means — `SPANNIndex.cpp:579-705`). Flat Lloyd is
    O(n·k·d·iters); at k ≈ 0.12·n that is quadratic in n and dominated the
    ×64 build (~15k centers over 128k rows). Training √k coarse centers,
    partitioning the sample, then training size-proportional sub-centers
    per coarse cell costs ~k1× less for the same coverage role (heads only
    need to cover the space — recall is governed by replicas + nprobe
    downstream; measured SPANN recall on the ×64 corpus is unchanged).
    Falls back to flat Lloyd for small k, so test-scale indexes are
    byte-identical to before."""
    if k <= flat_max_k or len(X) < 2 * k:
        return lloyd_kmeans(X, k, iters, seed)
    k1 = max(2, int(np.sqrt(k)))
    coarse = lloyd_kmeans(X, k1, iters, seed)
    c2 = (coarse**2).sum(1)
    block = max(256, int(2.5e7 / max(k1, 1)))
    assign = np.empty(len(X), dtype=np.int64)
    for s in range(0, len(X), block):
        B = X[s : s + block]
        assign[s : s + block] = (-2.0 * (B @ coarse.T) + c2[None, :]).argmin(1)
    counts = np.bincount(assign, minlength=k1)
    # largest-remainder allocation of k sub-centers proportional to cell
    # size; every non-empty cell gets ≥ 1
    quota = k * counts / max(counts.sum(), 1)
    k_c = np.floor(quota).astype(np.int64)
    k_c[counts > 0] = np.maximum(k_c[counts > 0], 1)
    k_c = np.minimum(k_c, counts)  # can't pick more centers than members
    rem = k - int(k_c.sum())
    if rem > 0:
        order = np.argsort(-(quota - np.floor(quota)))
        for c in order:
            if rem <= 0:
                break
            if counts[c] > k_c[c]:
                k_c[c] += 1
                rem -= 1
    elif rem < 0:
        # the ≥1-per-non-empty-cell bump can overshoot k when many tiny
        # coarse cells exist; shed the excess from the cells furthest above
        # their proportional quota (never below 1) so ≤ k centers come back
        # and select_heads' k = min(ratio·n, max_heads) contract holds
        while rem < 0:
            over = np.where(k_c > 1, k_c - quota, -np.inf)
            c = int(np.argmax(over))
            if not np.isfinite(over[c]):
                break
            k_c[c] -= 1
            rem += 1
    out = []
    for c in range(k1):
        if counts[c] == 0 or k_c[c] == 0:
            continue
        sub = X[assign == c]
        out.append(lloyd_kmeans(sub, int(k_c[c]), iters, seed + 1 + c))
    return np.vstack(out)


def select_heads_distributed(
    vectors: DataFrame,
    k: int,
    n: int,
    metric: str = "l2",
    seed: int = 42,
    iters: int = 10,
) -> DataFrame:
    """Two-level DISTRIBUTED Lloyd: level 1 is the partition boundary
    (Spark's random row split — each partition sees ≈ the global
    distribution), level 2 is a per-partition partial k-means on the
    executors training size-proportional local centers, each snapped to
    a real local row. The union of partial heads IS the head set — no
    driver-side merge of k centers, no sample ceiling: every corpus row
    participates in some partition's fit, matching the reference's
    SelectHeadInternal building its BKT over ALL vectors
    (`SPANNIndex.cpp:579-705`).

    Scale shape: per-task cost is O(rows_p · k_p · d · iters) with
    k_p = k·rows_p/n — at 1000 executors the N·k·d Lloyd bill divides by
    the partition count and runs in parallel; driver traffic is the k
    result rows only. Within a task, large k_p delegates to hier_kmeans
    (the two-level local fit), and a partition too small to define its
    quota falls back to uniform choice of its own rows — the same fixed
    point the flat path uses when k ≈ n."""
    import pandas as pd

    from sptag_spark.operators.knn import _as_matrix

    frac_k = k / max(n, 1)
    cosine = metric == "cosine"
    src = vectors.select("id", "vector")
    # parallelism guard (same as balanced.py / assign_replicas): a compact
    # parquet arrives as a handful of row-group splits, which would run
    # the per-partition fits on a quarter of the cores (measured: the
    # 8.4M dress rehearsal spent P1 on 8 of 32 threads). Spark's
    # round-robin repartition is deterministic (local sort, SPARK-23207),
    # so per-partition seeds stay stable. Real large tables already have
    # more splits than cores — this is a local-mode correction.
    sc = vectors.sparkSession.sparkContext
    if src.rdd.getNumPartitions() < sc.defaultParallelism:
        src = src.repartition(sc.defaultParallelism)

    def kernel(batches):
        ids_l, X_l = [], []
        for pdf in batches:
            if len(pdf):
                ids_l.append(pdf["id"].to_numpy(np.int64))
                X_l.append(_as_matrix(pdf["vector"]))
        if not ids_l:
            return
        ids = np.concatenate(ids_l)
        X = np.vstack(X_l)
        # deterministic per-partition seed: partitioning of a stable
        # source is stable, so min-id identifies the partition
        pseed = int(seed + (int(ids.min()) % 1_000_003))
        k_p = max(1, int(round(len(ids) * frac_k)))
        if cosine:
            norms = np.linalg.norm(X, axis=1, keepdims=True)
            Xw = X / np.where(norms == 0.0, 1.0, norms)
        else:
            Xw = X
        if 2 * k_p >= len(ids):
            pick = np.random.default_rng(pseed).choice(
                len(ids), size=min(k_p, len(ids)), replace=False
            )
            chosen = np.sort(pick)
        else:
            centers = hier_kmeans(Xw, k_p, iters=iters, seed=pseed)
            order = np.argsort(ids, kind="stable")
            ids_s, X_s = ids[order], Xw[order]
            x2 = (X_s**2).sum(1)
            nearest = np.empty(len(centers), dtype=np.int64)
            block = max(1, int(2.5e7 / max(len(X_s), 1)))
            for s in range(0, len(centers), block):
                D = -2.0 * (centers[s : s + block] @ X_s.T) + x2[None, :]
                nearest[s : s + block] = order[D.argmin(axis=1)]
            chosen = np.unique(nearest)
        yield pd.DataFrame(
            {
                "head_id": ids[chosen],
                "vector": [
                    np.asarray(X[i], dtype=np.float32) for i in chosen
                ],
            }
        )

    return (
        src.mapInPandas(kernel, "head_id long, vector array<float>")
        .dropDuplicates(["head_id"])
    )


def select_heads(
    vectors: DataFrame,
    ratio: float = DEFAULT_HEAD_RATIO,
    metric: str = "l2",
    seed: int = 42,
    max_heads: int = 1 << 20,
    sample_rows: int = 200_000,
    distributed: bool | None = None,
) -> DataFrame:
    """Pick ~ratio·N real vectors as heads. Returns (head_id, vector) where
    head_id is the chosen vector's id in the base table.

    KMeans over a bounded sample (training cost is O(sample·k·iters),
    independent of N), then snap each centroid to the nearest true vector.
    """
    n = vectors.count()
    k = max(1, min(int(n * ratio), max_heads))
    # past the sample ceiling a 200k sample cannot DEFINE k distinct
    # heads (the SPACEV regime: k up to 10⁸) — the old path degenerated
    # to uniform choice. Train on the WHOLE corpus instead via
    # per-partition partial Lloyd (distributed two-level fit); the
    # sampled driver fit remains for every scale the sample covers, so
    # existing builds are byte-identical.
    if distributed is None:
        distributed = 2 * k >= sample_rows and n > sample_rows
    if distributed and n > 2 * k:
        return select_heads_distributed(
            vectors, k, n, metric=metric, seed=seed
        )
    frac = min(1.0, sample_rows / max(n, 1))
    sample = vectors if frac >= 1.0 else vectors.sample(frac, seed=seed)
    rows = sample.select("id", "vector").collect()
    ids = np.array([r["id"] for r in rows], dtype=np.int64)
    X = np.array([list(r["vector"]) for r in rows], dtype=np.float64)
    # Honor the metric's geometry (ADVICE r6): Lloyd + the snap below are L2
    # arithmetic, so COSINE trains and snaps on unit-normalized rows — on
    # the unit sphere ||a-b||² = 2-2cosθ, so L2 ordering there IS cosine
    # ordering — while the returned heads stay the ORIGINAL vectors (real
    # rows, searchable under the index metric). "ip" keeps raw L2 geometry
    # for SELECTION: a max-inner-product snap would collapse many centroids
    # onto the few largest-norm rows (MIPS is not a metric); coverage is
    # geometric, and routing/scoring honor ip at query time. The reference's
    # own head build knows only L2/Cosine (DistCalcMethod,
    # `inc/Core/DefinitionList.h`) — ip is this engine's extension.
    if metric == "cosine":
        norms = np.linalg.norm(X, axis=1, keepdims=True)
        Xw = X / np.where(norms == 0.0, 1.0, norms)
    else:
        Xw = X
    if 2 * k >= len(rows):
        # k heads from a ≤2k-row sample: clustering is (near-)identity —
        # Lloyd with k ≈ n refines nothing and hier_kmeans' flat fallback
        # at len(X) < 2k would be O(n·k·d·iters) driver BLAS (measured:
        # a 2M-vector build wanted k = 204.8k from a 200k sample and spent
        # HOURS in that degenerate fit). Uniform choice of k sample rows
        # is exactly Lloyd's init, and with k ≈ n its fixed point.
        pick = np.random.default_rng(seed).choice(
            len(rows), size=min(k, len(rows)), replace=False
        )
        pick.sort()
        spark = vectors.sparkSession
        return spark.createDataFrame(
            [
                (int(ids[i]), [float(x) for x in X[i]])
                for i in pick
            ],
            "head_id long, vector array<float>",
        )
    centers = hier_kmeans(Xw, k, iters=10, seed=seed)
    # snap each centroid to the nearest SAMPLE vector (same argmin the
    # distributed kernel computes, minus the Spark jobs). Rows are
    # pre-sorted by id so argmin's first-occurrence IS the smallest id
    # among exact-distance ties (knn's (dist, id) ordering) — the
    # masked-id formulation this replaces allocated a (block, n) int64
    # temp per block and was memory-bandwidth-bound at large k·n.
    # When frac < 1 this snaps within the TRAINING sample rather than the
    # full table — the centroid was fit to sample points, so its nearest
    # sample row is the natural real-vector representative (the reference
    # likewise picks heads from the BKT's sampled structure,
    # SPANNIndex.cpp:579-705). The previous distributed alternative was a
    # k-query top-1 knn over the whole table — O(k·N) distance work, which
    # at k = 0.1·N is QUADRATIC in N and measured as a dominant slice of a
    # 512k-vector build (SCALING.md ×256 build autopsy). When the sample
    # IS the whole table (small inputs) this is byte-identical to the old
    # local path.
    order = np.argsort(ids, kind="stable")
    ids_s, X_s = ids[order], Xw[order]
    x2 = (X_s**2).sum(1)
    nearest = np.empty(len(centers), dtype=np.int64)
    block = max(1, int(2.5e7 / max(len(X_s), 1)))
    for s in range(0, len(centers), block):
        D = (
            -2.0 * (centers[s : s + block] @ X_s.T)
            + x2[None, :]
        )
        nearest[s : s + block] = ids_s[D.argmin(axis=1)]
    head_ids = np.unique(nearest)
    spark = vectors.sparkSession
    chosen = {int(h) for h in head_ids}
    picked = [
        (int(r["id"]), list(map(float, r["vector"])))
        for r in rows
        if int(r["id"]) in chosen
    ]
    return spark.createDataFrame(
        picked, "head_id long, vector array<float>"
    )
