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

    # Arrow transfer, not Py4J Row marshalling (see balanced_kmeans)
    pdf = assigned_vectors.select("cluster", "vector").mapInPandas(
        kernel, schema="cluster int, c long, s array<double>"
    ).toPandas()
    sums = np.zeros((k, dim))
    counts = np.zeros(k, dtype=np.int64)
    cl = pdf["cluster"].to_numpy()
    np.add.at(sums, cl, np.stack(pdf["s"].to_numpy()))
    np.add.at(counts, cl, pdf["c"].to_numpy())
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
    replicas: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Returns (centroids, lists): centroids=(head_id, vector); lists =
    (head_id, id, vector, dist) with `replicas` rows per input vector.

    replicas > 1 is classic IVF multi-assignment: each vector lands in its
    r nearest lists (rng_factor=inf turns assign_replicas' RNG prune into a
    pure top-r cut — no geometric pruning, unlike SPANN). A vector near a
    list boundary is then findable from either side, buying recall at the
    same nprobe for r× storage; the serve path's (query_id, id) min-agg
    dedup already collapses the duplicate candidates."""
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
        from sptag_spark.resources import attach_artifacts, release

        if replicas > 1:
            # re-assign against the refined balanced centroids: primary
            # assignment tracks the balanced partition, spill copies go to
            # the next-nearest lists. centroids were COLLECTED (driver
            # rows, no lineage), so neither joined nor the hier coarse
            # assignment is referenced any more — release them now
            lists = assign_replicas(
                src, centroids, metric=metric, replica_count=replicas,
                candidate_num=max(2 * replicas, 4), rng_factor=float("inf"),
            )
            release(assigned, include_self=False)
            joined.unpersist()
            return centroids, lists
        # dist (to own centroid) is unused by the serve path, which rescores
        # candidates against the query — keep the postings schema w/o an
        # extra scan. lists still reads through joined's cache, so hand the
        # pinned frames (joined + any hier coarse assignment) to the owner
        lists = joined.select(
            F.col("cluster").cast("long").alias("head_id"),
            "id", "vector", F.lit(0.0).alias("dist"),
        )
        attach_artifacts(
            lists, getattr(assigned, "_sptag_artifacts", []) + [joined]
        )
        return centroids, lists
    heads = select_heads(vectors, ratio=n_lists_ratio, metric=metric, seed=seed)
    lists = assign_replicas(
        vectors, heads, metric=metric, replica_count=replicas,
        candidate_num=max(2 * replicas, 4) if replicas > 1 else 1,
        rng_factor=float("inf") if replicas > 1 else 1.0,
    )
    return heads, lists


def ivf_search(
    queries: DataFrame,
    centroids: DataFrame,
    lists: DataFrame,
    k: int = 10,
    nprobe: int = 8,
    metric: str = "l2",
    q_rows: list | None = None,
) -> DataFrame:
    return ann_search(
        queries, centroids, lists, k=k, nprobe=nprobe, metric=metric,
        max_dist_ratio=float("inf"), q_rows=q_rows,
    )


def _centroid_matrix(centroids: DataFrame):
    """Driver-side (head_ids, C) from the (small by design) centroid table."""
    rows = centroids.select("head_id", "vector").collect()
    head_ids = np.array([r["head_id"] for r in rows], dtype=np.int64)
    C = np.array([list(r["vector"]) for r in rows], dtype=np.float64)
    return head_ids, C


def ivf_residuals(lists: DataFrame, centroids: DataFrame) -> DataFrame:
    """(head_id, id, vector): each list member replaced by its RESIDUAL
    v − centroid(head). A multi-assigned vector has a different residual per
    list. Map-only; the centroid matrix rides a broadcast."""
    bc = lists.sparkSession.sparkContext.broadcast(_centroid_matrix(centroids))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        head_ids, C = bc.value
        pos = {int(h): i for i, h in enumerate(head_ids)}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(pdf["vector"].tolist(), dtype=np.float64)
            h = np.array([pos[int(x)] for x in pdf["head_id"]], dtype=np.int64)
            R = (V - C[h]).astype(np.float32)
            yield pd.DataFrame(
                {
                    "head_id": pdf["head_id"].to_numpy(),
                    "id": pdf["id"].to_numpy(),
                    "vector": list(R),
                }
            )

    return lists.select("head_id", "id", "vector").mapInPandas(
        kernel, schema="head_id long, id long, vector array<float>"
    )


def ivf_pq_train(lists: DataFrame, centroids: DataFrame, m: int = 8, **kw):
    """Train PQ codebooks on RESIDUALS (IVFADC, Jégou et al. 2011 — the
    layout faiss made canonical): residual spread is the cluster radius, not
    the global spread, so the same 2^nbits codebook entries quantize far
    finer (measured recall@10 0.46 → 0.88 at sf0.1 vs raw-vector PQ at the
    same nprobe/M). Returns PQCodebooks."""
    from sptag_spark.index.pq import train_pq

    return train_pq(ivf_residuals(lists, centroids).select("id", "vector"), m=m, **kw)


def ivf_pq_encode(lists: DataFrame, centroids: DataFrame, books) -> DataFrame:
    """(head_id, id, codes): the IVF layout with residual PQ codes instead
    of float vectors. One map-only pass (centroids + codebooks in closure);
    the serve path never reads a float vector outside routing. Multi-assigned
    vectors are encoded per list (their residuals differ)."""
    from sptag_spark.index.pq import _encode_inmem

    cb, R = books.codebooks, books.rotation
    bc = lists.sparkSession.sparkContext.broadcast(_centroid_matrix(centroids))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        head_ids, C = bc.value
        pos = {int(h): i for i, h in enumerate(head_ids)}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(pdf["vector"].tolist(), dtype=np.float64)
            h = np.array([pos[int(x)] for x in pdf["head_id"]], dtype=np.int64)
            X = V - C[h]
            if R is not None:
                X = X @ R
            codes = _encode_inmem(X, cb).astype(np.int16)
            yield pd.DataFrame(
                {
                    "head_id": pdf["head_id"].to_numpy(),
                    "id": pdf["id"].to_numpy(),
                    "codes": list(codes),
                }
            )

    return lists.select("head_id", "id", "vector").mapInPandas(
        kernel, schema="head_id long, id long, codes array<smallint>"
    )


def ivf_pq_search(
    queries: DataFrame,
    centroids: DataFrame,
    coded_lists: DataFrame,
    books,
    k: int = 10,
    nprobe: int = 8,
    rerank: int = 0,
    vectors: DataFrame | None = None,
    q_rows: list | None = None,
) -> DataFrame:
    """IVF-PQ serve: coarse routing to nprobe lists + residual-ADC scan over
    PQ codes — the composition SPANN+quantizer serve together
    (`SPANN/Index.h:46-59` heads + `PQQuantizer.h:112-194` ADC).
    ‖q − (c + r̂)‖² = ‖(q−c) − r̂‖², so the LUT for a candidate in list c is
    built from the query's residual against THAT centroid: one M×256 table
    per (query, probed list), computed lazily inside the scan kernel.

    Plan: broadcast-route queries→lists (partition-prunable on head_id),
    then ONE mapInPandas over the selected code rows: each candidate costs
    an M-byte gather instead of a D-float scan — 32× less I/O than
    ivf_search at the same nprobe, which is what a 100 TB posting tier
    actually serves. Returns (query_id, rank, id, adc_dist).

    rerank > 0 adds the exact-refine stage (faiss IndexRefineFlat's role):
    keep the top `rerank` candidates per query by ADC distance, recompute
    EXACT distances for just those ids against `vectors`, and re-rank to k.
    The refine join ships only (query_id, id) pairs — nq·rerank rows,
    always broadcast — so the full-vector table is scanned once with a
    broadcast hash filter and never shuffled. Lifts recall from
    PQ-quantization-limited to routing-limited (measured 0.62 → 0.89 at
    sf0.1, nprobe=25%, m=16) for k·rerank exact distance computations per
    query. The returned adc_dist column is then the exact distance."""
    from sptag_spark.index.ann import route_queries

    cb, R = books.codebooks, books.rotation
    m, _, sub = cb.shape
    routes = route_queries(
        queries, centroids, nprobe, metric="l2",
        max_dist_ratio=float("inf"), q_rows=q_rows,
    )
    from sptag_spark.index.ann import ROUTE_STATIC_ISIN_MAX

    routed = getattr(routes, "_sptag_routed_heads", None)
    src = coded_lists
    from sptag_spark.index.ann import cached_count

    if (
        routed is not None
        and len(routed) <= ROUTE_STATIC_ISIN_MAX
        and len(routed) < cached_count(centroids)
    ):
        # static partition pruning on the code scan, size-gated like
        # ann_search — and skipped outright when the batch's routed set
        # covers EVERY list (r14: at serve nprobe=25% over 80 queries the
        # union hits all lists, so the IN-filter pruned nothing and only
        # added a literal-list predicate to every plan)
        src = src.filter(F.col("head_id").isin(routed))
    cand = src.join(
        F.broadcast(routes.select("query_id", "head_id")), "head_id"
    ).select("query_id", "head_id", "id", "codes")

    qrows = (
        q_rows
        if q_rows is not None
        else queries.select("query_id", "vector").collect()
    )
    qmap = {
        int(r["query_id"]): np.asarray(r["vector"], dtype=np.float64)
        for r in qrows
    }
    # centroid matrix broadcast: once per index object, not per call
    from sptag_spark.index.ann import head_matrix_bc

    bc = head_matrix_bc(centroids)

    # map-side cut: each batch keeps only its best `keep_n` ids per query
    # (after in-batch min-dedup of multi-assigned copies). Same superset
    # argument as ann_search's kernel — an id's global score is the min over
    # its per-list copies, so if keep_n in-batch ids beat it, their global
    # mins beat its global min too; the merge sees every possible winner.
    # The shuffle then carries |Q|·keep_n rows per batch instead of every
    # scored code row (nprobe·list_len per query).
    keep_n = max(rerank, k)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sptag_spark.functions.npgroup import group_slices

        head_ids, C = bc.value
        pos = {int(h): i for i, h in enumerate(head_ids)}
        cols = np.arange(m)[None, :]
        lut_cache: dict[tuple[int, int], np.ndarray] = {}

        def lut(qid: int, hid: int) -> np.ndarray:
            key = (qid, hid)
            t = lut_cache.get(key)
            if t is None:
                x = qmap[qid] - C[pos[hid]]
                if R is not None:
                    x = x @ R
                # all M sub-tables in one vectorized op (bit-identical to
                # the per-subspace loop: same pairwise diffs, same sum
                # order over the sub axis)
                t = ((x[: m * sub].reshape(m, 1, sub) - cb) ** 2).sum(-1)
                lut_cache[key] = t
            return t

        for pdf in batches:
            if len(pdf) == 0:
                continue
            Cc = np.array(pdf["codes"].tolist(), dtype=np.int64)
            qids = pdf["query_id"].to_numpy(dtype=np.int64)
            ids = pdf["id"].to_numpy(dtype=np.int64)
            hids = pdf["head_id"].to_numpy(dtype=np.int64)
            dist = np.empty(len(pdf))
            for idx in group_slices(qids * (1 << 32) + hids):
                dist[idx] = lut(int(qids[idx[0]]), int(hids[idx[0]]))[
                    cols, Cc[idx]
                ].sum(1)
            out_q, out_i, out_d = [], [], []
            for idx in group_slices(qids):
                qid = qids[idx[0]]
                bi, bd = ids[idx], dist[idx]
                order = np.lexsort((bd, bi))  # id asc, dist asc within id
                first = np.ones(len(bi), dtype=bool)
                first[1:] = bi[order][1:] != bi[order][:-1]
                uniq = order[first]  # min dist per in-batch id
                top = uniq[np.lexsort((bi[uniq], bd[uniq]))[:keep_n]]
                out_q.append(np.full(len(top), qid, dtype=np.int64))
                out_i.append(bi[top])
                out_d.append(bd[top])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "id": np.concatenate(out_i),
                    "adc_dist": np.concatenate(out_d),
                }
            )

    from sptag_spark.index.ann import topk_per_query

    scored = cand.mapInPandas(
        kernel, schema="query_id long, id long, adc_dist double"
    )
    # a multi-assigned vector scores per list (residuals differ);
    # topk_per_query keeps its best approximation — min is both dedup and
    # accuracy here — and ranks in the same single shuffle
    if rerank <= 0:
        return topk_per_query(scored, k, dist_col="adc_dist",
                              n_queries=len(qrows))
    if vectors is None:
        raise ValueError("rerank > 0 requires the full-vector table")
    shortlist = topk_per_query(
        scored, max(rerank, k), dist_col="adc_dist", with_rank=False,
        n_queries=len(qrows),
    ).select("query_id", "id")
    exact_cand = vectors.select("id", "vector").join(F.broadcast(shortlist), "id")

    # sorted query lookup for the refine kernel's row-paired gather
    _q_ids = np.array(sorted(qmap), dtype=np.int64)
    _Q_mat = np.stack([qmap[int(q)] for q in _q_ids]) if len(_q_ids) else None

    def exact_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # row-paired exact rescore (r14): one vectorized (V − Q_row)² per
        # batch instead of a Python loop per query group — elementwise
        # arithmetic identical to _exact_pair_dists, so values are bitwise
        # unchanged (same pair-local ops, same axis-1 sum)
        from sptag_spark.operators.knn import _exact_rowpair_dists

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(pdf["vector"].tolist(), dtype=np.float64)
            qids = pdf["query_id"].to_numpy(dtype=np.int64)
            dist = _exact_rowpair_dists(
                V, _Q_mat[np.searchsorted(_q_ids, qids)], "l2"
            )
            yield pd.DataFrame(
                {"query_id": qids, "id": pdf["id"].to_numpy(), "adc_dist": dist}
            )

    refined = exact_cand.mapInPandas(
        exact_kernel, schema="query_id long, id long, adc_dist double"
    )
    return topk_per_query(refined, k, dist_col="adc_dist",
                          n_queries=len(qrows))
