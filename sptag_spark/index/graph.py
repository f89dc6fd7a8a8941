"""Relative-neighborhood-graph build — BKT/KDT's graph layer, Spark-first.

Reference (`NeighborhoodGraph.h:363-402`, SURVEY.md §3.4): the in-memory
indexes pair their space-partition tree with an RNG over all vectors. The
build initializes a kNN graph from TPTNumber=32 random trinary-projection
trees — all-pairs distances within ≤2000-row leaves
(`NeighborhoodGraph.h:301-360`) — then refines with the RNG prune rule
(`RelativeNeighborhoodGraph.h:18-35`): scanning candidates ascending by
distance, accept j iff for every accepted i,
rng_factor·d(i, j) ≥ d(node, j).

Spark translation: a TPT leaf is a co-partitioned block. We reuse the head
assignment (balanced clusters + replicas) as the blocking structure — each
vector lands in `replicas` blocks, all-pairs top-L runs INSIDE each block
(applyInPandas per block, BLAS), and a per-node merge + RNG prune produces
the final ≤L adjacency. Replication across blocks plays the role of the 32
independent TPT partitions: boundary neighbors are found because near
vectors co-occur in at least one block with high probability.

Scale shape: no all-pairs shuffle ever happens — the only wide ops are the
block co-partition (shuffle by block id), the per-node candidate merge
(shuffle by src), and one equi-join to attach candidate vectors for the
prune. The reference's own graph build is likewise the dominant index cost.

The graph is needed for *traversal parity* experiments, not result parity
(the exact engine answers top-k without it) — see SURVEY.md §1.1.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sptag_spark.index.heads import select_heads
from sptag_spark.index.postings import assign_replicas
from sptag_spark.operators.knn import _block_distances, _exact_pair_dists

NEIGHBORHOOD_SIZE = 32  # L (BKT/ParameterDefinitionList.h:23)
RNG_FACTOR = 1.0


def _block_topL(L: int, metric: str = "l2"):
    """All-pairs local top-L inside one block: (src, dst, dist)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"src": [], "dst": [], "dist": []}).astype(
                {"src": np.int64, "dst": np.int64, "dist": np.float64}
            )
        V = np.array(pdf["vector"].tolist(), dtype=np.float64)
        ids = pdf["id"].to_numpy(dtype=np.int64)
        D = _block_distances(V, V, metric)
        np.fill_diagonal(D, np.inf)
        kk = min(L, n - 1)
        out_src, out_dst, out_dist = [], [], []
        for r in range(n):
            cand = np.argpartition(D[r], kk - 1)[:kk]
            order = np.lexsort((ids[cand], D[r][cand]))
            cand = cand[order]
            out_src.append(np.full(kk, ids[r], dtype=np.int64))
            out_dst.append(ids[cand])
            # exact recompute for reported distances
            out_dist.append(_exact_pair_dists(V[cand], V[r], metric))
        return pd.DataFrame(
            {
                "src": np.concatenate(out_src),
                "dst": np.concatenate(out_dst),
                "dist": np.concatenate(out_dist),
            }
        )

    return fn


def _rng_prune_partition(L: int, rng_factor: float, metric: str = "l2"):
    """mapInPandas kernel over src-repartitioned, (src, dist, dst)-sorted
    candidate rows: prunes EVERY src group in the batch with NumPy slicing.
    (A groupBy(src).applyInPandas formulation schedules one pandas call per
    node — per-group overhead dwarfs the prune at millions of nodes.)"""

    def pair_dist(a: np.ndarray, b: np.ndarray) -> float:
        # metric-aware candidate-candidate distance for the RNG rule,
        # matching NeighborhoodGraph's metric-parameterized build
        if metric == "l2":
            d = a - b
            return float((d * d).sum())
        if metric == "cosine":
            na, nb = np.linalg.norm(a), np.linalg.norm(b)
            if na == 0.0 or nb == 0.0:
                return 1.0
            return max(0.0, 1.0 - float(a @ b) / (na * nb))
        return -float(a @ b)

    def prune_block(srcs, dsts, dists, C):
        out_idx: list[int] = []
        start, n = 0, len(srcs)
        while start < n:
            end = start
            while end < n and srcs[end] == srcs[start]:
                end += 1
            accepted: list[int] = []
            for j in range(start, end):
                ok = True
                for i in accepted:
                    if rng_factor * pair_dist(C[i], C[j]) < dists[j]:
                        ok = False
                        break
                if ok:
                    accepted.append(j)
                    if len(accepted) >= L:
                        break
            out_idx.extend(accepted)
            start = end
        return pd.DataFrame(
            {"src": srcs[out_idx], "dst": dsts[out_idx], "dist": dists[out_idx]}
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Arrow may split one src group across consecutive batches of the
        # same partition: hold back the trailing group until src changes.
        tail: pd.DataFrame | None = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if tail is not None:
                pdf = pd.concat([tail, pdf], ignore_index=True)
            srcs = pdf["src"].to_numpy(dtype=np.int64)
            cut = int(np.searchsorted(srcs, srcs[-1], side="left"))
            tail = pdf.iloc[cut:].reset_index(drop=True)
            head = pdf.iloc[:cut]
            if len(head):
                yield prune_block(
                    head["src"].to_numpy(dtype=np.int64),
                    head["dst"].to_numpy(dtype=np.int64),
                    head["dist"].to_numpy(),
                    np.array(head["dst_vector"].tolist(), dtype=np.float64),
                )
        if tail is not None and len(tail):
            yield prune_block(
                tail["src"].to_numpy(dtype=np.int64),
                tail["dst"].to_numpy(dtype=np.int64),
                tail["dist"].to_numpy(),
                np.array(tail["dst_vector"].tolist(), dtype=np.float64),
            )

    return fn


def build_rng_graph(
    vectors: DataFrame,
    L: int = NEIGHBORHOOD_SIZE,
    block_ratio: float = 0.05,
    replicas: int = 4,
    rng_factor: float = RNG_FACTOR,
    heads: DataFrame | None = None,
    metric: str = "l2",
) -> DataFrame:
    """Edge DataFrame (src, dst, dist) with ≤L RNG-pruned neighbors per node.

    heads (optional) lets callers reuse an existing centroid layer; otherwise
    a block-granularity head set is selected at `block_ratio`. `metric`
    parameterizes both the candidate search and the prune rule, like the
    reference's NeighborhoodGraph taking the index's DistCalcMethod.
    """
    if heads is None:
        heads = select_heads(vectors, ratio=block_ratio)
    blocks = assign_replicas(
        vectors, heads, replica_count=replicas, candidate_num=max(replicas * 4, 8)
    )
    local = (
        blocks.select("head_id", "id", "vector")
        .groupBy("head_id")
        .applyInPandas(
            _block_topL(L, metric), schema="src long, dst long, dist double"
        )
    )
    # merge replicas' views of each node, keep a bounded candidate list
    # (CEF-like: 2L before the prune), then attach candidate vectors
    merged = local.dropDuplicates(["src", "dst"])
    w = Window.partitionBy("src").orderBy(F.col("dist"), F.col("dst"))
    cand = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 2 * L)
        .drop("_rn")
    )
    cand = cand.join(
        vectors.select(
            F.col("id").alias("dst"), F.col("vector").alias("dst_vector")
        ),
        "dst",
    )
    # co-locate each node's candidates and order them for the sequential
    # prune; one kernel pass handles every group in its partition
    return (
        cand.repartition("src")
        .sortWithinPartitions("src", "dist", "dst")
        .mapInPandas(
            _rng_prune_partition(L, rng_factor, metric),
            schema="src long, dst long, dist double",
        )
    )


def graph_stats(edges: DataFrame) -> DataFrame:
    """Degree histogram: (degree, n_nodes) — the graph-quality summary the
    reference prints during builds."""
    deg = edges.groupBy("src").agg(F.count("*").alias("degree"))
    return deg.groupBy("degree").agg(F.count("*").alias("n_nodes"))


def _score_against_queries(cand: DataFrame, qmap: dict, metric: str) -> DataFrame:
    """(query_id, id, vector) → (query_id, id, dist): the same batched exact
    scorer shape as index/ann.py's posting scan."""

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(pdf["vector"].tolist(), dtype=np.float64)
            qids = pdf["query_id"].to_numpy(dtype=np.int64)
            dist = np.empty(len(pdf))
            for qid in np.unique(qids):
                idx = np.nonzero(qids == qid)[0]
                dist[idx] = _exact_pair_dists(V[idx], qmap[int(qid)], metric)
            yield pd.DataFrame(
                {"query_id": qids, "id": pdf["id"].to_numpy(), "dist": dist}
            )

    return cand.mapInPandas(score, schema="query_id long, id long, dist double")


def graph_search(
    vectors: DataFrame,
    edges: DataFrame,
    queries: DataFrame,
    k: int = 10,
    seeds: DataFrame | None = None,
    n_seeds: int = 8,
    max_hops: int = 6,
    beam: int = 16,
    metric: str = "l2",
) -> DataFrame:
    """Best-first traversal over the RNG edge table — the Spark translation
    of the reference's queue-driven graph walk (`BKTIndex.cpp:279-350`).

    The sequential NGQueue becomes synchronous beam expansion: per hop, the
    per-query frontier (the `beam` best unvisited nodes — the m_Results
    insert-bound) joins the edge table for neighbors, new nodes are scored
    with the batched exact kernel, and visited-set state accumulates as a
    DataFrame (the CheckAndSet bitset). MaxCheck ≈ n_seeds + hops × beam × L.
    Seeds come from `seeds` (query_id, id) or a tree-layer top-n_seeds via
    knn over a sampled entry set — SearchTrees seeding the queue.

    Scale note: hop-synchronous joins are the honest distributed form of a
    pointer-chasing walk, but SPANN's posting scan (index/ann.py) is the
    100 TB serve path — the reference itself abandons in-memory graph
    traversal at billion scale. This operator exists for BKT/KDT in-memory
    parity and graph-quality evaluation (a graph nothing searches is not
    evidence of anything).
    """
    from sptag_spark.operators.knn import knn

    q_rows = queries.select("query_id", "vector").collect()
    qmap = {
        int(r["query_id"]): np.asarray(r["vector"], dtype=np.float64)
        for r in q_rows
    }
    if seeds is None:
        entry = select_heads(vectors, ratio=0.05, metric=metric)
        seed_res = knn(
            entry.select(F.col("head_id").alias("id"), "vector"),
            queries, k=n_seeds, metric=metric,
        )
        seeds = seed_res.select("query_id", "id")

    vec_by_id = vectors.select("id", "vector")
    # localCheckpoint per hop: an iterative union/join loop otherwise grows
    # the logical plan without bound (StackOverflow in plan stringification
    # around hop 6) and re-plans the whole history every hop. The
    # checkpointed state is tiny — ≤ (seeds + hops·beam·L) rows per query.
    visited = _score_against_queries(
        seeds.join(vec_by_id, "id").select("query_id", "id", "vector"), qmap, metric
    ).localCheckpoint()
    frontier = visited
    w = Window.partitionBy("query_id").orderBy(F.col("dist"), F.col("id"))
    for _ in range(max_hops):
        # expand: frontier's beam-best nodes pull their adjacency lists
        beam_front = (
            frontier.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= beam)
            .drop("_rn")
        )
        neighbors = (
            beam_front.select("query_id", F.col("id").alias("src"))
            .join(edges.select("src", "dst"), "src")
            .select("query_id", F.col("dst").alias("id"))
            .dropDuplicates(["query_id", "id"])
            .join(visited.select("query_id", "id"), ["query_id", "id"], "left_anti")
        )
        scored = _score_against_queries(
            neighbors.join(vec_by_id, "id").select("query_id", "id", "vector"),
            qmap, metric,
        ).localCheckpoint()
        if scored.limit(1).count() == 0:
            break
        frontier = scored
        # plain union of checkpointed hop outputs: every leaf is already
        # materialized, so the plan stays shallow (≤ max_hops branches)
        # without paying a second materialization per hop
        visited = visited.unionByName(scored)
    return (
        visited.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "id", "dist")
    )
