"""BKT — the hierarchical balanced-k-means tree (SPTAG's namesake structure).

Reference: `Common/BKTree.h:25-32,546-627` BuildTrees recursively splits the
index set with balanced k-means (`KmeansClustering`, balance factor
`DynamicFactorSelect`) until partitions reach `BKTLeafSize`, storing the tree
as a flat `vector<BKTNode{centerid, childStart, childEnd}>` whose centerids
are REAL vector indices. SPANN's SelectHead walks this tree with a
select/split threshold rule to pick ~Ratio·N heads
(`src/Core/SPANN/SPANNIndex.cpp:579-705`).

Spark-first shape (SURVEY §1.1): the tree itself is metadata, not data — the
reference trains every split on ≤ `Samples`(=1000) rows, so the whole
hierarchy is sample-bounded and builds on the driver from one bounded
sample, exactly like the flat head k-means (index/heads.py). The full-data
work is ONE map-only pass: each vector walks the broadcast tree and gets a
per-row `cluster_path ARRAY<INT>` (the node-id trail root→leaf) — the
DataFrame encoding of the reference's flat node array. Per-node subtree
sizes then come from a leaf-count aggregation (map-side combinable), and the
SelectHeadDynamically threshold/split walk runs on the driver over the small
(node → size) map, as in the reference.

At 100 TB this is the piece that keeps head selection viable at billions of
vectors: the hierarchy bounds every decision to one node's children (k ≤ 32
centers) instead of one flat argmin over ~10⁸ heads.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sptag_spark.index.heads import DEFAULT_HEAD_RATIO

BKT_KMEANS_K = 8  # m_iBKTKmeansK (reference default 32; 8 suits test scale)
BKT_LEAF_SIZE = 8  # m_iBKTLeafSize
BKT_SAMPLES = 1024  # Samples per split (reference: 1000)


@dataclass
class BktTree:
    """Flat node arrays, the reference's `vector<BKTNode>` in NumPy form.
    `center_ids[n]` is the REAL vector id the node's centroid snapped to
    (BKT centerids are actual vectors, which is what makes the selected
    heads searchable with the index's own distance)."""

    centers: np.ndarray  # (n_nodes, d) float64
    center_ids: np.ndarray  # (n_nodes,) int64
    child_start: np.ndarray  # (n_nodes,) int32 index into children; -1 = leaf
    child_end: np.ndarray  # (n_nodes,) int32
    children: np.ndarray  # flat int32 child node ids
    max_depth: int

    @property
    def n_nodes(self) -> int:
        return len(self.center_ids)

    def is_leaf(self, node: int) -> bool:
        return self.child_start[node] < 0

    def node_children(self, node: int) -> np.ndarray:
        if self.child_start[node] < 0:
            return np.empty(0, dtype=np.int32)
        return self.children[self.child_start[node] : self.child_end[node]]


def _balanced_split(
    X: np.ndarray, k: int, rng: np.random.Generator, iters: int = 6
) -> np.ndarray:
    """Size-penalized k-means on an in-memory block (the reference's
    KmeansClustering with its balance factor, `BKTree.h:219-330`): assignment
    is argmin(dist + lambda·running_count). Returns (n,) labels in [0, k)."""
    k = min(k, len(X))
    centers = X[rng.choice(len(X), size=k, replace=False)].astype(np.float64)
    d0 = (
        -2.0 * (X @ centers.T)
        + (centers**2).sum(1)[None, :]
        + (X**2).sum(1)[:, None]
    )
    lam = float(np.maximum(d0, 0).mean()) / max(len(X) / k, 1.0)
    labels = np.zeros(len(X), dtype=np.int64)
    for _ in range(iters):
        d = (
            -2.0 * (X @ centers.T)
            + (centers**2).sum(1)[None, :]
            + (X**2).sum(1)[:, None]
        )
        counts = np.zeros(k)
        for r in range(len(X)):
            a = int((d[r] + lam * counts).argmin())
            labels[r] = a
            counts[a] += 1.0
        for c in range(k):
            m = labels == c
            if m.any():
                centers[c] = X[m].mean(0)
    return labels


def build_bkt(
    vectors: DataFrame,
    kmeans_k: int = BKT_KMEANS_K,
    leaf_size: int = BKT_LEAF_SIZE,
    sample_rows: int = BKT_SAMPLES,
    seed: int = 42,
) -> BktTree:
    """Train the hierarchy on a bounded deterministic sample (every split in
    the reference likewise trains on ≤ Samples rows)."""
    rows = (
        vectors.select("id", "vector")
        .orderBy(F.xxhash64(F.col("id")))
        .limit(sample_rows)
        .collect()
    )
    ids = np.array([r["id"] for r in rows], dtype=np.int64)
    X = np.array([list(r["vector"]) for r in rows], dtype=np.float64)
    rng = np.random.default_rng(seed)

    centers: list[np.ndarray] = []
    center_ids: list[int] = []
    child_start: list[int] = []
    child_end: list[int] = []
    children: list[int] = []
    depth_of: list[int] = []

    def snap(idx: np.ndarray) -> int:
        """Nearest sample row to the group mean, smallest id on ties — the
        centerid convention (BKT nodes are real vectors)."""
        mu = X[idx].mean(0)
        d = ((X[idx] - mu) ** 2).sum(1)
        best = d.min()
        tied = idx[d <= best]
        return int(tied[np.argmin(ids[tied])])

    def build(idx: np.ndarray, depth: int) -> int:
        node = len(center_ids)
        r = snap(idx)
        centers.append(X[r])
        center_ids.append(int(ids[r]))
        child_start.append(-1)
        child_end.append(-1)
        depth_of.append(depth)
        if len(idx) <= leaf_size:
            return node
        labels = _balanced_split(X[idx], kmeans_k, rng)
        groups = [idx[labels == c] for c in range(labels.max() + 1)]
        groups = [g for g in groups if len(g)]
        if len(groups) <= 1:  # degenerate split (duplicate points): leaf
            return node
        kid_ids = [build(g, depth + 1) for g in groups]
        child_start[node] = len(children)
        children.extend(kid_ids)
        child_end[node] = len(children)
        return node

    build(np.arange(len(X)), 0)
    return BktTree(
        centers=np.array(centers),
        center_ids=np.array(center_ids, dtype=np.int64),
        child_start=np.array(child_start, dtype=np.int32),
        child_end=np.array(child_end, dtype=np.int32),
        children=np.array(children, dtype=np.int32),
        max_depth=max(depth_of) + 1,
    )


def _walk_paths(tree: BktTree, V: np.ndarray) -> list[list[int]]:
    """Level-synchronous descent: each row follows argmin-distance child.
    Returns per-row node-id paths (root inclusive)."""
    n = len(V)
    cur = np.zeros(n, dtype=np.int64)
    paths: list[list[int]] = [[0] for _ in range(n)]
    live = ~np.array([tree.is_leaf(0)] * n)
    while live.any():
        for node in np.unique(cur[live]):
            kids = tree.node_children(int(node))
            sel = np.nonzero(live & (cur == node))[0]
            C = tree.centers[kids]
            D = (
                -2.0 * (V[sel] @ C.T)
                + (C**2).sum(1)[None, :]
                + (V[sel] ** 2).sum(1)[:, None]
            )
            nxt = kids[D.argmin(1)]
            cur[sel] = nxt
            for i, nd in zip(sel, nxt):
                paths[i].append(int(nd))
        live = np.array([not tree.is_leaf(int(c)) for c in cur])
    return paths


def bkt_assign(vectors: DataFrame, tree: BktTree) -> DataFrame:
    """(id, cluster_path ARRAY<INT>, leaf INT) — one map-only pass, the
    sample-bounded tree rides in the closure (SURVEY §1.1's encoding)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(pdf["vector"].tolist(), dtype=np.float64)
            paths = _walk_paths(tree, V)
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(dtype=np.int64),
                    "cluster_path": paths,
                    "leaf": np.array([p[-1] for p in paths], dtype=np.int32),
                }
            )

    return vectors.select("id", "vector").mapInPandas(
        kernel, schema="id long, cluster_path array<int>, leaf int"
    )


def subtree_sizes(tree: BktTree, assigned: DataFrame) -> np.ndarray:
    """(n_nodes,) full-data subtree row counts: leaf counts aggregated in
    Spark (one map-side-combinable groupBy), propagated up on the driver.
    The reference sizes the walk in sample space; full-data counts make the
    threshold rule see the true distribution."""
    leaf_counts = {
        int(r["leaf"]): int(r["n"])
        for r in assigned.groupBy("leaf").agg(F.count("*").alias("n")).collect()
    }
    sizes = np.zeros(tree.n_nodes, dtype=np.int64)
    # children always have larger node ids than their parent (preorder build),
    # so one reverse sweep accumulates bottom-up
    for node in range(tree.n_nodes - 1, -1, -1):
        if tree.is_leaf(node):
            sizes[node] = leaf_counts.get(node, 0)
        else:
            sizes[node] = sizes[tree.node_children(node)].sum()
    return sizes


def _select_walk(
    tree: BktTree,
    sizes: np.ndarray,
    node: int,
    select_threshold: int,
    split_threshold: int,
    split_factor: int,
    selected: set[int],
) -> int:
    """Port of SelectHeadDynamicallyInternal (`SPANNIndex.cpp:580-627`):
    returns the not-yet-covered subtree size, or 0 once this node's center
    (plus, above the split threshold, its biggest children's centers) is
    selected to cover it."""
    child_sizes: list[tuple[int, int]] = []
    covered = 1
    for kid in tree.node_children(node):
        cs = _select_walk(
            tree, sizes, int(kid), select_threshold, split_threshold,
            split_factor, selected,
        )
        if cs > 0:
            child_sizes.append((int(kid), cs))
            covered += cs
    if covered >= select_threshold:
        selected.add(int(tree.center_ids[node]))
        if covered > split_threshold:
            child_sizes.sort(key=lambda p: -p[1])
            take = int(math.ceil(covered / split_factor) + 0.5)
            for kid, _ in child_sizes[:take]:
                selected.add(int(tree.center_ids[kid]))
        return 0
    return covered


def select_heads_bkt(
    vectors: DataFrame,
    ratio: float = DEFAULT_HEAD_RATIO,
    kmeans_k: int = BKT_KMEANS_K,
    leaf_size: int = BKT_LEAF_SIZE,
    select_threshold: int = 12,
    seed: int = 42,
) -> DataFrame:
    """SPANN SelectHeadDynamically: build the BKT, then binary-search the
    split threshold per candidate select threshold so the selected-head
    fraction lands nearest `ratio` (`SPANNIndex.cpp:629-705`). Returns
    (head_id, vector) — same contract as the flat select_heads."""
    tree = build_bkt(vectors, kmeans_k, leaf_size, seed=seed)
    assigned = bkt_assign(vectors, tree)
    sizes = subtree_sizes(tree, assigned)
    n = int(sizes[0])
    split_factor = max(2, int(round(1.0 / max(ratio, 1e-9)) + 0.5))

    def run(sel_t: int, split_t: int) -> set[int]:
        selected: set[int] = set()
        _select_walk(tree, sizes, 0, sel_t, split_t, split_factor, selected)
        return selected

    best: set[int] | None = None
    min_diff = float("inf")
    for sel_t in range(2, select_threshold + 1):
        lo, hi = split_factor, max(n, split_factor + 2)
        while lo < hi - 1:
            mid = (lo + hi) // 2
            picked = run(sel_t, mid)
            diff = len(picked) / max(n, 1) - ratio
            if abs(diff) < min_diff:
                min_diff = abs(diff)
                best = picked
            if diff > 0:
                lo = mid
            else:
                hi = mid
    if not best:
        best = {int(tree.center_ids[0])}
    ids_df = vectors.sparkSession.createDataFrame(
        [(int(h),) for h in sorted(best)], "head_id long"
    )
    return F.broadcast(ids_df).join(
        vectors.select(F.col("id").alias("head_id"), "vector"), "head_id"
    )


def bkt_stats(tree: BktTree, assigned: DataFrame) -> DataFrame:
    """Invariant summary for the driver oracle: every vector reaches a leaf
    through a valid root-anchored path of bounded depth."""
    return assigned.agg(
        F.count("*").alias("n_vectors"),
        F.bool_and(
            (F.element_at("cluster_path", 1) == 0)
            & (F.element_at("cluster_path", -1) == F.col("leaf"))
        ).alias("paths_anchored"),
        F.bool_and(
            (F.size("cluster_path") >= 1)
            & (F.size("cluster_path") <= tree.max_depth)
        ).alias("depth_bounded"),
        F.bool_and(
            (F.col("leaf") >= 0) & (F.col("leaf") < tree.n_nodes)
        ).alias("leaves_valid"),
    )
