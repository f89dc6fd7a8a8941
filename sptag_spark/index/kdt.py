"""KDT — the kd-tree space partition as a tabular structure + leaf routing.

Reference: `Common/KDTree.h:22-28` — nodes `{left, right, split_dim,
split_value}`; the split dimension is drawn from the top-5 variance
dimensions of the node's rows and the split value is the mean
(`KDTree.h:363-366` per SURVEY.md §1.1). SPTAG uses the KDT exactly like
the BKT: a partition tree whose leaves seed the graph search.

Spark shape (mirrors heads.py's contract): the tree is trained driver-side
on a bounded sample — the same sample-bounded training SPTAG applies — and
serialized as a flat table `(node_id, split_dim, split_value, left, right)`
with negative child ids encoding leaves (~the reference's flat
`vector<KDTNode>`). Routing the FULL table to leaves is one vectorized
mapInPandas pass (a level-by-level NumPy walk — no per-row recursion), so a
leaf id can serve as a partition key the same way `head_id` does: co-locate,
prune, all-pairs within leaves.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOP_VARIANCE_DIMS = 5  # KDTree.h:363-366


@dataclass
class KdtTree:
    """Flat node arrays; node 0 is the root. For node i: children ids in
    left/right; a NEGATIVE child value -(leaf_id+1) terminates in a leaf."""

    split_dim: np.ndarray  # (n_nodes,) int32
    split_value: np.ndarray  # (n_nodes,) float64
    left: np.ndarray  # (n_nodes,) int32
    right: np.ndarray  # (n_nodes,) int32
    n_leaves: int

    def to_df(self, spark) -> DataFrame:
        rows = [
            (i, int(self.split_dim[i]), float(self.split_value[i]),
             int(self.left[i]), int(self.right[i]))
            for i in range(len(self.split_dim))
        ]
        return spark.createDataFrame(
            rows,
            "node_id int, split_dim int, split_value double, left int, right int",
        )


def build_kdt(
    vectors: DataFrame,
    leaf_size: int = 64,
    sample_rows: int = 200_000,
    seed: int = 42,
) -> KdtTree:
    """Train the split structure on a bounded sample (median-free mean
    splits on a top-variance dimension, like the reference)."""
    n = vectors.count()
    frac = min(1.0, sample_rows / max(n, 1))
    sample = vectors if frac >= 1.0 else vectors.sample(frac, seed=seed)
    X = np.array(
        [list(r["vector"]) for r in sample.select("vector").collect()],
        dtype=np.float64,
    )
    rng = np.random.default_rng(seed)
    split_dim: list[int] = []
    split_value: list[float] = []
    left: list[int] = []
    right: list[int] = []
    n_leaves = 0

    def new_leaf() -> int:
        nonlocal n_leaves
        n_leaves += 1
        return -n_leaves  # -(leaf_id+1)

    def build(rows: np.ndarray) -> int:
        nonlocal split_dim, split_value, left, right
        if len(rows) <= leaf_size:
            return new_leaf()
        var = X[rows].var(axis=0)
        top = np.argsort(var)[::-1][:TOP_VARIANCE_DIMS]
        d = int(rng.choice(top))
        v = float(X[rows, d].mean())
        mask = X[rows, d] <= v
        # degenerate split (constant dim): force a leaf
        if mask.all() or (~mask).all():
            return new_leaf()
        node = len(split_dim)
        split_dim.append(d)
        split_value.append(v)
        left.append(0)
        right.append(0)
        left[node] = build(rows[mask])
        right[node] = build(rows[~mask])
        return node

    root = build(np.arange(len(X)))
    if root < 0:  # tiny input: single leaf — encode a pass-through node
        split_dim, split_value, left, right = [0], [np.inf], [root], [root]
    return KdtTree(
        split_dim=np.array(split_dim, dtype=np.int32),
        split_value=np.array(split_value, dtype=np.float64),
        left=np.array(left, dtype=np.int32),
        right=np.array(right, dtype=np.int32),
        n_leaves=max(n_leaves, 1),
    )


def _walk(tree: KdtTree, V: np.ndarray) -> np.ndarray:
    """Vectorized level-by-level descent: (n,) leaf ids."""
    node = np.zeros(len(V), dtype=np.int64)  # current node id (>=0) while live
    leaf = np.full(len(V), -1, dtype=np.int64)
    live = np.ones(len(V), dtype=bool)
    while live.any():
        idx = np.nonzero(live)[0]
        nd = node[idx]
        go_left = (
            V[idx, tree.split_dim[nd]] <= tree.split_value[nd]
        )
        nxt = np.where(go_left, tree.left[nd], tree.right[nd])
        done = nxt < 0
        leaf[idx[done]] = -nxt[done] - 1
        live[idx[done]] = False
        node[idx[~done]] = nxt[~done]
    return leaf


def kdt_assign(vectors: DataFrame, tree: KdtTree) -> DataFrame:
    """(id, leaf): route every vector to its leaf — one map-only pass, the
    tree rides in the closure (it is sample-bounded and tiny)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(pdf["vector"].tolist(), dtype=np.float64)
            yield pd.DataFrame(
                {"id": pdf["id"].to_numpy(dtype=np.int64), "leaf": _walk(tree, V)}
            )

    return vectors.select("id", "vector").mapInPandas(
        kernel, schema="id long, leaf long"
    )


def kdt_leaf_sizes(assigned: DataFrame) -> DataFrame:
    return assigned.groupBy("leaf").agg(F.count("*").alias("n"))
