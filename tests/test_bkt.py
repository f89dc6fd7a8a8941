"""BKT hierarchy: structure invariants, SelectHead coverage walk, and SPANN
recall parity when heads come from the tree walk instead of flat k-means
(reference: BKTree.h:546-627, SPANNIndex.cpp:579-705)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sptag_spark.index.ann import ann_search
from sptag_spark.index.bkt import (
    bkt_assign,
    bkt_stats,
    build_bkt,
    select_heads_bkt,
    subtree_sizes,
)
from sptag_spark.index.postings import build_postings
from sptag_spark.operators.knn import knn
from sptag_spark.operators.recall import recall_per_query, recall_summary
from sptag_spark.tables import queries_table, vectors_table


@pytest.fixture(scope="module")
def bkt_fixture(spark, sf_dir):
    vectors = vectors_table(spark, sf_dir).cache()
    tree = build_bkt(vectors, kmeans_k=4, leaf_size=8)
    assigned = bkt_assign(vectors, tree).cache()
    return vectors, tree, assigned

def test_bkt_is_hierarchical(bkt_fixture):
    _, tree, _ = bkt_fixture
    assert tree.max_depth >= 3  # 500 rows / leaf 8 at k=4 must recurse
    assert tree.n_nodes > 5
    # preorder: children ids greater than parent (subtree_sizes relies on it)
    for node in range(tree.n_nodes):
        kids = tree.node_children(node)
        assert (kids > node).all()


def test_bkt_paths_cover_all(bkt_fixture):
    vectors, tree, assigned = bkt_fixture
    row = bkt_stats(tree, assigned).first()
    assert row["n_vectors"] == vectors.count()
    assert row["paths_anchored"] and row["depth_bounded"] and row["leaves_valid"]


def test_bkt_subtree_sizes(bkt_fixture):
    vectors, tree, assigned = bkt_fixture
    sizes = subtree_sizes(tree, assigned)
    n = vectors.count()
    assert sizes[0] == n  # root covers everything
    for node in range(tree.n_nodes):
        kids = tree.node_children(node)
        if len(kids):
            assert sizes[node] == sizes[kids].sum()


def test_bkt_path_prefix_is_nearest_child_chain(bkt_fixture):
    """Spot-check the descent: each step of a path is a child of the
    previous node."""
    _, tree, assigned = bkt_fixture
    for r in assigned.limit(20).collect():
        path = r["cluster_path"]
        assert path[0] == 0
        for a, b in zip(path, path[1:]):
            assert b in tree.node_children(a)


def test_select_heads_bkt_hits_ratio(spark, sf_dir):
    vectors = vectors_table(spark, sf_dir).cache()
    heads = select_heads_bkt(vectors, ratio=0.12)
    n, h = vectors.count(), heads.count()
    assert 0.04 * n <= h <= 0.3 * n, (n, h)
    # heads are real vectors
    missing = heads.join(
        vectors.select(F.col("id").alias("head_id")), "head_id", "left_anti"
    ).count()
    assert missing == 0


def test_spann_recall_with_bkt_heads(spark, sf_dir):
    vectors = vectors_table(spark, sf_dir).cache()
    queries = queries_table(spark, sf_dir)
    heads = select_heads_bkt(vectors, ratio=0.12).cache()
    postings = build_postings(vectors, heads).cache()
    truth = knn(vectors, queries, k=10)
    approx = ann_search(queries, heads, postings, k=10, nprobe=10)
    summary = recall_summary(recall_per_query(approx, truth, 10)).first()
    assert summary["avg_recall"] >= 0.9, summary
