"""KDT partition-tree tests: structure invariants + routing consistency."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sptag_spark.index.kdt import build_kdt, kdt_assign, kdt_leaf_sizes

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def kdt(spark):
    from sptag_spark.tables import vectors_table

    v = vectors_table(spark, SF).cache()
    tree = build_kdt(v, leaf_size=32)
    assigned = kdt_assign(v, tree).cache()
    yield v, tree, assigned
    assigned.unpersist()
    v.unpersist()


def test_every_vector_routed_once(kdt):
    v, tree, assigned = kdt
    assert assigned.count() == v.count()
    assert assigned.select("id").distinct().count() == v.count()
    n_used = assigned.select("leaf").distinct().count()
    assert 1 < n_used <= tree.n_leaves


def test_leaves_spatially_coherent(kdt):
    """Sibling rows in a leaf must be closer on average than random pairs —
    the whole point of a space-partition tree."""
    v, _tree, assigned = kdt
    rows = v.join(assigned, "id").collect()
    by_leaf = {}
    X = {}
    for r in rows:
        X[r["id"]] = np.array(r["vector"], dtype=np.float64)
        by_leaf.setdefault(r["leaf"], []).append(r["id"])
    rng = np.random.default_rng(0)
    ids = list(X)
    within, across = [], []
    for leaf, members in by_leaf.items():
        if len(members) < 2:
            continue
        a, b = rng.choice(members, 2, replace=False)
        within.append(((X[a] - X[b]) ** 2).sum())
        c, d = rng.choice(ids, 2, replace=False)
        across.append(((X[c] - X[d]) ** 2).sum())
    assert np.mean(within) < np.mean(across)


def test_routing_deterministic(kdt):
    v, tree, assigned = kdt
    again = kdt_assign(v, tree)
    diff = assigned.withColumnRenamed("leaf", "l1").join(
        again.withColumnRenamed("leaf", "l2"), "id"
    ).filter(F.col("l1") != F.col("l2"))
    assert diff.count() == 0


def test_leaf_sizes_bounded_on_training_data(spark):
    """On data where the tree trained on EVERY row (sample ⊇ table), leaf
    occupancy stays near leaf_size (splits can't overfill)."""
    from sptag_spark.tables import vectors_table

    v = vectors_table(spark, SF)
    tree = build_kdt(v, leaf_size=32)
    sizes = kdt_leaf_sizes(kdt_assign(v, tree))
    assert sizes.agg(F.max("n")).first()[0] <= 32 * 2
