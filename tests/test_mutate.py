"""Mutation semantics tests — replays the reference's Add/Delete/Refine test
sequences (Test/src/AlgoTest.cpp:203-224) against the exact-kNN oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sptag_spark.operators.knn import knn
from sptag_spark.operators.mutate import (
    add_batch,
    apply_tombstones,
    delete_by_meta,
    delete_by_vector,
    meta_mapping,
    need_refine,
    refine_index,
)

DIM = 8


@pytest.fixture(scope="module")
def idx(spark):
    return spark.createDataFrame(
        [(i, [float(i)] * DIM, str(i % 5)) for i in range(100)],
        "id long, vector array<float>, meta string",
    ).cache()


def test_tombstone_anti_join(spark, idx):
    tomb = spark.createDataFrame([(i,) for i in range(0, 100, 2)], "id long")
    live = apply_tombstones(idx, tomb)
    assert live.count() == 50
    assert live.filter(F.col("id") % 2 == 0).count() == 0
    # deleted ids never appear in search results
    q = spark.createDataFrame([(0, [4.0] * DIM)], "query_id long, vector array<float>")
    res = knn(live, q, k=5, metric="l2").collect()
    assert all(r["id"] % 2 == 1 for r in res)
    # nearest live to 4.0 are 3,5 (tie → smaller id first), then 1,7,...
    assert [r["id"] for r in sorted(res, key=lambda r: r["rank"])] == [3, 5, 1, 7, 9]


def test_delete_by_vector_exact_match(spark, idx):
    targets = spark.createDataFrame(
        [([7.0] * DIM,), ([42.0] * DIM,), ([1000.0] * DIM,)], "vector array<float>"
    )
    got = sorted(r["id"] for r in delete_by_vector(idx, targets).collect())
    assert got == [7, 42]  # 1000 matches nothing


def test_meta_mapping_latest_wins(idx):
    m = {r["meta"]: r["id"] for r in meta_mapping(idx).collect()}
    # meta is id%5 → latest id for key '3' is 98? 98%5=3 → yes
    assert m == {str(k): 95 + k for k in range(5)}


def test_delete_by_meta(spark, idx):
    keys = spark.createDataFrame([("2",)], "meta string")
    got = [r["id"] for r in delete_by_meta(idx, keys).collect()]
    assert got == [97]  # latest id with meta '2'


def test_add_batch_positional_ids(spark, idx):
    batch = spark.createDataFrame(
        [([500.0] * DIM, "new0"), ([501.0] * DIM, "new1")], "vector array<float>, meta string"
    )
    merged = add_batch(idx, batch)
    assert merged.count() == 102
    new = merged.filter(F.col("meta").startswith("new")).orderBy("id").collect()
    assert [r["id"] for r in new] == [100, 101]


def test_refine_compacts_and_remaps(spark, idx):
    tomb = spark.createDataFrame([(i,) for i in range(0, 100, 2)], "id long")
    assert need_refine(idx, tomb)  # 50% > 0.4
    small_tomb = spark.createDataFrame([(1,)], "id long")
    assert not need_refine(idx, small_tomb)
    refined = refine_index(idx, tomb)
    rows = refined.orderBy("id").collect()
    assert len(rows) == 50
    assert [r["id"] for r in rows] == list(range(50))
    assert [r["old_id"] for r in rows] == list(range(1, 100, 2))


def test_add_batch_dim_mismatch(spark, idx):
    import pytest
    from sptag_spark.operators.mutate import add_batch

    base = idx
    bad = spark.createDataFrame(
        [([1.0, 2.0],), ([1.0],)], "vector array<float>"
    ).withColumn("meta", F.lit("x"))
    with pytest.raises(ValueError, match="DimensionSizeMismatch"):
        add_batch(base, bad)


def test_global_row_number_by_matches_sorted_enumeration(spark):
    """Distributed dense numbering == row_number() OVER (ORDER BY id):
    random unique keys over several partitions, exact 0..n-1 in key order."""
    import random

    from sptag_spark.operators.rank import global_row_number_by

    rng = random.Random(11)
    ids = rng.sample(range(1_000_000), 4000)
    df = spark.createDataFrame(
        [(i,) for i in ids], "id long"
    ).repartition(16)
    got = {
        r["id"]: r["rn"]
        for r in global_row_number_by(df, "id", out_col="rn").collect()
    }
    assert got == {v: i for i, v in enumerate(sorted(ids))}


def test_global_row_number_by_handles_tiny_and_empty(spark):
    from sptag_spark.operators.rank import global_row_number_by

    empty = spark.createDataFrame([], "id long")
    assert global_row_number_by(empty, "id").count() == 0
    one = spark.createDataFrame([(42,)], "id long")
    assert global_row_number_by(one, "id", out_col="rn").first()["rn"] == 0


def test_global_row_number_arbitrary_is_dense_permutation(spark):
    from sptag_spark.operators.rank import global_row_number_arbitrary

    df = spark.createDataFrame(
        [(f"m{i}",) for i in range(2500)], "meta string"
    ).repartition(9)
    out = global_row_number_arbitrary(df, out_col="rn")
    vals = sorted(r["rn"] for r in out.collect())
    assert vals == list(range(2500))
    # stable across re-execution of the same frame (pin holds)
    again = sorted(r["rn"] for r in out.collect())
    assert again == vals
    empty = spark.createDataFrame([], "meta string")
    assert global_row_number_arbitrary(empty).count() == 0


def test_add_batch_ids_dense_after_max(spark, idx):
    new = spark.createDataFrame(
        [([float(j)] * DIM, f"new{j}") for j in range(40)],
        "vector array<float>, meta string",
    ).repartition(6)
    merged = add_batch(idx, new)
    got = sorted(r["id"] for r in merged.collect())
    assert got == list(range(140))
    new_metas = {
        r["meta"] for r in merged.filter(F.col("id") >= 100).collect()
    }
    assert new_metas == {f"new{j}" for j in range(40)}
