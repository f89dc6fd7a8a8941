"""MultiIndexScan (MultiIndexScanTest.cpp:104-123 analog) and recall/MRR
(TruthSet.h:167-243 semantics) tests."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from sptag_spark.operators.knn import knn
from sptag_spark.operators.multi_index import IndexSpec, multi_index_scan
from sptag_spark.operators.recall import recall_per_query, recall_summary

DIM = 6


@pytest.fixture(scope="module")
def multi_fixture(spark):
    rng = np.random.default_rng(11)
    rows = [
        (
            i,
            [float(x) for x in rng.normal(size=DIM)],
            [float(x) for x in rng.normal(size=DIM)],
        )
        for i in range(120)
    ]
    vectors = spark.createDataFrame(
        rows, "id long, vector_a array<float>, vector_b array<float>"
    )
    qrows = [
        (
            j,
            [float(x) for x in rng.normal(size=DIM)],
            [float(x) for x in rng.normal(size=DIM)],
        )
        for j in range(4)
    ]
    queries = spark.createDataFrame(
        qrows, "query_id long, q_a array<float>, q_b array<float>"
    )
    return vectors, queries, rows, qrows


def test_weighted_score_matches_numpy(multi_fixture):
    vectors, queries, rows, qrows = multi_fixture
    wa, wb = 0.3, 0.7
    res = multi_index_scan(
        vectors,
        queries,
        [IndexSpec("vector_a", "q_a", wa, "l2"), IndexSpec("vector_b", "q_b", wb, "l2")],
        k=5,
    ).collect()
    # Spark stores array<float> → round expectations through float32 too
    V_a = np.array([r[1] for r in rows], dtype=np.float32).astype(np.float64)
    V_b = np.array([r[2] for r in rows], dtype=np.float32).astype(np.float64)
    for qid, qa, qb in qrows:
        qa = np.array(qa, dtype=np.float32).astype(np.float64)
        qb = np.array(qb, dtype=np.float32).astype(np.float64)
        s = wa * ((V_a - qa) ** 2).sum(1) + wb * ((V_b - qb) ** 2).sum(1)
        expect = np.lexsort((np.arange(len(s)), s))[:5]
        got = sorted((r for r in res if r["query_id"] == qid), key=lambda r: r["rank"])
        assert [r["id"] for r in got] == list(expect)
        for r, ei in zip(got, expect):
            assert math.isclose(r["score"], s[ei], rel_tol=1e-9)


def test_recall_identity_is_one(spark, multi_fixture):
    vectors, queries, _, _ = multi_fixture
    v = vectors.select("id", F.col("vector_a").alias("vector"))
    q = queries.select("query_id", F.col("q_a").alias("vector"))
    truth = knn(v, q, 5, "l2")
    per_q = recall_per_query(truth, truth, 5)
    summary = recall_summary(per_q).first()
    assert summary["avg_recall"] == 1.0
    assert summary["mrr"] == 1.0
    assert summary["n_queries"] == 4


def test_recall_counts_and_mrr(spark):
    # hand-built: truth = {1,2,3}; results hit at ranks 2 and 3 only
    truth = spark.createDataFrame(
        [(0, 1, 1, 0.1), (0, 2, 2, 0.2), (0, 3, 3, 0.3)],
        "query_id long, rank long, id long, dist double",
    )
    results = spark.createDataFrame(
        [(0, 1, 9, 5.0), (0, 2, 2, 0.2), (0, 3, 3, 0.3)],
        "query_id long, rank long, id long, dist double",
    )
    row = recall_per_query(results, truth, 3).first()
    assert row["n_hits"] == 2
    assert math.isclose(row["recall"], 2 / 3)
    assert row["rr"] == 0.5  # first hit at rank 2


def test_distance_tie_credit(spark):
    # result id differs from truth id but distance ties within 1e-6 → credit
    truth = spark.createDataFrame(
        [(0, 1, 10, 0.5)], "query_id long, rank long, id long, dist double"
    )
    results = spark.createDataFrame(
        [(0, 1, 99, 0.5000001)], "query_id long, rank long, id long, dist double"
    )
    assert recall_per_query(results, truth, 1).first()["n_hits"] == 1
    assert recall_per_query(results, truth, 1, dist_tie_credit=False).first()["n_hits"] == 0


def test_custom_rank_fn_matches_numpy(multi_fixture):
    """Arbitrary-rank-fn parity (MultiIndexScan.h:28's float(*)(vector<float>);
    MultiIndexScanTest.cpp:104-123): a non-linear vectorized fn — max of the
    weighted per-index distances — must reproduce the brute-force ranking."""
    vectors, queries, rows, qrows = multi_fixture
    wa, wb = 0.3, 0.7
    res = multi_index_scan(
        vectors,
        queries,
        [IndexSpec("vector_a", "q_a", wa, "l2"), IndexSpec("vector_b", "q_b", wb, "l2")],
        k=5,
        rank_fn=lambda d: np.max(d, axis=1),
    ).collect()
    V_a = np.array([r[1] for r in rows], dtype=np.float32).astype(np.float64)
    V_b = np.array([r[2] for r in rows], dtype=np.float32).astype(np.float64)
    for qid, qa, qb in qrows:
        qa = np.array(qa, dtype=np.float32).astype(np.float64)
        qb = np.array(qb, dtype=np.float32).astype(np.float64)
        s = np.maximum(
            wa * ((V_a - qa) ** 2).sum(1), wb * ((V_b - qb) ** 2).sum(1)
        )
        expect = np.lexsort((np.arange(len(s)), s))[:5]
        got = sorted((r for r in res if r["query_id"] == qid), key=lambda r: r["rank"])
        assert [r["id"] for r in got] == list(expect)
        for r, ei in zip(got, expect):
            assert math.isclose(r["score"], s[ei], rel_tol=1e-9)


def test_default_rank_fn_unchanged(multi_fixture):
    """rank_fn=None must stay byte-identical to the weighted-sum path."""
    vectors, queries, _, _ = multi_fixture
    specs = [
        IndexSpec("vector_a", "q_a", 0.3, "l2"),
        IndexSpec("vector_b", "q_b", 0.7, "l2"),
    ]
    base = multi_index_scan(vectors, queries, specs, k=5).collect()
    explicit = multi_index_scan(
        vectors, queries, specs, k=5, rank_fn=lambda d: d.sum(axis=1)
    ).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, explicit))
