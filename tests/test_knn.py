"""Exact k-NN operator tests.

Mirrors the reference's golden-fixture strategy (Test/src/AlgoTest.cpp:160-245:
deterministic vectors vec[i][j]=i, queries q[i][j]=2i, k=3) and its
brute-force-truth harness (PerfTest.cpp:186-203): the kernel path must equal
the declarative path must equal NumPy.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sptag_spark.operators.knn import attach_meta, knn, knn_brute_expr
from sptag_spark.tables import queries_table, vectors_table

DIM = 10
N = 200


@pytest.fixture(scope="module")
def algotest_fixture(spark):
    """vec[i][j] = i, meta = str(i); queries q[i][j] = 2i (AlgoTest.cpp:166-188)."""
    vectors = spark.createDataFrame(
        [(i, [float(i)] * DIM, str(i)) for i in range(N)],
        "id long, vector array<float>, meta string",
    )
    queries = spark.createDataFrame(
        [(i, [float(2 * i)] * DIM) for i in range(3)],
        "query_id long, vector array<float>",
    )
    return vectors, queries


def test_golden_l2_neighbors(algotest_fixture):
    """For query 2i the L2-nearest vectors are ids 2i, 2i±1, ... ascending by
    |id - 2i| with smaller-id tie-break (QueryResultSet.h:17-26)."""
    vectors, queries = algotest_fixture
    res = knn(vectors, queries, k=3, metric="l2").collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["id"], r["dist"]))
    for qid, rows in by_q.items():
        rows.sort()
        target = 2 * qid
        # rank 1: exact match, dist 0; ranks 2-3: ids target-1, target+1 (tie
        # on dist → smaller id first)
        assert rows[0] == (1, target, 0.0)
        expected_tie = [target - 1, target + 1] if target >= 1 else [target + 1, target + 2]
        assert [r[1] for r in rows[1:]] == expected_tie


def test_kernel_equals_declarative(spark):
    rng = np.random.default_rng(7)
    vectors = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=8)]) for i in range(300)],
        "id long, vector array<float>",
    )
    queries = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=8)]) for i in range(5)],
        "query_id long, vector array<float>",
    )
    for metric in ("l2", "cosine", "ip"):
        a = knn(vectors, queries, k=7, metric=metric)
        b = knn_brute_expr(vectors, queries, k=7, metric=metric)
        pa = a.orderBy("query_id", "rank").toPandas()
        pb = b.orderBy("query_id", "rank").toPandas()
        assert pa[["query_id", "rank", "id"]].equals(pb[["query_id", "rank", "id"]]), metric
        assert np.allclose(pa["dist"], pb["dist"], atol=1e-9), metric


def test_knn_on_testdata(spark, sf_dir):
    vectors = vectors_table(spark, sf_dir)
    queries = queries_table(spark, sf_dir)
    nq = queries.count()
    res = knn(vectors, queries, k=10, metric="l2")
    pdf = res.toPandas()
    assert len(pdf) == nq * 10
    # every query's rank-1 neighbor is itself at distance 0
    self_hits = pdf[pdf["rank"] == 1]
    assert (self_hits["query_id"] == self_hits["id"]).all()
    assert (self_hits["dist"] == 0.0).all()


def test_attach_meta(algotest_fixture):
    vectors, queries = algotest_fixture
    res = attach_meta(knn(vectors, queries, k=3, metric="l2"), vectors)
    rows = res.filter(F.col("rank") == 1).collect()
    for r in rows:
        assert r["meta"] == str(r["id"])


def test_empty_queries(spark, algotest_fixture):
    vectors, _ = algotest_fixture
    empty = spark.createDataFrame([], "query_id long, vector array<float>")
    assert knn(vectors, empty, k=3).count() == 0


def test_knn_chunked_path_identical(spark, sf_dir):
    """Forcing chunk_size below |Q| must produce exactly the unchunked
    result (the large-batch closure-growth fallback)."""
    vectors = vectors_table(spark, sf_dir)
    queries = queries_table(spark, sf_dir)
    base = sorted(map(tuple, knn(vectors, queries, k=5).collect()))
    chunked = sorted(map(tuple, knn(vectors, queries, k=5, chunk_size=3).collect()))
    assert base == chunked
    assert len(base) > 0


def test_ann_chunked_path_identical(spark, sf_dir):
    from sptag_spark.index.ann import ann_search
    from sptag_spark.index.heads import select_heads
    from sptag_spark.index.postings import build_postings

    vectors = vectors_table(spark, sf_dir).cache()
    queries = queries_table(spark, sf_dir)
    heads = select_heads(vectors, ratio=0.12).cache()
    postings = build_postings(vectors, heads).cache()
    base = sorted(map(tuple, ann_search(queries, heads, postings, k=5).collect()))
    chunked = sorted(
        map(tuple, ann_search(queries, heads, postings, k=5, chunk_size=7).collect())
    )
    assert base == chunked
    assert len(base) > 0


def test_sql_door_matches_kernel(spark, sf_dir):
    """spark.sql text (sql.py knn_sql) and the DataFrame kernel return
    identical rows for every metric — the two front doors are one engine."""
    from pyspark.sql import functions as F

    from sptag_spark.operators.knn import knn
    from sptag_spark.sql import sql_knn
    from sptag_spark.tables import queries_table, vectors_table

    for metric in ("l2", "cosine", "ip"):
        via_sql = {
            (r["query_id"], r["rank"], r["id"], r["dist"])
            for r in sql_knn(spark, sf_dir, metric=metric, k=5).collect()
        }
        kern = knn(
            vectors_table(spark, sf_dir), queries_table(spark, sf_dir), 5, metric
        ).withColumn("dist", F.round("dist", 4))
        via_kernel = {
            (r["query_id"], r["rank"], r["id"], r["dist"])
            for r in kern.collect()
        }
        assert via_sql == via_kernel, metric


def test_dimension_mismatch_diagnostics(spark):
    """NULL vectors and ragged/mismatched dims raise the reference's
    DimensionSizeMismatch diagnostic, not an opaque BLAS shape error
    (BKTIndex.cpp:924 rejects these at AddIndex time)."""
    import pytest

    from sptag_spark.operators.knn import knn

    v = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, None)],
        "id long, vector array<float>",
    )
    q = spark.createDataFrame(
        [(100, [1.0, 0.1])], "query_id long, vector array<float>"
    )
    with pytest.raises(Exception, match="DimensionSizeMismatch.*NULL"):
        knn(v, q, 2, "l2").collect()

    clean = v.filter(v.vector.isNotNull())
    q3 = spark.createDataFrame(
        [(7, [1.0, 2.0, 3.0])], "query_id long, vector array<float>"
    )
    with pytest.raises(Exception, match="DimensionSizeMismatch.*dim"):
        knn(clean, q3, 2, "l2").collect()

    # empty query batch is a degenerate success, not an error
    assert knn(clean, q.filter(q.query_id < 0), 2, "l2").collect() == []


def test_range_search_matches_brute(spark, sf_dir):
    """Range search returns exactly the pairs the declarative filter keeps,
    with the same distances."""
    from pyspark.sql import functions as F

    from sptag_spark.functions.distance import dist_expr
    from sptag_spark.operators.knn import range_search
    from sptag_spark.tables import queries_table, vectors_table

    vectors = vectors_table(spark, sf_dir).select("id", "vector")
    queries = queries_table(spark, sf_dir)
    radius = 1.3
    got = {
        (r["query_id"], r["id"]): r["dist"]
        for r in range_search(vectors, queries, radius).collect()
    }
    q = queries.select("query_id", F.col("vector").alias("qvector"))
    ref = {
        (r["query_id"], r["id"]): r["dist"]
        for r in vectors.crossJoin(F.broadcast(q))
        .withColumn("dist", dist_expr(F.col("qvector"), F.col("vector"), "l2"))
        .filter(F.col("dist") <= radius)
        .select("query_id", "id", "dist")
        .collect()
    }
    assert set(got) == set(ref)
    for key, d in got.items():
        assert abs(d - ref[key]) < 1e-9
    # every query at least self-hits (queries are drawn from the corpus)
    qids = {qid for qid, _ in got}
    assert all((qid, qid) in got and got[(qid, qid)] == 0.0 for qid in qids)


def test_range_search_plan_is_map_only(spark, sf_dir):
    """No Exchange anywhere: the radius scan is a single map stage."""
    from sptag_spark.operators.knn import range_search
    from sptag_spark.tables import queries_table, vectors_table

    plan = range_search(
        vectors_table(spark, sf_dir).select("id", "vector"),
        queries_table(spark, sf_dir),
        radius=1.3,
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
