"""Driver queries: MultiIndexScan and recall/MRR (SURVEY.md §2.4).

Fixture (F5-style): vector_a = embedding, vector_b = reverse(embedding) —
two "indexes" over the same entities, weights {0.3, 0.7}, both L2. Query set
is the standard vec_id % 25 == 0 slice.

Recall fixture: "approximate" results = exact kNN restricted to odd ids (a
deterministic, SQL-expressible stand-in for an ANN candidate set); truth =
unrestricted exact kNN. Exercises the TruthSet::CalculateRecall join
(id match + distance-tie credit) and MRR.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sptag_spark.operators.knn import knn
from sptag_spark.operators.multi_index import IndexSpec, multi_index_scan
from sptag_spark.operators.recall import recall_per_query
from sptag_spark.queries.knn_queries import ROUND, _DIST_SQL, _L2SQ
from sptag_spark.registry import register
from sptag_spark.tables import (
    DEFAULT_K,
    ORACLE_QUERIES,
    ORACLE_VECTORS,
    queries_table,
    vectors_table,
)

W_A, W_B = 0.3, 0.7


def _multi_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = vectors_table(spark, sf_dir).select(
        "id",
        F.col("vector").alias("vector_a"),
        F.reverse("vector").alias("vector_b"),
    )
    q = queries_table(spark, sf_dir).select(
        "query_id",
        F.col("vector").alias("q_a"),
        F.reverse("vector").alias("q_b"),
    )
    specs = [
        IndexSpec("vector_a", "q_a", W_A, "l2"),
        IndexSpec("vector_b", "q_b", W_B, "l2"),
    ]
    res = multi_index_scan(v, q, specs, DEFAULT_K)
    return res.withColumn("score", F.round("score", ROUND))


_L2SQ_REV = (
    "list_sum(list_transform(list_zip(list_reverse(q.vector), "
    "list_reverse(v.vector)), "
    "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))^2))"
)

register(
    "multi_index_scan",
    _multi_index,
    f"""
WITH v AS ({ORACLE_VECTORS}),
     q AS ({ORACLE_QUERIES}),
pairs AS (
  SELECT q.query_id, v.id, {W_A} * ({_L2SQ}) + {W_B} * ({_L2SQ_REV}) AS s
  FROM q CROSS JOIN v
),
ranked AS (
  SELECT query_id, id, s,
         row_number() OVER (PARTITION BY query_id ORDER BY s, id) AS rank
  FROM pairs
)
SELECT query_id, rank, id, round(s, {ROUND}) AS score
FROM ranked WHERE rank <= {DEFAULT_K}
""",
)


def _multi_index_rank_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same two-index fixture, CUSTOM rank function: max of the weighted
    per-index distances (Chebyshev-style fusion — an entity is only close
    if it is close under EVERY index). Parity with the arbitrary
    `float (*)(std::vector<float>)` of `inc/Core/MultiIndexScan.h:28` /
    `Test/src/MultiIndexScanTest.cpp:104-123`; the fn is vectorized
    (batch (m, n_specs) → (m,)) per the operator's contract."""
    import numpy as np

    v = vectors_table(spark, sf_dir).select(
        "id",
        F.col("vector").alias("vector_a"),
        F.reverse("vector").alias("vector_b"),
    )
    q = queries_table(spark, sf_dir).select(
        "query_id",
        F.col("vector").alias("q_a"),
        F.reverse("vector").alias("q_b"),
    )
    specs = [
        IndexSpec("vector_a", "q_a", W_A, "l2"),
        IndexSpec("vector_b", "q_b", W_B, "l2"),
    ]
    res = multi_index_scan(
        v, q, specs, DEFAULT_K, rank_fn=lambda d: np.max(d, axis=1)
    )
    return res.withColumn("score", F.round("score", ROUND))


register(
    "multi_index_rank_fn",
    _multi_index_rank_fn,
    f"""
WITH v AS ({ORACLE_VECTORS}),
     q AS ({ORACLE_QUERIES}),
pairs AS (
  SELECT q.query_id, v.id,
         greatest({W_A} * ({_L2SQ}), {W_B} * ({_L2SQ_REV})) AS s
  FROM q CROSS JOIN v
),
ranked AS (
  SELECT query_id, id, s,
         row_number() OVER (PARTITION BY query_id ORDER BY s, id) AS rank
  FROM pairs
)
SELECT query_id, rank, id, round(s, {ROUND}) AS score
FROM ranked WHERE rank <= {DEFAULT_K}
""",
)


def _recall_restricted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sptag_spark.queries.ann_queries import query_batch

    vectors = vectors_table(spark, sf_dir)
    queries = queries_table(spark, sf_dir)
    q_rows = query_batch(spark, sf_dir)
    truth = knn(vectors, queries, DEFAULT_K, "l2", q_rows=q_rows)
    approx = knn(
        vectors.filter(F.col("id") % 2 == 1), queries, DEFAULT_K, "l2",
        q_rows=q_rows,
    )
    per_q = recall_per_query(approx, truth, DEFAULT_K)
    return per_q.select(
        "query_id",
        "n_hits",
        F.round("recall", ROUND).alias("recall"),
        F.round("rr", ROUND).alias("rr"),
    )


register(
    "recall_restricted",
    _recall_restricted,
    f"""
WITH v AS ({ORACLE_VECTORS}),
     q AS ({ORACLE_QUERIES}),
truth AS (
  SELECT query_id, id, d FROM (
    SELECT q.query_id, v.id, {_DIST_SQL["l2"]} AS d,
           row_number() OVER (PARTITION BY q.query_id ORDER BY {_DIST_SQL["l2"]}, v.id) AS rank
    FROM q CROSS JOIN v
  ) WHERE rank <= {DEFAULT_K}
),
approx AS (
  SELECT query_id, id, d, rank FROM (
    SELECT q.query_id, v.id, {_DIST_SQL["l2"]} AS d,
           row_number() OVER (PARTITION BY q.query_id ORDER BY {_DIST_SQL["l2"]}, v.id) AS rank
    FROM q CROSS JOIN v WHERE v.id % 2 = 1
  ) WHERE rank <= {DEFAULT_K}
),
hits AS (
  SELECT a.query_id, a.rank, a.id,
         EXISTS (
           SELECT 1 FROM truth t
           WHERE t.query_id = a.query_id
             AND (t.id = a.id OR abs(a.d - t.d) < 1e-6 * (a.d + 1e-6))
         ) AS hit
  FROM approx a
)
SELECT query_id,
       CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       round(sum(CASE WHEN hit THEN 1.0 ELSE 0.0 END) / {DEFAULT_K}.0, {ROUND}) AS recall,
       round(coalesce(1.0 / min(CASE WHEN hit THEN rank END), 0.0), {ROUND}) AS rr
FROM hits GROUP BY query_id
""",
)
