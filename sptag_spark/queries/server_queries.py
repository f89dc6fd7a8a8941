"""Driver queries: service-surface parity (SURVEY.md §2.11) and index
lifecycle composites (§2.7 MergeIndex, §2.6 SearchTree, OPQ variant of §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sptag_spark.index.ann import search_tree
from sptag_spark.index.pq import adc_search
from sptag_spark.operators.mutate import merge_index
from sptag_spark.queries.knn_queries import ROUND, _DIST_SQL
from sptag_spark.registry import register
from sptag_spark.server import encode_query, execute_queries
from sptag_spark.tables import (
    ORACLE_QUERIES,
    ORACLE_VECTORS,
    queries_table,
    vectors_table,
)

# -- merge_index ------------------------------------------------------------
#
# Two sub-indexes carved from the embeddings table (even/odd ids), each with
# a closed-form tombstone set; the merged live view is fully SQL-expressible.


def _merge_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = vectors_table(spark, sf_dir)
    v1 = v.filter(F.col("id") % 2 == 0)
    v2 = v.filter(F.col("id") % 2 == 1)
    t1 = v1.filter(F.col("id") % 10 == 0).select("id")
    t2 = v2.filter(F.col("id") % 7 == 0).select("id")
    merged = merge_index(v1, t1, v2, t2)
    return merged.select(
        "id",
        "meta",
        F.round(F.element_at("vector", 1).cast("double"), ROUND).alias("v0"),
    )


register(
    "merge_index_live",
    _merge_live,
    f"""
WITH v AS ({ORACLE_VECTORS}),
live1 AS (SELECT * FROM v WHERE id % 2 = 0 AND NOT id % 10 = 0),
live2 AS (SELECT * FROM v WHERE id % 2 = 1 AND NOT id % 7 = 0),
off AS (SELECT COALESCE(MAX(id), -1) + 1 AS o FROM live1)
SELECT id, meta, round(CAST(vector[1] AS DOUBLE), {ROUND}) AS v0 FROM live1
UNION ALL
SELECT live2.id + off.o AS id, meta,
       round(CAST(vector[1] AS DOUBLE), {ROUND}) AS v0
FROM live2, off
""",
)


# -- wire-format parse + execute --------------------------------------------
#
# Query strings are built from the standard query batch (sorted by query_id,
# position = batch index), alternating literal and base64 payloads, all with
# $resultnum:5 and $extractmetadata:true — so the oracle is exact kNN at k=5
# with metadata, re-keyed to batch position.

_PARSE_K = 5


def _query_parse_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    vectors = vectors_table(spark, sf_dir)
    qrows = sorted(
        queries_table(spark, sf_dir).collect(), key=lambda r: r["query_id"]
    )
    strings = [
        encode_query(
            r["vector"],
            base64_payload=(i % 2 == 1),
            resultnum=_PARSE_K,
            extractmetadata="true",
        )
        for i, r in enumerate(qrows)
    ]
    res = execute_queries({"main": vectors}, strings, default_k=10)
    return res.select(
        "query_id", "rank", "id", F.round("dist", ROUND).alias("dist"), "meta"
    )


register(
    "query_parse_search",
    _query_parse_search,
    f"""
WITH v AS ({ORACLE_VECTORS}),
     q0 AS ({ORACLE_QUERIES}),
q AS (
  SELECT row_number() OVER (ORDER BY query_id) - 1 AS query_id, vector
  FROM q0
),
pairs AS (
  SELECT q.query_id, v.id, v.meta, {_DIST_SQL["l2"]} AS d
  FROM q CROSS JOIN v
),
ranked AS (
  SELECT query_id, id, meta, d,
         row_number() OVER (PARTITION BY query_id ORDER BY d, id) AS rank
  FROM pairs
)
SELECT query_id, rank, id, round(d, {ROUND}) AS dist, meta
FROM ranked WHERE rank <= {_PARSE_K}
""",
)


# -- tree-only search (rows-only: heads derive from KMeans) -----------------


def _search_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sptag_spark.queries.ann_queries import spann_index

    heads, _postings = spann_index(spark, sf_dir)
    queries = queries_table(spark, sf_dir)
    res = search_tree(queries, heads, k=5)
    return res.withColumn("dist", F.round("dist", ROUND))


register("search_tree_topk", _search_tree, None)


# -- OPQ (rotation + PQ/ADC; rows-only: codebooks from sampled KMeans) ------


def _opq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sptag_spark.queries.ann_queries import opq_index

    books, codes = opq_index(spark, sf_dir)
    queries = queries_table(spark, sf_dir)
    res = adc_search(codes, queries, books, k=5)
    return res.withColumn("adc_dist", F.round("adc_dist", ROUND))


register("opq_adc_search", _opq_adc, None)
