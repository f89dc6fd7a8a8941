"""Driver queries: service-surface parity (SURVEY.md §2.11) and index
lifecycle composites (§2.7 MergeIndex, §2.6 SearchTree, OPQ variant of §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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
        (F.round(F.element_at("vector", 1).cast("double"), ROUND) + F.lit(0.0)).alias("v0"),
    )


register(
    "merge_index_live",
    _merge_live,
    f"""
WITH v AS ({ORACLE_VECTORS}),
live1 AS (SELECT * FROM v WHERE id % 2 = 0 AND NOT id % 10 = 0),
live2 AS (SELECT * FROM v WHERE id % 2 = 1 AND NOT id % 7 = 0),
off AS (SELECT COALESCE(MAX(id), -1) + 1 AS o FROM live1)
SELECT id, meta, round(CAST(vector[1] AS DOUBLE), {ROUND}) + 0.0 AS v0 FROM live1
UNION ALL
SELECT live2.id + off.o AS id, meta,
       round(CAST(vector[1] AS DOUBLE), {ROUND}) + 0.0 AS v0
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


# -- tree-only search (self-verifying: heads derive from KMeans, so the
# oracle checks the per-query output CONTRACT — full k, ranked by
# nondecreasing nonnegative distance — not the head ids themselves) ---------

_TREE_K = 5


def _search_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sptag_spark.queries.ann_queries import spann_index

    heads, _postings = spann_index(spark, sf_dir)
    queries = queries_table(spark, sf_dir)
    res = search_tree(queries, heads, k=_TREE_K)
    w = Window.partitionBy("query_id").orderBy("rank")
    flagged = res.withColumn("_prev", F.lag("dist").over(w))
    return flagged.groupBy("query_id").agg(
        F.count("*").alias("n_results"),
        F.bool_and(
            F.coalesce(F.col("dist") >= F.col("_prev"), F.lit(True))
        ).alias("dists_nondecreasing"),
        (F.min("dist") >= 0).alias("dists_nonneg"),
    )


def _search_tree_oracle() -> str:
    from sptag_spark.queries.ann_queries import ORACLE_PER_QUERY

    return f"""
SELECT query_id, CAST({_TREE_K} AS BIGINT) AS n_results,
       TRUE AS dists_nondecreasing, TRUE AS dists_nonneg
FROM ({ORACLE_PER_QUERY})
"""


register("search_tree_topk", _search_tree, _search_tree_oracle())


# -- OPQ (self-verifying: genuine recall measurement vs exact truth, plus
# the acceptance OPQ exists for — not materially worse than plain PQ) -------


def _opq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sptag_spark.operators.recall import recall_per_query, result_hits
    from sptag_spark.queries.ann_queries import (
        opq_index,
        pq_index,
        query_batch,
        truth_hit_arrays,
    )
    from sptag_spark.tables import DEFAULT_K

    truth = truth_hit_arrays(spark, sf_dir)
    queries = queries_table(spark, sf_dir)
    q_rows = query_batch(spark, sf_dir)
    books_o, codes_o = opq_index(spark, sf_dir)
    res_o = adc_search(
        codes_o, queries, books_o, k=DEFAULT_K, q_rows=q_rows
    ).withColumnRenamed("adc_dist", "dist")
    # ONE execution of the OPQ search: counts, per-query recall, and the
    # corpus gates all derive from a single result_hits frame (the branch-
    # per-aggregate formulation re-ran the whole ADC plan per branch)
    per_q = result_hits(res_o, truth).groupBy("query_id").agg(
        F.count("*").alias("n_results"),
        (F.sum(F.col("hit").cast("double")) / F.lit(float(DEFAULT_K))).alias(
            "_recall"
        ),
    )
    # per_q is lazily checkpointed: the corpus-average gate derives from
    # the one materialized |Q|-row frame via a broadcast scalar instead of
    # an unpartitioned window (whose move-all-data warning floods logs; a
    # non-checkpointed agg branch would re-run the whole ADC plan).
    per_q = per_q.localCheckpoint(eager=False)
    avg_o = per_q.agg(F.avg("_recall").alias("_r_opq"))
    # OPQ's reason to exist: rotation must not lose recall vs plain PQ
    # (OPQQuantizer.h trains the rotation to REDUCE quantization error);
    # 0.02 absolute slack for sampling noise in codebook training. res_p
    # executes once, reduced to one broadcast row.
    books_p, codes_p = pq_index(spark, sf_dir)
    res_p = adc_search(
        codes_p, queries, books_p, k=DEFAULT_K, q_rows=q_rows
    ).withColumnRenamed("adc_dist", "dist")
    avg_p = recall_per_query(res_p, truth, DEFAULT_K).agg(
        F.avg("recall").alias("r_pq")
    )
    return (
        # gate 0.4: raw m=8 ADC at 32× compression measures 0.58 @ sf0.01
        # and 0.49 @ sf0.1 (recall at fixed M drifts down as the corpus
        # grows — more near-ties inside one quantization cell); ~100× over
        # chance at both SFs. The compression-quality ladder above it is
        # covered by sq8 (0.95) and ivf_pq+refine (0.8).
        per_q.crossJoin(F.broadcast(avg_o))
        .withColumn("recall_ok", F.col("_r_opq") >= F.lit(0.4))
        .crossJoin(F.broadcast(avg_p))
        .select(
            "query_id",
            "n_results",
            "recall_ok",
            (F.col("_r_opq") >= F.col("r_pq") - 0.02).alias("opq_not_worse"),
        )
    )


def _opq_oracle() -> str:
    from sptag_spark.queries.ann_queries import ORACLE_PER_QUERY
    from sptag_spark.tables import DEFAULT_K

    return f"""
SELECT query_id, CAST({DEFAULT_K} AS BIGINT) AS n_results,
       TRUE AS recall_ok, TRUE AS opq_not_worse
FROM ({ORACLE_PER_QUERY})
"""


register("opq_adc_search", _opq_adc, _opq_oracle())
