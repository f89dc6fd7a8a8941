"""Driver queries: the ANN scale path (SPANN heads/postings, IVF, PQ/ADC,
balanced k-means). KMeans-derived structures are not SQL-expressible, so
these are rows-only checks for the driver; their *quality* gates (recall ≥
0.9 vs the exact oracle, posting invariants) live in tests/test_ann.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sptag_spark.index.ann import ann_search
from sptag_spark.index.balanced import balanced_kmeans, cluster_sizes
from sptag_spark.index.heads import select_heads
from sptag_spark.index.ivf import ivf_build, ivf_search
from sptag_spark.index.postings import build_postings, posting_stats
from sptag_spark.index.pq import adc_search, pq_encode, train_pq
from sptag_spark.registry import register
from sptag_spark.tables import DEFAULT_K, queries_table, vectors_table


def _ann_spann(spark: SparkSession, sf_dir: str) -> DataFrame:
    vectors = vectors_table(spark, sf_dir)
    queries = queries_table(spark, sf_dir)
    heads = select_heads(vectors, ratio=0.12).cache()
    postings = build_postings(vectors, heads)
    res = ann_search(queries, heads, postings, k=DEFAULT_K, nprobe=8)
    return res.withColumn("dist", F.round("dist", 4))


register("ann_spann_search", _ann_spann, None)


def _ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    vectors = vectors_table(spark, sf_dir)
    queries = queries_table(spark, sf_dir)
    centroids, lists = ivf_build(vectors, n_lists_ratio=0.05)
    centroids = centroids.cache()
    res = ivf_search(queries, centroids, lists, k=DEFAULT_K, nprobe=8)
    return res.withColumn("dist", F.round("dist", 4))


register("ann_ivf_search", _ann_ivf, None)


def _pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    vectors = vectors_table(spark, sf_dir)
    queries = queries_table(spark, sf_dir)
    books = train_pq(vectors, m=8)
    codes = pq_encode(vectors, books)
    res = adc_search(codes, queries, books, k=DEFAULT_K)
    return res.withColumn("adc_dist", F.round("adc_dist", 4))


register("pq_adc_search", _pq_adc, None)


def _posting_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    vectors = vectors_table(spark, sf_dir)
    heads = select_heads(vectors, ratio=0.12).cache()
    postings = build_postings(vectors, heads)
    return posting_stats(postings)


register("posting_histogram", _posting_histogram, None)


def _balanced_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    vectors = vectors_table(spark, sf_dir)
    assigned = balanced_kmeans(vectors, k=16, n_iter=4)
    return cluster_sizes(assigned)


register("balanced_kmeans_sizes", _balanced_clusters, None)
