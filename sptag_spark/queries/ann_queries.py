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


# Index structures are OFFLINE artifacts: SPANN builds heads/postings once
# (SSDServing BuildHead/BuildSSDIndex stages) and serves every query from
# them; a 100 TB deployment reads them back as partitioned Parquet
# (index/persistence.py). The memo below is the in-session equivalent —
# build once per (session, sf_dir), persist, and let every query time the
# SERVE path, which is what the reference's QPS numbers measure.
_INDEX_CACHE: dict[tuple, tuple] = {}


def _memo(spark: SparkSession, sf_dir: str, kind: str, build):
    key = (id(spark.sparkContext), sf_dir, kind)
    if key not in _INDEX_CACHE:
        _INDEX_CACHE[key] = build()
    return _INDEX_CACHE[key]


def spann_index(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    def build():
        vectors = vectors_table(spark, sf_dir)
        heads = select_heads(vectors, ratio=0.12).persist()
        postings = build_postings(vectors, heads).persist()
        postings.count()
        return heads, postings

    return _memo(spark, sf_dir, "spann", build)


def ivf_index(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    def build():
        vectors = vectors_table(spark, sf_dir)
        centroids, lists = ivf_build(vectors, n_lists_ratio=0.05)
        centroids = centroids.persist()
        lists = lists.persist()
        lists.count()
        return centroids, lists

    return _memo(spark, sf_dir, "ivf", build)


def pq_index(spark: SparkSession, sf_dir: str) -> tuple:
    def build():
        vectors = vectors_table(spark, sf_dir)
        books = train_pq(vectors, m=8)
        codes = pq_encode(vectors, books).persist()
        codes.count()
        return books, codes

    return _memo(spark, sf_dir, "pq", build)


def opq_index(spark: SparkSession, sf_dir: str) -> tuple:
    def build():
        vectors = vectors_table(spark, sf_dir)
        books = train_pq(vectors, m=8, opq_rotation=True)
        codes = pq_encode(vectors, books).persist()
        codes.count()
        return books, codes

    return _memo(spark, sf_dir, "opq", build)


def _ann_spann(spark: SparkSession, sf_dir: str) -> DataFrame:
    heads, postings = spann_index(spark, sf_dir)
    queries = queries_table(spark, sf_dir)
    # nprobe 10 clears the paper's ~0.9 recall@10 operating point at every
    # test SF (the reference's SIFT1B config probes 64 internal results)
    res = ann_search(queries, heads, postings, k=DEFAULT_K, nprobe=10)
    return res.withColumn("dist", F.round("dist", 4))


register("ann_spann_search", _ann_spann, None)


def _ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    centroids, lists = ivf_index(spark, sf_dir)
    queries = queries_table(spark, sf_dir)
    # single-assignment IVF needs a wider probe than replicated SPANN for
    # comparable recall (the storage/probe trade — see test_ivf_recall)
    res = ivf_search(queries, centroids, lists, k=DEFAULT_K, nprobe=12)
    return res.withColumn("dist", F.round("dist", 4))


register("ann_ivf_search", _ann_ivf, None)


def _pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    books, codes = pq_index(spark, sf_dir)
    queries = queries_table(spark, sf_dir)
    res = adc_search(codes, queries, books, k=DEFAULT_K)
    return res.withColumn("adc_dist", F.round("adc_dist", 4))


register("pq_adc_search", _pq_adc, None)


def _posting_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    _heads, postings = spann_index(spark, sf_dir)
    return posting_stats(postings)


register("posting_histogram", _posting_histogram, None)


def _balanced_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    vectors = vectors_table(spark, sf_dir)
    assigned = balanced_kmeans(vectors, k=16, n_iter=4)
    return cluster_sizes(assigned)


register("balanced_kmeans_sizes", _balanced_clusters, None)


def _rng_graph_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sptag_spark.index.graph import build_rng_graph, graph_stats

    def build():
        heads, _ = spann_index(spark, sf_dir)
        vectors = vectors_table(spark, sf_dir)
        edges = build_rng_graph(vectors, L=8, heads=heads, replicas=4).persist()
        edges.count()
        return (edges,)

    (edges,) = _memo(spark, sf_dir, "rng_graph", build)
    return graph_stats(edges)


register("rng_graph_degrees", _rng_graph_degrees, None)


def _kdt_leaf_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sptag_spark.index.kdt import build_kdt, kdt_assign, kdt_leaf_sizes

    def build():
        vectors = vectors_table(spark, sf_dir)
        tree = build_kdt(vectors, leaf_size=64)
        assigned = kdt_assign(vectors, tree).persist()
        assigned.count()
        return (assigned,)

    (assigned,) = _memo(spark, sf_dir, "kdt", build)
    return kdt_leaf_sizes(assigned)


register("kdt_leaf_sizes", _kdt_leaf_histogram, None)
