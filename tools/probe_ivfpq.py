"""Fresh-process stage breakdown for the ivf_pq_search bench query (the
slowest ANN-family serve query): times each suffix of the pipeline —
route-only, ADC scan without rerank, + exact rerank, + self-verify — so a
regression or optimization target can be attributed to a stage instead of
guessed. One process per invocation (SCALING.md protocol).

Usage: python tools/probe_ivfpq.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
os.environ.setdefault("SPTAG_SPARK_DRIVER_MEM", "40g")
os.environ.setdefault("SPTAG_SPARK_AQE", "false")

from sptag_spark.session import get_spark  # noqa: E402

spark = get_spark("probe-ivfpq", cpus=32, shuffle_partitions=32)
spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(10).write.format(
    "noop"
).mode("overwrite").save()
spark.range(32).repartition(32).mapInPandas(
    lambda it: it, "id long"
).write.format("noop").mode("overwrite").save()

from sptag_spark.index.ann import route_queries  # noqa: E402
from sptag_spark.index.ivf import ivf_pq_search  # noqa: E402
from sptag_spark.queries.ann_queries import (  # noqa: E402
    DEFAULT_K,
    cached_count,
    ivf_index,
    ivfpq_index,
    self_verified_search,
    truth_topk,
)
from sptag_spark.tables import queries_table, vectors_table  # noqa: E402

centroids, _ = ivf_index(spark, sf_dir)
books, coded = ivfpq_index(spark, sf_dir)
queries = queries_table(spark, sf_dir)
vectors = vectors_table(spark, sf_dir)
truth = truth_topk(spark, sf_dir)
nprobe = max(12, -(-cached_count(centroids) // 4))

stages = {
    "route_only": lambda: route_queries(
        queries, centroids, nprobe, metric="l2", max_dist_ratio=float("inf")
    ),
    "adc_no_rerank": lambda: ivf_pq_search(
        queries, centroids, coded, books, k=DEFAULT_K, nprobe=nprobe
    ),
    "adc_rerank": lambda: ivf_pq_search(
        queries, centroids, coded, books, k=DEFAULT_K, nprobe=nprobe,
        rerank=4 * DEFAULT_K, vectors=vectors,
    ),
    "full_query_with_verify": lambda: self_verified_search(
        ivf_pq_search(
            queries, centroids, coded, books, k=DEFAULT_K, nprobe=nprobe,
            rerank=4 * DEFAULT_K, vectors=vectors,
        ).withColumnRenamed("adc_dist", "dist"),
        truth, DEFAULT_K, recall_gate=0.8,
    ),
}
out = {"op": "ivf_pq_breakdown", "sf_dir": sf_dir, "nprobe": nprobe}
for name, fn in stages.items():
    fn().write.format("noop").mode("overwrite").save()  # codegen warm
    t0 = time.time()
    fn().write.format("noop").mode("overwrite").save()
    out[name] = round(time.time() - t0, 3)
print(json.dumps(out))
spark.stop()
