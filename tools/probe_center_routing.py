"""Center-routed scatter probe (SCALING.md r10): recall vs fan-out.

The reference aggregator's TopK/Centers mode bounds each query's fan-out
to the scatter_topk nearest servers (`AggregatorService.cpp:215-258`).
This probe measures what that costs in recall on head-sharded SPANN at
sf0.1: shards fixed, scatter_topk swept, recall@10 vs the exact kNN
truth, plus the average number of shards actually probed (the RPC
budget the mode exists to bound).

Run: python tools/probe_center_routing.py [n_shards ...]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

SF = "/root/testdata/sf0.1"


def main() -> int:
    from sptag_spark.index.ann import SEARCH_INTERNAL_RESULT_NUM  # noqa: F401
    from sptag_spark.index.heads import select_heads
    from sptag_spark.index.postings import build_postings
    from sptag_spark.operators.knn import knn
    from sptag_spark.serving_local import ShardedSpannAggregator
    from sptag_spark.session import get_spark
    from sptag_spark.tables import queries_table, vectors_table

    split = "range"
    args = [a for a in sys.argv[1:]]
    if "--split" in args:
        i = args.index("--split")
        split = args[i + 1]
        args = args[:i] + args[i + 2 :]
    shard_counts = [int(a) for a in args] or [8]
    spark = get_spark("probe-center-routing")
    v = vectors_table(spark, SF)
    heads = select_heads(v, ratio=0.12).persist()
    postings = build_postings(v, heads).persist()
    postings.count()
    queries = queries_table(spark, SF)
    qs = [
        (int(r["query_id"]), np.asarray(r["vector"], dtype=np.float64))
        for r in queries.collect()
    ]
    truth = {}
    for r in knn(v, queries, k=10).collect():
        truth.setdefault(r["query_id"], set()).add(r["id"])

    nprobe = 24
    out = []
    for n_shards in shard_counts:
        for topk in sorted({1, 2, max(1, n_shards // 2), n_shards}):
            agg = ShardedSpannAggregator(
                heads, postings, n_shards=n_shards, scatter_topk=topk,
                split=split,
            )
            # warm + recall
            hits = total = 0
            lat = []
            for qid, q in qs:
                t0 = time.perf_counter()
                ids, _ = agg.search_one(q, k=10, nprobe=nprobe)
                lat.append((time.perf_counter() - t0) * 1e3)
                hits += len(set(int(i) for i in ids) & truth[qid])
                total += 10
            lat.sort()
            row = {
                "split": split,
                "n_shards": n_shards,
                "scatter_topk": topk,
                "recall_at_10": round(hits / total, 4),
                "p50_ms": round(lat[len(lat) // 2], 3),
                "fanout_frac": round(topk / n_shards, 3),
            }
            out.append(row)
            print(json.dumps(row), flush=True)
    print(json.dumps({"rows": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
