"""Probe: ShardedSpannAggregator at 2-16 shards, sf0.1 (VERDICT r9 #7).

Measures, per shard count:
- recall@10 vs the exact in-Spark truth (the acceptance metric),
- per-query p50/p99 latency through the scatter-gather path,
- postings examined per query (the nprobe-per-shard semantics: each shard
  answers at the same nprobe over ITS heads, so total probed work grows
  with shard count — the reference aggregator has the same property, each
  child index applies its own MaxCheck budget),
- an EQUAL-WORK variant (nprobe split across shards) isolating the recall
  lift that is purely semantic from extra work,
- deadline-partial behavior with one induced slow shard.

Usage: python tools/probe_sharded_agg.py [--sf /root/testdata/sf0.1]
       [--nprobe 24] [--k 10] [--shards 1,2,4,8,16]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def _arg(name: str, default: str) -> str:
    return (
        sys.argv[sys.argv.index(name) + 1] if name in sys.argv else default
    )


def main() -> None:
    sf = _arg("--sf", "/root/testdata/sf0.1")
    nprobe = int(_arg("--nprobe", "24"))
    k = int(_arg("--k", "10"))
    shard_counts = [int(x) for x in _arg("--shards", "1,2,4,8,16").split(",")]

    from sptag_spark.calibration import gemm_calibration
    from sptag_spark.queries.ann_queries import spann_index, truth_topk
    from sptag_spark.serving_local import ShardedSpannAggregator
    from sptag_spark.session import get_spark
    from sptag_spark.tables import queries_table

    print(json.dumps({"calibration": gemm_calibration()}), flush=True)
    spark = get_spark("probe-sharded-agg")
    heads, postings = spann_index(spark, sf)
    truth = {}
    for r in truth_topk(spark, sf, k=k).collect():
        truth.setdefault(int(r["query_id"]), set()).add(int(r["id"]))
    qs = [
        (int(r["query_id"]), np.asarray(r["vector"], dtype=np.float64))
        for r in queries_table(spark, sf).collect()
    ]
    n_heads = heads.count()

    def measure(agg, np_probe):
        lat, hits = [], 0
        agg.search_one(qs[0][1], k=k, nprobe=np_probe)  # warm
        for qid, q in qs:
            t0 = time.perf_counter()
            ids, _ = agg.search_one(q, k=k, nprobe=np_probe)
            lat.append((time.perf_counter() - t0) * 1000)
            hits += len(set(ids.tolist()) & truth[qid])
        lat = np.array(lat)
        return {
            "recall": round(hits / (len(qs) * k), 4),
            "p50_ms": round(float(np.percentile(lat, 50)), 2),
            "p99_ms": round(float(np.percentile(lat, 99)), 2),
        }

    for n in shard_counts:
        agg = ShardedSpannAggregator(heads, postings, n_shards=n)
        posts_per_q = sum(
            int(rep.indptr[-1]) * min(nprobe, len(rep.head_ids))
            / max(1, len(rep.head_ids))
            for rep in agg.replicas
        )
        row = {
            "shards": n,
            "heads_per_shard": round(n_heads / n, 1),
            "est_postings_per_query": int(posts_per_q),
            "same_nprobe": measure(agg, nprobe),
            # equal work: nprobe split across shards (floor 2)
            "split_nprobe": measure(agg, max(2, nprobe // n)),
        }
        # deadline partials: make shard 0 slow, budget squeezes it out
        if n >= 2:
            slow = agg.replicas[0]
            real = slow.search_one

            def lagged(q, *a, **kw):
                time.sleep(0.05)
                return real(q, *a, **kw)

            slow.search_one = lagged
            partials = 0
            rec = 0
            for qid, q in qs:
                ids, _, partial = agg.search_with_deadline(
                    q, k=k, nprobe=nprobe, budget_ms=20.0
                )
                partials += partial
                rec += len(set(ids.tolist()) & truth[qid])
            slow.search_one = real
            row["deadline_1_slow_shard"] = {
                "partial_rate": round(partials / len(qs), 3),
                "recall_of_answers": round(rec / (len(qs) * k), 4),
            }
        print(json.dumps(row), flush=True)
    print(json.dumps({"calibration_after": gemm_calibration()}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
