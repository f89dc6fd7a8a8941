"""Shard-growth journey on the aggregator tier (VERDICT r11 ask #5).

`cli partition` / ShardedSpannAggregator size shards ONCE (the
reference's BalancedDataPartition capacity rule); LIRE keeps POSTINGS
healthy but nothing rebalanced SHARDS when adds concentrate on one.
This probe runs the journey end to end on disk shards:

  P1  build: clustered corpus -> heads -> routed postings -> 4 k-means
      disk shards (center-routed scatter_topk=2). Baseline recall@10,
      single-query p50, and deadline-partial rate at a fixed budget.
  P2  concentrated adds near ONE shard's heads (assign_replicas against
      the existing heads — the SPFresh append path), posting view
      unioned. Reconstructing the aggregator over the grown postings
      rebuilds ONLY the dirtied shards' stores (per-shard fingerprint
      gate); untouched shard stores must be byte-identical. Overloaded
      state re-measured: recall, p50, partial rate at the same budget.
  P3  overflow detected (shard rows > budget) -> split_shard(): 2-means
      over that shard's head centroids, two new disk shards built from
      partition-pruned scans of its heads only. Re-measured: recall,
      p50, partial rate; bytes written vs total store bytes; other
      shards byte-identical through the whole journey.

Output: PROBE_SHARD_GROWTH.json + SCALING.md-ready numbers printed.
Usage: python tools/probe_shard_growth.py [--n 400000] [--dim 16]
       [--queries 256] [--budget-ms auto]
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

WORK = "/tmp/shard_growth"


def _arg(name: str, default: str) -> str:
    return (
        sys.argv[sys.argv.index(name) + 1] if name in sys.argv else default
    )


def store_digest(store_dir: str) -> str:
    h = hashlib.sha256()
    for f in sorted(os.listdir(store_dir)):
        p = os.path.join(store_dir, f)
        with open(p, "rb") as fh:
            h.update(f.encode())
            h.update(fh.read())
    return h.hexdigest()[:16]


def main() -> None:
    n = int(_arg("--n", "400000"))
    dim = int(_arg("--dim", "16"))
    n_q = int(_arg("--queries", "256"))
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK)
    out: dict = {"n": n, "dim": dim, "phases": {}}

    os.environ.setdefault("SPTAG_SPARK_DRIVER_MEM", "40g")
    import pandas as pd
    from pyspark.sql import functions as F

    from sptag_spark.index.postings import build_postings
    from sptag_spark.serving_local import ShardedSpannAggregator
    from sptag_spark.session import get_spark

    spark = get_spark("probe-shard-growth", cpus=32, shuffle_partitions=32)
    rng = np.random.default_rng(23)
    sites = rng.normal(size=(256, dim)) * 50.0
    bsites = spark.sparkContext.broadcast(sites)

    def gen(it):
        for pdf in it:
            ids = pdf["id"].to_numpy(np.int64)
            r = np.random.default_rng(31 + int(ids[0]))
            a = r.integers(0, len(bsites.value), size=len(ids))
            V = bsites.value[a] + r.normal(size=(len(ids), dim))
            yield pd.DataFrame(
                {"id": ids, "vector": [row.astype(np.float32) for row in V]}
            )

    vecs = (
        spark.range(n)
        .repartition(32)
        .mapInPandas(gen, "id long, vector array<float>")
        .persist()
    )
    vecs.count()
    heads = (
        vecs.sample(fraction=min(1.0, 16000 * 1.3 / n), seed=7)
        .limit(16000)
        .selectExpr("id as head_id", "vector")
        .persist()
    )
    n_heads = heads.count()
    t0 = time.time()
    postings = build_postings(vecs, heads).persist()
    post_rows = postings.count()
    build_wall = time.time() - t0
    store_dir = os.path.join(WORK, "stores")
    t0 = time.time()
    agg = ShardedSpannAggregator(
        heads, postings, n_shards=4, store_dir=store_dir,
        scatter_topk=2, split="kmeans",
    )
    store_wall = time.time() - t0
    out["phases"]["p1_build"] = {
        "heads": n_heads,
        "posting_rows": post_rows,
        "posting_build_s": round(build_wall, 1),
        "store_build_s": round(store_wall, 1),
        "rows_per_shard": agg.shard_posting_rows(),
    }
    print(json.dumps(out["phases"]["p1_build"]), flush=True)

    # queries + exact truth from the generator (corpus rebuilt in RAM)
    per = n // 32
    # ids assigned by spark.range().repartition are not contiguous per
    # file; rebuild truth from the DataFrame instead (one collect of the
    # sampled query neighborhoods is too broad — use a spark-side exact
    # knn over sampled queries)
    qrows = vecs.sample(fraction=min(1.0, n_q * 1.3 / n), seed=99).limit(
        n_q
    ).collect()
    Q = np.array([r["vector"] for r in qrows], dtype=np.float64)
    Q += np.random.default_rng(99).normal(scale=0.3, size=Q.shape)
    qlist = [(i, Q[i]) for i in range(len(Q))]

    from sptag_spark.operators.knn import knn

    qdf = spark.createDataFrame(
        [(i, [float(v) for v in Q[i]]) for i in range(len(Q))],
        "query_id long, vector array<float>",
    )

    def exact_truth(corpus) -> dict[int, set]:
        t: dict[int, set] = {}
        for r in knn(corpus, qdf, k=10, metric="l2").collect():
            t.setdefault(int(r["query_id"]), set()).add(int(r["id"]))
        return t

    truth = exact_truth(vecs)

    def shard_p50s(agg, nprobe=24) -> list[float]:
        """Per-shard single-query p50 over the queries ROUTED to each
        shard — the hotspot signal concentrated adds create and a split
        removes."""
        out = []
        for rep in agg.replicas:
            lat = []
            for _, q in qlist[:48]:
                t1 = time.time()
                rep.search_one(q, k=10, nprobe=nprobe)
                lat.append((time.time() - t1) * 1000)
            lat.sort()
            out.append(round(lat[len(lat) // 2], 3))
        return out

    def measure(agg, budget_ms=None, nprobe=24):
        rows = agg.batch_search(qlist, k=10, nprobe=nprobe)
        by_q: dict[int, list[int]] = {}
        for r in rows:
            lst = by_q.setdefault(r[0], [])
            if len(lst) < 10:
                lst.append(int(r[2]))
        hits = sum(
            len(set(by_q.get(i, [])) & truth.get(i, set()))
            for i in range(len(Q))
        )
        lat = []
        for i, q in qlist[:96]:
            t1 = time.time()
            agg.search_one(q, k=10, nprobe=nprobe)
            lat.append((time.time() - t1) * 1000)
        lat.sort()
        res = {
            "recall_at_10": round(hits / (10 * len(Q)), 4),
            "p50_single_ms": round(lat[len(lat) // 2], 3),
            "p99_single_ms": round(lat[int(0.99 * (len(lat) - 1))], 3),
        }
        if budget_ms is not None:
            partials = 0
            for i, q in qlist[:96]:
                _, _, partial = agg.search_with_deadline(
                    q, k=10, nprobe=nprobe, budget_ms=budget_ms
                )
                partials += partial
            res["partial_rate"] = round(partials / 96, 3)
            res["budget_ms"] = budget_ms
        return res

    base = measure(agg)
    # tight enough that an overloaded shard can breach it: 1.6x the
    # baseline p99 (the deadline path adds ~0.3 ms of thread setup)
    budget_ms = float(
        _arg("--budget-ms", str(round(1.6 * base["p99_single_ms"], 2)))
    )
    base = measure(agg, budget_ms=budget_ms)
    base["shard_p50_ms"] = shard_p50s(agg)
    digests_before = {
        d: store_digest(os.path.join(store_dir, d))
        for d in sorted(os.listdir(store_dir))
    }
    out["phases"]["p1_serve"] = base
    print(json.dumps(base), flush=True)

    # P2: concentrated adds near the LARGEST shard's heads (1.5x its rows)
    jmax = int(np.argmax(agg.shard_posting_rows()))
    target_heads = agg.replicas[jmax].H
    add_n = int(1.5 * agg.shard_posting_rows()[jmax] / 3)  # ~1.5x rows at
    # ~3 replicas/vector
    hsel = np.random.default_rng(7).integers(0, len(target_heads), add_n)
    A = target_heads[hsel] + np.random.default_rng(8).normal(
        scale=0.5, size=(add_n, dim)
    )
    adds = spark.createDataFrame(
        [(n + i, [float(v) for v in A[i]]) for i in range(add_n)],
        "id long, vector array<float>",
    )
    from sptag_spark.index.postings import assign_replicas, cut_postings

    t0 = time.time()
    delta = assign_replicas(adds, heads).persist()
    delta.count()
    postings2 = postings.unionByName(delta).persist()
    postings2.count()
    add_wall = time.time() - t0
    t0 = time.time()
    agg2 = ShardedSpannAggregator(
        heads, postings2, n_shards=4, store_dir=store_dir,
        scatter_topk=2, split="kmeans",
    )
    regate_wall = time.time() - t0
    rows2 = agg2.shard_posting_rows()
    digests_mid = {
        d: store_digest(os.path.join(store_dir, d))
        for d in sorted(os.listdir(store_dir))
    }
    untouched_mid = [
        d for d in digests_before
        if digests_mid.get(d) == digests_before[d]
    ]
    # recall for P2/P3 is against the LIVE corpus truth (base + adds):
    # against the stale base truth the added near-duplicates displace
    # true neighbors and the figure conflates freshness with quality
    vecs2 = vecs.unionByName(adds).persist()
    vecs2.count()
    truth.clear()
    truth.update(exact_truth(vecs2))
    over = measure(agg2, budget_ms=budget_ms)
    out["phases"]["p2_overload"] = {
        "adds": add_n,
        "target_shard": jmax,
        "rows_per_shard": rows2,
        "add_wall_s": round(add_wall, 1),
        "store_regate_s": round(regate_wall, 1),
        "untouched_stores": untouched_mid,
        "shard_p50_ms": shard_p50s(agg2),
        **over,
    }
    print(json.dumps(out["phases"]["p2_overload"]), flush=True)

    # P3: overflow -> split only the overloaded shard
    budget_rows = int(1.2 * max(out["phases"]["p1_build"]["rows_per_shard"]))
    assert rows2[jmax] > budget_rows, "fixture failed to overflow"
    t0 = time.time()
    rep = agg2.split_shard(jmax, heads, postings2, store_dir=store_dir)
    split_wall = time.time() - t0
    new_bytes = sum(
        os.path.getsize(os.path.join(d, f))
        for d in rep["store_dirs"]
        for f in os.listdir(d)
    )
    total_bytes = sum(
        os.path.getsize(os.path.join(store_dir, d, f))
        for d in os.listdir(store_dir)
        for f in os.listdir(os.path.join(store_dir, d))
    )
    digests_after = {
        d: store_digest(os.path.join(store_dir, d))
        for d in sorted(os.listdir(store_dir))
        if d in digests_before and d != f"shard_{jmax}"
    }
    untouched_after = [
        d for d in digests_after if digests_after[d] == digests_mid.get(d)
    ]
    post = measure(agg2, budget_ms=budget_ms)
    post["shard_p50_ms"] = shard_p50s(agg2)
    out["phases"]["p3_split"] = {
        "split_report": rep,
        "split_wall_s": round(split_wall, 1),
        "rows_per_shard": agg2.shard_posting_rows(),
        "bytes_written": new_bytes,
        "total_store_bytes": total_bytes,
        "untouched_stores": untouched_after,
        **post,
    }
    print(json.dumps(out["phases"]["p3_split"]), flush=True)

    with open("/root/repo/PROBE_SHARD_GROWTH.json", "w") as f:
        json.dump(out, f, indent=1)
    print("WROTE /root/repo/PROBE_SHARD_GROWTH.json", flush=True)


if __name__ == "__main__":
    main()
