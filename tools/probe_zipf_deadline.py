"""Skewed-query deadline study on the NETWORK aggregator (r12 VERDICT #4).

All prior routing probes drove uniform query mixes; real traffic hammers
hot heads. This probe drives a Zipf-skewed mix at a 4-shard network
deployment (real server processes, real sockets, center-routed scatter,
per-query deadline) and exercises the OBSERVED-LATENCY rebalance loop:

  P1  build: clustered corpus -> heads -> routed postings -> 4 k-means
      disk shards; concentrated adds overload ONE shard (the SPFresh
      append path), so the deployment starts with a genuinely hot+big
      shard — the state a static BalancedDataPartition layout drifts
      into (reference frame: AggregatorService.cpp:280-323 timeout
      semantics; BalancedDataPartition sizes shards once, offline).
  P2  drive: Zipf(alpha) site popularity aimed at the hot shard's
      region, CONCURRENT clients, search_with_deadline at a budget
      calibrated from the cold shards' observed p99. Recorded: overall
      partial rate, per-shard p50/p99 and deadline-miss attribution
      (RemoteReplicaAggregator.tracker — ShardLatencyTracker).
  P3  trigger + split: the split decision comes from
      tracker.hot_shard() — the shard whose OBSERVED rolling p99 stands
      out — NOT from row counts. split_shard() builds the two halves
      (untouched shard stores byte-identical), two new server processes
      spawn from the new stores, the aggregator reloads with 5 backends,
      and the SAME Zipf mix is re-driven: per-shard p99 and the
      partial rate must recover.

Output: PROBE_ZIPF_DEADLINE.json + printed phase lines.
Usage: python tools/probe_zipf_deadline.py [--n 400000] [--dim 16]
       [--queries 1500] [--alpha 1.15] [--concurrency 8]
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

WORK = "/tmp/zipf_deadline"


def _arg(name: str, default: str) -> str:
    return (
        sys.argv[sys.argv.index(name) + 1] if name in sys.argv else default
    )


def store_digest(store_dir: str) -> str:
    h = hashlib.sha256()
    for f in sorted(os.listdir(store_dir)):
        with open(os.path.join(store_dir, f), "rb") as fh:
            h.update(f.encode())
            h.update(fh.read())
    return h.hexdigest()[:16]


def _serve_proc_main(store_dir, k, nprobe, ready, stop_ev):
    """One shard server PROCESS: opens the packed store from FILES (the
    serving-node cold start — no Spark in the child) and answers over the
    newline TCP wire format."""
    from sptag_spark.server import AnnTcpServer
    from sptag_spark.serving_local import DiskSpannReplica

    rep = DiskSpannReplica.from_store(store_dir)
    srv = AnnTcpServer(rep, k=k, nprobe=nprobe).start()
    ready.put(srv.address)
    stop_ev.wait()
    srv.stop()


def main() -> None:
    n = int(_arg("--n", "400000"))
    dim = int(_arg("--dim", "16"))
    n_q = int(_arg("--queries", "1500"))
    alpha = float(_arg("--alpha", "1.15"))
    conc = int(_arg("--concurrency", "8"))
    nprobe = 24
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK)
    out: dict = {
        "n": n, "dim": dim, "n_queries": n_q, "zipf_alpha": alpha,
        "concurrency": conc, "nprobe": nprobe, "phases": {},
    }

    os.environ.setdefault("SPTAG_SPARK_DRIVER_MEM", "40g")
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401

    from sptag_spark.index.postings import assign_replicas, build_postings
    from sptag_spark.serving_local import ShardedSpannAggregator
    from sptag_spark.session import get_spark

    spark = get_spark("probe-zipf-deadline", cpus=32, shuffle_partitions=32)
    rng = np.random.default_rng(41)
    sites = rng.normal(size=(256, dim)) * 50.0
    bsites = spark.sparkContext.broadcast(sites)

    def gen(it):
        for pdf in it:
            ids = pdf["id"].to_numpy(np.int64)
            r = np.random.default_rng(57 + int(ids[0]))
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
    agg = ShardedSpannAggregator(
        heads, postings, n_shards=4, store_dir=store_dir,
        scatter_topk=2, split="kmeans",
    )
    rows0 = agg.shard_posting_rows()

    # overload ONE shard with concentrated adds (3x its rows) — the
    # SPFresh append path against the existing heads
    jhot = int(np.argmax(rows0))
    hot_heads = agg.replicas[jhot].H
    add_n = int(3.0 * rows0[jhot] / 3)  # ~3x rows at ~3 replicas/vector
    bhot = spark.sparkContext.broadcast(hot_heads)

    def genadds(it):
        for pdf in it:
            ids = pdf["id"].to_numpy(np.int64)
            r = np.random.default_rng(97 + int(ids[0]))
            a = r.integers(0, len(bhot.value), size=len(ids))
            V = bhot.value[a] + r.normal(scale=0.5, size=(len(ids), dim))
            yield pd.DataFrame(
                {
                    "id": ids + n,
                    "vector": [row.astype(np.float32) for row in V],
                }
            )

    adds = spark.range(add_n).repartition(32).mapInPandas(
        genadds, "id long, vector array<float>"
    )
    delta = assign_replicas(adds, heads).persist()
    delta.count()
    postings2 = postings.unionByName(delta).persist()
    postings2.count()
    agg2 = ShardedSpannAggregator(
        heads, postings2, n_shards=4, store_dir=store_dir,
        scatter_topk=2, split="kmeans",
    )
    rows2 = agg2.shard_posting_rows()
    out["phases"]["p1_build"] = {
        "heads": n_heads,
        "posting_rows": post_rows,
        "posting_build_s": round(build_wall, 1),
        "rows_per_shard_before": rows0,
        "hot_shard": jhot,
        "adds": add_n,
        "rows_per_shard_overloaded": rows2,
    }
    print(json.dumps(out["phases"]["p1_build"]), flush=True)
    digests_before = {
        d: store_digest(os.path.join(store_dir, d))
        for d in sorted(os.listdir(store_dir))
    }

    # Zipf query mix aimed at the hot shard: site popularity rank 1..m
    # assigned to the sites nearest the hot shard's center — rank r drawn
    # with p(r) ~ 1/r^alpha (truncated at |sites|)
    hot_center = agg2.centers[jhot]
    order = np.argsort(((sites - hot_center) ** 2).sum(axis=1))
    qr = np.random.default_rng(3)
    ranks = qr.zipf(alpha, size=4 * n_q)
    ranks = ranks[ranks <= len(sites)][:n_q]
    assert len(ranks) == n_q, "raise the oversample factor"
    qsites = sites[order[ranks - 1]]
    Q = qsites + qr.normal(scale=0.8, size=(n_q, dim))
    site_shard = np.array(
        [
            int(np.argmin(((agg2.centers - s) ** 2).sum(axis=1)))
            for s in sites
        ]
    )
    hot_share = float((site_shard[order[ranks - 1]] == jhot).mean())
    out["phases"]["p1_build"]["hot_traffic_share"] = round(hot_share, 3)

    import multiprocessing as mp

    from sptag_spark.server import RemoteReplicaAggregator

    ctx = mp.get_context("spawn")
    stop_ev = ctx.Event()
    procs: list = []
    shard_dirs = [
        os.path.join(store_dir, f"shard_{i}") for i in range(4)
    ]

    def spawn(dirs):
        ready_q = ctx.Queue()
        ps = [
            ctx.Process(
                target=_serve_proc_main,
                args=(d, 10, nprobe, ready_q, stop_ev),
                daemon=True,
            )
            for d in dirs
        ]
        for p in ps:
            p.start()
        addrs = [ready_q.get(timeout=180) for _ in ps]
        return ps, addrs

    def drive(ragg, budget_ms):
        """Concurrent Zipf drive: ``conc`` client threads issuing
        deadline searches — the hot server queues, its tail grows."""
        import concurrent.futures as cf

        partials = 0
        with cf.ThreadPoolExecutor(max_workers=conc) as ex:
            futs = [
                ex.submit(
                    ragg.search_with_deadline, Q[i], 10,
                    budget_ms=budget_ms,
                )
                for i in range(n_q)
            ]
            for f in futs:
                partials += bool(f.result()[2])
        time.sleep(0.3)  # let straggler recorders land
        return partials / n_q

    try:
        procs, addrs = spawn(shard_dirs)
        ragg = RemoteReplicaAggregator(
            addrs, centers=agg2.centers, scatter_topk=2
        )
        # budget calibration: uncapped drive fills the tracker; budget =
        # 1.5x the median of the COLD shards' observed p99 (cold = not
        # the row-count argmax — the calibration may not name jhot)
        import concurrent.futures as cf

        with cf.ThreadPoolExecutor(max_workers=conc) as ex:
            list(
                ex.map(
                    lambda i: ragg.search_one(Q[i], 10),
                    range(min(n_q, 512)),
                )
            )
        time.sleep(0.3)
        cal = ragg.tracker.stats()
        cold_p99 = sorted(
            s["p99_ms"]
            for j, s in enumerate(cal)
            if j != jhot and s["p99_ms"] is not None
        )
        budget_ms = round(1.5 * cold_p99[len(cold_p99) // 2], 2)
        out["budget_ms"] = budget_ms
        out["phases"]["p2_calibration"] = {"per_shard": cal}
        print(json.dumps({"budget_ms": budget_ms, "cal": cal}), flush=True)

        ragg.tracker = type(ragg.tracker)(len(ragg.replicas))
        partial_rate = drive(ragg, budget_ms)
        before = ragg.tracker.stats()
        trigger = ragg.tracker.hot_shard(factor=1.5)
        out["phases"]["p2_skewed"] = {
            "partial_rate": round(partial_rate, 4),
            "per_shard": before,
            "latency_trigger": trigger,
            "rowcount_argmax": int(np.argmax(rows2)),
        }
        print(json.dumps(out["phases"]["p2_skewed"]), flush=True)
        assert trigger is not None, "no shard stood out — raise skew"

        # P3: split the shard the LATENCY trigger named
        t0 = time.time()
        rep = agg2.split_shard(
            trigger, heads, postings2, store_dir=store_dir
        )
        split_wall = time.time() - t0
        digests_after = {
            d: store_digest(os.path.join(store_dir, d))
            for d in sorted(os.listdir(store_dir))
            if d in digests_before and d != f"shard_{trigger}"
        }
        untouched = [
            d
            for d in digests_after
            if digests_after[d] == digests_before[d]
        ]
        new_procs, new_addrs = spawn(rep["store_dirs"])
        procs += new_procs
        kept = [a for i, a in enumerate(addrs) if i != trigger]
        all_addrs = (
            kept[:trigger] + new_addrs + kept[trigger:]
        )
        ragg3 = RemoteReplicaAggregator(
            all_addrs, centers=agg2.centers, scatter_topk=2
        )
        partial_rate3 = drive(ragg3, budget_ms)
        after = ragg3.tracker.stats()
        out["phases"]["p3_split"] = {
            "split_report": rep,
            "split_wall_s": round(split_wall, 1),
            "untouched_stores": untouched,
            "partial_rate": round(partial_rate3, 4),
            "per_shard": after,
            "post_trigger": ragg3.tracker.hot_shard(factor=1.5),
        }
        print(json.dumps(out["phases"]["p3_split"]), flush=True)
    finally:
        stop_ev.set()
        for p in procs:
            p.join(timeout=10)
            if p.is_alive():
                p.terminate()

    with open("/root/repo/PROBE_ZIPF_DEADLINE.json", "w") as f:
        json.dump(out, f, indent=1)
    print("WROTE /root/repo/PROBE_ZIPF_DEADLINE.json", flush=True)


if __name__ == "__main__":
    main()
