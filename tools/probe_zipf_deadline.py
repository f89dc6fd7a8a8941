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
    ready.put((store_dir, srv.address))
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

    jhot = int(np.argmax(rows0))
    out["phases"]["p1_build"] = {
        "heads": n_heads,
        "posting_rows": post_rows,
        "posting_build_s": round(build_wall, 1),
        "rows_per_shard_before": rows0,
        "hot_shard": jhot,
    }

    # Zipf query mix aimed at the hot shard: site popularity rank 1..m
    # assigned to the sites nearest the hot shard's center — rank r drawn
    # with p(r) ~ 1/r^alpha (truncated at |sites|)
    hot_center = agg.centers[jhot]
    order = np.argsort(((sites - hot_center) ** 2).sum(axis=1))
    qr = np.random.default_rng(3)
    ranks = qr.zipf(alpha, size=4 * n_q)
    ranks = ranks[ranks <= len(sites)][:n_q]
    assert len(ranks) == n_q, "raise the oversample factor"
    qsites = sites[order[ranks - 1]]
    Q = qsites + qr.normal(scale=0.8, size=(n_q, dim))
    site_shard = np.array(
        [
            int(np.argmin(((agg.centers - s) ** 2).sum(axis=1)))
            for s in sites
        ]
    )
    hot_share = float((site_shard[order[ranks - 1]] == jhot).mean())
    out["phases"]["p1_build"]["hot_traffic_share"] = round(hot_share, 3)
    print(json.dumps(out["phases"]["p1_build"]), flush=True)

    import multiprocessing as mp

    from sptag_spark.server import RemoteReplicaAggregator

    ctx = mp.get_context("spawn")
    procs: list = []
    stop_evs: list = []
    shard_dirs = [
        os.path.join(store_dir, f"shard_{i}") for i in range(4)
    ]

    def spawn(dirs):
        ready_q = ctx.Queue()
        ev = ctx.Event()
        stop_evs.append(ev)
        ps = [
            ctx.Process(
                target=_serve_proc_main,
                args=(d, 10, nprobe, ready_q, ev),
                daemon=True,
            )
            for d in dirs
        ]
        for p in ps:
            p.start()
        # children report ready in COMPLETION order — re-key by store
        # dir so the address list aligns with the centers/replica order
        # (a permuted list silently misroutes the center scatter)
        by_dir = dict(ready_q.get(timeout=180) for _ in ps)
        return ps, [by_dir[d] for d in dirs]

    def overload():
        """Concentrated adds (3x the hot shard's rows) — the SPFresh
        append path against the existing heads; the dirty shard's store
        rebuilds in place, the others are reused byte-identical."""
        hot_heads = agg.replicas[jhot].H
        # ~6x the shard's rows (at ~3 replicas/vector): the overload has
        # to push the hot shard's tail PAST an SLO calibrated at 1.3x the
        # healthy deployment's worst p99 — a 4x overload only doubled p50
        # (wire+route overhead floors the per-call cost) and slid under
        add_n = int(6.0 * rows0[jhot] / 3)
        bhot = spark.sparkContext.broadcast(hot_heads)

        def genadds(it):
            for pdf in it:
                ids = pdf["id"].to_numpy(np.int64)
                r = np.random.default_rng(97 + int(ids[0]))
                a = r.integers(0, len(bhot.value), size=len(ids))
                V = bhot.value[a] + r.normal(
                    scale=0.5, size=(len(ids), dim)
                )
                yield pd.DataFrame(
                    {
                        "id": ids + n,
                        "vector": [
                            row.astype(np.float32) for row in V
                        ],
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
        return add_n, postings2, agg2

    def drive(ragg, budget_ms):
        """SERIAL Zipf deadline drive. Deadline SLOs are per-query; a
        concurrent client pool was measured to inflate every shard's p99
        with CLIENT-side queueing noise (fresh per-call executors + TCP
        connects) until it swamped the 3x per-query scan-cost signal the
        overloaded shard actually shows. Serial keeps the observed
        latency = the shard's serving cost + wire, which is the signal
        the rebalance trigger must read. The Zipf mix still routes most
        observations through the hot shard."""
        partials = 0
        for i in range(n_q):
            partials += bool(
                ragg.search_with_deadline(
                    Q[i], 10, budget_ms=budget_ms
                )[2]
            )
        time.sleep(0.3)  # let straggler recorders land
        return partials / n_q

    min_misses = max(10, n_q // 100)
    try:
        # P1b: the HEALTHY deployment defines the SLO. Budget is
        # calibrated ON THE DEADLINE PATH itself (per-call executor +
        # fresh TCP connects are part of what the budget must cover):
        # a generous-budget drive of the SAME Zipf mix fills the
        # tracker; budget = 1.3x the worst per-shard p99 a BALANCED
        # deployment shows under this concurrency.
        base_procs, base_addrs = spawn(shard_dirs)
        ragg0 = RemoteReplicaAggregator(
            base_addrs, centers=agg.centers, scatter_topk=2
        )
        drive(ragg0, budget_ms=10_000.0)
        cal = ragg0.tracker.stats()
        budget_ms = round(
            1.3
            * max(
                s["p99_ms"] for s in cal if s["p99_ms"] is not None
            ),
            2,
        )
        ragg0.tracker = type(ragg0.tracker)(len(ragg0.replicas))
        base_partial = drive(ragg0, budget_ms)
        out["budget_ms"] = budget_ms
        out["phases"]["p1_healthy"] = {
            "calibration_per_shard": cal,
            "partial_rate": round(base_partial, 4),
            "per_shard": ragg0.tracker.stats(),
        }
        print(
            json.dumps(
                {
                    "budget_ms": budget_ms,
                    "healthy_partial": round(base_partial, 4),
                    "cal": cal,
                }
            ),
            flush=True,
        )
        stop_evs[0].set()  # base servers down before the store rebuild
        for p in base_procs:
            p.join(timeout=10)

        # P2: overload + re-serve at the SAME budget — the SLO breach
        add_n, postings2, agg2 = overload()
        rows2 = agg2.shard_posting_rows()
        digests_before = {
            d: store_digest(os.path.join(store_dir, d))
            for d in sorted(os.listdir(store_dir))
            if d.startswith("shard_") and "_s" not in d
        }
        new_procs, addrs = spawn(shard_dirs)
        procs += new_procs
        ragg = RemoteReplicaAggregator(
            addrs, centers=agg2.centers, scatter_topk=2
        )
        partial_rate = drive(ragg, budget_ms)
        before = ragg.tracker.stats()
        trigger = ragg.tracker.hot_shard(factor=1.5, min_misses=min_misses)
        out["phases"]["p2_skewed"] = {
            "adds": add_n,
            "rows_per_shard_overloaded": rows2,
            "partial_rate": round(partial_rate, 4),
            "per_shard": before,
            "latency_trigger": trigger,
            "rowcount_argmax": int(np.argmax(rows2)),
        }
        print(json.dumps(out["phases"]["p2_skewed"]), flush=True)
        assert trigger is not None, "no shard stood out — raise skew"

        # P3: the trigger->split->re-drive LOOP — the operational
        # rebalance cycle. Each round splits the shard the OBSERVED-
        # latency trigger names, respawns only the two new halves'
        # servers, reloads the aggregator, and re-drives the same Zipf
        # mix; the loop converges when the trigger goes silent (an
        # uneven 2-means can leave one half still hot — the trigger
        # catches it and the next round fixes it).
        dirs = list(shard_dirs)
        rounds = []
        cur = ragg
        while trigger is not None and len(rounds) < 4:
            t0 = time.time()
            rep = agg2.split_shard(
                trigger, heads, postings2, store_dir=store_dir
            )
            split_wall = time.time() - t0
            untouched = [
                d
                for d in sorted(os.listdir(store_dir))
                if d in digests_before
                and store_digest(os.path.join(store_dir, d))
                == digests_before[d]
            ]
            new_procs, new_addrs = spawn(rep["store_dirs"])
            procs += new_procs
            addrs = (
                addrs[:trigger] + new_addrs + addrs[trigger + 1 :]
            )
            dirs = dirs[:trigger] + rep["store_dirs"] + dirs[trigger + 1 :]
            cur = RemoteReplicaAggregator(
                addrs, centers=agg2.centers, scatter_topk=2
            )
            pr = drive(cur, budget_ms)
            # converged when the SLO is back: partial rate within noise
            # of the healthy deployment's — the trigger may still name a
            # merely-bigger shard, but the operator stops splitting when
            # the deadline behavior recovered
            nxt = (
                None
                if pr <= max(2.0 * base_partial, 0.01)
                else cur.tracker.hot_shard(
                    factor=1.5, min_misses=min_misses
                )
            )
            rounds.append(
                {
                    "split_report": rep,
                    "split_wall_s": round(split_wall, 1),
                    "untouched_original_stores": untouched,
                    "partial_rate": round(pr, 4),
                    "per_shard": cur.tracker.stats(),
                    "next_trigger": nxt,
                }
            )
            print(json.dumps(rounds[-1]), flush=True)
            trigger = nxt
        out["phases"]["p3_split_rounds"] = rounds
        out["phases"]["p3_summary"] = {
            "rounds": len(rounds),
            "healthy_partial_rate": round(base_partial, 4),
            "partial_rate_path": [
                out["phases"]["p2_skewed"]["partial_rate"],
                *[r["partial_rate"] for r in rounds],
            ],
            "converged": trigger is None,
            "final_n_shards": len(addrs),
        }
        print(json.dumps(out["phases"]["p3_summary"]), flush=True)
    finally:
        for ev in stop_evs:
            ev.set()
        for p in procs:
            p.join(timeout=10)
            if p.is_alive():
                p.terminate()

    with open("/root/repo/PROBE_ZIPF_DEADLINE.json", "w") as f:
        json.dump(out, f, indent=1)
    print("WROTE /root/repo/PROBE_ZIPF_DEADLINE.json", flush=True)


if __name__ == "__main__":
    main()
