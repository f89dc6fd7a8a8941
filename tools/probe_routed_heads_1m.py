"""Probe: grouped head routing vs flat kernel at 1M-4M heads (VERDICT r8 #5).

The r8 probe showed the grouped path does 16-33x less head-scoring WORK at
recall ~1.0, but its local WALL trailed the flat kernel below ~1M heads —
both paths were stage-floor-bound. This probe generates head tables big
enough (default sweep 262144 / 1M / 2M / 4M, 64-dim, clustered mixture)
that the flat kernel's per-call columnar scan + BLAS finally exceeds the
stage floor, and records the wall CROSSOVER the dispatch gate
(ROUTE_GROUPED_MIN_HEADS) should sit below.

Heads are generated DISTRIBUTED (mapInPandas RNG, parquet in /tmp/routed1m)
— a 4M-row createDataFrame from the driver would dominate the probe.
Usage: python tools/probe_routed_heads_1m.py [--heads 262144,1048576,...]
       [--queries 128] [--nprobe 8] [--dim 64] [--reps 3]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

WORK = "/tmp/routed1m"


def _arg(name: str, default: str) -> str:
    return (
        sys.argv[sys.argv.index(name) + 1] if name in sys.argv else default
    )


def gen_heads(spark, n: int, dim: int, n_sites: int = 256):
    path = f"{WORK}/heads_{n}_{dim}.parquet"
    if not os.path.isdir(path):
        rng = np.random.default_rng(11)
        sites = (rng.normal(size=(n_sites, dim)) * 4.0).astype(np.float64)
        bsites = spark.sparkContext.broadcast(sites)

        def gen(it):
            import pandas as pd

            for pdf in it:
                ids = pdf["id"].to_numpy(np.int64)
                r = np.random.default_rng(17 + int(ids[0]))
                S = bsites.value
                assign = r.integers(0, len(S), size=len(ids))
                H = S[assign] + r.normal(size=(len(ids), S.shape[1]))
                yield pd.DataFrame(
                    {
                        "head_id": ids,
                        "vector": [row.astype(np.float32) for row in H],
                    }
                )

        spark.range(n).repartition(32).mapInPandas(
            gen, "head_id long, vector array<float>"
        ).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def main() -> None:
    head_counts = [
        int(x)
        for x in _arg("--heads", "262144,1048576,2097152,4194304").split(",")
    ]
    nq = int(_arg("--queries", "128"))
    nprobe = int(_arg("--nprobe", "8"))
    dim = int(_arg("--dim", "64"))
    reps = int(_arg("--reps", "3"))

    import sptag_spark.index.ann as A
    from sptag_spark.calibration import gemm_calibration
    from sptag_spark.index.postings import ROUTE_FANOUT
    from sptag_spark.session import get_spark

    print(json.dumps({"calibration": gemm_calibration()}), flush=True)
    os.environ.setdefault("SPTAG_SPARK_DRIVER_MEM", "48g")
    spark = get_spark("probe-routed-1m", cpus=32, shuffle_partitions=64)
    os.makedirs(WORK, exist_ok=True)

    rng = np.random.default_rng(11)
    sites = (rng.normal(size=(256, dim)) * 4.0).astype(np.float64)
    Q = sites[rng.integers(0, 256, size=nq)] + rng.normal(size=(nq, dim))
    qs = spark.createDataFrame(
        [(i, Q[i].astype(np.float32).tolist()) for i in range(nq)],
        "query_id long, vector array<float>",
    ).persist()
    qs.count()

    def routes(df):
        return {(r["query_id"], r["head_id"]) for r in df.collect()}

    for k in head_counts:
        heads = gen_heads(spark, k, dim).persist()
        heads._sptag_cached_count = heads.count()

        # flat kernel walls (gate forced high)
        saved = A.ROUTE_GROUPED_MIN_HEADS
        A.ROUTE_GROUPED_MIN_HEADS = 1 << 60
        flat_walls = []
        flat = None
        for _ in range(reps):
            t0 = time.time()
            flat = routes(A.route_queries(qs, heads, nprobe=nprobe))
            flat_walls.append(round(time.time() - t0, 2))
        A.ROUTE_GROUPED_MIN_HEADS = saved

        # grouped path: one-time structure build, then warm walls
        t0 = time.time()
        A._head_group_index(heads, "l2")
        build_wall = round(time.time() - t0, 2)
        grp_walls = []
        grp = None
        for _ in range(reps):
            t0 = time.time()
            grp = routes(
                A._ratio_cut(
                    A._route_grouped(qs, heads, nprobe, "l2"),
                    A.MAX_DIST_RATIO,
                )
            )
            grp_walls.append(round(time.time() - t0, 2))

        gc, _ = heads._sptag_head_groups
        g = len(gc)
        fanout_q = min(g, max(ROUTE_FANOUT, 4 * nprobe))
        print(
            json.dumps(
                {
                    "heads": k,
                    "groups": g,
                    "fanout_q": fanout_q,
                    "wall_flat_sec": flat_walls,
                    "group_build_sec": build_wall,
                    "wall_grouped_sec": grp_walls,
                    "head_recall_vs_flat": round(
                        len(flat & grp) / max(1, len(flat)), 4
                    ),
                    "work_flat_per_q": k,
                    "work_grouped_per_q": g
                    + fanout_q * (A._GROUP_SPILL * k // g),
                }
            ),
            flush=True,
        )
        heads.unpersist()
    print(json.dumps({"calibration_after": gemm_calibration()}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
