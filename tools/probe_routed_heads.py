"""Probe: serve-side routed head search vs flat head scan (VERDICT r7 #5).

At SPACEV1B-like scale the head table is ~10^8 rows and per-query FLAT
head scoring is the serve bottleneck; the reference searches its head BKT
(`SPANNIndex.cpp:192-216`), never scans. This probe measures the repo's
two-level routed path (`index/ann.py _route_grouped`) against the flat
distributed kernel at a ×1024-style head count (default 204,800 heads,
64-dim — 1024× the sf0.1 SPANN head table):

- wall clock for one 128-query routing call, flat vs grouped
- per-query PAIR WORK (heads actually scored): flat = k;
  grouped = g + fanout_q · spill·k/g  (the sublinear term)
- head-level recall of the grouped selection vs the flat top-nprobe

Heads are drawn from a clustered mixture (256 sites + noise) — the shape
real embedding corpora have; see tests/test_ann.py for the unstructured
worst case. Usage: python tools/probe_routed_heads.py [--heads 204800]
[--queries 128] [--nprobe 8] [--dim 64]
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
    k = int(_arg("--heads", "204800"))
    nq = int(_arg("--queries", "128"))
    nprobe = int(_arg("--nprobe", "8"))
    dim = int(_arg("--dim", "64"))

    import sptag_spark.index.ann as A
    from sptag_spark.index.postings import ROUTE_FANOUT
    from sptag_spark.session import get_spark

    spark = get_spark("probe-routed-heads")
    rng = np.random.default_rng(11)
    sites = rng.normal(size=(256, dim)) * 4.0
    assign = rng.integers(0, 256, size=k)
    H = (sites[assign] + rng.normal(size=(k, dim))).astype(np.float32)
    heads = spark.createDataFrame(
        [(i, H[i].tolist()) for i in range(k)],
        "head_id long, vector array<float>",
    ).persist()
    heads.count()
    Q = (sites[rng.integers(0, 256, size=nq)] + rng.normal(size=(nq, dim))).astype(
        np.float32
    )
    qs = spark.createDataFrame(
        [(i, Q[i].tolist()) for i in range(nq)],
        "query_id long, vector array<float>",
    ).persist()
    qs.count()

    def routes(df):
        return {(r["query_id"], r["head_id"]) for r in df.collect()}

    # flat distributed kernel (force: disable the grouped gate)
    saved_gate = A.ROUTE_GROUPED_MIN_HEADS
    A.ROUTE_GROUPED_MIN_HEADS = 1 << 60
    flat_heads = heads.alias("flat")
    flat_heads._sptag_cached_count = k
    t0 = time.time()
    flat = routes(A.route_queries(qs, flat_heads, nprobe=nprobe))
    flat_wall = time.time() - t0
    t0 = time.time()
    routes(A.route_queries(qs, flat_heads, nprobe=nprobe))
    flat_wall2 = time.time() - t0
    A.ROUTE_GROUPED_MIN_HEADS = saved_gate

    grp_heads = heads.alias("grp")
    grp_heads._sptag_cached_count = k

    def grouped_routes():
        # force the grouped PATH (route_queries' dispatch would hand
        # all-groups-probed mega batches back to the flat kernel; this
        # probe measures the path itself at every batch size)
        return routes(
            A._ratio_cut(
                A._route_grouped(qs, grp_heads, nprobe, "l2"),
                A.MAX_DIST_RATIO,
            )
        )

    t0 = time.time()
    grp = grouped_routes()
    grp_wall_cold = time.time() - t0  # includes one-time group build
    t0 = time.time()
    grp2 = grouped_routes()
    grp_wall_warm = time.time() - t0

    gc, _ = grp_heads._sptag_head_groups
    g = len(gc)
    fanout_q = min(g, max(ROUTE_FANOUT, 4 * nprobe))
    pair_flat = k
    pair_grouped = g + fanout_q * (A._GROUP_SPILL * k // g)
    print(
        json.dumps(
            {
                "heads": k,
                "queries": nq,
                "nprobe": nprobe,
                "groups": g,
                "fanout_q": fanout_q,
                "per_query_heads_scored_flat": pair_flat,
                "per_query_heads_scored_grouped": pair_grouped,
                "work_ratio": round(pair_flat / pair_grouped, 1),
                "wall_flat_sec": [round(flat_wall, 2), round(flat_wall2, 2)],
                "wall_grouped_sec_cold_build": round(grp_wall_cold, 2),
                "wall_grouped_sec_warm": round(grp_wall_warm, 2),
                "head_recall_vs_flat": round(
                    len(flat & grp) / max(1, len(flat)), 4
                ),
                "head_recall_run2": round(
                    len(flat & grp2) / max(1, len(flat)), 4
                ),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
