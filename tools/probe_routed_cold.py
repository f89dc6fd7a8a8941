"""Probe: grouped-routing disk store under a COLD page cache (VERDICT r9 #6).

The r9 probes showed the pruned-partition layout only reaches PARITY with
the flat kernel on a cache-warm node — the 16-73× per-query work reduction
never surfaced as wall because the whole head table sat in the page cache.
This probe measures the regime the layout exists for: a serve node whose
head table is NOT cached (cold start, or a table bigger than RAM). Before
every repetition it evicts the head-table and store files from the page
cache with posix_fadvise(POSIX_FADV_DONTNEED), then times one routing call
and samples the Spark JVM's /proc/<pid>/io read_bytes — actual block I/O,
the direct evidence of what each layout reads from disk:

- FLAT kernel: must scan the entire heads parquet (every byte faults in).
- GROUPED, pruned parquet layout (save_head_groups): the probed-group isin
  is a PartitionFilter — only probed directories are read.

Usage: python tools/probe_routed_cold.py [--heads 1048576] [--queries 4]
       [--nprobe 8] [--dim 64] [--reps 3]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from tools.probe_routed_heads_1m import gen_heads  # noqa: E402

WORK = "/tmp/routed_cold"


def _arg(name: str, default: str) -> str:
    return (
        sys.argv[sys.argv.index(name) + 1] if name in sys.argv else default
    )


def evict(*paths: str) -> int:
    """Drop every file under ``paths`` from the page cache. → bytes advised."""
    total = 0
    for path in paths:
        for root, _, files in os.walk(path):
            for fn in files:
                p = os.path.join(root, fn)
                fd = os.open(p, os.O_RDONLY)
                try:
                    os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
                    total += os.fstat(fd).st_size
                finally:
                    os.close(fd)
    return total


def jvm_read_bytes() -> int:
    """Sum of actual block-I/O read bytes across local java processes —
    the Spark driver JVM does all parquet reading in local mode."""
    total = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read()
            if b"java" not in cmd.split(b"\0", 1)[0]:
                continue
            with open(f"/proc/{pid}/io") as f:
                for line in f:
                    if line.startswith("read_bytes:"):
                        total += int(line.split(":")[1])
        except OSError:
            continue
    return total


def main() -> None:
    n_heads = int(_arg("--heads", "1048576"))
    nq = int(_arg("--queries", "4"))
    nprobe = int(_arg("--nprobe", "8"))
    dim = int(_arg("--dim", "64"))
    reps = int(_arg("--reps", "3"))

    import sptag_spark.index.ann as A
    from sptag_spark.calibration import gemm_calibration
    from sptag_spark.session import get_spark

    print(json.dumps({"calibration": gemm_calibration()}), flush=True)
    os.environ.setdefault("SPTAG_SPARK_DRIVER_MEM", "48g")
    spark = get_spark("probe-routed-cold", cpus=32, shuffle_partitions=64)
    os.makedirs(WORK, exist_ok=True)

    heads = gen_heads(spark, n_heads, dim)  # cached parquet in /tmp/routed1m
    flat_path = f"/tmp/routed1m/heads_{n_heads}_{dim}.parquet"
    heads._sptag_cached_count = n_heads

    # one-time: build + persist the grouped store (the tree.bin artifact);
    # reuse across probe invocations
    store = f"{WORK}/store_{n_heads}_{dim}"
    if not os.path.isdir(os.path.join(store, "groups")):
        t0 = time.time()
        A.save_head_groups(heads, store)
        print(
            json.dumps({"group_store_build_sec": round(time.time() - t0, 1)}),
            flush=True,
        )
    os.sync()  # dirty pages cannot be evicted

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

    results: dict = {"heads": n_heads, "nq": nq, "nprobe": nprobe}

    # -------- FLAT kernel, cold each rep (reads the whole table) --------
    saved = A.ROUTE_GROUPED_MIN_HEADS
    A.ROUTE_GROUPED_MIN_HEADS = 1 << 60
    flat_ref = None
    walls, ios = [], []
    for _ in range(reps):
        fresh = spark.read.parquet(flat_path)
        fresh._sptag_cached_count = n_heads
        evicted = evict(flat_path)
        io0 = jvm_read_bytes()
        t0 = time.time()
        flat_ref = routes(A.route_queries(qs, fresh, nprobe=nprobe))
        walls.append(round(time.time() - t0, 2))
        ios.append(jvm_read_bytes() - io0)
    A.ROUTE_GROUPED_MIN_HEADS = saved
    results["flat"] = {
        "cold_wall_sec": walls,
        "jvm_read_mb": [round(b / 1e6, 1) for b in ios],
        "table_mb": round(evicted / 1e6, 1),
    }

    # ---- GROUPED over the pruned parquet store, cold each rep ----
    walls, ios = [], []
    grp = None
    for _ in range(reps):
        fresh = spark.read.parquet(flat_path)
        fresh._sptag_cached_count = n_heads
        A.load_head_groups(spark, fresh, store)
        evict(flat_path)
        evicted = evict(store)
        io0 = jvm_read_bytes()
        t0 = time.time()
        grp = routes(
            A._ratio_cut(
                A._route_grouped(qs, fresh, nprobe, "l2"), A.MAX_DIST_RATIO
            )
        )
        walls.append(round(time.time() - t0, 2))
        ios.append(jvm_read_bytes() - io0)
    results["grouped_pruned"] = {
        "cold_wall_sec": walls,
        "jvm_read_mb": [round(b / 1e6, 1) for b in ios],
        "store_mb": round(evicted / 1e6, 1),
    }
    results["head_recall_vs_flat"] = round(
        len(flat_ref & grp) / max(1, len(flat_ref)), 4
    )

    # warm references (page cache holds everything after the cold reps)
    t0 = time.time()
    routes(
        A._ratio_cut(
            A._route_grouped(qs, fresh, nprobe, "l2"), A.MAX_DIST_RATIO
        )
    )
    results["grouped_pruned"]["warm_wall_sec"] = round(time.time() - t0, 2)
    A.ROUTE_GROUPED_MIN_HEADS = 1 << 60
    fresh2 = spark.read.parquet(flat_path)
    fresh2._sptag_cached_count = n_heads
    t0 = time.time()
    routes(A.route_queries(qs, fresh2, nprobe=nprobe))
    results["flat"]["warm_wall_sec"] = round(time.time() - t0, 2)
    A.ROUTE_GROUPED_MIN_HEADS = saved

    print(json.dumps(results), flush=True)
    print(json.dumps({"calibration_after": gemm_calibration()}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
