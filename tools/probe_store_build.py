"""Probe: serial (toLocalIterator) vs executor-parallel packed-store build.

The store build's scale bottleneck after VERDICT r9 #1 is no longer MEMORY
(both builders are chunk-bounded) but driver-serial BANDWIDTH: every
posting row of the serial builder funnels through one Python iterator.
build_packed_store_parallel moves the sort + float32 serialization onto
executors (range-partitioned fragments, driver concat). This probe
measures both at synthetic posting scales and reports rows/s.

Usage: python tools/probe_store_build.py [--rows 2097152,8388608]
       [--dim 64] [--heads 2048]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

WORK = "/tmp/store_build_probe"


def _arg(name: str, default: str) -> str:
    return (
        sys.argv[sys.argv.index(name) + 1] if name in sys.argv else default
    )


def gen_postings(spark, n: int, dim: int, n_heads: int):
    path = f"{WORK}/postings_{n}_{dim}.parquet"
    if not os.path.isdir(path):

        def gen(it):
            import pandas as pd

            for pdf in it:
                ids = pdf["id"].to_numpy(np.int64)
                r = np.random.default_rng(29 + int(ids[0]))
                V = r.normal(size=(len(ids), dim)).astype(np.float32)
                yield pd.DataFrame(
                    {
                        "head_id": ids % n_heads,
                        "id": ids,
                        "vector": [row for row in V],
                    }
                )

        spark.range(n).repartition(32).mapInPandas(
            gen, "head_id long, id long, vector array<float>"
        ).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def main() -> None:
    row_counts = [int(x) for x in _arg("--rows", "2097152,8388608").split(",")]
    dim = int(_arg("--dim", "64"))
    n_heads = int(_arg("--heads", "2048"))

    from sptag_spark.calibration import gemm_calibration
    from sptag_spark.serving_local import (
        DiskSpannReplica,
        build_packed_store,
        build_packed_store_parallel,
    )
    from sptag_spark.session import get_spark

    print(json.dumps({"calibration": gemm_calibration()}), flush=True)
    spark = get_spark("probe-store-build", cpus=32, shuffle_partitions=64)
    os.makedirs(WORK, exist_ok=True)

    rng = np.random.default_rng(7)
    heads = spark.createDataFrame(
        [
            (int(i), rng.normal(size=dim).astype(np.float32).tolist())
            for i in range(n_heads)
        ],
        "head_id long, vector array<float>",
    ).persist()
    heads.count()

    for n in row_counts:
        postings = gen_postings(spark, n, dim, n_heads)
        row = {"rows": n, "dim": dim, "gb": round(n * dim * 4 / 1e9, 2)}
        for mode, builder in (
            ("serial", build_packed_store),
            ("parallel", build_packed_store_parallel),
        ):
            d = f"{WORK}/store_{mode}_{n}"
            shutil.rmtree(d, ignore_errors=True)
            t0 = time.time()
            builder(heads, postings, d)
            wall = time.time() - t0
            row[mode] = {
                "wall_sec": round(wall, 1),
                "rows_per_sec": int(n / wall),
            }
        # identical stores -> identical answers; spot-check one slab
        ra = DiskSpannReplica.from_store(f"{WORK}/store_serial_{n}")
        rb = DiskSpannReplica.from_store(f"{WORK}/store_parallel_{n}")
        q = np.asarray(rb.H[0], dtype=np.float64)
        ia, da = ra.search_one(q, k=10, nprobe=4)
        ib, db = rb.search_one(q, k=10, nprobe=4)
        row["stores_identical"] = bool(
            ia.tolist() == ib.tolist() and da.tolist() == db.tolist()
        )
        row["speedup"] = round(
            row["serial"]["wall_sec"] / row["parallel"]["wall_sec"], 2
        )
        print(json.dumps(row), flush=True)
        for mode in ("serial", "parallel"):
            shutil.rmtree(f"{WORK}/store_{mode}_{n}", ignore_errors=True)
    print(json.dumps({"calibration_after": gemm_calibration()}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
