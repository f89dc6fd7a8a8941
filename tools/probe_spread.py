"""A/B probe for the scale-adaptive spread width (r14).

Times construct+noop of the dedup family at the current
SPTAG_SPREAD_BYTES_PER_TASK, bench-like (AQE off, local[32]).
Run:  SPTAG_SPARK_AQE=false SPTAG_SPREAD_BYTES_PER_TASK=<n> python tools/probe_spread.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPTAG_SPARK_AQE", "false")

from sptag_spark.session import get_spark  # noqa: E402

QUERIES = [
    "minhash_near_dup",
    "duplicate_spans",
    "dedup_clusters",
    "dedup_keep_best",
]
RUNS = int(os.environ.get("PROBE_RUNS", "4"))


def main() -> None:
    from sptag_spark.registry import all_specs
    from sptag_spark.resources import release

    specs = all_specs()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("probe-spread", cpus=cpus)
    from sptag_spark.partitioning import SPREAD_BYTES_PER_TASK

    print(f"# bytes_per_task={SPREAD_BYTES_PER_TASK} cpus={cpus}", flush=True)
    out = {}
    for name in QUERIES:
        fn = specs[name].query
        # warmup
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        release(df)
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
            release(df)
        samples.sort()
        out[name] = samples
        print(f"{name:24s} med={samples[len(samples)//2]:.3f} "
              f"min={samples[0]:.3f} max={samples[-1]:.3f}", flush=True)
    print("TOTAL_MED", round(sum(s[len(s)//2] for s in out.values()), 3))


if __name__ == "__main__":
    main()
