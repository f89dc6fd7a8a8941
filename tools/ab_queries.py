"""Interleaved per-query A/B probe (optimization-round evidence protocol).

One fresh process per (checkout, sitting): runs the NAMED registry queries
with the bench's own discipline (1 untimed warm-up, then N timed
construct+noop runs, median) against an arbitrary checkout, prints one JSON
line with the GEMM calibration header. Drive it alternately against two
checkouts in the same sitting so machine state cancels:

  for i in 1 2 3; do
    python tools/ab_queries.py /tmp/r13_head  q1 q2 ... >> /tmp/ab_old.jsonl
    python tools/ab_queries.py /root/repo     q1 q2 ... >> /tmp/ab_new.jsonl
  done
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.abspath(sys.argv[1])
NAMES = sys.argv[2:]
SF_DIR = os.environ.get("SPTAG_AB_SF", "/root/testdata/sf0.1")
N_RUNS = int(os.environ.get("SPTAG_AB_RUNS", "5"))
sys.path.insert(0, REPO)

os.environ.setdefault("SPTAG_SPARK_DRIVER_MEM", "40g")
os.environ.setdefault("SPTAG_SPARK_AQE", "false")


def main() -> None:
    from sptag_spark.calibration import gemm_calibration

    calib = gemm_calibration()

    from sptag_spark.registry import all_specs
    from sptag_spark.session import get_spark

    spark = get_spark("sptag-ab", cpus=32, shuffle_partitions=32)
    # same pool warm-up as bench.py
    spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(10).write.format(
        "noop"
    ).mode("overwrite").save()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    from sptag_spark.resources import release

    specs = all_specs()
    out: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    for name in NAMES:
        spec = specs[name]
        samples: list[float] = []
        for i in range(1 + N_RUNS):
            t0 = time.time()
            df = spec.query(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            if i >= 1:
                samples.append(time.time() - t0)
            release(df, include_self=False)
        samples.sort()
        out[name] = round(samples[len(samples) // 2], 3)
        spreads[name] = [round(samples[0], 3), round(samples[-1], 3)]
    print(
        json.dumps(
            {
                "repo": REPO,
                "sf_dir": SF_DIR,
                "calibration": calib,
                "queries": out,
                "spread": spreads,
            }
        )
    )


if __name__ == "__main__":
    main()
