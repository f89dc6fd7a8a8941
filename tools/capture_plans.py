"""Capture `.explain("formatted")` + a timing/job-count breakdown for
registry queries (optimization-round evidence protocol, guide §1).

For each query this runs the bench's own discipline — one untimed
construction+execution (codegen/builds/memo warm-up), then a timed
construction and a timed noop materialization — and records:

- plans/<name>_<suffix>.txt        the formatted physical plan
- a JSON summary line per query:   construct_sec (driver-side work inside
  the query fn: eager collects, checkpoints, streaming runs), exec_sec
  (the noop materialization of the returned plan), n_jobs (Spark jobs the
  steady-state run issued — each job is a scheduler round-trip with a
  fixed floor at local[32]), and plan-shape counts (Exchange / scans /
  join strategies / Python-boundary nodes).

Usage:
  python tools/capture_plans.py OUTDIR SUFFIX [query ...]   (default: all)
  SPTAG_CAPTURE_SF=/root/testdata/sf0.1 to override the data dir.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUTDIR = sys.argv[1]
SUFFIX = sys.argv[2]
ONLY = sys.argv[3:]
SF_DIR = os.environ.get("SPTAG_CAPTURE_SF", "/root/testdata/sf0.1")

os.environ.setdefault("SPTAG_SPARK_DRIVER_MEM", "40g")
os.environ.setdefault("SPTAG_SPARK_AQE", "false")

from sptag_spark.registry import all_specs  # noqa: E402
from sptag_spark.session import get_spark  # noqa: E402


def formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


_SHAPE = {
    "exchanges": r"^\(\d+\) Exchange",
    "broadcast_exchanges": r"^\(\d+\) BroadcastExchange",
    "scans": r"^\(\d+\) Scan",
    "sort_merge_joins": r"^\(\d+\) SortMergeJoin",
    "shuffled_hash_joins": r"^\(\d+\) ShuffledHashJoin",
    "broadcast_hash_joins": r"^\(\d+\) BroadcastHashJoin",
    "nested_loop_joins": r"^\(\d+\) (BroadcastNestedLoopJoin|CartesianProduct)",
    "python_nodes": r"^\(\d+\) (BatchEvalPython|ArrowEvalPython|MapInPandas|"
    r"FlatMapGroupsInPandas|MapInArrow)",
    "windows": r"^\(\d+\) Window",
    "sorts": r"^\(\d+\) Sort\b",
}


def plan_shape(plan: str) -> dict:
    shape = {k: 0 for k in _SHAPE}
    for ln in plan.splitlines():
        s = ln.strip()
        for k, pat in _SHAPE.items():
            if re.match(pat, s):
                shape[k] += 1
    return shape


def main() -> None:
    os.makedirs(OUTDIR, exist_ok=True)
    spark = get_spark("capture-plans", cpus=32, shuffle_partitions=32)
    sc = spark.sparkContext

    # bench warm-ups: JVM/codegen path + Python worker pool
    spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(10).write.format(
        "noop"
    ).mode("overwrite").save()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    specs = all_specs()
    names = ONLY or sorted(specs)
    rows = []
    for name in names:
        spec = specs[name]
        try:
            # untimed warm-up run: memoized builds + codegen land here
            df = spec.query(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            from sptag_spark.resources import release

            release(df, include_self=False)

            # steady-state run, job-counted
            sc.setJobGroup(f"cap:{name}", name)
            t0 = time.time()
            df = spec.query(spark, SF_DIR)
            t_construct = time.time() - t0
            plan = formatted_plan(df)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t_exec = time.time() - t0
            jobs = sc.statusTracker().getJobIdsForGroup(f"cap:{name}")
            sc.setJobGroup("idle", "idle")
            release(df, include_self=False)

            with open(os.path.join(OUTDIR, f"{name}_{SUFFIX}.txt"), "w") as f:
                f.write(plan)
            row = {
                "query": name,
                "construct_sec": round(t_construct, 3),
                "exec_sec": round(t_exec, 3),
                "total_sec": round(t_construct + t_exec, 3),
                "n_jobs": len(jobs),
                **plan_shape(plan),
            }
        except Exception as exc:  # noqa: BLE001
            row = {"query": name, "error": f"{type(exc).__name__}: {exc}"[:300]}
        rows.append(row)
        print(json.dumps(row), flush=True)

    with open(os.path.join(OUTDIR, f"_summary_{SUFFIX}.json"), "w") as f:
        json.dump(
            {"sf_dir": SF_DIR, "suffix": SUFFIX, "rows": rows}, f, indent=1
        )
    spark.stop()


if __name__ == "__main__":
    main()
