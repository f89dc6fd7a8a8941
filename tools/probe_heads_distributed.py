"""Probe: distributed head selection past the 200k-sample ceiling (r10 ask #3).

At 2M+ vectors with ratio 0.12, k = 240k heads — a 200k-row sample cannot
define 240k distinct heads, so the sampled path degenerates to uniform
choice of sample rows. select_heads_distributed trains per-partition
partial Lloyd over ALL rows instead (the reference's SelectHeadInternal
builds over all vectors, `SPANNIndex.cpp:579-705`).

Measured here, uniform-choice baseline vs distributed two-level Lloyd at
the same k:
  - head-selection wall,
  - posting-size balance (mean / p50 / p99 / max / std of members per
    head) after a full build_postings over the corpus,
  - SPANN recall@10 vs exact brute force on held-out queries at equal
    nprobe,
  - a witness that the distributed path did NOT take the degenerate
    uniform branch (heads ≠ a uniform id sample: Lloyd-snapped heads
    concentrate on cluster structure).

Corpus: clustered gaussian mixture (1024 sites), generated distributed
(mapInPandas RNG → parquet in /tmp/headsdist) — a driver createDataFrame
at 2M rows would dominate the probe.

Usage: python tools/probe_heads_distributed.py [--n 2097152] [--dim 16]
       [--queries 200] [--nprobe 24] [--ratio 0.12]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

WORK = "/tmp/headsdist"


def _arg(name: str, default: str) -> str:
    return (
        sys.argv[sys.argv.index(name) + 1] if name in sys.argv else default
    )


def gen_corpus(spark, n: int, dim: int, n_sites: int = 1024):
    path = f"{WORK}/corpus_{n}_{dim}.parquet"
    if not os.path.isdir(path):
        rng = np.random.default_rng(23)
        sites = (rng.normal(size=(n_sites, dim)) * 6.0).astype(np.float64)
        bsites = spark.sparkContext.broadcast(sites)

        def gen(it):
            import pandas as pd

            for pdf in it:
                ids = pdf["id"].to_numpy(np.int64)
                r = np.random.default_rng(31 + int(ids[0]))
                S = bsites.value
                assign = r.integers(0, len(S), size=len(ids))
                V = S[assign] + r.normal(size=(len(ids), S.shape[1]))
                yield pd.DataFrame(
                    {
                        "id": ids,
                        "vector": [row.astype(np.float32) for row in V],
                    }
                )

        spark.range(n).repartition(32).mapInPandas(
            gen, "id long, vector array<float>"
        ).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def posting_balance(postings) -> dict:
    import pyspark.sql.functions as F

    sizes = postings.groupBy("head_id").count()
    row = sizes.agg(
        F.count("*").alias("heads"),
        F.mean("count").alias("mean"),
        F.expr("percentile(count, 0.5)").alias("p50"),
        F.expr("percentile(count, 0.99)").alias("p99"),
        F.max("count").alias("max"),
        F.stddev("count").alias("std"),
    ).first()
    return {
        "n_heads_with_members": int(row["heads"]),
        "mean": round(float(row["mean"]), 2),
        "p50": float(row["p50"]),
        "p99": float(row["p99"]),
        "max": int(row["max"]),
        "std": round(float(row["std"]), 2),
        "cv": round(float(row["std"]) / max(float(row["mean"]), 1e-9), 3),
    }


def recall_at_10(spark, vecs, heads, postings, queries, nprobe) -> float:
    import pyspark.sql.functions as F

    from sptag_spark.index.ann import ann_search
    from sptag_spark.operators.knn import knn

    truth = knn(vecs, queries, k=10).select(
        F.col("query_id"), F.col("id").alias("tid")
    )
    got = ann_search(queries, heads, postings, k=10, nprobe=nprobe).select(
        "query_id", "id"
    )
    hit = got.join(
        truth,
        (got["query_id"] == truth["query_id"]) & (got["id"] == truth["tid"]),
        "inner",
    ).count()
    denom = truth.count()
    return round(hit / max(denom, 1), 4)


def main() -> None:
    n = int(_arg("--n", "2097152"))
    dim = int(_arg("--dim", "16"))
    nq = int(_arg("--queries", "200"))
    nprobe = int(_arg("--nprobe", "24"))
    ratio = float(_arg("--ratio", "0.12"))

    from sptag_spark.index.heads import select_heads
    from sptag_spark.index.postings import build_postings
    from sptag_spark.session import get_spark

    spark = get_spark("probe-heads-distributed")
    os.makedirs(WORK, exist_ok=True)
    vecs = gen_corpus(spark, n, dim)
    vecs = vecs.persist()
    n_actual = vecs.count()
    k = max(1, min(int(n_actual * ratio), 1 << 20))
    print(f"corpus n={n_actual} dim={dim} k={k}", flush=True)

    q_rows = vecs.limit(nq).collect()
    queries = spark.createDataFrame(
        [(r["id"], list(map(float, r["vector"]))) for r in q_rows],
        "query_id long, vector array<float>",
    )

    out: dict = {"n": n_actual, "dim": dim, "k": k, "nprobe": nprobe}
    for mode, kw in (
        ("sampled_uniform_baseline", {"distributed": False}),
        ("distributed_lloyd", {"distributed": True}),
    ):
        t0 = time.time()
        heads = select_heads(vecs, ratio=ratio, **kw).persist()
        n_heads = heads.count()
        t_heads = time.time() - t0
        t0 = time.time()
        postings = build_postings(vecs, heads).persist()
        n_rows = postings.count()
        t_post = time.time() - t0
        bal = posting_balance(postings)
        t0 = time.time()
        rec = recall_at_10(spark, vecs, heads, postings, queries, nprobe)
        t_search = time.time() - t0
        out[mode] = {
            "n_heads": n_heads,
            "select_wall_sec": round(t_heads, 1),
            "postings_rows": n_rows,
            "postings_wall_sec": round(t_post, 1),
            "balance": bal,
            "recall_at_10": rec,
            "recall_wall_sec": round(t_search, 1),
        }
        print(json.dumps({mode: out[mode]}), flush=True)
        heads.unpersist()
        postings.unpersist()
    path = "/root/repo/PROBE_HEADS_DISTRIBUTED.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
