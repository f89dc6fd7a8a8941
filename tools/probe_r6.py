"""One-shot fresh-process scale probes for the r6 additions (SCALING.md
protocol): `dedup_keep_best` (components + per-cluster argmax) and
`streaming_near_dup` (cross-batch stateful LSH — per-micro-batch wall as
cumulative state grows).

Usage: python tools/probe_r6.py <keep_best|stream_neardup> <scale>
One (op, scale) per process — repeated checkpoint/state runs in one session
accumulate storage blocks whose deferred cleanup pollutes later timings
(measured r5; see SCALING.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F  # noqa: E402

op, scale = sys.argv[1], int(sys.argv[2])
os.environ.setdefault("SPTAG_SPARK_DRIVER_MEM", "48g")

from scale_stress import WORK, materialize, scaled_docs  # noqa: E402

from sptag_spark.session import get_spark  # noqa: E402

spark = get_spark("probe-r6", cpus=32, shuffle_partitions=64)
os.makedirs(WORK, exist_ok=True)
if op in ("keep_best", "stream_dedup", "stream_neardup", "bm25"):
    dpath = materialize(
        scaled_docs(spark, scale), f"{WORK}/documents_x{scale}.parquet"
    )
    docs = spark.read.parquet(dpath)
    nd = docs.count()

if op == "keep_best":
    from pyspark.sql import Window

    from sptag_spark.functions.text import token_count
    from sptag_spark.operators.components import dedup_clusters

    def run() -> None:
        clusters = dedup_clusters(docs, 0.6)
        toks = docs.select("doc_id", token_count(F.col("text")).alias("n_tokens"))
        multi = clusters.join(toks, "doc_id")
        w = Window.partitionBy("cluster_rep").orderBy(
            F.col("n_tokens").desc(), "doc_id"
        )
        kept = (
            multi.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select("doc_id", "n_tokens", "cluster_size")
        )
        singles = toks.join(
            clusters.select("doc_id"), "doc_id", "left_anti"
        ).select(
            "doc_id", "n_tokens", F.lit(1).cast("long").alias("cluster_size")
        )
        kept.unionByName(singles).write.format("noop").mode("overwrite").save()

    t0 = time.time()
    run()
    print(json.dumps({"op": "dedup_keep_best", "scale": scale, "rows_in": nd,
                      "sec": round(time.time() - t0, 2)}))

elif op == "stream_dedup":
    from sptag_spark.streaming.stateful import streaming_first_wins_dedup

    # ~50% of keys repeat (doc_id mod nd/2) and every key re-arrives in
    # later batches, so cumulative state is exercised batch over batch
    work = f"{WORK}/stream_dedup_x{scale}_{os.getpid()}"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(f"{work}/docs", exist_ok=True)
    for part in range(4):
        docs.filter(F.col("doc_id") % 4 == part).select(
            "doc_id", F.pmod("doc_id", F.lit(nd // 2)).alias("k"), "text"
        ).coalesce(1).write.mode("append").parquet(f"{work}/docs")
    stream = (
        spark.readStream.schema("doc_id long, k long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{work}/docs")
    )
    dedup = streaming_first_wins_dedup(stream, "k", "doc_id")
    t0 = time.time()
    q = (
        dedup.writeStream.format("noop")
        .option("checkpointLocation", f"{work}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0
    per_batch = [
        {"batch": p["batchId"], "ms": p["batchDuration"],
         "rows_in": p["numInputRows"]}
        for p in q.recentProgress
    ]
    print(json.dumps({"op": "streaming_first_wins_dedup", "scale": scale,
                      "rows_in": nd, "sec": round(wall, 2),
                      "per_batch": per_batch}))
    shutil.rmtree(work, ignore_errors=True)

elif op == "stream_neardup":
    from sptag_spark.streaming.stateful import streaming_near_dup_candidates

    # 4 equal files → 4 micro-batches; state accumulates across them, so
    # flat per-batch wall = state lookups stay bounded as state grows
    work = f"{WORK}/stream_neardup_x{scale}_{os.getpid()}"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(f"{work}/docs", exist_ok=True)
    for part in range(4):
        docs.filter(F.col("doc_id") % 4 == part).select(
            "doc_id", "text"
        ).coalesce(1).write.mode("append").parquet(f"{work}/docs")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{work}/docs")
    )
    cand = streaming_near_dup_candidates(stream, threshold=0.3, bands=16, n_hashes=32)
    t0 = time.time()
    q = (
        cand.writeStream.format("noop")
        .option("checkpointLocation", f"{work}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0
    per_batch = [
        {"batch": p["batchId"], "ms": p["batchDuration"],
         "rows_in": p["numInputRows"]}
        for p in q.recentProgress
    ]
    print(json.dumps({"op": "streaming_near_dup", "scale": scale,
                      "rows_in": nd, "sec": round(wall, 2),
                      "per_batch": per_batch}))
    shutil.rmtree(work, ignore_errors=True)

elif op == "cc":
    # Distributed connected-components at a size where the local union-find
    # dispatch can NOT absorb it (the label-propagation loop has only been
    # correctness-tested via local_threshold=0 before this probe). Graph =
    # what dup detection actually emits, at adversarial diameter: scale
    # million nodes in 5-node stars (the LSH-cluster shape), star roots
    # chained in runs of 1000 (diameter ~1000 → pointer jumping must bite;
    # plain min-propagation would need ~1000 rounds, log-doubling ~10).
    from sptag_spark.operators.components import connected_components

    n = scale * 1_000_000
    ids = spark.range(n).select(F.col("id"))
    stars = ids.filter(F.col("id") % 5 != 0).select(
        F.col("id").alias("src"),
        (F.col("id") - F.col("id") % 5).alias("dst"),
    )
    roots = ids.filter(
        (F.col("id") % 5 == 0) & (F.col("id") % 5000 != 0)
    )
    chain = roots.select(
        F.col("id").alias("src"), (F.col("id") - 5).alias("dst")
    )
    edges = stars.union(chain)
    t0 = time.time()
    comp = connected_components(edges)
    n_comp = comp.select("component").distinct().count()
    sec = round(time.time() - t0, 2)
    # exactness: every 5000-node chain-of-stars collapses to ONE component
    expect = n // 5000
    print(json.dumps({"op": "connected_components", "scale": scale,
                      "nodes": n, "edges": n - n // 5000,
                      "n_components": n_comp, "expected": expect,
                      "ok": n_comp == expect, "sec": sec}))

elif op == "bm25":
    from sptag_spark.operators.retrieval import bm25_topk

    # multi-term query over the scaled corpus — the tf stream prunes to
    # these terms map-side, so the probe measures exactly the stages that
    # grow with the corpus (tokenize+filter scan, (doc,term) agg, score join)
    terms = ["data", "model", "training", "search", "index"]
    t0 = time.time()
    bm25_topk(docs, terms, k=20).write.format("noop").mode("overwrite").save()
    print(json.dumps({"op": "bm25_topk", "scale": scale, "rows_in": nd,
                      "sec": round(time.time() - t0, 2)}))

elif op == "refine_ab":
    # A/B at 40% tombstones: refine_index as shipped (measured-size
    # dispatch), the old row_number() OVER (ORDER BY id) global window,
    # and the forced big path (range-partitioned sort + map-only offsets).
    # All write all columns to the noop sink (count() would prune the
    # vector column and flatter every path).
    from pyspark.sql import Window

    from scale_stress import scaled_embeddings

    from sptag_spark.operators.mutate import apply_tombstones, refine_index

    vpath = materialize(
        scaled_embeddings(spark, scale).withColumn(
            "meta", F.col("id").cast("string")
        ),
        f"{WORK}/vectors_x{scale}.parquet",
    )
    vec = spark.read.parquet(vpath)
    nv = vec.count()
    tomb = vec.select("id").filter(F.pmod("id", F.lit(5)) < 2)

    def refine_old():
        live = apply_tombstones(vec, tomb)
        w = Window.orderBy("id")
        return (
            live.withColumn("old_id", F.col("id"))
            .withColumn("id", (F.row_number().over(w) - 1).cast("long"))
            .select("id", "old_id", "vector", "meta")
        )

    def refine_distributed():
        # the big-input path forced (no known_count): range-partitioned
        # sort + map-only partition-offset numbering
        from sptag_spark.operators.rank import global_row_number_by

        live = apply_tombstones(vec, tomb)
        return (
            global_row_number_by(
                live.withColumn("old_id", F.col("id")), "old_id",
                out_col="_rn",
            )
            .withColumn("id", F.col("_rn"))
            .select("id", "old_id", "vector", "meta")
        )

    out = {"op": "refine_index_ab", "scale": scale, "rows_in": nv}
    for name, fn in (("dispatched_sec", lambda: refine_index(vec, tomb)),
                     ("old_window_sec", refine_old),
                     ("distributed_sec", refine_distributed)):
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 2)
    print(json.dumps(out))

elif op == "add_batch":
    from scale_stress import scaled_embeddings

    from sptag_spark.operators.mutate import add_batch

    vpath = materialize(
        scaled_embeddings(spark, scale).withColumn(
            "meta", F.col("id").cast("string")
        ),
        f"{WORK}/vectors_x{scale}.parquet",
    )
    vec = spark.read.parquet(vpath)
    nv = vec.count()
    half = vec.filter(F.pmod("id", F.lit(2)) == 0).select("vector", "meta")
    t0 = time.time()
    add_batch(vec, half).write.format("noop").mode("overwrite").save()
    print(json.dumps({"op": "add_batch", "scale": scale, "rows_in": nv,
                      "batch_rows": nv // 2,
                      "sec": round(time.time() - t0, 2)}))

elif op == "bm25":
    # Selective-term retrieval over a growing corpus: the matched set stays
    # ~constant (scaled copies suffix every token) while the corpus-stats
    # scan (doc lengths, avgdl) grows with the data — the realistic shape
    # of rare-term search on a big corpus.
    from sptag_spark.operators.retrieval import bm25_topk

    t0 = time.time()
    n_hits = bm25_topk(docs, ["merge", "scan", "hash"], k=20).count()
    print(json.dumps({"op": "bm25_topk", "scale": scale, "rows_in": nd,
                      "hits": n_hits, "sec": round(time.time() - t0, 2)}))

spark.stop()
