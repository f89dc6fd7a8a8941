"""SSDServing — the INI-driven four-stage SPANN pipeline, Spark-first.

Reference: `SSDServing/main.h:12-25` BootProgram reads an INI with sections
[Base] [SelectHead] [BuildHead] [BuildSSDIndex] [SearchSSDIndex] (sample:
docs/GettingStart.md buildconfig.ini) and executes each stage whose
`isExecute` is true, persisting artifacts under Base.IndexDirectory.

Spark mapping of each stage:
- SelectHead  → the BKT SelectHeadDynamically walk (index/bkt.py) at
  [SelectHead].Ratio with BKTKmeansK/BKTLeafSize/SelectThreshold knobs;
- BuildHead   → the heads table written to <IndexDirectory>/heads.parquet
  (the in-memory head index is a broadcastable table here — its "graph
  build" is subsumed by exact head routing, SURVEY §3.2);
- BuildSSDIndex → build_postings at ReplicaCount, posting cut from
  PostingPageLimit, written partitionBy(head_id) to
  <IndexDirectory>/postings (write_postings — partition pruning is the SSD
  seek);
- SearchSSDIndex → ann_search over the persisted artifacts at
  SearchInternalResultNum probes / ResultNum k / MaxDistRatio, writing
  results to <IndexDirectory>/<SearchResult>; with TruthPath set, recall
  is computed and returned exactly as `SSDIndex.h:284-285` prints it.

Vector/query/truth inputs accept VectorType PARQUET (canonical id/vector),
DEFAULT or XVEC binary (io/readers.py); truth accepts DEFAULT/TXT/PARQUET.
"""

from __future__ import annotations

import configparser
import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_METRICS = {"l2": "l2", "cosine": "cosine", "innerproduct": "ip", "ip": "ip"}


def _load_vectors(
    spark: SparkSession, path: str, fmt: str, id_col: str = "id"
) -> DataFrame:
    fmt = (fmt or "PARQUET").upper()
    if fmt == "PARQUET":
        df = spark.read.parquet(path)
        cols = set(df.columns)
        if "vec_id" in cols:  # embeddings-table layout
            df = df.select(
                F.col("vec_id").alias(id_col),
                F.col("embedding").alias("vector"),
            )
        return df
    from sptag_spark.io.readers import read_binary_vectors

    df = read_binary_vectors(spark, path, fmt.lower())
    return df.withColumnRenamed("id", id_col) if id_col != "id" else df


def _load_truth(spark: SparkSession, path: str, fmt: str) -> DataFrame:
    fmt = (fmt or "DEFAULT").upper()
    if fmt == "PARQUET":
        return spark.read.parquet(path)
    from sptag_spark.io.readers import read_truth_default, read_truth_txt

    reader = read_truth_default if fmt == "DEFAULT" else read_truth_txt
    truth = reader(spark, path)
    if "dist" not in truth.columns:  # truth files carry ids only
        truth = truth.withColumn("dist", F.lit(0.0))
    return truth


def boot_program(
    spark: SparkSession,
    config_path: str | None = None,
    config: dict[str, dict[str, str]] | None = None,
) -> dict[str, Any]:
    """BootProgram(`main.h:12`): run the enabled stages, return per-stage
    timings plus search results/recall. `config` (nested dict) overrides /
    replaces the INI file, mirroring BootProgram's config_map parameter."""
    cp = configparser.ConfigParser()
    cp.optionxform = str  # reference keys are CamelCase; keep them
    if config_path:
        with open(config_path) as f:
            cp.read_file(f)
    if config:
        cp.read_dict(config)

    def get(sec: str, key: str, default: str = "") -> str:
        return cp.get(sec, key, fallback=default)

    def enabled(sec: str) -> bool:
        return cp.has_section(sec) and get(sec, "isExecute", "false").lower() == "true"

    base = cp["Base"]
    metric = _METRICS[base.get("DistCalcMethod", "L2").lower()]
    index_dir = base.get("IndexDirectory", "")
    out: dict[str, Any] = {"stages": {}, "metric": metric}

    vectors = _load_vectors(
        spark, base["VectorPath"], base.get("VectorType", "PARQUET")
    ).persist()
    persisted = [vectors]  # released at pipeline end (resources.py pattern)

    heads_path = os.path.join(index_dir, "heads.parquet")
    postings_path = os.path.join(index_dir, "postings")

    heads: DataFrame | None = None
    if enabled("SelectHead"):
        from sptag_spark.index.bkt import select_heads_bkt

        t0 = time.time()
        heads = select_heads_bkt(
            vectors,
            ratio=float(get("SelectHead", "Ratio", "0.12")),
            kmeans_k=int(get("SelectHead", "BKTKmeansK", "8")),
            leaf_size=int(get("SelectHead", "BKTLeafSize", "8")),
            select_threshold=int(get("SelectHead", "SelectThreshold", "12")),
        ).persist()
        persisted.append(heads)
        out["stages"]["SelectHead"] = round(time.time() - t0, 3)
        out["n_heads"] = heads.count()

    if enabled("BuildHead"):
        t0 = time.time()
        if heads is None:
            raise ValueError("BuildHead requires SelectHead output")
        heads.write.mode("overwrite").option("compression", "zstd").parquet(
            heads_path
        )
        out["stages"]["BuildHead"] = round(time.time() - t0, 3)

    if enabled("BuildSSDIndex"):
        from sptag_spark.index.postings import build_postings, write_postings

        t0 = time.time()
        heads_df = heads if heads is not None else spark.read.parquet(heads_path)
        # PostingPageLimit is in 4 KB pages of packed records; the posting
        # cut here is row-count-based, so expose the row cap directly with
        # the page knob as a coarse multiplier (page ≈ 1000 rows default)
        limit = int(get("BuildSSDIndex", "PostingPageLimit", "1")) * 1000
        postings = build_postings(
            vectors,
            heads_df,
            metric,
            replica_count=int(get("BuildSSDIndex", "ReplicaCount", "8")),
            posting_limit=limit,
        )
        write_postings(postings, postings_path)
        out["stages"]["BuildSSDIndex"] = round(time.time() - t0, 3)

    if enabled("SearchSSDIndex"):
        from sptag_spark.index.ann import ann_search
        from sptag_spark.operators.recall import recall_per_query, recall_summary

        t0 = time.time()
        sec = "SearchSSDIndex"
        queries = _load_vectors(
            spark, get(sec, "QueryPath") or base["QueryPath"],
            get(sec, "QueryType") or base.get("QueryType", "PARQUET"),
            id_col="query_id",
        )
        heads_df = heads if heads is not None else spark.read.parquet(heads_path)
        postings_df = spark.read.parquet(postings_path)
        k = int(get(sec, "ResultNum", "10"))
        results = ann_search(
            queries,
            heads_df,
            postings_df,
            k=k,
            nprobe=int(get(sec, "SearchInternalResultNum", "8")),
            metric=metric,
            max_dist_ratio=float(get(sec, "MaxDistRatio", "8.0")),
        ).persist()
        result_name = get(sec, "SearchResult", "result.parquet")
        results.write.mode("overwrite").parquet(
            os.path.join(index_dir, result_name)
        )
        out["stages"]["SearchSSDIndex"] = round(time.time() - t0, 3)
        out["results"] = results
        truth_path = get(sec, "TruthPath") or base.get("TruthPath", "")
        if truth_path:
            truth = _load_truth(
                spark, truth_path,
                get(sec, "TruthType") or base.get("TruthType", "DEFAULT"),
            )
            summary = recall_summary(
                recall_per_query(results, truth, k, dist_tie_credit=False)
            ).first()
            out["recall"] = summary["avg_recall"]
            out["mrr"] = summary["mrr"]
    # persisted-artifact lifecycle: the stage OUTPUTS are on disk (parquet)
    # — only `results` is handed back as a live plan. Attach the pinned
    # intermediates to it so release(out["results"]) drops everything; a
    # pure build run (no Search stage) has no live consumer, so unpersist
    # immediately.
    if "results" in out:
        from sptag_spark.resources import attach_artifacts

        attach_artifacts(out["results"], persisted)
    else:
        for df in persisted:
            df.unpersist()
    return out
