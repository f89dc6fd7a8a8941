"""Streaming / incremental maintenance — the reference's "fresh update".

Reference semantics (SURVEY.md §2.9): AddIndex appends vectors under a lock
and schedules background rebuilds every AddCountForRebuild=1000 adds
(`BKTIndex.cpp:901-970`); DeleteIndex tombstones (`:875-899`); RefineIndex
compacts when >40% deleted. There are no watermarks/event-time — "streaming"
is online index mutation.

Spark mapping:
- ingestion = Structured Streaming file/kafka source → foreachBatch appending
  to the base table (micro-batch == the reference's add batch);
- deletes = a tombstone stream unioned into the tombstone table;
- background rebuild = a periodic batch job re-running select_heads/
  build_postings and atomically swapping the directory (the reference swaps
  under a shared_timed_mutex; we swap a view/table pointer);
- the *query-time* semantics (base ∪ deltas, anti-join tombstones) are
  `live_view` below — identical results whether rows arrived by batch or
  stream.

Also provided: a watermarked windowed aggregation over the events stream —
the Spark-native streaming operator SPTAG has no equivalent of, included
because a 100 TB ingestion pipeline needs it (late data, event time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sptag_spark.operators.mutate import apply_tombstones

ADD_COUNT_FOR_REBUILD = 1000  # BKT/ParameterDefinitionList.h:44


def live_view(
    base: DataFrame, deltas: list[DataFrame], tombstones: DataFrame
) -> DataFrame:
    """The queryable state after any add/delete interleaving: base ∪ deltas,
    minus tombstones. Exactly AlgoTest's add/delete replay semantics."""
    out = base
    for d in deltas:
        out = out.unionByName(d)
    return apply_tombstones(out, tombstones)


def needs_rebuild(n_adds_since_build: int) -> bool:
    return n_adds_since_build >= ADD_COUNT_FOR_REBUILD


def stream_append_vectors(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    schema: str = "id long, vector array<float>, meta string",
):
    """File-source micro-batch appender: new parquet files landing in
    source_dir are appended to the target table exactly once (checkpointed).
    Returns the StreamingQuery (caller stops it / processAllAvailable)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.writeStream.format("parquet")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def streaming_event_window_counts(
    events_stream: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type — late rows beyond
    the watermark are dropped, state is bounded. Works on any streaming
    DataFrame with (ts TIMESTAMP, event_type STRING, value DOUBLE)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )
