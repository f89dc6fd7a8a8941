"""Streaming ANN serving — the socket serve loop as Structured Streaming.

The reference's server (`AnnService/src/Server/*`, SURVEY §2.11) accepts a
continuous feed of queries over sockets, batches them per connection, and
answers each batch against the in-memory index. The Spark-native rendering
of that loop: queries ARRIVE as a stream (a landing directory, Kafka, …),
each micro-batch is answered with the same batch `ann_search` plan the
batch path uses, and results append to a sink. `foreachBatch` is the
idiomatic bridge — inside it the micro-batch is a plain DataFrame, so the
entire existing serve stack (head routing, partition-pruned posting scan,
final rank) is reused verbatim rather than reimplemented for streams.

Scale shape: the index side (heads broadcast, postings partitioned by
head_id) is identical to batch serving; the stream only bounds how many
queries enter each plan execution — maxFilesPerTrigger/maxOffsetsPerTrigger
is the backpressure knob where the reference has a socket accept queue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def serve_query_stream(
    query_stream: DataFrame,
    heads: DataFrame,
    postings: DataFrame,
    sink_path: str,
    checkpoint_path: str,
    k: int = 10,
    nprobe: int = 8,
    metric: str = "l2",
    timings: list | None = None,
) -> StreamingQuery:
    """Answer a streaming (query_id, vector) feed with SPANN searches.

    Each micro-batch runs the normal `ann_search` plan and APPENDS
    (query_id, rank, id, dist, batch_id) to `sink_path` (parquet). Returns
    the StreamingQuery handle; callers control the trigger/termination —
    maxFilesPerTrigger on the source bounds queries per micro-batch (the
    socket accept queue's backpressure role).

    timings (optional): a list the serve loop appends one
    {"epoch_id", "n_queries", "sec"} dict to per non-empty micro-batch —
    the per-micro-batch serve latency a deployment would export as a
    metric (reference logs per-batch latency in its serve loop;
    bench.py reports these for the multi-batch demo).
    """
    from sptag_spark.index.ann import ann_search

    def answer(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        import time

        import pyspark.sql.functions as F

        t0 = time.time()
        batch = batch.select("query_id", "vector")
        n = None
        if timings is not None:
            batch = batch.persist()
            n = batch.count()
        res = ann_search(batch, heads, postings, k=k, nprobe=nprobe,
                         metric=metric)
        res.withColumn("batch_id", F.lit(epoch_id).cast("long")).write.mode(
            "append"
        ).parquet(sink_path)
        if timings is not None:
            batch.unpersist()
            timings.append(
                {
                    "epoch_id": int(epoch_id),
                    "n_queries": int(n),
                    "sec": time.time() - t0,
                }
            )

    return (
        query_stream.writeStream.foreachBatch(answer)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
