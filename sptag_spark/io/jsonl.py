"""JSONL source/sink — the training-data interchange format.

The reference's readers cover its own binary/TSV vector formats
(`inc/Helper/VectorSetReaders/*.h`); a 100 TB documents pipeline adds one
more I/O boundary: JSON Lines, the de-facto interchange for text corpora
(one JSON object per line, gz-sharded). Spark's native json source IS the
right engine for it — this module only pins the idioms that make it safe
at scale:

- ALWAYS pass an explicit schema on read: schema inference is a full extra
  pass over 100 TB before the real job starts, and a heterogeneous corpus
  silently widens types mid-scan.
- write with compression="gzip" by default: JSONL is 5-10x redundant, and
  text corpora are read far less often than scanned.
- a shard count scaled to the data, not the session default: thousands of
  tiny gz files thrash the namenode; one giant file can't parallelize
  (gzip is unsplittable — shards ARE the parallelism on read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

# target uncompressed bytes per shard; gzip then lands shards near the
# 100-200 MB range a distributed read schedules well
_SHARD_BYTES = 512 << 20


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str | None = "gzip",
    est_total_bytes: int | None = None,
) -> None:
    """Write one JSON object per row. Shard count derives from the
    Catalyst size estimate (or the caller's) so shards stay near
    _SHARD_BYTES regardless of the upstream partitioning."""
    if est_total_bytes is None:
        est_total_bytes = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    shards = max(1, min(est_total_bytes // _SHARD_BYTES + 1, 100_000))
    w = df.repartition(int(shards)).write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """Explicit-schema JSONL read. Corrupt lines land in a NULL-row rather
    than killing the scan (PERMISSIVE — a 100 TB corpus always has a few),
    and the schema makes column pruning real: reading two fields of a
    50-field corpus parses only those two."""
    return spark.read.schema(schema).json(path)
