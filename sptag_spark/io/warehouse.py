"""Bucketed warehouse tables — shuffle-free co-located joins at scale.

The reference keeps the vector store, metadata offsets, and delete bitset
as separate structures addressed by the SAME vector id
(`VectorSet.h:12-81`, `MetadataSet.h:43`, `Labelset.h:14-120`): a lookup
never "re-partitions" anything because everything is physically laid out
by id. The warehouse-scale Spark equivalent is BUCKETING: write each
id-keyed table `bucketBy(B, id)` + `sortBy(id)`, and every id-equi-join
between tables bucketed the same way (vectors ⋈ tombstones, vectors ⋈
metadata updates, base ⋈ increment merges) executes with ZERO Exchange —
each task joins bucket i of A against bucket i of B straight off the scan.

When the bucketed-join win matters: at 100 TB the serve-path meta attach
is a broadcast join (results are tiny; `operators/knn.py attach_meta`) —
bucketing buys nothing there. It is the MAINTENANCE paths — tombstone
apply, refine/compact, merge of base + streamed increments — that join
big-with-big on id; those shuffle-both-sides today, and at 100 TB the
shuffle IS the job. Bucketing both tables moves that cost to write time,
once, amortized over every subsequent join/refine cycle.

Bucket-count discipline: both sides must use the same B, and B should be
sized so one bucket of the FACT table fits an executor core's working
memory at the target scale (100 TB / B ≤ a few GB ⇒ B in the tens of
thousands on a real cluster; 8-32 in tests). Spark only bucket-joins when
`spark.sql.sources.bucketing.enabled` (default true) and the join keys
cover the bucket spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame, table: str, buckets: int, key: str = "id"
) -> None:
    """Write `df` as a managed parquet table bucketed+sorted by `key`.

    sortBy(key) additionally lets SortMergeJoin skip its per-task sort:
    a join of two same-bucketed sorted tables is scan → merge, the minimal
    physical plan an id-equi-join can have."""
    (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str = "id",
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key: no Exchange on
    either side (tests/test_plans.py pins this)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)


def apply_tombstones_bucketed(
    spark: SparkSession,
    vectors_table: str,
    tombstones_table: str,
) -> DataFrame:
    """The maintenance-path tombstone apply (`Labelset.h` soft-deletes) as a
    co-located LEFT ANTI join: with both tables bucketed by id, the 100 TB
    compaction scan never shuffles the vector store."""
    return spark.table(vectors_table).join(
        spark.table(tombstones_table), "id", "left_anti"
    )
