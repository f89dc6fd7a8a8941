"""Global top-k with a rank column, without the full-data window funnel.

The naive formulation — ``row_number() OVER (ORDER BY ...)`` then
``WHERE rank <= k`` — forces every input row through ONE task (Window with
no partition spec ⇒ Exchange SinglePartition over the whole aggregate).
Correct, but a scale-killer on a real corpus: the BM25 candidate set or the
distinct-token vocabulary of a 100 TB corpus does not fit one task.

``orderBy(...).limit(k)`` instead compiles to TakeOrderedAndProject: each
partition keeps a k-row heap, and only ≤ #partitions·k rows reach the final
merge. The ≤ k survivors arrive in rank order on one partition (the
operator's outputOrdering contract), so the rank column is a plain
monotonically_increasing_id projection — no window node at all (plan shape
pinned by tests/test_plans.py, value equivalence by
tests/test_properties.py).

Mirrors the reference's per-query top-k heap semantics
(AnnService/inc/Core/Common/QueryResultSet.h) applied at corpus level.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# monotonically_increasing_id() = partition_id * 2^33 + row-offset-in-partition
# (documented bit layout: upper 31 bits partition id, lower 33 bits offset).
_MID_PARTITION_STRIDE = 1 << 33


def ranked_topk(
    df: DataFrame,
    order: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Keep the global top-``k`` rows of ``df`` under ``order`` and number
    them 1..k in that order (LONG ``rank_col``).

    ``order`` must be a total order (break ties explicitly, e.g.
    ``[F.col("score").desc(), F.col("doc_id")]``) so rank assignment is
    deterministic.

    Ranking the survivors uses NO window at all: TakeOrderedAndProject's
    output ordering is part of its operator contract (it exposes
    outputOrdering = the sort order, single partition), so
    monotonically_increasing_id() over it yields 0..k-1 in rank order —
    and being non-deterministic, the expression is never pushed below the
    limit or reordered by Catalyst. An unpartitioned rank window here
    would be harmless over ≤ k rows but logs WindowExec's move-all-data
    warning, a false alarm that would mask real funnels in run logs (and
    a constant partition key is folded away by EliminateWindowPartitions,
    bringing the warning back). Correctness vs the window formulation is
    property-tested (tests/test_properties.py), ties included.

    The sortWithinPartitions below is a defensive no-op sort over the ≤ k
    survivors: rank correctness must not DEPEND on the physical plan
    compiling to TakeOrderedAndProject. If the planner ever falls back to
    Sort + GlobalLimit (e.g. spark.sql.execution.topKSortFallbackThreshold
    lowered below k), the single-partition shuffle feeding GlobalLimit
    does not preserve order — the local re-sort restores it for pennies
    (k rows), while under TakeOrderedAndProject the physical
    RemoveRedundantSorts rule elides it (child outputOrdering already
    satisfies it), so the pinned plan shape is unchanged.
    """
    return (
        df.orderBy(*order)
        .limit(k)
        .sortWithinPartitions(*order)
        .withColumn(
            rank_col, (F.monotonically_increasing_id() + 1).cast("long")
        )
    )


def _bucket_offsets(counts: dict[int, int], n_buckets: int) -> dict[int, int]:
    """Exclusive prefix sums over dense bucket ids 0..n_buckets-1 (missing
    buckets count 0)."""
    offsets: dict[int, int] = {}
    acc = 0
    for b in range(n_buckets):
        offsets[b] = acc
        acc += counts.get(b, 0)
    return offsets


def global_row_number_by(
    df: DataFrame,
    key: str,
    out_col: str = "rn",
    num_buckets: int | None = None,
) -> DataFrame:
    """0-based global row number ordered by a UNIQUE, DETERMINISTIC numeric
    ``key`` column — without the single-partition window funnel.

    ``row_number() OVER (ORDER BY key)`` moves every row through one task.
    This instead (1) samples ~``num_buckets`` approximate quantile split
    points of ``key`` (a column-pruned scan of the key alone), (2) assigns
    each row a range bucket with a pure column expression (deterministic, so
    recomputation across the two jobs is safe — no pin needed), (3) collects
    the per-bucket counts (≤ num_buckets scalars) to form exclusive prefix
    offsets, and (4) numbers rows with a PARTITIONED window
    ``row_number() OVER (PARTITION BY bucket ORDER BY key)`` plus the
    bucket's offset. Every stage is parallel in num_buckets; only bucket
    counts touch the driver. Quantile error only skews bucket sizes, never
    correctness.

    Requires ``key`` to be unique (ties across a bucket split point would
    otherwise make numbering ambiguous) and deterministic (it is evaluated
    in two independent jobs).
    """
    spark = df.sparkSession
    if num_buckets is None:
        num_buckets = min(
            int(spark.conf.get("spark.sql.shuffle.partitions", "200")), 256
        )
    kcol = F.col(key).cast("double")
    if num_buckets > 1:
        probs = [i / num_buckets for i in range(1, num_buckets)]
        bounds = sorted(
            {
                b
                for b in df.select(
                    F.percentile_approx(kcol, probs, 10000).alias("b")
                ).first()["b"]
                or []
                if b is not None
            }
        )
    else:
        bounds = []
    if bounds:
        bucket = F.aggregate(
            F.array(*[F.lit(float(b)) for b in bounds]),
            F.lit(0),
            lambda acc, b: acc + F.when(kcol >= b, 1).otherwise(0),
        )
    else:
        bucket = F.lit(0)
    bucketed = df.withColumn("_gbkt", bucket)
    counts = {
        r["_gbkt"]: r["count"]
        for r in bucketed.groupBy("_gbkt").count().collect()
    }
    offsets = _bucket_offsets(counts, len(bounds) + 1)
    off_expr = (
        F.element_at(
            F.create_map(
                *[
                    F.lit(x)
                    for b, off in offsets.items()
                    for x in (b, off)
                ]
            ),
            F.col("_gbkt"),
        )
        if offsets
        else F.lit(0)
    )
    w = Window.partitionBy("_gbkt").orderBy(key)
    return (
        bucketed.withColumn(
            out_col,
            (F.row_number().over(w) - 1 + off_expr).cast("long"),
        )
        .drop("_gbkt")
    )


def global_row_number_arbitrary(
    df: DataFrame, out_col: str = "rn"
) -> DataFrame:
    """0-based global row number in an ARBITRARY but internally consistent
    order (positional-append semantics: the caller needs unique dense
    numbers, not any particular ordering) — no single-partition window.

    The input is pinned with a lazy localCheckpoint so its partition layout
    is frozen across the two jobs (per-partition counts, then numbering) —
    without the pin a shuffle upstream could replay differently between
    jobs. Numbering is then map-only: offset-of-my-partition (exclusive
    prefix sums of the collected per-partition counts — ≤ #partitions
    scalars on the driver) plus my row offset within the partition,
    recovered from monotonically_increasing_id()'s documented layout
    (upper 31 bits partition id, lower 33 bits record number) — no Sort, no
    Window, no Exchange at all.
    """
    pinned = df.localCheckpoint(eager=False)
    pidded = pinned.withColumn("_gpid", F.spark_partition_id())
    counts = {
        r["_gpid"]: r["count"]
        for r in pidded.groupBy("_gpid").count().collect()
    }
    n_parts = (max(counts) + 1) if counts else 0
    offsets = _bucket_offsets(counts, n_parts)
    off_expr = (
        F.element_at(
            F.create_map(
                *[F.lit(x) for p, off in offsets.items() for x in (p, off)]
            ),
            F.col("_gpid"),
        )
        if offsets
        else F.lit(0)
    )
    local = F.monotonically_increasing_id().bitwiseAND(
        F.lit(_MID_PARTITION_STRIDE - 1)
    )
    return pidded.withColumn(
        out_col, (off_expr + local).cast("long")
    ).drop("_gpid")
