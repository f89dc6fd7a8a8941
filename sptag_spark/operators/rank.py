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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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
