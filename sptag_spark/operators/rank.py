"""Global top-k with a rank column, without the full-data window funnel.

The naive formulation — ``row_number() OVER (ORDER BY ...)`` then
``WHERE rank <= k`` — forces every input row through ONE task (Window with
no partition spec ⇒ Exchange SinglePartition over the whole aggregate).
Correct, but a scale-killer on a real corpus: the BM25 candidate set or the
distinct-token vocabulary of a 100 TB corpus does not fit one task.

``orderBy(...).limit(k)`` instead compiles to TakeOrderedAndProject: each
partition keeps a k-row heap, and only ≤ #partitions·k rows reach the final
merge. The rank window then runs over the ≤ k survivors — and since
TakeOrderedAndProject's output is already SinglePartition, Catalyst inserts
no extra Exchange for it (pinned by tests/test_plans.py).

Mirrors the reference's per-query top-k heap semantics
(AnnService/inc/Core/Common/QueryResultSet.h) applied at corpus level.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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
    """
    w = Window.orderBy(*order)
    return (
        df.orderBy(*order)
        .limit(k)
        .withColumn(rank_col, F.row_number().over(w).cast("long"))
    )
