"""Recall@k / MRR — the reference's quality metrics as a join+agg.

Reference: `Common/TruthSet.h:167-243` CalculateRecall counts a result as a
hit if its id is in the truth set OR its distance ties a truth distance
(distance-tie credit); recall = hits/k averaged over queries, MRR from the
rank of the first hit. The tie tolerance is metric-aware in the reference:
RELATIVE for L2 (`fabs(d - td) < eps * (d + eps)` — squared-L2 grows with
scale, so ties at large distances need a proportional band), ABSOLUTE for
cosine (distance is bounded in [0, 2]), and no credit for ip. Shapes: a
semi-join-with-tolerance + window agg.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DIST_TIE_TOL = 1e-6  # TruthSet.h recall Epsilon


def _tie_cond(d: Column, td: Column, metric: str) -> Column:
    """Metric-aware distance-tie credit (TruthSet.h:167-243)."""
    eps = F.lit(DIST_TIE_TOL)
    if metric == "l2":
        return F.abs(d - td) < eps * (d + eps)
    if metric == "cosine":
        return F.abs(d - td) < eps  # strict, as TruthSet.h:192's `< Epsilon`
    return F.lit(False)  # ip: id match only


def result_hits(
    results: DataFrame,
    truth: DataFrame,
    dist_tie_credit: bool = True,
    metric: str = "l2",
) -> DataFrame:
    """(query_id, rank, id, hit BOOLEAN) — every result row exactly once,
    hit=true iff ANY truth row matches by id or distance-tie. The shared
    first stage of every recall-derived metric: computing it once lets a
    caller derive recall AND structural invariants (row counts, self-hits)
    from a single execution of the search plan."""
    r = results.select("query_id", "rank", "id", "dist")
    t = truth.select(
        F.col("query_id").alias("t_query_id"),
        F.col("id").alias("t_id"),
        F.col("dist").alias("t_dist"),
    )
    cond = (F.col("query_id") == F.col("t_query_id")) & (
        (F.col("id") == F.col("t_id"))
        | (
            F.lit(dist_tie_credit)
            & _tie_cond(F.col("dist"), F.col("t_dist"), metric)
        )
    )
    # left join + dedupe: a result row is a hit if ANY truth row matches.
    return (
        r.join(t, cond, "left")
        .groupBy("query_id", "rank", "id")
        .agg(F.max(F.col("t_id").isNotNull()).alias("hit"))
    )


def recall_per_query(
    results: DataFrame,
    truth: DataFrame,
    k: int,
    dist_tie_credit: bool = True,
    metric: str = "l2",
) -> DataFrame:
    """results/truth: (query_id, rank, id, dist). Returns per query:
    (query_id, n_hits BIGINT, recall DOUBLE, rr DOUBLE) where rr = 1/rank of
    the first hit in the *result* ordering (0.0 when no hit).
    """
    hits = result_hits(results, truth, dist_tie_credit, metric)
    return hits.groupBy("query_id").agg(
        F.sum(F.col("hit").cast("long")).alias("n_hits"),
        (F.sum(F.col("hit").cast("double")) / F.lit(float(k))).alias("recall"),
        F.coalesce(
            F.lit(1.0) / F.min(F.when(F.col("hit"), F.col("rank"))), F.lit(0.0)
        ).alias("rr"),
    )


def recall_summary(per_query: DataFrame) -> DataFrame:
    """Aggregate: (avg_recall, mrr, n_queries) — the numbers the reference
    prints (`SSDServing/SSDIndex.h:284-285`)."""
    return per_query.agg(
        F.avg("recall").alias("avg_recall"),
        F.avg("rr").alias("mrr"),
        F.count("*").alias("n_queries"),
    )
