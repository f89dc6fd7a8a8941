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


def truth_arrays(truth: DataFrame) -> DataFrame:
    """Pre-aggregate a (query_id, id, dist) truth frame to ONE row per query:
    (t_query_id, t_ids ARRAY, t_dists ARRAY). ``result_hits`` consumes this
    form directly (the frame is tagged); callers that verify many searches
    against the same truth table memoize/persist THIS frame so the per-query
    grouping runs once per truth table instead of once per verify run."""
    ta = truth.groupBy(F.col("query_id").alias("t_query_id")).agg(
        F.collect_list("id").alias("t_ids"),
        F.collect_list("dist").alias("t_dists"),
    )
    ta._sptag_truth_arrays = True
    return ta


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
    from a single execution of the search plan.

    Plan shape (r13, guide §2.4/§3.1): the truth side is collapsed to one
    row per query (``truth_arrays``) and broadcast, so "ANY truth row
    matches" is a scalar array expression per result row — a map-side
    BroadcastHashJoin with NO post-join dedup aggregation. The former
    OR-condition row join needed a groupBy over the joined rows (an extra
    Exchange + two HashAggregates on every verify) to collapse multi-matches;
    array_contains/exists computes the same ∃-semantics in place. `truth`
    may be either the raw (query_id, id, dist) frame or an already-
    aggregated ``truth_arrays`` frame (tagged) — memoizing callers pass the
    latter so the truth grouping is off the per-run path entirely."""
    r = results.select("query_id", "rank", "id", "dist")
    ta = (
        truth
        if getattr(truth, "_sptag_truth_arrays", False)
        else truth_arrays(truth)
    )
    hit = F.array_contains(F.col("t_ids"), F.col("id"))
    if dist_tie_credit and metric in ("l2", "cosine"):
        # ∃ truth dist within the metric's tie tolerance — identical credit
        # to the old per-row OR condition, evaluated over the array
        hit = hit | F.exists(
            F.col("t_dists"), lambda td: _tie_cond(F.col("dist"), td, metric)
        )
    return r.join(
        F.broadcast(ta), F.col("query_id") == F.col("t_query_id"), "left"
    ).select(
        "query_id", "rank", "id",
        F.coalesce(hit, F.lit(False)).alias("hit"),
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
