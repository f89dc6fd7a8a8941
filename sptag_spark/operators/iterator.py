"""ResultIterator — streaming-k iteration over a ranked result.

Reference: `src/Core/ResultIterator.cpp:30-76` / `SPANNResultIterator.h:20-65`
(VBASE-style, OSDI'23): Next(batch) returns the next-best `batch` results;
once the traversal budget is exceeded results may arrive out of order and the
RelaxedMono flag is set (`BKTIndex.cpp:382-385`).

Exact-engine translation: rank the full candidate set ONCE (cache it), then
page through it. Because the ranking is exact and materialized, results are
always in true ascending order — RelaxedMono is identically False, documented
as an intentional improvement (SURVEY.md §7 "What's hard").

Paging uses rank-range filters over the cached ranking — each page is a
pruned scan of a cached DataFrame, no recomputation, no OFFSET scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sptag_spark.operators.knn import knn


class ResultIterator:
    """Iterate a batch k-NN result query-by-query in rank order.

    >>> it = ResultIterator(vectors, queries, metric="l2", max_results=100)
    >>> first = it.next_batch(10)   # ranks 1..10 for every query
    >>> second = it.next_batch(10)  # ranks 11..20
    >>> it.relaxed_mono
    False
    """

    def __init__(
        self,
        vectors: DataFrame,
        queries: DataFrame,
        metric: str = "l2",
        max_results: int = 1000,
    ) -> None:
        self._ranked = knn(vectors, queries, k=max_results, metric=metric).cache()
        self._pos = 0
        self.max_results = max_results
        # exact engine: ordering is globally true — see module docstring
        self.relaxed_mono = False

    def next_batch(self, batch: int) -> DataFrame:
        lo, hi = self._pos + 1, self._pos + batch
        self._pos = hi
        return self._ranked.filter(
            (F.col("rank") >= lo) & (F.col("rank") <= hi)
        ).withColumn("relaxed_mono", F.lit(False))

    def close(self) -> None:
        self._ranked.unpersist()


class SpannResultIterator(ResultIterator):
    """SPANNResultIterator (`SPANN/SPANNResultIterator.h:20-65`): the same
    Next(batch) contract over the SPANN two-phase search instead of the
    exact scan. The reference streams posting lists in head-batches
    (`m_headBatch`, `SPANN/Options.h:127`) to fill each page lazily; here
    the routed candidate set is ranked once and cached — every page is a
    pruned scan, and because the ranking over the probed candidates is
    materialized, ordering is true within it (RelaxedMono ≡ False). The
    probe budget (nprobe) plays MaxCheck's accuracy-knob role."""

    def __init__(
        self,
        queries: DataFrame,
        heads: DataFrame,
        postings: DataFrame,
        metric: str = "l2",
        max_results: int = 1000,
        nprobe: int = 8,
        head_batch: int | None = None,
        max_dist_ratio: float | None = None,
    ) -> None:
        """head_batch=h enables the reference's lazy probing: start with h
        probed heads and widen by h only when a page requests ranks the
        already-probed candidate pool cannot fill for every query —
        `m_headBatch`'s stream-more-postings-on-demand, with Spark's cached
        ranking replacing the per-page posting read. Note the dist-ratio cut
        also bounds each query's pool: a query may legitimately expose fewer
        than max_results ranks no matter how many heads are probed (the
        reference's under-budget <k semantics)."""
        from sptag_spark.index.ann import MAX_DIST_RATIO, ann_search

        ratio = MAX_DIST_RATIO if max_dist_ratio is None else max_dist_ratio
        self._search = lambda n: ann_search(
            queries, heads, postings, k=max_results, nprobe=n, metric=metric,
            max_dist_ratio=ratio,
        )
        self._n_heads = heads.count()
        self._head_batch = head_batch
        self._nprobe = head_batch if head_batch else nprobe
        self._ranked = self._search(self._nprobe).cache()
        self._pos = 0
        self.max_results = max_results
        self.relaxed_mono = False

    def _available(self) -> int:
        from pyspark.sql import functions as F

        row = self._ranked.groupBy("query_id").count().agg(
            F.min("count")
        ).first()
        return int(row[0] or 0)

    def next_batch(self, batch: int) -> DataFrame:
        from pyspark.sql import functions as F

        if self._head_batch:
            hi = self._pos + batch
            while (
                self._available() < min(hi, self.max_results)
                and self._nprobe < self._n_heads
            ):
                self._ranked.unpersist()
                self._nprobe = min(
                    self._nprobe + self._head_batch, self._n_heads
                )
                self._ranked = self._search(self._nprobe).cache()
        lo, hi = self._pos + 1, self._pos + batch
        self._pos = hi
        return self._ranked.filter(
            (F.col("rank") >= lo) & (F.col("rank") <= hi)
        ).withColumn("relaxed_mono", F.lit(False))
