"""SPFresh-style incremental SPANN maintenance — online adds without rebuild.

Reference discipline: AddIndex appends under a lock and schedules a full
rebuild every AddCountForRebuild=1000 adds (`BKTIndex.cpp:901-970`); SPFresh
(SOSP'23, cited in reference README) refines this to in-place posting
appends against the EXISTING head set, deferring restructuring. The swap to
a new index version happens under `shared_timed_mutex`
(`BKTree.h:538-544` SwapTree).

Spark mapping — `SpannLiveIndex`:
- heads are FIXED between rebuilds; an add micro-batch runs
  `assign_replicas(batch, heads)` — a map-only kernel over the (small)
  batch with the broadcast head matrix, exactly the posting-append step —
  and the result is unioned into the postings view;
- the swap is an atomic Python reference assignment of the postings/heads
  DataFrames (readers that grabbed the old reference keep a consistent
  snapshot — DataFrames are immutable, which is a stronger guarantee than
  the reference's lock);
- deletes are tombstones, anti-joined at search time (`Labelset.h` soft
  deletes);
- after `rebuild_threshold` adds, rebuild() re-selects heads, re-cuts
  postings from the live vector set (the reference's background rebuild;
  SPFresh's split/merge is subsumed by the re-cut at this scale), and swaps.

At 100 TB the postings view is a base partitioned-Parquet table plus delta
files per micro-batch (the union below IS that view); rebuild compacts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sptag_spark.index.ann import ann_search
from sptag_spark.index.heads import DEFAULT_HEAD_RATIO, select_heads
from sptag_spark.index.postings import assign_replicas, build_postings
from sptag_spark.streaming.ingest import ADD_COUNT_FOR_REBUILD


class SpannLiveIndex:
    def __init__(
        self,
        vectors: DataFrame,
        ratio: float = DEFAULT_HEAD_RATIO,
        metric: str = "l2",
        rebuild_threshold: int = ADD_COUNT_FOR_REBUILD,
        prebuilt: tuple[DataFrame, DataFrame] | None = None,
    ) -> None:
        """prebuilt=(heads, postings) attaches an already-built base index
        (the offline build artifact) so serve/maintain cost can be measured
        separately from the build, as the reference's harness does."""
        self._metric = metric
        self._ratio = ratio
        self._rebuild_threshold = rebuild_threshold
        self._spark = vectors.sparkSession
        self._base = vectors.select("id", "vector").persist()
        self._deltas: list[DataFrame] = []
        self._tombstones = self._spark.createDataFrame([], "id long")
        self._n_tombstones = 0
        # every DataFrame THIS index persisted and currently serves from —
        # released on rebuild-swap and close() (resources.py discipline;
        # prebuilt heads/postings belong to the caller and are never
        # unpersisted here). Unpersisting a frame an in-flight reader still
        # references is safe: it recomputes from lineage.
        self._pinned: list[DataFrame] = [self._base]
        if prebuilt is not None:
            self.heads, self.postings = prebuilt
        else:
            self.heads = select_heads(
                self._base, ratio=ratio, metric=metric
            ).persist()
            self.postings = build_postings(self._base, self.heads, metric).persist()
            self.postings.count()
            self._pinned += [self.heads, self.postings]
        self.adds_since_build = 0
        self.builds = 0

    def live_vectors(self) -> DataFrame:
        out = self._base
        for d in self._deltas:
            out = out.unionByName(d)
        if self._n_tombstones == 0:
            return out
        return out.join(self._tombstones, "id", "left_anti")

    def add_batch(self, batch: DataFrame) -> None:
        """Append a micro-batch: assign new vectors to the EXISTING heads
        (map-only over the batch) and atomically swap the postings view."""
        batch = batch.select("id", "vector").persist()
        n = batch.count()
        delta = assign_replicas(batch, self.heads, self._metric).persist()
        delta.count()
        self._deltas.append(batch)
        self._pinned += [batch, delta]
        # atomic reference swap — readers keep their snapshot
        self.postings = self.postings.unionByName(delta)
        self.adds_since_build += n
        if self.adds_since_build >= self._rebuild_threshold:
            self.rebuild()

    def delete_ids(self, ids: DataFrame) -> None:
        self._tombstones = self._tombstones.unionByName(
            ids.select("id")
        ).dropDuplicates(["id"])
        # known non-zero marker; the exact figure is never consulted, only
        # zero-vs-nonzero gates the anti-join (an empty tombstone table
        # still plans and shuffles the join on every search)
        self._n_tombstones = 1

    def search(
        self, queries: DataFrame, k: int = 10, nprobe: int = 10
    ) -> DataFrame:
        """ann_search over the live view: streamed adds are visible the
        moment add_batch returns, deletes are filtered — no rebuild needed."""
        live_postings = self.postings
        if self._n_tombstones:
            live_postings = live_postings.join(
                self._tombstones, "id", "left_anti"
            )
        return ann_search(
            queries, self.heads, live_postings, k=k, nprobe=nprobe,
            metric=self._metric,
        )

    def rebuild(self, should_abort=None) -> None:
        """The reference's background rebuild: fold deltas into the base,
        drop tombstoned rows, re-select heads, re-cut postings, swap.

        should_abort: optional zero-arg callable checked between the three
        phases (IAbortOperation parity — `inc/Core/VectorIndex.h:22-26`,
        `RefineIndex` checks at `BKTIndex.cpp:855,861`). An abort raises
        ExternalAbortError and, because the swap is the LAST step, leaves
        the serving index exactly as it was."""
        from sptag_spark.errors import ExternalAbortError, check_abort

        check_abort(should_abort)
        built = []
        try:
            new_base = self.live_vectors().persist()
            built.append(new_base)
            new_base.count()
            check_abort(should_abort)
            new_heads = select_heads(
                new_base, ratio=self._ratio, metric=self._metric
            ).persist()
            built.append(new_heads)
            check_abort(should_abort)
            new_postings = build_postings(
                new_base, new_heads, self._metric
            ).persist()
            built.append(new_postings)
            new_postings.count()
            check_abort(should_abort)
        except ExternalAbortError:
            # release the partially built frames — without this every
            # aborted rebuild pins a full materialized index copy in
            # executor storage for the session lifetime
            for df in built:
                df.unpersist()
            raise
        self._base, self.heads, self.postings = new_base, new_heads, new_postings
        # swap done — release every frame the PREVIOUS structure pinned
        # (old base, old heads/postings if owned, per-batch deltas)
        self._unpersist_pinned()
        self._pinned = built
        self._deltas = []
        self._tombstones = self._spark.createDataFrame([], "id long")
        self._n_tombstones = 0
        self.adds_since_build = 0
        self.builds += 1

    def _unpersist_pinned(self) -> None:
        # resources.release discipline: the SparkContext (or the whole
        # session) may already be gone when a long-lived holder finally
        # closes — releasing storage must never raise
        for df in self._pinned:
            try:
                df.unpersist()
            except Exception:  # noqa: BLE001
                pass

    def close(self) -> None:
        """Release every persisted frame this index owns (VectorIndex.h
        lifecycle parity — the reference frees its index memory on close).
        The object is dead afterwards; build a new one to serve again.
        Safe to call on a stopped/replaced Spark session."""
        self._unpersist_pinned()
        self._pinned = []
