"""In-memory SPANN serving replica — ms-latency serving of Spark-built artifacts.

The reference's deployment shape (SURVEY §2.11, `Server/ServiceContext.cpp`)
is: indexes are BUILT offline, then every serving node loads the artifacts
into RAM/SSD and answers queries from memory at ms latency; the aggregator
shards queries across such replicas. In this engine, Spark IS the offline
build tier (heads, partitioned postings — `index/`), and Spark batch plans
are the high-throughput serve tier; but a per-query job costs ~1s of fixed
scheduling at any scale, so the reference's ms-scale SINGLE-QUERY operating
point needs the reference's own serving shape: load the Spark-built
artifacts into a process-local replica and answer with NumPy.

This module is that replica. It consumes exactly what the Spark side
persists (`io/index_store.py` save_index layout, or live heads/postings
DataFrames) and mirrors `index/ann.py`'s routing + scoring semantics —
including the `limitDist > 0.1` ratio-cut guard and (dist, id) tie order —
so `tests/test_serving_local.py` can pin replica results row-identical to
the distributed `ann_search` plan.

Scale contract: ONE replica must hold heads + postings in RAM — the same
contract the reference imposes per serving node (SPANN keeps postings on
local SSD). Sharding above that is the aggregator's job (`index/ann.py`
route_queries is that same operator, distributed).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from sptag_spark.index.ann import MAX_DIST_RATIO, SEARCH_INTERNAL_RESULT_NUM
from sptag_spark.operators.knn import _exact_pair_dists


def _route_batch(
    head_ids: np.ndarray,
    H: np.ndarray,
    Q: np.ndarray,
    nprobe: int,
    metric: str,
    max_dist_ratio: float,
    nq: np.ndarray | None,
) -> tuple[np.ndarray, np.ndarray]:
    """Batched head routing — per query, bitwise the search_one selection:
    BLAS preselect of nprobe+16 heads behind a tie-safe threshold (keep
    everything <= the kth value, so boundary ties never drop), exact
    row-paired rescore of just those pairs, then the (dist, head_id) order
    and limitDist guard on exact values. → (pair_q, pair_h): query index /
    head slot of every (query, probed head) pair."""
    from sptag_spark.operators.knn import (
        _block_distances,
        _exact_rowpair_dists,
    )

    B = len(Q)
    nH = len(head_ids)
    npb = min(nprobe, nH)
    kkh = min(npb + 16, nH)
    chunk = max(1, int(16_000_000 // max(nH, 1)))
    pq_parts: list[np.ndarray] = []
    ph_parts: list[np.ndarray] = []
    for c0 in range(0, B, chunk):
        Qc = Q[c0 : c0 + chunk]
        DH = _block_distances(H, Qc, metric)  # (nH, m)
        t = np.partition(DH, kkh - 1, axis=0)[kkh - 1]  # (m,)
        qi, hi_ = np.nonzero((DH <= t[None, :]).T)
        pq_parts.append(qi + c0)
        ph_parts.append(hi_)
    pair_q = np.concatenate(pq_parts)
    pair_h = np.concatenate(ph_parts)
    hd = _exact_rowpair_dists(
        H[pair_h],
        Q[pair_q],
        metric,
        nq_rows=(nq[pair_q] if nq is not None else None),
    )
    o = np.lexsort((head_ids[pair_h], hd, pair_q))
    pair_q, pair_h, hd = pair_q[o], pair_h[o], hd[o]
    pos = _run_positions(pair_q)
    keep = pos < npb
    pair_q, pair_h, hd, pos = (
        pair_q[keep],
        pair_h[keep],
        hd[keep],
        pos[keep],
    )
    if max_dist_ratio < float("inf"):
        # pos==0 is each query's min head distance (runs are
        # (dist, id)-sorted); scatter it to the run then cut
        starts = np.nonzero(pos == 0)[0]
        run_id = np.cumsum(pos == 0) - 1
        cut = hd[starts][run_id] * max_dist_ratio
        keep = ~(cut > 0.1) | (hd <= cut)  # limitDist guard
        pair_q, pair_h = pair_q[keep], pair_h[keep]
    return pair_q, pair_h


def route_to_shards(
    centers: np.ndarray | None,
    scatter_topk: int | None,
    q: np.ndarray,
    metric: str,
    n: int,
) -> list[int]:
    """Center-routed scatter selection, shared by the in-process and
    network aggregators: indices of the scatter_topk nearest of ``n``
    shards by query-to-center distance ((dist, index) determinism in
    place of the reference's unstable std::sort ties), or all of them
    when routing is off. scatter_topk <= 0 means BROADCAST — the
    reference's TopK default -1 (`AggregatorContext.cpp:36`), not a
    negative slice."""
    if (
        centers is None
        or scatter_topk is None
        or scatter_topk <= 0
        or scatter_topk >= n
    ):
        return list(range(n))
    # empty shards carry +inf sentinel centers; score only finite rows so
    # the ip/cosine kernels never compute through inf·0 = NaN (the old
    # post-hoc np.where guard was correct but raised RuntimeWarnings).
    # The never-route-to-empty invariant holds by construction: masked
    # rows keep +inf and sort last (r10/r12 advice).
    finite = np.isfinite(centers).all(axis=1)
    d = np.full(n, np.inf)
    if finite.any():
        d[finite] = _exact_pair_dists(
            centers[finite], np.asarray(q, np.float64), metric
        )
    d = np.where(np.isfinite(d), d, np.inf)
    order = np.lexsort((np.arange(n), d))
    return [int(i) for i in order[:scatter_topk]]


def _id_filter_mask(
    ids: np.ndarray,
    deleted_ids: np.ndarray | None,
    allowed_ids: np.ndarray | None,
) -> np.ndarray | None:
    """Serve-time candidate filter: keep ids not in ``deleted_ids``
    (tombstones) and, when given, in ``allowed_ids`` (a metadata
    predicate's surviving ids). → boolean mask, or None when no filter
    applies (callers skip the indexing pass)."""
    keep = None
    if deleted_ids is not None and len(deleted_ids):
        keep = np.isin(ids, np.asarray(deleted_ids), invert=True)
    if allowed_ids is not None:
        k2 = np.isin(ids, np.asarray(allowed_ids))
        keep = k2 if keep is None else (keep & k2)
    return keep


def _run_positions(sorted_keys: np.ndarray) -> np.ndarray:
    """Position of each element within its run of equal keys (keys must
    be pre-sorted) — the segment-arithmetic replacement for a per-group
    ``arange`` loop in the batched rank/preselect stages."""
    new = np.empty(len(sorted_keys), dtype=bool)
    new[0] = True
    new[1:] = sorted_keys[1:] != sorted_keys[:-1]
    starts = np.nonzero(new)[0]
    run_id = np.cumsum(new) - 1
    return np.arange(len(sorted_keys), dtype=np.int64) - starts[run_id]


def _dedup_keep_min(
    cq: np.ndarray,
    key2: np.ndarray,
    val: np.ndarray,
    *carry: np.ndarray,
) -> tuple:
    """One row per (cq, key2) pair, keeping the MINIMUM ``val`` (carried
    arrays take the group's first row in sorted order — callers only pass
    carries whose value is identical across a group's rows, e.g. replica
    rows of one vector id). Packs the pair into one int64 for a single
    argsort pass when key2 fits 32 bits; arbitrary keys take the 3-key
    lexsort. Shared by the full-vector and PQ batch dedups.
    → (cq_u, key2_u, val_u, *carry_u)."""
    if (
        len(key2)
        and key2.min() >= 0
        and key2.max() < (1 << 32)
        and cq.max() < (1 << 31)
    ):
        key = (cq << np.int64(32)) | key2
        o = np.argsort(key, kind="stable")
        key_s = key[o]
        new = np.empty(len(key_s), dtype=bool)
        new[0] = True
        new[1:] = key_s[1:] != key_s[:-1]
        starts = np.nonzero(new)[0]
        return (
            key_s[starts] >> np.int64(32),
            key_s[starts] & np.int64(0xFFFFFFFF),
            np.minimum.reduceat(val[o], starts),
            *(c[o][starts] for c in carry),
        )
    o = np.lexsort((val, key2, cq))
    cq_s, k_s, v_s = cq[o], key2[o], val[o]
    new = np.empty(len(cq_s), dtype=bool)
    new[0] = True
    new[1:] = (cq_s[1:] != cq_s[:-1]) | (k_s[1:] != k_s[:-1])
    return (
        cq_s[new],
        k_s[new],
        v_s[new],
        *(c[o][new] for c in carry),
    )


class LocalSpannReplica:
    """Process-local SPANN index: broadcast-free, job-free serving."""

    dispatch_label = "replica"  # planner last_dispatch tag

    #: per-call IO counters in the reference harness's "Ex IOs / Ex
    #: Elements" shape (SSDIndex.h:288-345) — class defaults so every
    #: subclass (incl. from_store loaders that bypass __init__) reads 0
    #: before its first search
    last_io_postings = 0
    last_io_rows = 0
    last_batch_io: dict | None = None

    def __init__(self, heads: DataFrame, postings: DataFrame) -> None:
        hp = heads.select("head_id", "vector").toPandas()
        self.head_ids = hp["head_id"].to_numpy(np.int64)
        order = np.argsort(self.head_ids)
        self.head_ids = self.head_ids[order]
        self.H = np.array(hp["vector"].tolist(), dtype=np.float64)[order]

        pp = postings.select("head_id", "id", "vector").toPandas()
        # drop MEMBERLESS heads (r12): a reference head always holds at
        # least its own vector (ApproximateRNG assigns every vector via
        # the exact head search), but the routed grouped assignment can
        # displace a head into groups none of its nearby vectors probe —
        # an empty posting. Serving one is pure waste, and worse: a query
        # whose NEAREST head is empty lets the limitDist guard prune every
        # other head and answer EMPTY (measured, r12 dim-100 probe — 11 of
        # 64 queries). nprobe then counts real postings only, as in the
        # reference.
        live = np.unique(pp["head_id"].to_numpy(np.int64))
        if len(live) < len(self.head_ids):
            keep = np.isin(self.head_ids, live)
            self.head_ids = self.head_ids[keep]
            self.H = self.H[keep]
        slot = np.searchsorted(self.head_ids, pp["head_id"].to_numpy(np.int64))
        porder = np.argsort(slot, kind="stable")
        slot = slot[porder]
        self.post_ids = pp["id"].to_numpy(np.int64)[porder]
        self.post_V = np.array(pp["vector"].tolist(), dtype=np.float64)[porder]
        self.indptr = np.searchsorted(slot, np.arange(len(self.head_ids) + 1))
        # per-head slab EXTENTS (offset, length into post_V/post_ids) — the
        # indirection that lets a patched disk store keep slabs
        # non-contiguous (log-structured appends); contiguous CSR here
        self.slab_off = self.indptr[:-1]
        self.slab_len = np.diff(self.indptr)

    @classmethod
    def from_path(cls, spark: SparkSession, path: str) -> "LocalSpannReplica":
        """Load from a save_index() directory — the handoff from the Spark
        build tier to a serving node."""
        import os

        heads = spark.read.parquet(os.path.join(path, "heads"))
        postings = spark.read.parquet(os.path.join(path, "postings"))
        return cls(heads, postings)

    def search_one(
        self,
        q: np.ndarray,
        k: int = 10,
        nprobe: int = SEARCH_INTERNAL_RESULT_NUM,
        metric: str = "l2",
        max_dist_ratio: float = MAX_DIST_RATIO,
        deleted_ids: np.ndarray | None = None,
        allowed_ids: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """→ (ids, dists), rank order. Same routing + scoring semantics as
        the distributed plan (index/ann.py).

        ``deleted_ids`` / ``allowed_ids``: serve-time candidate filters —
        the reference's serving node drops tombstoned ids during search
        (`SPANNIndex.cpp` checks m_deletedID per candidate; metadata
        filters reach the same spot via the filter UDF, §2.2) rather than
        rebuilding. Filtering happens BEFORE scoring, after dedup, so the
        top-k back-fills from the surviving candidates exactly like the
        reference's heap that never admits a deleted id."""
        if len(self.head_ids) == 0:  # empty shard answers empty, not a crash
            self.last_io_postings = self.last_io_rows = 0
            return np.empty(0, dtype=np.int64), np.empty(0)
        q = np.asarray(q, dtype=np.float64)
        hd = _exact_pair_dists(self.H, q, metric)
        sel = np.lexsort((self.head_ids, hd))[: min(nprobe, len(self.head_ids))]
        if max_dist_ratio < float("inf"):
            cut = hd[sel].min() * max_dist_ratio
            if cut > 0.1:  # limitDist guard (SPANNIndex.cpp:217-230)
                sel = sel[hd[sel] <= cut]
        cand = np.concatenate(
            [
                np.arange(
                    self.slab_off[s], self.slab_off[s] + self.slab_len[s]
                )
                for s in sel
            ]
        ) if len(sel) else np.empty(0, dtype=np.int64)
        # per-query IO witness, the reference harness's "Ex IOs / Ex
        # Elements" columns (SSDIndex.h:288-345): posting lists read and
        # candidate rows gathered from the store — for DiskSpannReplica
        # these ARE the memmap reads. Two ints; bench reads them per call.
        self.last_io_postings = int(len(sel))
        self.last_io_rows = int(cand.size)
        if cand.size == 0:
            return np.empty(0, dtype=np.int64), np.empty(0)
        # replica dedup on vector id (same as the distributed min-agg)
        ids = self.post_ids[cand]
        _, first = np.unique(ids, return_index=True)
        cand = cand[first]
        ids = self.post_ids[cand]
        keep = _id_filter_mask(ids, deleted_ids, allowed_ids)
        if keep is not None:
            cand, ids = cand[keep], ids[keep]
        if cand.size == 0:
            return np.empty(0, dtype=np.int64), np.empty(0)
        # explicit float64 promotion of the gathered slab: a float32
        # store (DiskSpannReplica's memmap) must score bit-identically to
        # the RAM replica's float64 copy — l2 promotes inside V - q, but
        # cosine's norm would otherwise accumulate in float32
        d = _exact_pair_dists(
            np.asarray(self.post_V[cand], dtype=np.float64), q, metric
        )
        top = np.lexsort((ids, d))[: min(k, len(ids))]
        return ids[top], d[top]

    def _batch_search_serial(
        self,
        queries: list[tuple[int, np.ndarray]],
        k: int = 10,
        nprobe: int = SEARCH_INTERNAL_RESULT_NUM,
        metric: str = "l2",
        max_dist_ratio: float = MAX_DIST_RATIO,
        deleted_ids: np.ndarray | None = None,
        allowed_ids: np.ndarray | None = None,
    ) -> list[tuple[int, int, int, float]]:
        """Per-query loop over search_one — the semantic definition of
        batch_search; tests pin the vectorized path row-identical to it."""
        out = []
        for qid, q in queries:
            ids, d = self.search_one(
                q, k, nprobe, metric, max_dist_ratio,
                deleted_ids=deleted_ids, allowed_ids=allowed_ids,
            )
            out.extend(
                (int(qid), r + 1, int(i), float(dd))
                for r, (i, dd) in enumerate(zip(ids, d))
            )
        return out

    def batch_search(
        self,
        queries: list[tuple[int, np.ndarray]],
        k: int = 10,
        nprobe: int = SEARCH_INTERNAL_RESULT_NUM,
        metric: str = "l2",
        max_dist_ratio: float = MAX_DIST_RATIO,
        deleted_ids: np.ndarray | None = None,
        allowed_ids: np.ndarray | None = None,
    ) -> list[tuple[int, int, int, float]]:
        """→ rows of (query_id, rank, id, dist) — the QueryResult contract,
        row-identical to a search_one loop but VECTORIZED head-major: the
        batch's (query, probed-head) pairs are inverted so each posting
        slab is gathered from the store ONCE per batch (for the disk
        replica, one page-read per slab instead of one per query probing
        it) and scored against all its queries in one BLAS block — the
        reference's batch-throughput shape (`SearchIndex` over a query
        batch amortizes posting reads the same way). Final distances are
        the exact per-pair recompute on a (k+16)-margin preselect, the
        same BLAS-select / exact-rescore contract as the distributed
        kernel (`operators/knn.py _topk_frame`), so reported values stay
        bit-identical to search_one and the SQL oracle.

        Candidate memory is O(batch · nprobe · posting_limit) scalar rows
        (vectors never accumulate — only the probed slab is resident);
        the planner's REPLICA_DISPATCH_MAX_QUERIES cap bounds it at serve
        scale."""
        from sptag_spark.operators.knn import (
            _block_distances,
            _exact_rowpair_dists,
        )

        if not queries or len(self.head_ids) == 0:
            return []
        # above ~512 queries the global sort/dedup arrays outgrow cache and
        # per-query cost starts climbing back up — process in chunks at the
        # measured sweet spot (SCALING.md r10 batch table; a THREADED chunk
        # fan-out was also measured: ≤13% at 4 workers, negative at 8, so
        # the loop stays serial)
        if len(queries) > _BATCH_QUERY_CHUNK:
            out: list[tuple[int, int, int, float]] = []
            ios: list[dict] = []
            for i in range(0, len(queries), _BATCH_QUERY_CHUNK):
                out.extend(
                    self.batch_search(
                        queries[i : i + _BATCH_QUERY_CHUNK],
                        k,
                        nprobe,
                        metric,
                        max_dist_ratio,
                        deleted_ids=deleted_ids,
                        allowed_ids=allowed_ids,
                    )
                )
                if self.last_batch_io is not None:
                    ios.append(self.last_batch_io)
            if ios:  # stitch the chunked IO tables back to batch order
                self.last_batch_io = {
                    key: np.concatenate([io[key] for io in ios])
                    for key in ios[0]
                }
            return out
        qids = np.array([int(qid) for qid, _ in queries], dtype=np.int64)
        Q = np.array([np.asarray(v, dtype=np.float64) for _, v in queries])
        B, d = Q.shape
        nH = len(self.head_ids)
        npb = min(nprobe, nH)
        # per-query 1-D norms for cosine rescore (the pair kernel computes
        # np.linalg.norm(q) per query — same code path, so same ulps)
        nq = (
            np.array([np.linalg.norm(q) for q in Q])
            if metric == "cosine"
            else None
        )

        # The select-then-rescore contract used throughout: BLAS block
        # values pick candidates behind a TIE-SAFE threshold (the kth
        # smallest value per query, keeping everything <= it, so boundary
        # ties are never dropped) with a +16 noise margin, and every
        # REPORTED value is the exact row-paired recompute — bitwise
        # search_one's — so the final (dist, id) rank can only differ if
        # GEMM noise exceeded 16 true neighbors, which distinct vectors'
        # distance gaps dwarf.

        # Stage 1 — routing (shared helper; bitwise the search_one
        # selection, incl. the (dist, head_id) tie order and limitDist
        # guard on exact values)
        pair_q, pair_h = _route_batch(
            self.head_ids, self.H, Q, npb, metric, max_dist_ratio, nq
        )
        # per-query LOGICAL IO table (reference shape, SSDIndex.h:288-345):
        # lists read / rows gathered per query. The head-major pass below
        # amortizes the PHYSICAL slab reads across queries sharing a head —
        # that amortization is the batch win; the reference's per-query
        # table is logical, which this matches (bitwise search_one's
        # counters). Two bincounts over the routed pairs — negligible.
        self.last_batch_io = {
            "postings_read": np.bincount(pair_q, minlength=B),
            "rows_scanned": np.bincount(
                pair_q, weights=self.slab_len[pair_h], minlength=B
            ).astype(np.int64),
        }
        if pair_h.size == 0:
            return []

        # Stage 2 — head-major scoring: one slab gather + one BLAS block
        # per distinct probed head, shared by every query probing it;
        # per-head tie-safe local top-(k+16) caps what flows downstream
        # (the global top-k is a subset of every slab's local top-k).
        ho = np.argsort(pair_h, kind="stable")
        ph, pq = pair_h[ho], pair_q[ho]
        bnd = np.nonzero(ph[1:] != ph[:-1])[0] + 1
        starts = np.concatenate(([0], bnd))
        ends = np.concatenate((bnd, [len(ph)]))
        cand_q: list[np.ndarray] = []
        cand_rows: list[np.ndarray] = []
        cand_d: list[np.ndarray] = []
        kk = k + 16
        for s0, e0 in zip(starts, ends):
            s = int(ph[s0])
            lo = int(self.slab_off[s])
            hi = lo + int(self.slab_len[s])
            if hi == lo:
                continue
            qsub = pq[s0:e0]
            rows = np.arange(lo, hi, dtype=np.int64)
            # serve-time filter BEFORE the per-slab cap: the cap ranks by
            # unfiltered distance, so a selective filter applied later
            # would silently evict surviving candidates that search_one
            # back-fills (caught by code review; pinned by
            # test_batch_filter_survives_slab_cap)
            fmask = _id_filter_mask(
                self.post_ids[lo:hi], deleted_ids, allowed_ids
            )
            if fmask is not None:
                rows = rows[fmask]
                if rows.size == 0:
                    continue
            slab = np.asarray(self.post_V[rows], dtype=np.float64)
            D = _block_distances(slab, Q[qsub], metric)  # (|rows|, |qsub|)
            if len(rows) > kk:
                t = np.partition(D, kk - 1, axis=0)[kk - 1]  # (|qsub|,)
                r, c = np.nonzero((D <= t[None, :]).T)
                cand_q.append(qsub[r])
                cand_rows.append(rows[c])
                cand_d.append(D[c, r])
            else:
                cand_q.append(np.repeat(qsub, len(rows)))
                cand_rows.append(np.tile(rows, len(qsub)))
                cand_d.append(D.T.ravel())
        if not cand_q:
            return []
        cq = np.concatenate(cand_q)
        cr = np.concatenate(cand_rows)
        cd = np.concatenate(cand_d)
        ids_all = self.post_ids[cr]

        # Stage 3 — global dedup + rank: replica dedup by (query, id)
        # (replicas of an id share one vector, so any representative row
        # scores identically), margin preselect on BLAS values, exact
        # row-paired rescore of survivors, final (dist, id) rank — all
        # segment arithmetic, no per-query loop.
        cq_u, ids_u, cd_u, cr_u = _dedup_keep_min(cq, ids_all, cd, cr)
        # (serve-time filters were already applied per slab in stage 2 —
        # before the slab cap — so every candidate here is a survivor)
        o2 = np.lexsort((ids_u, cd_u, cq_u))
        cq_u, ids_u, cr_u = cq_u[o2], ids_u[o2], cr_u[o2]
        pos = _run_positions(cq_u)
        mkeep = pos < kk
        cq_u, ids_u, cr_u = cq_u[mkeep], ids_u[mkeep], cr_u[mkeep]
        V_sel = np.asarray(self.post_V[cr_u], dtype=np.float64)
        d_exact = _exact_rowpair_dists(
            V_sel,
            Q[cq_u],
            metric,
            nq_rows=(nq[cq_u] if nq is not None else None),
        )
        o3 = np.lexsort((ids_u, d_exact, cq_u))
        cq_u, ids_u, d_exact = cq_u[o3], ids_u[o3], d_exact[o3]
        pos = _run_positions(cq_u)
        fin = pos < k
        qid_f = qids[cq_u[fin]]
        rank_f = pos[fin] + 1
        id_f = ids_u[fin]
        d_f = d_exact[fin]
        return [
            (int(a), int(r), int(i), float(dd))
            for a, r, i, dd in zip(qid_f, rank_f, id_f, d_f)
        ]


_STORE_CHUNK_ROWS = 65536  # vector rows buffered per flush (~16 MB at d=64)
_BATCH_QUERY_CHUNK = 512  # batch_search sub-batch size (measured knee, r10)

#: native VALUE-TYPE packed stores (VERDICT r11 #1): the reference keeps
#: vectors in their declared type end-to-end — Dataset<T> rows are
#: D×sizeof(T) bytes (`AnnService/inc/Core/VectorSet.h:35`,
#: `Dataset.h:78-94`), so SPACEV1B's int8 corpus costs 1 byte/component on
#: SSD and per posting read. A float32-only store is 4× that I/O. The
#: score kernels promote every gathered slab to float64 before any
#: arithmetic, so an int8/uint8/int16 store is RESULT-IDENTICAL whenever
#: the cast is lossless — which the builders verify per chunk.
_STORE_DTYPES = {
    "float32": np.float32,
    "int8": np.int8,
    "uint8": np.uint8,
    "int16": np.int16,
}
_STORE_EXT = {"float32": "f32", "int8": "i8", "uint8": "u8", "int16": "i16"}


def _pack_values(V32: np.ndarray, value_type: str) -> np.ndarray:
    """Cast a float32 vector block to the store's value type, REFUSING a
    lossy cast: an int8 store of a genuinely-float corpus would silently
    change every distance, so the builder fails loudly instead (the
    reference can't hit this — its Dataset<T> never converts)."""
    if value_type == "float32":
        return V32
    dt = _STORE_DTYPES[value_type]
    Vt = V32.astype(dt)
    if not np.array_equal(Vt.astype(np.float32), V32):
        raise ValueError(
            f"value_type={value_type!r} packed store would be LOSSY: vector "
            f"components are not exactly representable as {value_type} — "
            "build with value_type='float32' (or ingest the corpus in its "
            "native integer type)"
        )
    return Vt


def _vector_crc(df: DataFrame):
    """Order-independent CONTENT checksum of the vector column: integer
    sum of per-row crc32 over the JSON form. Ids alone are blind to a
    re-embedded corpus (same ids, new values) — the exact case where
    serving a stale store silently answers with the previous embedding's
    distances (r10 review)."""
    from pyspark.sql import functions as F

    return F.sum(F.crc32(F.to_json(F.col("vector"))))


def postings_fingerprint(postings: DataFrame) -> dict:
    """Identity of the posting set a packed store was built from — row
    count + (head_id, id) checksum + vector content checksum, one agg
    job. Recorded in the store's meta.json so a rebuilt index at the same
    path never serves a stale store (the same staleness class ADVICE r9
    flagged for the refine store), including an in-place re-embedding
    that preserves ids."""
    from pyspark.sql import functions as F

    r = postings.agg(
        F.count("*").alias("n"),
        (F.sum("id") + F.sum("head_id")).alias("s"),
        _vector_crc(postings).alias("v"),
    ).first()
    return {
        "post_rows": int(r["n"]),
        "post_id_sum": int(r["s"] or 0),
        "post_vec_crc": int(r["v"] or 0),
    }


def packed_store_matches(
    store_dir: str, fingerprint: dict, value_type: str = "float32"
) -> bool:
    """True when an existing packed store at ``store_dir`` was built from
    the posting set with this fingerprint AND in this value type
    (missing/legacy meta → False / float32). A value-type switch rebuilds:
    the files are a different width per component."""
    import json
    import os

    meta_p = os.path.join(store_dir, "meta.json")
    if not os.path.exists(meta_p):
        return False
    with open(meta_p) as f:
        meta = json.load(f)
    return meta.get("value_type", "float32") == value_type and all(
        meta.get(k) == fingerprint[k]
        for k in ("post_rows", "post_id_sum", "post_vec_crc")
    )


def _store_patch_torn(store_dir: str) -> bool:
    """True when a patch died between the sidecar and meta replaces —
    patch_sidecars.npz carries an epoch meta.json doesn't. Constructors
    given Spark artifacts treat a torn store like a fingerprint mismatch
    (rebuild); from_store raises instead (r12 ADVICE)."""
    import json
    import os

    sc_p = os.path.join(store_dir, "patch_sidecars.npz")
    if not os.path.exists(sc_p):
        return False
    try:
        with open(os.path.join(store_dir, "meta.json")) as f:
            meta = json.load(f)
        with np.load(sc_p) as z:
            return int(z["patch_epoch"][0]) != int(meta.get("patch_epoch", -1))
    except (OSError, KeyError, ValueError):
        return True


def build_packed_store(
    heads: DataFrame,
    postings: DataFrame,
    store_dir: str,
    chunk_rows: int = _STORE_CHUNK_ROWS,
    value_type: str = "float32",
) -> dict:
    """Stream the DiskSpannReplica packed store from Spark artifacts —
    the posting-file write stage of the reference's SSD build
    (`ExtraFullGraphSearcher.h:587-1000` writes posting files a batch at a
    time), kept OUT-OF-CORE on the build side too (VERDICT r9 #1): Spark
    sorts the postings by (head_id, id) and the driver consumes the sorted
    stream through ``toLocalIterator``, flushing fixed-size float32 chunks
    into ``post_vectors.f32``. Peak driver memory is heads (the RAM
    contract) + ONE chunk of posting vectors + 8 bytes/row of ids — never
    the shard's vector matrix, which is exactly what lets this build a
    store for a shard LARGER than driver RAM.

    ``value_type``: store vectors as int8/uint8/int16/float32 — the
    reference's Dataset<T> width (`VectorSet.h:35`). Non-float32 requires
    a LOSSLESS cast (verified per chunk) and is then result-identical:
    the score kernels promote gathered slabs to float64 regardless.

    → build stats (recorded in meta.json): ``max_buffer_rows`` is the hard
    memory witness — the chunked writer never held more vector rows than
    this."""
    import json
    import os

    if value_type not in _STORE_DTYPES:
        raise ValueError(
            f"value_type must be one of {sorted(_STORE_DTYPES)}: {value_type!r}"
        )
    os.makedirs(store_dir, exist_ok=True)
    hp = heads.select("head_id", "vector").toPandas()  # small side, by contract
    raw_ids = hp["head_id"].to_numpy(np.int64)
    order = np.argsort(raw_ids)
    head_ids = raw_ids[order]
    H = np.array(hp["vector"].tolist(), dtype=np.float64)[order]
    np.save(os.path.join(store_dir, "head_ids.npy"), head_ids)
    np.save(os.path.join(store_dir, "H.npy"), H)

    stats = {"max_buffer_rows": 0, "chunk_rows": int(chunk_rows), "flushes": 0}
    counts = np.zeros(len(head_ids) + 1, dtype=np.int64)
    id_chunks: list[np.ndarray] = []
    rows = 0
    dim = int(H.shape[1]) if H.ndim == 2 else 0
    buf_h: list[int] = []
    buf_i: list[int] = []
    buf_v: list = []
    vec_file = os.path.join(store_dir, f"post_vectors.{_STORE_EXT[value_type]}")
    with open(vec_file, "wb") as f:

        def flush() -> None:
            nonlocal rows, dim
            if not buf_v:
                return
            stats["max_buffer_rows"] = max(stats["max_buffer_rows"], len(buf_v))
            V = np.array(buf_v, dtype=np.float32)
            dim = int(V.shape[1])
            _pack_values(V, value_type).tofile(f)
            id_chunks.append(np.array(buf_i, dtype=np.int64))
            slots = np.searchsorted(head_ids, np.array(buf_h, dtype=np.int64))
            np.add.at(counts, slots + 1, 1)
            rows += len(buf_v)
            stats["flushes"] += 1
            buf_h.clear()
            buf_i.clear()
            buf_v.clear()

        it = (
            postings.select("head_id", "id", "vector")
            .orderBy("head_id", "id")
            .toLocalIterator(prefetchPartitions=False)
        )
        for row in it:
            buf_h.append(row["head_id"])
            buf_i.append(row["id"])
            buf_v.append(row["vector"])
            if len(buf_v) >= chunk_rows:
                flush()
        flush()
    post_ids = (
        np.concatenate(id_chunks) if id_chunks else np.empty(0, dtype=np.int64)
    )
    np.save(os.path.join(store_dir, "post_ids.npy"), post_ids)
    np.save(os.path.join(store_dir, "indptr.npy"), np.cumsum(counts))
    with open(os.path.join(store_dir, "meta.json"), "w") as f:
        json.dump(
            {"rows": int(rows), "dim": dim, "value_type": value_type,
             "build": stats, **postings_fingerprint(postings)},
            f,
        )
    return stats


def build_packed_store_parallel(
    heads: DataFrame,
    postings: DataFrame,
    store_dir: str,
    n_fragments: int | None = None,
    value_type: str = "float32",
) -> dict:
    """Executor-parallel twin of build_packed_store: the SORT and the
    vector serialization run on executors instead of funneling through one
    driver iterator. Postings are range-partitioned by (head_id, id) —
    partition i's keys all precede partition i+1's — each partition writes
    its OWN float32 fragment + id/count sidecars (bounded memory: one
    Arrow batch of vectors at a time), and the driver CONCATENATES the
    fragments in partition order with file-to-file copies (no vector ever
    driver-resident). Byte-identical store to the serial builder.

    This is the 100 TB build shape — the reference's SSD build writes its
    posting files batch-at-a-time per selection worker
    (`ExtraFullGraphSearcher.h:587-1000`); here each Spark partition is
    that worker. Local mode shares /tmp; on a cluster the fragment dir
    must be shared storage (same place the posting files live).

    ``value_type``: as build_packed_store — the lossless-cast check runs
    EXECUTOR-side, per Arrow batch, inside the fragment writer.

    → build stats: per-fragment row counts plus ``max_batch_rows``, the
    largest vector block any single writer held."""
    import json
    import os
    import shutil

    if value_type not in _STORE_DTYPES:
        raise ValueError(
            f"value_type must be one of {sorted(_STORE_DTYPES)}: {value_type!r}"
        )
    os.makedirs(store_dir, exist_ok=True)
    ext = _STORE_EXT[value_type]
    hp = heads.select("head_id", "vector").toPandas()  # small side, by contract
    raw_ids = hp["head_id"].to_numpy(np.int64)
    order = np.argsort(raw_ids)
    head_ids = raw_ids[order]
    H = np.array(hp["vector"].tolist(), dtype=np.float64)[order]
    np.save(os.path.join(store_dir, "head_ids.npy"), head_ids)
    np.save(os.path.join(store_dir, "H.npy"), H)

    frag_dir = os.path.join(store_dir, "_fragments")
    shutil.rmtree(frag_dir, ignore_errors=True)
    os.makedirs(frag_dir)
    if n_fragments is None:
        spark = postings.sparkSession
        n_fragments = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    def write_fragment(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        f = None
        ids: list[np.ndarray] = []
        hcounts: dict[int, int] = {}
        rows = 0
        dim = 0
        max_batch = 0
        for pdf in batches:
            if not len(pdf):
                continue
            if f is None:
                f = open(os.path.join(frag_dir, f"part_{pid:05d}.{ext}"), "wb")
            V = np.array(pdf["vector"].tolist(), dtype=np.float32)
            dim = int(V.shape[1])
            max_batch = max(max_batch, len(V))
            _pack_values(V, value_type).tofile(f)
            ids.append(pdf["id"].to_numpy(np.int64))
            hid, cnt = np.unique(
                pdf["head_id"].to_numpy(np.int64), return_counts=True
            )
            for h, c in zip(hid.tolist(), cnt.tolist()):
                hcounts[h] = hcounts.get(h, 0) + c
            rows += len(V)
        if f is None:
            return
        f.close()
        np.save(
            os.path.join(frag_dir, f"part_{pid:05d}.ids.npy"),
            np.concatenate(ids),
        )
        hk = np.array(sorted(hcounts), dtype=np.int64)
        np.save(
            os.path.join(frag_dir, f"part_{pid:05d}.heads.npy"),
            np.stack([hk, np.array([hcounts[h] for h in hk], np.int64)]),
        )
        yield pd.DataFrame(
            {
                "pid": [pid],
                "rows": [rows],
                "dim": [dim],
                "max_batch_rows": [max_batch],
            }
        )

    frags = (
        postings.select("head_id", "id", "vector")
        .repartitionByRange(n_fragments, "head_id", "id")
        .sortWithinPartitions("head_id", "id")
        .mapInPandas(
            write_fragment,
            "pid int, rows long, dim int, max_batch_rows long",
        )
        .collect()
    )
    frags.sort(key=lambda r: r["pid"])
    rows = sum(r["rows"] for r in frags)
    # H is (0,)-shaped for an EMPTY shard (n_shards > head count makes
    # some range empty) — the store must still build and load (r10 review)
    dim = max(
        (r["dim"] for r in frags),
        default=int(H.shape[1]) if H.ndim == 2 else 0,
    )
    counts = np.zeros(len(head_ids) + 1, dtype=np.int64)
    id_parts: list[np.ndarray] = []
    with open(os.path.join(store_dir, f"post_vectors.{ext}"), "wb") as out:
        for r in frags:
            base = os.path.join(frag_dir, f"part_{r['pid']:05d}")
            with open(f"{base}.{ext}", "rb") as fin:
                shutil.copyfileobj(fin, out, length=1 << 22)
            id_parts.append(np.load(base + ".ids.npy"))
            hk, hc = np.load(base + ".heads.npy")
            counts[np.searchsorted(head_ids, hk) + 1] += hc
    post_ids = (
        np.concatenate(id_parts) if id_parts else np.empty(0, dtype=np.int64)
    )
    np.save(os.path.join(store_dir, "post_ids.npy"), post_ids)
    np.save(os.path.join(store_dir, "indptr.npy"), np.cumsum(counts))
    shutil.rmtree(frag_dir)
    stats = {
        "mode": "parallel",
        "fragments": len(frags),
        "max_batch_rows": max((r["max_batch_rows"] for r in frags), default=0),
    }
    with open(os.path.join(store_dir, "meta.json"), "w") as f:
        json.dump(
            {"rows": int(rows), "dim": dim, "value_type": value_type,
             "build": stats, **postings_fingerprint(postings)},
            f,
        )
    return stats


def patch_packed_store(
    store_dir: str,
    heads: DataFrame,
    postings: DataFrame,
    touched_heads,
    fingerprint: dict | None = None,
) -> dict:
    """Incremental store patch after LIRE maintenance (VERDICT r11 #2) —
    SPFresh's whole point is that maintenance I/O is LOCAL (SOSP'23 §4;
    the reference edits posting files in place,
    `SPANN/ExtraFullGraphSearcher.h`), so a split/merge must not trigger a
    full packed-store rebuild. The store becomes log-structured: slabs of
    ``touched_heads`` (plus any heads new to ``heads``) are re-read from
    the postings table — a partition-pruned ``head_id IN (...)`` scan, the
    same scope `_retire_and_reassign` edits — and APPENDED to the vector
    file; the extent table then points those heads at their new segments
    while every untouched head keeps its original extent, so untouched
    slab bytes are bit-identical (pinned by test). Retired heads simply
    lose their extent; their old file rows become dead space, tracked in
    meta as ``dead_rows`` with ``needs_compaction`` raised once dead
    exceeds live (a full rebuild then re-packs contiguously).

    Driver memory: the touched postings only (one posting + neighbor
    fanout per LIRE op — thousands of rows) plus the O(#heads) sidecars
    already under the RAM-tier contract. The fingerprint in meta is
    updated to the NEW postings identity (one Spark agg, executor-side),
    so DiskSpannReplica's staleness gate accepts the patched store.

    Crash safety (r12 ADVICE): the patched sidecar set (head_ids, H,
    extents, post_ids) is ONE file — ``patch_sidecars.npz`` written to a
    temp name and ``os.replace``d, so the extent table can never be seen
    half-updated — stamped with a ``patch_epoch`` that meta.json (also
    tmp+replace, written LAST) must match. The crash windows are all
    benign: dying after the vector append leaves old sidecars pointing at
    old extents (appended bytes are dead space); dying between the npz
    and meta replaces leaves an epoch mismatch that the loader refuses
    with a clear error (from_store) or rebuilds past (artifacts supplied,
    via the fingerprint gate), instead of serving out-of-range extents.

    → stats: ``vector_bytes_appended`` is the I/O witness — compare with
    ``store_vector_bytes`` to see the locality win."""
    import json
    import os

    meta_p = os.path.join(store_dir, "meta.json")
    with open(meta_p) as f:
        meta = json.load(f)
    vt = meta.get("value_type", "float32")
    ext_name = _STORE_EXT[vt]
    vec_path = os.path.join(store_dir, f"post_vectors.{ext_name}")
    sc_p = os.path.join(store_dir, "patch_sidecars.npz")
    if os.path.exists(sc_p):
        with np.load(sc_p) as z:
            if int(z["patch_epoch"][0]) != int(meta.get("patch_epoch", -1)):
                raise RuntimeError(
                    f"packed store at {store_dir} has a torn patch "
                    "(sidecar epoch != meta epoch); rebuild it from the "
                    "Spark artifacts before patching further"
                )
            old_head_ids = z["head_ids"]
            old_off, old_len = z["extents"]
            old_post_ids = z["post_ids"]
    else:
        old_head_ids = np.load(os.path.join(store_dir, "head_ids.npy"))
        old_ext_p = os.path.join(store_dir, "extents.npy")
        if os.path.exists(old_ext_p):
            old_off, old_len = np.load(old_ext_p)
        else:
            ip = np.load(os.path.join(store_dir, "indptr.npy"))
            old_off, old_len = ip[:-1], np.diff(ip)
        old_post_ids = np.load(os.path.join(store_dir, "post_ids.npy"))
    file_rows = int(meta["rows"])

    hp = heads.select("head_id", "vector").toPandas()
    raw = hp["head_id"].to_numpy(np.int64)
    order = np.argsort(raw)
    new_head_ids = raw[order]
    H = np.array(hp["vector"].tolist(), dtype=np.float64)[order]

    touched = {int(t) for t in touched_heads}
    old_set = set(old_head_ids.tolist())
    # rewrite = touched heads still alive + heads new to the index; a
    # touched head absent from `heads` retired — its extent just drops
    rewrite = sorted(
        h for h in new_head_ids.tolist() if h in touched or h not in old_set
    )
    app_ids = np.empty(0, dtype=np.int64)
    app_counts: dict[int, tuple[int, int]] = {}  # head -> (off, len)
    dim = int(meta["dim"])
    if rewrite:
        from pyspark.sql import functions as F

        pdf = (
            postings.filter(F.col("head_id").isin(rewrite))
            .select("head_id", "id", "vector")
            .orderBy("head_id", "id")
            .toPandas()
        )
        if len(pdf):
            V32 = np.array(pdf["vector"].tolist(), dtype=np.float32)
            if file_rows and V32.shape[1] != dim:
                raise ValueError(
                    f"patch dim {V32.shape[1]} != store dim {dim}"
                )
            dim = int(V32.shape[1])
            with open(vec_path, "ab") as f:
                _pack_values(V32, vt).tofile(f)
            app_ids = pdf["id"].to_numpy(np.int64)
            hvals = pdf["head_id"].to_numpy(np.int64)
            uh, starts = np.unique(hvals, return_index=True)
            lens = np.diff(np.append(starts, len(hvals)))
            for h, s, ln in zip(uh.tolist(), starts.tolist(), lens.tolist()):
                app_counts[int(h)] = (file_rows + s, int(ln))

    old_slot = {int(h): i for i, h in enumerate(old_head_ids.tolist())}
    off = np.zeros(len(new_head_ids), dtype=np.int64)
    ln = np.zeros(len(new_head_ids), dtype=np.int64)
    for i, h in enumerate(new_head_ids.tolist()):
        if h in app_counts:
            off[i], ln[i] = app_counts[h]
        elif h in old_set and h not in touched:
            s = old_slot[h]
            off[i], ln[i] = int(old_off[s]), int(old_len[s])
        # else: touched-but-no-rows or new-but-empty head → (0, 0)

    new_file_rows = file_rows + len(app_ids)
    live_rows = int(ln.sum())
    post_ids = np.concatenate([old_post_ids, app_ids])
    epoch = int(meta.get("patch_epoch", 0)) + 1
    tmp_sc = sc_p + ".tmp.npz"
    with open(tmp_sc, "wb") as f:
        np.savez(
            f,
            head_ids=new_head_ids,
            H=H,
            extents=np.stack([off, ln]),
            post_ids=post_ids,
            patch_epoch=np.array([epoch], dtype=np.int64),
        )
    os.replace(tmp_sc, sc_p)
    stats = {
        "heads_rewritten": len(rewrite),
        "rows_appended": int(len(app_ids)),
        "vector_bytes_appended": int(
            len(app_ids) * dim * np.dtype(_STORE_DTYPES[vt]).itemsize
        ),
        "store_vector_bytes": int(os.path.getsize(vec_path)),
        "dead_rows": int(new_file_rows - live_rows),
        "live_rows": live_rows,
        "needs_compaction": (new_file_rows - live_rows) > live_rows,
    }
    meta.update(
        {
            "rows": new_file_rows,
            "dim": dim,
            "patches": int(meta.get("patches", 0)) + 1,
            "patch_epoch": epoch,
            "last_patch": stats,
            # callers that track the posting identity incrementally (one
            # small agg per delta — SPFreshIndex) pass it in; otherwise
            # one full-frame agg. Per-batch full-corpus scans were the
            # r12 ADVICE locality leak.
            **(
                fingerprint
                if fingerprint is not None
                else postings_fingerprint(postings)
            ),
        }
    )
    tmp_m = meta_p + ".tmp"
    with open(tmp_m, "w") as f:
        json.dump(meta, f)
    os.replace(tmp_m, meta_p)
    return stats


class DiskSpannReplica(LocalSpannReplica):
    """SPANN's actual serving-node architecture (NeurIPS'21 §3;
    `SPANN/ExtraFullGraphSearcher.h` — head centroids in RAM, posting
    VECTORS in page-aligned files on local SSD, read per query): the
    posting matrix lives in a packed float32 file opened as np.memmap, so
    a query touches only its routed heads' slabs (CSR-contiguous rows →
    sequential page reads, the posting-file seek). RAM holds heads + the
    CSR index — the footprint that lets one node serve a corpus whose
    vectors don't fit memory.

    Distances are BIT-IDENTICAL to LocalSpannReplica: vectors originate as
    float32 (array<float> parquet), the RAM replica's float64 copy is the
    exact upcast, and the distance kernels promote the memmap's rows —
    float32 OR native int8/uint8/int16 (``value_type``, VERDICT r11 #1;
    the reference's Dataset<T> width, `VectorSet.h:35`) — to float64
    before any arithmetic. An integer store is 4× (int8/uint8) or 2×
    (int16) less SSD and posting-read I/O at identical results."""

    dispatch_label = "disk_replica"

    def __init__(
        self, heads, postings, store_dir: str, value_type: str = "float32"
    ) -> None:
        import json
        import os

        meta_p = os.path.join(store_dir, "meta.json")
        # identity gate (same staleness class as the refine store, ADVICE
        # r9): when Spark artifacts ARE supplied, an existing store is
        # trusted only if its recorded fingerprint matches the postings it
        # claims to pack — a rebuilt index at the same path rebuilds the
        # store instead of serving the old index's vectors — AND it was
        # packed in the requested value type. from_store (no artifacts)
        # trusts the files; it has nothing to check against.
        if os.path.exists(meta_p) and postings is not None:
            if not packed_store_matches(
                store_dir, postings_fingerprint(postings), value_type
            ) or _store_patch_torn(store_dir):
                import shutil

                shutil.rmtree(store_dir)
        if not os.path.exists(meta_p):
            if heads is None or postings is None:
                raise FileNotFoundError(
                    f"no packed replica store at {store_dir} and no Spark "
                    "artifacts supplied to build one"
                )
            # build once from the Spark artifacts (the posting-file write
            # stage), OUT-OF-CORE so the driver never holds the shard's
            # vectors — the whole point of this replica is a shard that
            # exceeds RAM; then serve every later construction from it.
            # Parallel (executor-fragment) builder by default: measured
            # 7.7-14.4× the serial streamer, which plateaus at ~31k rows/s
            # on the driver iterator (SCALING.md r10); byte-identical
            # stores (pinned by test). build_packed_store remains for
            # deployments without shared fragment storage.
            build_packed_store_parallel(
                heads, postings, store_dir, value_type=value_type
            )
        with open(meta_p) as f:
            meta = json.load(f)
        vt = meta.get("value_type", "float32")  # legacy stores are f32
        dt = _STORE_DTYPES[vt]
        self.value_type = vt
        sc_p = os.path.join(store_dir, "patch_sidecars.npz")
        if os.path.exists(sc_p):
            # PATCHED store (patch_packed_store): slabs are log-structured
            # — untouched slabs keep their original file extent, rewritten
            # ones live in appended segments, so they are not contiguous.
            # The sidecar set is one atomically-replaced file whose epoch
            # must match meta.json's; a mismatch means a patch died
            # between the two replaces — refuse rather than serve extents
            # that can point past meta's recorded rows (r12 ADVICE).
            with np.load(sc_p) as z:
                if int(z["patch_epoch"][0]) != int(
                    meta.get("patch_epoch", -1)
                ):
                    raise RuntimeError(
                        f"packed store at {store_dir} has a torn patch "
                        "(sidecar epoch != meta epoch); rebuild from the "
                        "Spark artifacts (supply heads+postings) to "
                        "recover"
                    )
                self.head_ids = z["head_ids"]
                self.H = z["H"]
                self.post_ids = z["post_ids"]
                self.slab_off, self.slab_len = z["extents"]
        else:
            self.head_ids = np.load(os.path.join(store_dir, "head_ids.npy"))
            self.H = np.load(os.path.join(store_dir, "H.npy"))
            self.post_ids = np.load(os.path.join(store_dir, "post_ids.npy"))
            ip = np.load(os.path.join(store_dir, "indptr.npy"))
            self.slab_off = ip[:-1]
            self.slab_len = np.diff(ip)
        # drop MEMBERLESS heads at load (r12, same rationale as the RAM
        # replica): an empty slab head wastes nprobe budget and can void
        # a whole answer through the limitDist guard. Store files are
        # untouched — the mask is load-time only, so legacy, fresh, and
        # patched stores all serve identically.
        if len(self.slab_len) and (self.slab_len == 0).any():
            keep = self.slab_len > 0
            self.head_ids = self.head_ids[keep]
            self.H = self.H[keep]
            self.slab_off = self.slab_off[keep]
            self.slab_len = self.slab_len[keep]
        # indptr kept as the live-rows cumulative for introspection
        # (posting lengths via np.diff, total via [-1])
        self.indptr = np.concatenate(([0], np.cumsum(self.slab_len)))
        # store-side tombstones (r12 ADVICE): a live SPFreshIndex defers
        # physical removal to compact(), so between a delete and the next
        # compaction the slabs still hold the rows. sync_store exports the
        # live tombstone set alongside the store; loading it here closes
        # the visibility window for from_store consumers, who otherwise
        # have no filter (the live index filters at search).
        ts_p = os.path.join(store_dir, "tombstones.npy")
        ts = np.load(ts_p) if os.path.exists(ts_p) else None
        self.store_deleted_ids = ts if ts is not None and len(ts) else None
        # the SSD side: never resident; rows fault in per probed slab.
        # A zero-row store (empty shard) cannot mmap an empty file — use
        # an empty in-RAM array with the same dtype/shape contract.
        if meta["rows"] == 0:
            self.post_V = np.empty((0, max(meta["dim"], 1)), dtype=dt)
        else:
            self.post_V = np.memmap(
                os.path.join(store_dir, f"post_vectors.{_STORE_EXT[vt]}"),
                dtype=dt,
                mode="r",
                shape=(meta["rows"], meta["dim"]),
            )

    @classmethod
    def from_store(cls, store_dir: str) -> "DiskSpannReplica":
        """Open an existing store with NO Spark session — the cold-start
        path of a serving node that only has the files (value type comes
        from the store's own meta.json)."""
        return cls(None, None, store_dir)

    @classmethod
    def from_path(
        cls, spark: SparkSession, path: str, value_type: str = "float32"
    ) -> "DiskSpannReplica":
        """From a save_index() directory; the packed store materializes
        beside the index on first use (`<path>/replica_store`)."""
        import os

        store = os.path.join(path, "replica_store")
        if os.path.exists(os.path.join(store, "meta.json")):
            return cls.from_store(store)
        heads = spark.read.parquet(os.path.join(path, "heads"))
        postings = spark.read.parquet(os.path.join(path, "postings"))
        return cls(heads, postings, store, value_type=value_type)

    def memory_bytes(self) -> int:
        """Resident footprint — the posting matrix is on disk."""
        return int(
            self.head_ids.nbytes
            + self.H.nbytes
            + self.post_ids.nbytes
            + self.slab_off.nbytes
            + self.slab_len.nbytes
        )

    def _with_store_tombstones(
        self, deleted_ids: np.ndarray | None
    ) -> np.ndarray | None:
        """Merge the store-exported tombstones (sync_store) into a
        caller's serve-time filter — idempotent under the batch chunk
        recursion (union of a superset is a no-op)."""
        if self.store_deleted_ids is None:
            return deleted_ids
        if deleted_ids is None or len(deleted_ids) == 0:
            return self.store_deleted_ids
        return np.union1d(
            np.asarray(deleted_ids, dtype=np.int64), self.store_deleted_ids
        )

    def search_one(self, q, k=10, nprobe=SEARCH_INTERNAL_RESULT_NUM,
                   metric="l2", max_dist_ratio=MAX_DIST_RATIO,
                   deleted_ids=None, allowed_ids=None):
        return super().search_one(
            q, k, nprobe, metric, max_dist_ratio,
            deleted_ids=self._with_store_tombstones(deleted_ids),
            allowed_ids=allowed_ids,
        )

    def batch_search(self, queries, k=10, nprobe=SEARCH_INTERNAL_RESULT_NUM,
                     metric="l2", max_dist_ratio=MAX_DIST_RATIO,
                     deleted_ids=None, allowed_ids=None):
        return super().batch_search(
            queries, k, nprobe, metric, max_dist_ratio,
            deleted_ids=self._with_store_tombstones(deleted_ids),
            allowed_ids=allowed_ids,
        )


def refine_fingerprint(vectors) -> dict:
    """Identity of the vector set a refine store was packed from — row
    count + id checksum + vector CONTENT checksum (a re-embedded corpus
    with unchanged ids must not reuse the old store), one agg job.
    Recorded in refine meta.json and re-checked before serving so a
    rebuilt index at the same path never exact-reranks against a stale
    store (ADVICE r9; content term r10)."""
    from pyspark.sql import functions as F

    r = vectors.agg(
        F.count("*").alias("n"),
        F.sum("id").alias("s"),
        _vector_crc(vectors).alias("v"),
    ).first()
    return {
        "rows": int(r["n"]),
        "id_sum": int(r["s"] or 0),
        "vec_crc": int(r["v"] or 0),
    }


def refine_store_matches(
    store_dir: str, fingerprint: dict, value_type: str = "float32"
) -> bool:
    """True when an existing refine store at ``store_dir`` was built from
    the vector set with this fingerprint AND in this value type
    (missing/legacy meta → False / float32, so callers rebuild rather
    than trust an unverifiable store)."""
    import json
    import os

    meta_p = os.path.join(store_dir, "meta.json")
    if not os.path.exists(meta_p):
        return False
    with open(meta_p) as f:
        meta = json.load(f)
    return meta.get("value_type", "float32") == value_type and all(
        meta.get(k) == fingerprint[k] for k in ("rows", "id_sum", "vec_crc")
    )


def build_refine_store(
    vectors,
    store_dir: str,
    chunk_rows: int = _STORE_CHUNK_ROWS,
    value_type: str = "float32",
) -> dict:
    """Pack (id, vector) into an id-sorted float32 matrix + ids.npy — the
    exact-rerank side table a compressed replica reads from disk (the
    reference's SSD posting vectors, keyed by id instead of by head).

    STREAMED like build_packed_store (VERDICT r9 #1): Spark does the
    id-sort, the driver consumes the sorted stream chunk-at-a-time, so the
    store a node needs precisely because its vectors exceed RAM can be
    built under that condition. meta.json records the source fingerprint
    (rows + id checksum) for the staleness gate. ``value_type``: as
    build_packed_store — an int8 corpus reranks from 1-byte components
    (4× less rerank read I/O), lossless-cast-checked per chunk.
    → build stats."""
    import json
    import os

    if value_type not in _STORE_DTYPES:
        raise ValueError(
            f"value_type must be one of {sorted(_STORE_DTYPES)}: {value_type!r}"
        )
    os.makedirs(store_dir, exist_ok=True)
    stats = {"max_buffer_rows": 0, "chunk_rows": int(chunk_rows), "flushes": 0}
    id_chunks: list[np.ndarray] = []
    rows = 0
    dim = 0
    buf_i: list[int] = []
    buf_v: list = []
    vec_file = os.path.join(store_dir, f"vectors.{_STORE_EXT[value_type]}")
    with open(vec_file, "wb") as f:

        def flush() -> None:
            nonlocal rows, dim
            if not buf_v:
                return
            stats["max_buffer_rows"] = max(stats["max_buffer_rows"], len(buf_v))
            V = np.array(buf_v, dtype=np.float32)
            dim = int(V.shape[1])
            _pack_values(V, value_type).tofile(f)
            ids = np.array(buf_i, dtype=np.int64)
            id_chunks.append(ids)
            rows += len(buf_v)
            stats["flushes"] += 1
            buf_i.clear()
            buf_v.clear()

        it = (
            vectors.select("id", "vector")
            .orderBy("id")
            .toLocalIterator(prefetchPartitions=False)
        )
        for row in it:
            buf_i.append(row["id"])
            buf_v.append(row["vector"])
            if len(buf_v) >= chunk_rows:
                flush()
        flush()
    ids = np.concatenate(id_chunks) if id_chunks else np.empty(0, dtype=np.int64)
    np.save(os.path.join(store_dir, "ids.npy"), ids)
    with open(os.path.join(store_dir, "meta.json"), "w") as f:
        json.dump(
            {"rows": int(rows), "dim": dim, "value_type": value_type,
             "build": stats, **refine_fingerprint(vectors)},
            f,
        )
    return stats


def open_refine_store(store_dir: str):
    """→ (ids int64 ndarray, memmap matrix in id order — dtype from the
    store's own meta: float32, or a native integer width whose gathered
    rows the rerank kernel promotes to float64 identically)."""
    import json
    import os

    with open(os.path.join(store_dir, "meta.json")) as f:
        meta = json.load(f)
    vt = meta.get("value_type", "float32")
    ids = np.load(os.path.join(store_dir, "ids.npy"))
    M = np.memmap(
        os.path.join(store_dir, f"vectors.{_STORE_EXT[vt]}"),
        dtype=_STORE_DTYPES[vt],
        mode="r",
        shape=(meta["rows"], meta["dim"]),
    )
    return ids, M


def build_refine_store_parallel(
    vectors,
    store_dir: str,
    n_fragments: int | None = None,
    value_type: str = "float32",
) -> dict:
    """Executor-parallel twin of build_refine_store (same shape as
    build_packed_store_parallel): Spark range-partitions by id, each
    partition writes its own id-sorted float32 fragment, the driver
    concatenates in partition order. Byte-identical store; the build
    scales with executors instead of the ~31k rows/s driver-iterator
    ceiling (SCALING.md r10). ``value_type``: as build_refine_store —
    the lossless-cast check runs executor-side per Arrow batch."""
    import json
    import os
    import shutil

    if value_type not in _STORE_DTYPES:
        raise ValueError(
            f"value_type must be one of {sorted(_STORE_DTYPES)}: {value_type!r}"
        )
    os.makedirs(store_dir, exist_ok=True)
    r_ext = _STORE_EXT[value_type]
    frag_dir = os.path.join(store_dir, "_fragments")
    shutil.rmtree(frag_dir, ignore_errors=True)
    os.makedirs(frag_dir)
    if n_fragments is None:
        spark = vectors.sparkSession
        n_fragments = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    def write_fragment(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        f = None
        ids: list[np.ndarray] = []
        rows = 0
        dim = 0
        max_batch = 0
        for pdf in batches:
            if not len(pdf):
                continue
            if f is None:
                f = open(
                    os.path.join(frag_dir, f"part_{pid:05d}.{r_ext}"), "wb"
                )
            V = np.array(pdf["vector"].tolist(), dtype=np.float32)
            dim = int(V.shape[1])
            max_batch = max(max_batch, len(V))
            _pack_values(V, value_type).tofile(f)
            ids.append(pdf["id"].to_numpy(np.int64))
            rows += len(V)
        if f is None:
            return
        f.close()
        np.save(
            os.path.join(frag_dir, f"part_{pid:05d}.ids.npy"),
            np.concatenate(ids),
        )
        yield pd.DataFrame(
            {
                "pid": [pid],
                "rows": [rows],
                "dim": [dim],
                "max_batch_rows": [max_batch],
            }
        )

    frags = (
        vectors.select("id", "vector")
        .repartitionByRange(n_fragments, "id")
        .sortWithinPartitions("id")
        .mapInPandas(
            write_fragment,
            "pid int, rows long, dim int, max_batch_rows long",
        )
        .collect()
    )
    frags.sort(key=lambda r: r["pid"])
    rows = sum(r["rows"] for r in frags)
    dim = max((r["dim"] for r in frags), default=0)
    id_parts: list[np.ndarray] = []
    with open(os.path.join(store_dir, f"vectors.{r_ext}"), "wb") as out:
        for r in frags:
            base = os.path.join(frag_dir, f"part_{r['pid']:05d}")
            with open(f"{base}.{r_ext}", "rb") as fin:
                shutil.copyfileobj(fin, out, length=1 << 22)
            id_parts.append(np.load(base + ".ids.npy"))
    ids = np.concatenate(id_parts) if id_parts else np.empty(0, dtype=np.int64)
    np.save(os.path.join(store_dir, "ids.npy"), ids)
    shutil.rmtree(frag_dir)
    stats = {
        "mode": "parallel",
        "fragments": len(frags),
        "max_batch_rows": max((r["max_batch_rows"] for r in frags), default=0),
    }
    with open(os.path.join(store_dir, "meta.json"), "w") as f:
        json.dump(
            {"rows": int(rows), "dim": dim, "value_type": value_type,
             "build": stats, **refine_fingerprint(vectors)},
            f,
        )
    return stats


class ShardLatencyTracker:
    """Per-shard serve-latency window + deadline-miss attribution — the
    OBSERVED-LATENCY rebalance trigger (r12 VERDICT #4).

    Row counts (`shard_posting_rows`) say which shard is BIG; under a
    skewed (Zipf) query mix the serving bottleneck is which shard is
    SLOW-AND-HOT — the one whose latency tail the aggregator actually
    observes blowing its deadline budget (the reference operator reads the
    same signal from `AggregatorService.cpp:280-323` timeout logs). Both
    aggregator tiers record every per-shard call here; ``hot_shard()`` is
    the split recommendation the probe drives ``split_shard`` with.

    Bounded state: a fixed window of recent latencies per shard (rolling
    percentiles) + two counters; thread-safe under the GIL for the
    deadline path's concurrent recorders (deque.append is atomic)."""

    def __init__(self, n_shards: int, window: int = 512) -> None:
        import collections

        self._window = window
        self.lat = [
            collections.deque(maxlen=window) for _ in range(n_shards)
        ]
        self.miss = [0] * n_shards
        self.calls = [0] * n_shards

    def record(
        self, j: int, ms: float, budget_ms: float | None = None
    ) -> None:
        self.lat[j].append(float(ms))
        self.calls[j] += 1
        if budget_ms is not None and ms > budget_ms:
            self.miss[j] += 1

    def stats(self) -> list[dict]:
        out = []
        for j in range(len(self.lat)):
            s = sorted(self.lat[j])
            if s:
                at = lambda f: s[min(len(s) - 1, int(f * len(s)))]  # noqa: E731
                out.append(
                    {
                        "n": self.calls[j],
                        "p50_ms": round(at(0.50), 3),
                        "p99_ms": round(at(0.99), 3),
                        "deadline_misses": self.miss[j],
                        "miss_rate": round(
                            self.miss[j] / max(1, self.calls[j]), 4
                        ),
                    }
                )
            else:
                out.append(
                    {
                        "n": self.calls[j],
                        "p50_ms": None,
                        "p99_ms": None,
                        "deadline_misses": self.miss[j],
                        "miss_rate": 0.0,
                    }
                )
        return out

    def hot_shard(
        self,
        factor: float = 2.0,
        min_samples: int = 32,
        min_misses: int = 3,
    ) -> int | None:
        """Split recommendation from OBSERVED serving behavior. Two
        signals, in priority order:

        1. **Deadline-miss attribution** (any shard has recorded misses):
           the shard whose miss RATE is ≥ ``factor`` × the median of the
           other sampled shards (or the only misser, with ≥
           ``min_misses`` of evidence). This is the SLO-breach signal —
           what the reference's aggregator timeout log
           (`AggregatorService.cpp:280-323`) shows the operator — and it
           separates a hot shard even when client-side concurrency noise
           blurs raw tails across shards (measured: the Zipf probe's
           per-shard p99s overlap under queueing while misses
           concentrate 2-7× on the overloaded shard).
        2. **Rolling p99** (budget-less traffic): the shard whose p99 is
           ≥ ``factor`` × the median p99 of the other sampled shards.

        → shard index, or None when no shard stands out (or fewer than
        two shards have ``min_samples`` observations — a trigger must
        never fire off noise)."""
        st = self.stats()
        sampled = [
            (j, s)
            for j, s in enumerate(st)
            if s["n"] >= min_samples and s["p99_ms"] is not None
        ]
        if len(sampled) < 2:
            return None
        if any(s["deadline_misses"] for _, s in sampled):
            j_hot, s_hot = max(
                sampled, key=lambda t: (t[1]["miss_rate"], -t[0])
            )
            # evidence floor FIRST: a single stray miss must never name a
            # shard (measured at small scale: one miss per shard and the
            # ratio test fired on whichever had fewest samples)
            if s_hot["deadline_misses"] < min_misses:
                return None
            others = sorted(
                s["miss_rate"] for j, s in sampled if j != j_hot
            )
            med = others[len(others) // 2]
            if med == 0 or s_hot["miss_rate"] >= factor * med:
                return j_hot
            return None
        j_hot, s_hot = max(sampled, key=lambda t: (t[1]["p99_ms"], -t[0]))
        others = sorted(s["p99_ms"] for j, s in sampled if j != j_hot)
        med = others[len(others) // 2]
        if med > 0 and s_hot["p99_ms"] >= factor * med:
            return j_hot
        return None

    def split_at(self, j: int) -> None:
        """Splice shard j's slot into two fresh slots, mirroring
        split_shard's replica splice — the halves start with clean
        windows (their latency profile is new)."""
        import collections

        self.lat[j : j + 1] = [
            collections.deque(maxlen=self._window),
            collections.deque(maxlen=self._window),
        ]
        self.miss[j : j + 1] = [0, 0]
        self.calls[j : j + 1] = [0, 0]


class ShardedSpannAggregator:
    """Scatter-gather over head-sharded replicas — the Aggregator tier
    (`AggregatorService.cpp:216-258`) for serving nodes whose RAM cannot
    hold the whole index.

    Sharding is BY HEAD: each shard owns a contiguous slice of the head
    space plus exactly the posting rows of those heads (what
    `BalancedDataPartition` produces for the reference's multi-machine
    deployment). A query is scattered to every shard, each answers from its
    local heads at the same nprobe, and the gather is a global merge-rank —
    strictly better than the reference's concat-without-rerank (NOTES.md
    divergence), and identical to the single-replica answer when nprobe
    spans the same heads.

    Note the semantic difference from one big replica: probing nprobe heads
    PER SHARD examines more postings than nprobe heads globally (the
    reference's aggregator has the same property — each child index answers
    with its own MaxCheck budget), so recall is ≥ the single-replica
    answer; tests pin top-1 identity and recall-no-worse.
    """

    @classmethod
    def for_budget(
        cls, heads: DataFrame, postings: DataFrame, node_budget_bytes: int
    ) -> "ShardedSpannAggregator":
        """Default shard-sizing rule (VERDICT r9 #7, measured at sf0.1 —
        SCALING.md r10): **shard to fit the node budget, never more.**
        shards = ceil(replica_bytes / budget). More shards than RAM
        requires buys nothing — at equal total work (nprobe split across
        shards) recall is flat (0.947-0.976 across 1-16 shards) while
        same-nprobe sharding just spends linearly more postings for its
        recall lift; and each extra shard adds scatter+merge overhead
        (p50 0.86 → 6.2 ms over 1 → 16 local shards). ≥4 shards is where
        deadline partials get cheap (one lost shard of ≥4 keeps
        recall ≥ 0.99 of answers vs 0.90 at 2) — the availability knob,
        not a default. Reference: `BalancedDataPartition`
        (src/BalancedDataPartition/main.cpp:151-241) splits by exactly
        this per-node-capacity rule."""
        import math

        from sptag_spark.plans.planner import index_fingerprint

        fp = index_fingerprint(heads, postings)
        est = fp["posting_rows"] * (8 * fp["dim"] + 16)
        return cls(
            heads,
            postings,
            n_shards=max(1, math.ceil(est / max(1, node_budget_bytes))),
        )

    def __init__(
        self,
        heads: DataFrame,
        postings: DataFrame,
        n_shards: int = 2,
        store_dir: str | None = None,
        scatter_topk: int | None = None,
        split: str = "range",
        value_type: str = "float32",
    ) -> None:
        """``store_dir``: build each shard as a DiskSpannReplica under
        ``store_dir/shard_<i>`` instead of an all-RAM LocalSpannReplica —
        the multi-node out-of-core deployment (every serving node holds
        its shard's heads in RAM and posting vectors on SSD), so the
        aggregated corpus can exceed n_shards × RAM.

        ``scatter_topk``: center-routed scatter — send each query to only
        the N shards whose CENTER (mean of the shard's head centroids) is
        nearest, instead of broadcasting to all. The reference
        aggregator's `[Service] TopK` + `Centers` mode
        (`AggregatorService.cpp:215-258` ranks servers by query-to-center
        distance and scatters to the TopK): at hundreds of serving nodes,
        broadcast is the RPC bottleneck and per-node centers bound the
        fan-out. None (default) broadcasts — exhaustive over shards.

        ``split``: how heads are assigned to shards. "range" (default)
        slices the head-id space — arbitrary spatial assignment, the
        conservative choice when routing is off. "kmeans" clusters the
        head CENTROIDS (deterministic Lloyd's on the driver — heads are
        the small RAM side by this tier's contract) so each shard is
        spatially coherent and its center actually summarizes it — what
        the reference's BalancedDataPartition produces and the layout
        center routing is designed for (measured: range split needs
        topk=n/2 for ≥0.99 recall, kmeans split reaches it at topk=1-2,
        SCALING.md r10)."""
        import os

        import pyspark.sql.functions as F

        if split == "kmeans":
            from sptag_spark.operators.knn import _block_distances

            hp = heads.select("head_id", "vector").toPandas()
            hid = hp["head_id"].to_numpy(np.int64)
            H = np.array(hp["vector"].tolist(), dtype=np.float64)
            # deterministic Lloyd's: spread init over the id-sorted heads,
            # fixed 10 passes (assignment, not quality, is the product)
            o = np.argsort(hid)
            hid, H = hid[o], H[o]
            C = H[np.linspace(0, len(H) - 1, min(n_shards, len(H))).astype(int)]
            for _ in range(10):
                a = np.argmin(_block_distances(C, H, "l2"), axis=0)
                for j in range(len(C)):
                    m = a == j
                    if m.any():
                        C[j] = H[m].mean(axis=0)
            groups = [
                hid[a == j] if j < len(C) else np.empty(0, np.int64)
                for j in range(n_shards)
            ]
            selections = [
                F.col("head_id").isin([int(x) for x in g]) if len(g)
                else F.lit(False)
                for g in groups
            ]
        else:
            hp = heads.select("head_id").toPandas()
            hids = np.sort(hp["head_id"].to_numpy(np.int64))
            bounds = [
                hids[(len(hids) * i) // n_shards] for i in range(1, n_shards)
            ] + [np.iinfo(np.int64).max]
            selections = []
            lo = np.iinfo(np.int64).min
            for hi in bounds:
                selections.append(
                    (F.col("head_id") >= int(lo)) & (F.col("head_id") < int(hi))
                )
                lo = hi
        self.replicas = []
        for i, sel in enumerate(selections):
            h_i, p_i = heads.filter(sel), postings.filter(sel)
            self.replicas.append(
                DiskSpannReplica(
                    h_i, p_i, os.path.join(store_dir, f"shard_{i}"),
                    value_type=value_type,
                )
                if store_dir is not None
                else LocalSpannReplica(h_i, p_i)
            )
        self.scatter_topk = scatter_topk
        # one center per shard — what BalancedDataPartition writes as the
        # per-node centers file the reference aggregator routes with. An
        # EMPTY shard's center is +inf so routing never selects it (it
        # has nothing to answer; n_shards can exceed the head count).
        dim = next(
            (int(r.H.shape[1]) for r in self.replicas if len(r.H)), 1
        )
        self.centers = np.array(
            [
                rep.H.mean(axis=0) if len(rep.H) else np.full(dim, np.inf)
                for rep in self.replicas
            ]
        )
        #: observed-latency rebalance signal (ShardLatencyTracker)
        self.tracker = ShardLatencyTracker(len(self.replicas))

    def _route_shards(self, q: np.ndarray, metric: str) -> list[int]:
        return route_to_shards(
            self.centers, self.scatter_topk, q, metric, len(self.replicas)
        )

    def shard_posting_rows(self) -> list[int]:
        """Posting rows per shard — the overflow signal for rebalancing
        (the reference's BalancedDataPartition sizes shards ONCE; growth
        past a node's budget is an operational gap this tier closes)."""
        return [int(r.indptr[-1]) for r in self.replicas]

    def split_shard(
        self,
        j: int,
        heads: DataFrame,
        postings: DataFrame,
        store_dir: str | None = None,
        value_type: str = "float32",
    ) -> dict:
        """Shard-growth rebalance (VERDICT r11 ask #5): split ONLY shard
        ``j`` — whose postings outgrew its node budget after concentrated
        adds — into two spatially-coherent halves, touching nothing else.

        The reference has no live piece here: `BalancedDataPartition`
        (src/BalancedDataPartition/main.cpp) sizes shards once, offline,
        and `AggregatorService` assumes static membership — growth past a
        node's capacity means a full re-partition. This method is the
        LIRE idea one tier up: 2-means over the overflowing shard's HEAD
        centroids (deterministic, driver-side — heads are the small side
        by this tier's contract), two new replicas built from
        partition-pruned `head_id IN (...)` scans of that shard's heads
        only, and an updated center table. Every other shard's replica —
        and, in the disk deployment, its packed store bytes — is
        untouched (pinned by probe: byte-identical stores).

        → report: rows moved, the two new shard sizes, store dirs."""
        import os

        from sptag_spark.streaming.spfresh import two_means

        import pyspark.sql.functions as F

        old = self.replicas[j]
        if len(old.head_ids) < 2:
            raise ValueError(f"shard {j} has {len(old.head_ids)} heads")
        labels, _ = two_means(old.H)
        sides = [old.head_ids[labels == 0], old.head_ids[labels == 1]]
        new_reps = []
        new_dirs = []
        for s, hid in enumerate(sides):
            sel = F.col("head_id").isin([int(x) for x in hid])
            h_s, p_s = heads.filter(sel), postings.filter(sel)
            if store_dir is not None:
                d = os.path.join(store_dir, f"shard_{j}_s{s}")
                new_dirs.append(d)
                new_reps.append(
                    DiskSpannReplica(h_s, p_s, d, value_type=value_type)
                )
            else:
                new_reps.append(LocalSpannReplica(h_s, p_s))
        before_rows = int(old.indptr[-1])
        self.replicas = (
            self.replicas[:j] + new_reps + self.replicas[j + 1 :]
        )
        self.tracker.split_at(j)
        dim = self.centers.shape[1]
        new_centers = [
            rep.H.mean(axis=0) if len(rep.H) else np.full(dim, np.inf)
            for rep in new_reps
        ]
        self.centers = np.vstack(
            [self.centers[:j], new_centers, self.centers[j + 1 :]]
        )
        return {
            "split_shard": j,
            "rows_before": before_rows,
            "rows_after": [int(r.indptr[-1]) for r in new_reps],
            "heads": [len(h) for h in sides],
            "store_dirs": new_dirs,
            "n_shards": len(self.replicas),
        }

    def search_one(
        self,
        q: np.ndarray,
        k: int = 10,
        nprobe: int = SEARCH_INTERNAL_RESULT_NUM,
        metric: str = "l2",
        max_dist_ratio: float = MAX_DIST_RATIO,
        deleted_ids: np.ndarray | None = None,
        allowed_ids: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        # SERIAL scatter, deliberately (measured r10, SCALING.md): a
        # thread-pool scatter was built and REJECTED — per-shard searches
        # here are µs-scale, so executor round-trips made p50 6.2 → 38.7
        # ms at 16 shards. Across real machines the scatter is
        # network-parallel regardless; locally the loop is the fast path.
        # The deadline path stays threaded — there the budget semantics,
        # not throughput, require concurrency.
        import time as _time

        ids_all, d_all = [], []
        for j in self._route_shards(q, metric):
            _t0 = _time.perf_counter()
            ids, d = self.replicas[j].search_one(
                q, k, nprobe, metric, max_dist_ratio,
                deleted_ids=deleted_ids, allowed_ids=allowed_ids,
            )
            # per-shard latency witness for the rebalance trigger
            # (two perf_counter calls against a µs-scale search — noise)
            self.tracker.record(j, (_time.perf_counter() - _t0) * 1000)
            ids_all.append(ids)
            d_all.append(d)
        return self._merge(ids_all, d_all, k)

    def batch_search(
        self,
        queries: list[tuple[int, np.ndarray]],
        k: int = 10,
        nprobe: int = SEARCH_INTERNAL_RESULT_NUM,
        metric: str = "l2",
        max_dist_ratio: float = MAX_DIST_RATIO,
        deleted_ids: np.ndarray | None = None,
        allowed_ids: np.ndarray | None = None,
    ) -> list[tuple[int, int, int, float]]:
        """→ rows of (query_id, rank, id, dist) — the whole batch scatters
        to every shard's VECTORIZED batch path (each shard gathers each of
        its probed slabs once for the batch), and the gather is the same
        global (dist, id) merge-rank as search_one's _merge, batched with
        segment arithmetic. Queries are tracked by batch POSITION so
        duplicate query_ids stay independent, like a search_one loop."""
        if not queries:
            return []
        pos_q = [(i, v) for i, (_, v) in enumerate(queries)]
        qids = np.array([int(q) for q, _ in queries], dtype=np.int64)
        # center routing: each shard answers only the sub-batch of queries
        # that selected it (broadcast = every shard gets the whole batch)
        per_shard: list[list] = [[] for _ in self.replicas]
        for item in pos_q:
            for j in self._route_shards(item[1], metric):
                per_shard[j].append(item)
        parts = [
            self.replicas[j].batch_search(
                sub, k, nprobe, metric, max_dist_ratio,
                deleted_ids=deleted_ids, allowed_ids=allowed_ids,
            )
            for j, sub in enumerate(per_shard)
            if sub
        ]
        return self._merge_batch(parts, qids, k)

    @staticmethod
    def _merge_batch(parts, qids: np.ndarray, k: int):
        """Gather for a scattered batch: ``parts`` is one row-list per
        shard, each keyed by batch POSITION. Cross-shard dedup (a vector
        replicated into heads of different shards answers once; replicas
        of an id share one vector, so the exact kernel scored it
        identically in every shard), then the (dist, id) re-rank per
        query — _merge, without the per-query loop. Shared by the
        in-process aggregator and the network tier
        (server.RemoteReplicaAggregator)."""
        pi_parts: list[np.ndarray] = []
        id_parts: list[np.ndarray] = []
        d_parts: list[np.ndarray] = []
        for rows in parts:
            if not rows:
                continue
            pi_parts.append(np.array([r[0] for r in rows], dtype=np.int64))
            id_parts.append(np.array([r[2] for r in rows], dtype=np.int64))
            d_parts.append(np.array([r[3] for r in rows]))
        if not pi_parts:
            return []
        pi = np.concatenate(pi_parts)
        ids = np.concatenate(id_parts)
        d = np.concatenate(d_parts)
        o = np.lexsort((d, ids, pi))
        pi, ids, d = pi[o], ids[o], d[o]
        keep = np.ones(len(pi), dtype=bool)
        keep[1:] = (pi[1:] != pi[:-1]) | (ids[1:] != ids[:-1])
        pi, ids, d = pi[keep], ids[keep], d[keep]
        o2 = np.lexsort((ids, d, pi))
        pi, ids, d = pi[o2], ids[o2], d[o2]
        pos = _run_positions(pi)
        fin = pos < k
        return [
            (int(qids[p]), int(r), int(i), float(dd))
            for p, r, i, dd in zip(
                pi[fin], pos[fin] + 1, ids[fin], d[fin]
            )
        ]

    @staticmethod
    def _merge(
        ids_all: list, d_all: list, k: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Gather = global re-rank with (dist, id) ties; dedup ids (a vector
        replicated into heads of different shards answers once)."""
        if not ids_all:
            return np.empty(0, dtype=np.int64), np.empty(0)
        ids = np.concatenate(ids_all)
        d = np.concatenate(d_all)
        if ids.size == 0:
            return ids, d
        _, first = np.unique(ids, return_index=True)
        ids, d = ids[first], d[first]
        top = np.lexsort((ids, d))[: min(k, len(ids))]
        return ids[top], d[top]

    def search_with_deadline(
        self,
        q: np.ndarray,
        k: int = 10,
        nprobe: int = SEARCH_INTERNAL_RESULT_NUM,
        metric: str = "l2",
        max_dist_ratio: float = MAX_DIST_RATIO,
        budget_ms: float = 50.0,
        deleted_ids: np.ndarray | None = None,
        allowed_ids: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray, bool]:
        """Per-query time budget with PARTIAL results — the reference
        aggregator's shard-timeout semantics (`AggregatorService.cpp:
        280-323`: when a child index misses the deadline, the merged answer
        carries whatever shards DID answer, flagged partial). → (ids,
        dists, partial); partial=True when ≥1 shard missed the budget (its
        result is dropped; the straggler thread finishes into the void —
        shard answers are read-only so nothing dangles).

        This lives in the driver-side serving tier precisely because Spark
        STAGES are all-or-nothing (the documented divergence, README) —
        here each shard is an independent in-RAM replica, so a deadline is
        honest.

        Each call gets its OWN executor, torn down without waiting: a
        shared fixed-size pool would let one stuck shard's straggler
        thread occupy a worker and eat LATER queries' budgets (queue wait
        counts against cf.wait), turning one slow shard into
        false partials for every subsequent query. Creating ≤ n_shards
        threads per deadline call is microseconds against a ms-scale
        budget; queued-but-unstarted tasks are cancelled, finished-late
        threads die into a dead executor nothing references."""
        import concurrent.futures as cf

        import time as _time

        ex = cf.ThreadPoolExecutor(
            max_workers=max(len(self.replicas), 1),
            thread_name_prefix="spann-shard",
        )

        def _timed(j):
            # per-shard wall + miss attribution for the rebalance trigger
            # — recorded by the WORKER thread when it finishes, so a
            # straggler still charges its shard after the merge moved on
            t0 = _time.perf_counter()
            out = self.replicas[j].search_one(
                q, k, nprobe, metric, max_dist_ratio,
                deleted_ids, allowed_ids,
            )
            self.tracker.record(
                j, (_time.perf_counter() - t0) * 1000, budget_ms
            )
            return out

        try:
            futs = [
                ex.submit(_timed, j)
                for j in self._route_shards(q, metric)
            ]
            done, not_done = cf.wait(futs, timeout=budget_ms / 1000.0)
        finally:
            ex.shutdown(wait=False, cancel_futures=True)
        ids_all, d_all = [], []
        n_failed = 0
        for f in done:
            # a shard that CRASHED degrades exactly like a shard that
            # STALLED: its result is dropped and the answer is flagged
            # partial — the reference aggregator's failed-child path
            # (`AggregatorService.cpp:280-323` folds timeout and error
            # children into the same partial merge). Propagating would
            # fail the whole query at the server boundary even though
            # healthy shards answered.
            if f.exception() is not None:
                n_failed += 1
                continue
            ids, d = f.result()
            ids_all.append(ids)
            d_all.append(d)
        ids, d = self._merge(ids_all, d_all, k)
        return ids, d, bool(not_done) or n_failed > 0

    def batch_search_with_deadline(
        self,
        queries: list[tuple[int, np.ndarray]],
        k: int = 10,
        nprobe: int = SEARCH_INTERNAL_RESULT_NUM,
        metric: str = "l2",
        max_dist_ratio: float = MAX_DIST_RATIO,
        budget_ms: float = 50.0,
        deleted_ids: np.ndarray | None = None,
        allowed_ids: np.ndarray | None = None,
    ) -> tuple[list[tuple[int, int, int, float]], bool]:
        """→ (rows, partial): ONE budget for the whole batch scatter.
        Each shard answers its routed sub-batch concurrently (one thread
        per shard — batch work per shard is ms-scale, unlike the µs
        per-query case where threading was measured and rejected); a
        shard missing the budget or crashing is dropped from the merge
        and the whole answer is flagged partial — the reference
        aggregator's shard-timeout semantics
        (`AggregatorService.cpp:280-323`), batched. Per-call executor
        for the same straggler-isolation reason as
        search_with_deadline."""
        import concurrent.futures as cf

        if not queries:
            return [], False
        pos_q = [(i, v) for i, (_, v) in enumerate(queries)]
        qids = np.array([int(q) for q, _ in queries], dtype=np.int64)
        per_shard: list[list] = [[] for _ in self.replicas]
        for item in pos_q:
            for j in self._route_shards(item[1], metric):
                per_shard[j].append(item)
        work = [(j, sub) for j, sub in enumerate(per_shard) if sub]
        ex = cf.ThreadPoolExecutor(
            max_workers=max(len(work), 1),
            thread_name_prefix="spann-shard-batch",
        )
        try:
            futs = [
                ex.submit(
                    self.replicas[j].batch_search,
                    sub, k, nprobe, metric, max_dist_ratio,
                    deleted_ids, allowed_ids,
                )
                for j, sub in work
            ]
            done, not_done = cf.wait(futs, timeout=budget_ms / 1000.0)
        finally:
            ex.shutdown(wait=False, cancel_futures=True)
        parts = []
        n_failed = 0
        for f in done:
            if f.exception() is not None:
                n_failed += 1  # crashed shard folds into the partial merge
                continue
            parts.append(f.result())
        rows = self._merge_batch(parts, qids, k)
        return rows, bool(not_done) or n_failed > 0

    def close(self) -> None:
        """Kept for handle symmetry — the scatter is a plain serial loop
        (the threaded variant was measured and rejected, SCALING.md r10)
        and the deadline path tears its per-call executor down itself, so
        there is no pooled state to release."""


class LocalPqSpannReplica:
    """PQ-compressed serving replica: SPANN routing + ADC scoring, no full
    vectors in RAM.

    The reference's billion-scale node keeps full postings on SSD; the
    RAM-resident twin at that scale needs compression — M bytes per vector
    (PQ codes, `PQQuantizer.h`) instead of 4·D, a ~32× density win that
    puts ~2B 64-d vectors in 16 GB. Routing stays full-precision (heads are
    ~0.1·N and tiny); member scoring is the ADC LUT gather
    (`index/pq.py adc_search` semantics, same rotation handling), so
    returned distances are `adc_dist` — approximate, monotone enough for
    the PQ recall regime (gate mirrors test_pq_adc_recall)."""

    dispatch_label = "pq_replica"  # planner last_dispatch tag

    def __init__(
        self,
        heads: DataFrame,
        postings: DataFrame,
        codes: DataFrame,
        books,
        refine_store=None,
        refine_factor: int = 4,
    ) -> None:
        # refine_store: (ids, float32 memmap) from open_refine_store — ADC
        # picks k·refine_factor candidates, their TRUE vectors are read
        # from disk and exact-reranked (the ivf_pq_search refine stage at
        # the serve tier; RAM stays codes-only, the reference's
        # SSD-rerank shape). None → raw ADC distances.
        self.refine = refine_store
        self.refine_factor = int(refine_factor)
        hp = heads.select("head_id", "vector").toPandas()
        self.head_ids = hp["head_id"].to_numpy(np.int64)
        order = np.argsort(self.head_ids)
        self.head_ids = self.head_ids[order]
        self.H = np.array(hp["vector"].tolist(), dtype=np.float64)[order]

        cp = codes.select("id", "codes").toPandas()
        self.code_ids = cp["id"].to_numpy(np.int64)
        corder = np.argsort(self.code_ids)
        self.code_ids = self.code_ids[corder]
        # uint8 — PQ codes index 256-entry codebooks; storing them wider
        # would silently forfeit the M-bytes-per-vector density this
        # replica exists for
        self.codes = np.array(cp["codes"].tolist(), dtype=np.uint8)[corder]

        pp = postings.select("head_id", "id").toPandas()  # NO vectors
        # memberless-head prune, as in LocalSpannReplica (r12)
        live = np.unique(pp["head_id"].to_numpy(np.int64))
        if len(live) < len(self.head_ids):
            keep = np.isin(self.head_ids, live)
            self.head_ids = self.head_ids[keep]
            self.H = self.H[keep]
        slot = np.searchsorted(self.head_ids, pp["head_id"].to_numpy(np.int64))
        porder = np.argsort(slot, kind="stable")
        self.post_rows = np.searchsorted(
            self.code_ids, pp["id"].to_numpy(np.int64)[porder]
        )
        self.indptr = np.searchsorted(
            slot[porder], np.arange(len(self.head_ids) + 1)
        )
        self.books = books

    def search_one(
        self,
        q: np.ndarray,
        k: int = 10,
        nprobe: int = SEARCH_INTERNAL_RESULT_NUM,
        metric: str = "l2",
        max_dist_ratio: float = MAX_DIST_RATIO,
        deleted_ids: np.ndarray | None = None,
        allowed_ids: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """→ (ids, adc_dists) in rank order; distances are ADC estimates.
        ``deleted_ids``/``allowed_ids``: serve-time candidate filters
        (see LocalSpannReplica.search_one)."""
        q = np.asarray(q, dtype=np.float64)
        hd = _exact_pair_dists(self.H, q, metric)
        sel = np.lexsort((self.head_ids, hd))[: min(nprobe, len(self.head_ids))]
        if max_dist_ratio < float("inf"):
            cut = hd[sel].min() * max_dist_ratio
            if cut > 0.1:
                sel = sel[hd[sel] <= cut]
        rows = np.concatenate(
            [self.post_rows[self.indptr[s] : self.indptr[s + 1]] for s in sel]
        ) if len(sel) else np.empty(0, dtype=np.int64)
        if rows.size == 0:
            return np.empty(0, dtype=np.int64), np.empty(0)
        rows = np.unique(rows)  # replica dedup (row index ≡ vector id)
        keep = _id_filter_mask(self.code_ids[rows], deleted_ids, allowed_ids)
        if keep is not None:
            rows = rows[keep]
        if rows.size == 0:
            return np.empty(0, dtype=np.int64), np.empty(0)
        cb, R = self.books.codebooks, self.books.rotation
        m, n_codes, sub = cb.shape
        qr = q @ R if R is not None else q
        lut = np.empty((m, n_codes))
        for i in range(m):
            diff = cb[i] - qr[i * sub : (i + 1) * sub][None, :]
            lut[i] = (diff * diff).sum(1)
        d = lut[np.arange(m)[None, :], self.codes[rows]].sum(1)
        ids = self.code_ids[rows]
        if self.refine is not None:
            rf_ids, rf_V = self.refine
            n_cand = min(len(ids), max(k, k * self.refine_factor))
            pre = np.lexsort((ids, d))[:n_cand]
            cand = ids[pre]
            # id-sorted store: candidate rows by searchsorted; the memmap
            # gather reads only those rows (the SSD rerank I/O). Validate
            # the hit before gathering — an id missing from the store
            # (stale refine store after an index rebuild) would otherwise
            # silently rerank against a WRONG row's vector (ADVICE r9).
            pos = np.minimum(np.searchsorted(rf_ids, cand), len(rf_ids) - 1)
            if len(rf_ids) == 0 or not np.array_equal(rf_ids[pos], cand):
                raise ValueError(
                    "refine store does not cover the index's ids — it was "
                    "built from a different vector set (stale store after "
                    "a rebuild?); rebuild it with build_refine_store"
                )
            V = np.asarray(rf_V[pos], dtype=np.float64)  # exact upcast
            dx = _exact_pair_dists(V, q, metric)
            top = np.lexsort((cand, dx))[: min(k, len(cand))]
            return cand[top], dx[top]
        top = np.lexsort((ids, d))[: min(k, len(ids))]
        return ids[top], d[top]

    def _batch_search_serial(
        self,
        queries: list[tuple[int, np.ndarray]],
        k: int = 10,
        nprobe: int = SEARCH_INTERNAL_RESULT_NUM,
        metric: str = "l2",
        max_dist_ratio: float = MAX_DIST_RATIO,
        deleted_ids: np.ndarray | None = None,
        allowed_ids: np.ndarray | None = None,
    ) -> list[tuple[int, int, int, float]]:
        """Per-query loop over search_one — the semantic definition of
        batch_search; tests pin the vectorized path row-identical to it."""
        out = []
        for qid, q in queries:
            ids, d = self.search_one(
                q, k, nprobe, metric, max_dist_ratio,
                deleted_ids=deleted_ids, allowed_ids=allowed_ids,
            )
            out.extend(
                (int(qid), r + 1, int(i), float(dd))
                for r, (i, dd) in enumerate(zip(ids, d))
            )
        return out

    def batch_search(
        self,
        queries: list[tuple[int, np.ndarray]],
        k: int = 10,
        nprobe: int = SEARCH_INTERNAL_RESULT_NUM,
        metric: str = "l2",
        max_dist_ratio: float = MAX_DIST_RATIO,
        deleted_ids: np.ndarray | None = None,
        allowed_ids: np.ndarray | None = None,
    ) -> list[tuple[int, int, int, float]]:
        """→ rows of (query_id, rank, id, adc_dist) — the QueryResult
        contract with ADC-estimated distances (or exact reranked distances
        when a refine store is attached), row-identical to a search_one
        loop. Vectorized like the full-vector replica's batch path: shared
        head routing, ONE (batch, m, 256) LUT tensor built for all queries
        (same subspace arithmetic as the per-query LUT), and head-major
        ADC scoring so each head's code slab is gathered once per batch.
        ADC values are deterministic gather-sums (not BLAS), so no margin/
        rescore stage is needed — the batched sums are bitwise the
        per-query ones."""
        from sptag_spark.operators.knn import _exact_rowpair_dists

        if not queries or len(self.head_ids) == 0:
            return []
        if len(queries) > _BATCH_QUERY_CHUNK:
            out: list[tuple[int, int, int, float]] = []
            for i in range(0, len(queries), _BATCH_QUERY_CHUNK):
                out.extend(
                    self.batch_search(
                        queries[i : i + _BATCH_QUERY_CHUNK],
                        k,
                        nprobe,
                        metric,
                        max_dist_ratio,
                        deleted_ids=deleted_ids,
                        allowed_ids=allowed_ids,
                    )
                )
            return out
        qids = np.array([int(qid) for qid, _ in queries], dtype=np.int64)
        Q = np.array([np.asarray(v, dtype=np.float64) for _, v in queries])
        B = len(qids)
        nq = (
            np.array([np.linalg.norm(q) for q in Q])
            if metric == "cosine"
            else None
        )
        pair_q, pair_h = _route_batch(
            self.head_ids,
            self.H,
            Q,
            min(nprobe, len(self.head_ids)),
            metric,
            max_dist_ratio,
            nq,
        )
        if pair_h.size == 0:
            return []

        # LUT tensor for the whole batch — per query i, subspace j:
        # (codebook[j] - rotated_q[j·sub:(j+1)·sub])² summed over the
        # subspace, exactly search_one's per-query loop body
        cb, R = self.books.codebooks, self.books.rotation
        m, n_codes, sub = cb.shape
        # rotate per query (vecmat), NOT one GEMM: dgemm and dgemv differ
        # in the last ulp and search_one rotates per query
        QR = np.array([q @ R for q in Q]) if R is not None else Q
        lut = np.empty((B, m, n_codes))
        for j in range(m):
            diff = cb[j][None, :, :] - QR[:, None, j * sub : (j + 1) * sub]
            sq = diff * diff
            # reduce in 2D, not 3D: numpy's last-axis pairwise reduction
            # blocks DIFFERENTLY for 3-D arrays at some shapes (measured:
            # one-ulp drift vs the per-query 2-D sum), and these values
            # must be bitwise the serial kernel's
            lut[:, j, :] = sq.reshape(-1, sub).sum(axis=1).reshape(B, n_codes)
        lut_flat = lut.reshape(B, m * n_codes)
        code_cols = np.arange(m, dtype=np.int64) * n_codes  # (m,)

        # head-major candidate collection + ADC scoring: one code-slab
        # gather per probed head, scored for all its queries in one
        # fancy-gather sum (bitwise the per-query axis-1 sum)
        ho = np.argsort(pair_h, kind="stable")
        ph, pq = pair_h[ho], pair_q[ho]
        bnd = np.nonzero(ph[1:] != ph[:-1])[0] + 1
        starts = np.concatenate(([0], bnd))
        ends = np.concatenate((bnd, [len(ph)]))
        cand_q: list[np.ndarray] = []
        cand_rows: list[np.ndarray] = []
        cand_d: list[np.ndarray] = []
        for s0, e0 in zip(starts, ends):
            s = int(ph[s0])
            lo, hi = int(self.indptr[s]), int(self.indptr[s + 1])
            if hi == lo:
                continue
            qsub = pq[s0:e0]
            rows = self.post_rows[lo:hi]
            idx = code_cols[None, :] + self.codes[rows]  # (n, m) flat cols
            G = lut_flat[qsub][:, idx]  # (|qsub|, n, m)
            # 2-D reduction for bitwise parity with search_one (see LUT)
            D = G.reshape(-1, m).sum(axis=1).reshape(len(qsub), hi - lo)
            cand_q.append(np.repeat(qsub, hi - lo))
            cand_rows.append(np.tile(rows, len(qsub)))
            cand_d.append(D.ravel())
        if not cand_q:
            return []
        cq = np.concatenate(cand_q)
        cr = np.concatenate(cand_rows)
        cd = np.concatenate(cand_d)

        # dedup by (query, code row) — row index ≡ vector id here, and
        # the ADC value of a row is identical wherever it was scored
        cq_u, cr_u, cd_u = _dedup_keep_min(cq, cr, cd)
        ids_u = self.code_ids[cr_u]
        fmask = _id_filter_mask(ids_u, deleted_ids, allowed_ids)
        if fmask is not None:
            cq_u, cr_u, cd_u, ids_u = (
                cq_u[fmask],
                cr_u[fmask],
                cd_u[fmask],
                ids_u[fmask],
            )
            if len(cq_u) == 0:
                return []

        # rank by (adc, id) per query — deterministic values, no rescore
        o2 = np.lexsort((ids_u, cd_u, cq_u))
        cq_u, ids_u, cd_u = cq_u[o2], ids_u[o2], cd_u[o2]
        pos = _run_positions(cq_u)

        if self.refine is not None:
            rf_ids, rf_V = self.refine
            n_cand = max(k, k * self.refine_factor)
            pre = pos < n_cand
            cq_u, ids_u = cq_u[pre], ids_u[pre]
            rf_pos = (
                np.minimum(np.searchsorted(rf_ids, ids_u), len(rf_ids) - 1)
                if len(rf_ids)
                else np.zeros(len(ids_u), dtype=np.int64)
            )
            if len(rf_ids) == 0 or not np.array_equal(rf_ids[rf_pos], ids_u):
                raise ValueError(
                    "refine store does not cover the index's ids — it was "
                    "built from a different vector set (stale store after "
                    "a rebuild?); rebuild it with build_refine_store"
                )
            V = np.asarray(rf_V[rf_pos], dtype=np.float64)  # exact upcast
            dx = _exact_rowpair_dists(
                V,
                Q[cq_u],
                metric,
                nq_rows=(nq[cq_u] if nq is not None else None),
            )
            o3 = np.lexsort((ids_u, dx, cq_u))
            cq_u, ids_u, cd_u = cq_u[o3], ids_u[o3], dx[o3]
            pos = _run_positions(cq_u)
        fin = pos < k
        return [
            (int(qids[p]), int(r), int(i), float(dd))
            for p, r, i, dd in zip(
                cq_u[fin], pos[fin] + 1, ids_u[fin], cd_u[fin]
            )
        ]

    def memory_bytes(self) -> int:
        """RAM actually held by the replica's arrays — the figure the
        planner's budget dispatch trades against the full-vector twin."""
        return int(
            self.H.nbytes
            + self.head_ids.nbytes
            + self.codes.nbytes
            + self.code_ids.nbytes
            + self.post_rows.nbytes
            + self.indptr.nbytes
        )
