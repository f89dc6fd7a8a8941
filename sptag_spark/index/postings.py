"""Posting-list construction — SPANN's SSD layer as a partitioned table.

Reference: ApproximateRNG (`src/Core/VectorIndex.cpp:847-884`, called from
`ExtraFullGraphSearcher.h:681`) searches the head index with every base
vector, keeps up to `ReplicaCount` (8) nearest heads per vector after the RNG
prune rule (`RelativeNeighborhoodGraph.h:18-35`: candidate head j, scanned in
ascending distance order, is accepted iff for every already-accepted head i,
rng_factor · d(head_i, head_j) ≥ d(v, head_j) — i.e. j is not "behind" an
accepted head), then cuts each posting to `PostingPageLimit` pages keeping the
nearest members (`ExtraFullGraphSearcher.h:747-760`).

Spark shape: one mapInPandas pass over the big table with the (small, by
SPANN's own design) heads matrix broadcast in the closure — BLAS block
distances, per-row candidate RNG prune (c×c, c=candidate_num) — then a window
rank per head for the posting cut. Written out with partitionBy(head_id),
Parquet partition pruning replaces SPANN's SSD seek: a query that routes to
h heads reads exactly h directories.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sptag_spark.operators.knn import _as_matrix, _block_distances

REPLICA_COUNT = 8  # SPANN ReplicaCount
CANDIDATE_NUM = 32  # heads considered per vector before RNG prune
RNG_FACTOR = 1.0  # RNGFactor (ParameterDefinitionList)
POSTING_LIMIT = 1000  # members kept per posting (PostingPageLimit analog)

# Coarse-routed assignment kicks in above this head count: scoring every
# head per vector is O(N·k) distance work, and with k = Ratio·N that is
# QUADRATIC in N — a ×256 (512k-vector / 51k-head) build measured ~43 min
# with the flat scan (SCALING.md build autopsy). The reference never flat-
# scans either: ApproximateRNG SEARCHES the head index per vector
# (`VectorIndex.cpp:847-884` → SearchIndex). Routing = the same idea with
# a two-level structure: heads are grouped driver-side (balanced, size
# m ≈ k/g), each vector scores the g group centers, descends into the
# ROUTE_FANOUT nearest groups, and scores only those f·m heads.
ROUTED_MIN_HEADS = 8192
ROUTE_FANOUT = 16
#: k·g cells above which _head_routing switches from the exact dense
#: distance matrix (O(k·g) driver RAM — 45 GB at 1M heads, measured in
#: the r11 dress rehearsal) to the blocked top-2 path (O(k))
_DENSE_ROUTING_ENTRIES = 64_000_000


def _seg_dists(Vb: np.ndarray, Hm: np.ndarray, metric: str) -> np.ndarray:
    """(b, m) distances of a row SEGMENT against one group's head slab —
    the BITWISE twin of _bmd_dists for the constant-group case (pinned by
    test): einsum("bd,md->bm") reduces over d in the same order as
    ("bd,bmd->bm") on a broadcast slab, and every other term is the same
    per-row/per-head elementwise reduction, so the grouped kernel's
    accepted rows are bit-identical to the legacy per-probe gather path —
    without materializing the (b, m, d) gather that dominated its wall
    time (79% measured, r12)."""
    if metric == "l2":
        D = (
            (Hm * Hm).sum(-1)[None, :]
            - 2.0 * np.einsum("bd,md->bm", Vb, Hm)
            + (Vb * Vb).sum(1)[:, None]
        )
        np.maximum(D, 0.0, out=D)
        return D
    if metric == "cosine":
        Vn = Vb / np.maximum(np.linalg.norm(Vb, axis=1, keepdims=True), 1e-300)
        Hn = Hm / np.maximum(np.linalg.norm(Hm, axis=-1, keepdims=True), 1e-300)
        return 1.0 - np.einsum("bd,md->bm", Vn, Hn)
    return -np.einsum("bd,md->bm", Vb, Hm)


def _bmd_dists(Vb: np.ndarray, Hj: np.ndarray, metric: str) -> np.ndarray:
    """(b, m) distances between row-paired blocks: Vb (b, d) against per-row
    head slabs Hj (b, m, d) — the same formulas as _block_distances."""
    if metric == "l2":
        D = (
            (Hj * Hj).sum(-1)
            - 2.0 * np.einsum("bd,bmd->bm", Vb, Hj)
            + (Vb * Vb).sum(1)[:, None]
        )
        np.maximum(D, 0.0, out=D)
        return D
    if metric == "cosine":
        Vn = Vb / np.maximum(np.linalg.norm(Vb, axis=1, keepdims=True), 1e-300)
        Hn = Hj / np.maximum(np.linalg.norm(Hj, axis=-1, keepdims=True), 1e-300)
        return 1.0 - np.einsum("bd,bmd->bm", Vn, Hn)
    return -np.einsum("bd,bmd->bm", Vb, Hj)


def _head_routing(
    H: np.ndarray, head_ids: np.ndarray, metric: str, fanout: int = ROUTE_FANOUT
):
    """Driver-side two-level head layout for routed assignment:
    (group_centers (g, d), Hg (g, m, d), idsg (g, m), valid (g, m)).

    g ≈ √(k·fanout) balances the per-vector work g + fanout·(k/g). Every
    head is placed in its 2 nearest groups UNCONDITIONALLY (the IVF
    boundary-replica trick) — no capacity cap. r12 replaced the previous
    capacity-greedy placement after the dim-100 probe caught its failure
    mode: when natural clusters outnumber groups, a popular group fills
    and the greedy DISPLACES whole clusters' heads into groups none of
    their nearby vectors ever probe — those heads end up with EMPTY
    postings (12% of heads at the probe fixture) and the vectors' true
    neighbors land in far-away postings (recall plateau at 0.77 that no
    nprobe could buy back). Unconditional placement guarantees the
    visibility invariant the kernel relies on: a vector's own nearest
    heads are always inside its probed groups (in particular every head's
    own vector reaches its own posting — pinned by test).

    Total slots are exactly 2k either way; only the per-group DISTRIBUTION
    varies, so m = max group size (logged in the tuple via valid's shape).
    Duplicate sightings of a head through both groups are masked in the
    kernel after the (dist, id) sort. Build cost: one k×g BLAS block below
    _DENSE_ROUTING_ENTRIES; above it, a blocked top-2 scan keeps driver
    memory O(k) (the dense block is O(k^1.5) — 45 GB at 1M heads,
    measured r11)."""
    gc, top2 = _head_top2(H, metric, fanout)
    g = len(gc)
    slots: list[list[int]] = [[] for _ in range(g)]
    for h in range(len(H)):
        for gi in top2[h]:
            slots[int(gi)].append(h)
    m = max((len(s) for s in slots), default=0)
    d = H.shape[1]
    Hg = np.zeros((g, m, d))
    idsg = np.zeros((g, m), dtype=np.int64)
    valid = np.zeros((g, m), dtype=bool)
    for gi in range(g):
        for s, h in enumerate(slots[gi]):
            Hg[gi, s] = H[h]
            idsg[gi, s] = head_ids[h]
            valid[gi, s] = True
    return gc, Hg, idsg, valid


def _head_top2(H: np.ndarray, metric: str, fanout: int = ROUTE_FANOUT):
    """(group_centers, per-head 2 nearest group ids) — the placement both
    routing layouts share. Blocked above _DENSE_ROUTING_ENTRIES: O(k)
    driver memory (the dense (k, g) block is O(k^1.5) — 45 GB at 1M
    heads, measured r11)."""
    from sptag_spark.index.heads import lloyd_kmeans

    k = len(H)
    spill = 2
    g = max(2, min(int(np.sqrt(k * fanout)), k // 2))
    gc = lloyd_kmeans(H, g, iters=5, seed=11)
    if k * g <= _DENSE_ROUTING_ENTRIES:
        D = _block_distances(H, gc, metric)  # (k, g)
        if spill < g:
            top2 = np.argpartition(D, spill - 1, axis=1)[:, :spill]
            dv = np.take_along_axis(D, top2, 1)
            o = np.argsort(dv, axis=1, kind="stable")
            top2 = np.take_along_axis(top2, o, 1)
        else:
            top2 = np.broadcast_to(np.arange(g), (k, g)).copy()
    else:
        top2 = np.empty((k, min(spill, g)), dtype=np.int64)
        block = max(1024, int(2.5e7 / max(g, 1)))
        for s in range(0, k, block):
            Db = _block_distances(H[s : s + block], gc, metric)
            if spill < g:
                idx = np.argpartition(Db, spill - 1, axis=1)[:, :spill]
                dv = np.take_along_axis(Db, idx, 1)
                o = np.argsort(dv, axis=1, kind="stable")
                top2[s : s + block] = np.take_along_axis(idx, o, 1)
            else:
                top2[s : s + block] = np.broadcast_to(
                    np.arange(g), (len(Db), g)
                )
    return gc, top2


def _head_routing_csr(
    H: np.ndarray, head_ids: np.ndarray, metric: str, fanout: int = ROUTE_FANOUT
):
    """CSR twin of _head_routing for the grouped kernel (r12): the same
    unconditional top-2 placement laid out as
    (group_centers (g, d), goff (g+1,), Hflat (2k, d), idsflat (2k,)) —
    group gi's heads are rows goff[gi]:goff[gi+1] of the FLAT arrays.

    Zero padding: the rectangular layout pads every group to the MAX
    group size, and under skew (clusters ≫ groups) that ballooned to a
    multi-GB dense array — the shipped .npy filled the disk at the
    dim-100 probe. CSR is exactly 2k rows whatever the skew. Within each
    group, heads keep ascending head-index order (the slot order the
    rectangular layout uses), so candidate values and tie shapes match
    the legacy path."""
    gc, top2 = _head_top2(H, metric, fanout)
    g = len(gc)
    k = len(H)
    flat_g = top2.ravel()
    # stable sort by group keeps ascending head order within each group
    o = np.argsort(flat_g, kind="stable")
    rows = np.repeat(np.arange(k), top2.shape[1])[o]
    counts = np.bincount(flat_g, minlength=g)
    goff = np.concatenate(([0], np.cumsum(counts)))
    return gc, goff, H[rows], head_ids[rows]


#: payload size above which head/routing arrays ship as memmapped files
#: instead of a pickled Broadcast (see _ship_arrays)
_BC_MMAP_MIN_BYTES = 64 << 20

#: staged-payload reuse + reclamation (r12 ADVICE: every large
#: assign_replicas staged a fresh mkdtemp of multi-GB .npy copies and
#: never removed them). Content-keyed cache: a repeated build over the
#: same payload (rebuild loops, probe reruns) reuses the already-added
#: files; atexit reclaims every staged dir at interpreter exit. Staged
#: files CANNOT be deleted while the SparkContext lives — tasks fetch
#: every addFile'd path lazily and there is no removeFile — so exit-time
#: cleanup is the earliest safe point.
_SHIPPED_CACHE: dict[tuple, dict] = {}
_SHIPPED_DIRS: list[str] = []


def _reclaim_shipped_dirs() -> None:
    import shutil

    for d in _SHIPPED_DIRS:
        shutil.rmtree(d, ignore_errors=True)
    _SHIPPED_DIRS.clear()
    _SHIPPED_CACHE.clear()


def _arrays_content_key(app_id: str, arrays: dict) -> tuple:
    """Exact content identity of a payload (blake2b over raw bytes +
    dtype/shape), scoped to the SparkContext that holds the addFile
    registry. ~1 GB/s — cheaper than re-staging the same gigabytes."""
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    for k in sorted(arrays):
        a = arrays[k]
        h.update(k.encode())
        if a is None:
            h.update(b"\x00none")
            continue
        a = np.ascontiguousarray(a)
        h.update(str((a.dtype.str, a.shape)).encode())
        h.update(memoryview(a).cast("B"))
    return (app_id, h.hexdigest())


def _ship_arrays(spark, arrays: dict):
    """Ship large READ-ONLY numpy payloads to Python workers via
    addFile + np.load(mmap_mode="r") instead of a pickled Broadcast.

    A pickled broadcast is unpickled PER PYTHON WORKER — local[32] holds
    32 private copies, and at the dim-100 probe the ~2 GB routing payload
    × 32 workers OOM-killed the node (r12, twice). An addFile'd .npy is
    fetched once per NODE and memmapped by every worker off the shared
    page cache: one physical copy however many cores. Below
    _BC_MMAP_MIN_BYTES the plain broadcast stays (no file churn for the
    small-head regime). The staged .npy files live for the SparkContext
    (tasks fetch every addFile'd path lazily; no removeFile exists) —
    identical payloads reuse the cache instead of re-staging, and atexit
    reclaims all staged dirs (r12 ADVICE). → a Broadcast whose value
    _load_arrays decodes."""
    total = sum(a.nbytes for a in arrays.values() if a is not None)
    if total < _BC_MMAP_MIN_BYTES:
        return spark.sparkContext.broadcast(arrays)
    import atexit
    import os
    import tempfile
    import uuid

    key = _arrays_content_key(spark.sparkContext.applicationId, arrays)
    if key in _SHIPPED_CACHE:
        return spark.sparkContext.broadcast(
            {"__files__": _SHIPPED_CACHE[key]}
        )
    if not _SHIPPED_DIRS:
        atexit.register(_reclaim_shipped_dirs)
    d = tempfile.mkdtemp(prefix="sptag_bc_")
    _SHIPPED_DIRS.append(d)
    tag = uuid.uuid4().hex[:8]
    names: dict = {}
    for k, a in arrays.items():
        if a is None:
            names[k] = None
            continue
        fn = f"sptag_{tag}_{k}.npy"
        np.save(os.path.join(d, fn), a)
        spark.sparkContext.addFile(os.path.join(d, fn))
        names[k] = fn
    _SHIPPED_CACHE[key] = names
    return spark.sparkContext.broadcast({"__files__": names})


def _load_arrays(value) -> dict:
    """Worker-side twin of _ship_arrays."""
    if "__files__" not in value:
        return value
    from pyspark import SparkFiles

    return {
        k: (None if fn is None else np.load(SparkFiles.get(fn), mmap_mode="r"))
        for k, fn in value["__files__"].items()
    }


def _rng_prune(
    cand_dists: np.ndarray, head_head: np.ndarray, replica: int, rng_factor: float
) -> list[int]:
    """Indices (into the candidate list) surviving the RNG rule, ≤ replica.
    cand_dists: ascending distances v→candidate-head; head_head[i, j]:
    distance between candidate heads i and j."""
    accepted: list[int] = []
    for j in range(len(cand_dists)):
        ok = True
        for i in accepted:
            if rng_factor * head_head[i, j] < cand_dists[j]:
                ok = False
                break
        if ok:
            accepted.append(j)
            if len(accepted) >= replica:
                break
    return accepted


def _prune_block(
    cand: np.ndarray,
    d_c: np.ndarray,
    head_ids: np.ndarray,
    H: np.ndarray,
    HH: np.ndarray | None,
    metric: str,
    replica_count: int,
    rng_factor: float,
    routed: bool,
):
    """Shared tail of the assignment kernel: per-row (dist, head_id)
    ascending sort, spilled-duplicate mask (routed mode), candidate
    head-head distances, and the vectorized greedy RNG prune.
    → (h2 (b,c) head ids in rank order, d2 (b,c) dists, acc (b,c) accept
    mask). Identical arithmetic for every caller — the flat path, the
    legacy routed path, and the grouped routed path differ only in how
    (cand, d_c) were produced."""
    # per-row (dist, head_id) ascending order — two STABLE argsorts ≡
    # np.lexsort((head_ids, dist)) rowwise
    hid_c = head_ids[cand]
    o1 = np.argsort(hid_c, axis=1, kind="stable")
    d1 = np.take_along_axis(d_c, o1, 1)
    c1 = np.take_along_axis(cand, o1, 1)
    o2 = np.argsort(d1, axis=1, kind="stable")
    d2 = np.take_along_axis(d1, o2, 1)
    c2 = np.take_along_axis(c1, o2, 1)
    h2 = head_ids[c2]
    b = len(cand)
    # routed mode spills heads into 2 groups, so the same head can be
    # sighted twice; duplicates carry identical (dist, head_id), hence
    # are ADJACENT after the sort
    dup = np.zeros(d2.shape, dtype=bool)
    if routed:
        dup[:, 1:] = (h2[:, 1:] == h2[:, :-1]) & (d2[:, 1:] == d2[:, :-1])
    # (b, c, c) candidate head-head distances
    if HH is not None:
        hh = HH[c2[:, :, None], c2[:, None, :]]
    else:
        G = H[c2]  # (b, c, d)
        if metric == "l2":
            sq = (G * G).sum(-1)
            hh = (
                sq[:, :, None]
                + sq[:, None, :]
                - 2.0 * np.einsum("bid,bjd->bij", G, G)
            )
            np.maximum(hh, 0.0, out=hh)
        elif metric == "cosine":
            Gn = G / np.maximum(
                np.linalg.norm(G, axis=-1, keepdims=True), 1e-300
            )
            hh = 1.0 - np.einsum("bid,bjd->bij", Gn, Gn)
            np.maximum(hh, 0.0, out=hh)
        else:  # ip
            hh = -np.einsum("bid,bjd->bij", G, G)
    # greedy RNG prune, vectorized over rows: candidate j (in ascending
    # (dist, id) order) is accepted iff no already-accepted i has
    # rng·d(head_i, head_j) < d(v, head_j) and the replica budget is open
    # — identical to the sequential early-exit loop, iterated j=0..c-1
    # across all rows at once
    n_c = d2.shape[1]
    acc = np.zeros((b, n_c), dtype=bool)
    acc_cnt = np.zeros(b, dtype=np.int64)
    # padded inf-dist slots (routed mode) flow through the violation
    # arithmetic by design and can produce non-finite intermediates
    # (inf*0 in the broadcast multiply); the isfinite/dup guards below
    # exclude those slots from acceptance, so the warning is noise —
    # scope it out rather than paying a per-slot pre-mask (r12 nit class)
    with np.errstate(invalid="ignore"):
        for j in range(n_c):
            viol = acc & (rng_factor * hh[:, :, j] < d2[:, j][:, None])
            # isfinite: routed mode pads short groups with inf-dist slots;
            # dup: second sighting of a spilled head — neither may be
            # accepted as a head
            ok = (
                ~viol.any(axis=1)
                & (acc_cnt < replica_count)
                & np.isfinite(d2[:, j])
                & ~dup[:, j]
            )
            acc[:, j] = ok
            acc_cnt += ok
    return h2, d2, acc


def assign_replicas(
    vectors: DataFrame,
    heads: DataFrame,
    metric: str = "l2",
    replica_count: int = REPLICA_COUNT,
    candidate_num: int = CANDIDATE_NUM,
    rng_factor: float = RNG_FACTOR,
    routed: bool | None = None,
    routed_impl: str = "grouped",
) -> DataFrame:
    """(head_id, id, vector, dist): every vector assigned to 1..replica_count
    heads. Head vectors ride along so postings are self-contained, like
    SPANN's posting records `(vid, vector)` (`ExtraFullGraphSearcher.h:60-110`).

    ``routed`` (default auto: head count ≥ ROUTED_MIN_HEADS): candidate
    heads come from the ROUTE_FANOUT nearest head GROUPS instead of a flat
    scan of every head — O(√(k·f) + f·k/√(k·f)) per vector instead of O(k),
    the same approximate-search-the-heads idea as the reference's
    ApproximateRNG. Below the gate the flat scan runs and results are
    byte-identical to before. Routing is approximate in the same way the
    reference's is: a candidate outside the f nearest groups is invisible,
    which can only LOSE a far replica, never corrupt a near one (recall
    re-measured at the build scale that motivated it — SCALING.md)."""
    # the head matrix is an immutable index artifact — collected once per
    # heads-frame OBJECT via the shared cache (r13: a live index streaming
    # micro-batches paid this collect job on EVERY add_batch; the memoized
    # prebuilt heads frame is the same object across a session's runs)
    from sptag_spark.index.ann import head_matrix

    head_ids, H = head_matrix(heads)
    if routed is None:
        routed = len(head_ids) >= ROUTED_MIN_HEADS
    routing = None
    routing_csr = None
    if routed and candidate_num < len(head_ids):
        if routed_impl == "grouped":
            # CSR layout (r12): flat (2k, d) slot arrays, zero padding —
            # a pure function of the (immutable) head matrix + metric, so
            # it is likewise computed once per frame object and remembered
            cache_key = ("csr", metric)
            cached = getattr(heads, "_sptag_routing_csr", None)
            if cached is None or cached[0] != cache_key:
                gc_csr, goff, Hg, idg = _head_routing_csr(
                    H, head_ids, metric
                )
                cached = (cache_key, (gc_csr, goff, Hg, idg))
                try:
                    heads._sptag_routing_csr = cached
                except Exception:  # noqa: BLE001 — cache is best-effort
                    pass
            gc_csr, goff, H, head_ids = cached[1]
            routing_csr = (gc_csr, goff)
        else:
            routing = _head_routing(H, head_ids, metric)
            # the flat arrays are replaced by the grouped fixed-slot
            # layout; padded slots carry dist=inf and are masked out
            # before selection
            g, m, _ = routing[1].shape
            H = routing[1].reshape(g * m, H.shape[1])
            head_ids = routing[2].reshape(g * m)
    # Heads ride a BROADCAST variable, not the task closure: the head set is
    # ~0.1·N (tens of GB at billion scale — the same per-node footprint the
    # reference's in-memory head index has), and a closure re-ships it with
    # every task while a broadcast lands once per executor.
    # Head-head distances: precompute the full h×h block only while it is
    # small; past that it is O(h²) memory (impossible at ≥1M heads) and the
    # RNG prune only ever reads the c×c candidate block, which is cheap to
    # compute per row from H directly.
    HH = (
        _block_distances(H, H, metric)
        if routing is None and routing_csr is None and len(head_ids) <= 4096
        else None
    )
    # big payloads ship as memmapped files (one physical copy per node),
    # small ones as a plain broadcast — see _ship_arrays
    bc = _ship_arrays(
        vectors.sparkSession,
        {
            "head_ids": head_ids,
            "H": H,
            "HH": HH,
            "gc": routing[0] if routing is not None else None,
            "Hg": routing[1] if routing is not None else None,
            "idsg": routing[2] if routing is not None else None,
            "valid": routing[3] if routing is not None else None,
            "gc_csr": routing_csr[0] if routing_csr is not None else None,
            "goff": routing_csr[1] if routing_csr is not None else None,
        },
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        arrs = _load_arrays(bc.value)
        head_ids, H, HH = arrs["head_ids"], arrs["H"], arrs["HH"]
        routing = (
            (arrs["gc"], arrs["Hg"], arrs["idsg"], arrs["valid"])
            if arrs["gc"] is not None
            else None
        )
        routing_csr = (
            (arrs["gc_csr"], np.asarray(arrs["goff"]))
            if arrs["gc_csr"] is not None
            else None
        )
        # The assignment is fully VECTORIZED across rows — a per-row Python
        # loop (argpartition + lexsort + c×c gather per vector) measured 128k
        # interpreter iterations per ×64 build and dominated wall time. Rows
        # are processed in bounded sub-blocks so the (b, c, c) head-head and
        # (b, c, d) gather temporaries stay tens of MB per worker.
        SUB = 512
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = _as_matrix(pdf["vector"])
            ids = pdf["id"].to_numpy(dtype=np.int64)
            # object array of float32 numpy cells — gathered (not boxed into
            # Python lists) for the output column; Arrow serializes the
            # numeric arrays directly
            vec_arr = pdf["vector"].to_numpy()
            c = min(candidate_num, len(head_ids))
            n = len(ids)

            if routing_csr is not None:
                # GROUPED routed path (r12 — the legacy per-probe
                # einsum over a (b, m, d) gathered slab measured 79% of
                # kernel wall at 100k heads, dominated by the gather's
                # memory traffic). Two passes:
                #   A. route every row to its f nearest groups in 512-row
                #      input-order subblocks, keeping only topf (n, f);
                #   B. sort rows by nearest group, then score each
                #      DISTINCT group once per subblock with a segment
                #      einsum (_seg_dists) over the CSR slot arrays —
                #      BITWISE the legacy kernel's candidate values (no
                #      (b, m, d) gather ever materializes), per-group
                #      local top-c pooled into the per-row top-c (the
                #      global top-c is a subset of every group's local
                #      top-c, so the candidate SET matches the legacy
                #      rectangular selection up to exact ties between
                #      duplicate spilled sightings — equivalent rows
                #      after the prune; pinned by the A/B test).
                gc_, goff = routing_csr
                g = len(goff) - 1
                f = min(ROUTE_FANOUT, g)
                topf_all = np.empty((n, f), dtype=np.int64)
                for s in range(0, n, SUB):
                    Vb = V[s : s + SUB]
                    b = len(Vb)
                    Dg = _block_distances(Vb, gc_, metric)  # (b, g)
                    topf_all[s : s + b] = (
                        np.argpartition(Dg, f - 1, axis=1)[:, :f]
                        if f < g
                        else np.broadcast_to(np.arange(g), (b, g))
                    )
                order = np.argsort(topf_all[:, 0], kind="stable")
                for s in range(0, n, SUB):
                    rsel = order[s : s + SUB]
                    Vb = V[rsel]
                    b = len(rsel)
                    tb = topf_all[rsel]  # (b, f)
                    nf = tb.shape[1]
                    flat_g = tb.ravel()
                    o = np.argsort(flat_g, kind="stable")
                    fg = flat_g[o]
                    rr = np.repeat(np.arange(b), nf)[o]
                    bnd = np.nonzero(fg[1:] != fg[:-1])[0] + 1
                    pr: list[np.ndarray] = []
                    pdi: list[np.ndarray] = []
                    pi: list[np.ndarray] = []
                    for s0, e0 in zip(
                        np.concatenate(([0], bnd)),
                        np.concatenate((bnd, [len(fg)])),
                    ):
                        gi = int(fg[s0])
                        lo, hi = int(goff[gi]), int(goff[gi + 1])
                        if hi == lo:
                            continue
                        rs = rr[s0:e0]
                        Dsub = _seg_dists(Vb[rs], H[lo:hi], metric)
                        cc_i = min(c, hi - lo)
                        if cc_i < hi - lo:
                            seli = np.argpartition(
                                Dsub, cc_i - 1, axis=1
                            )[:, :cc_i]
                            dsel = np.take_along_axis(Dsub, seli, 1)
                        else:
                            seli = np.broadcast_to(
                                np.arange(hi - lo), Dsub.shape
                            )
                            dsel = Dsub
                        pr.append(np.repeat(rs, seli.shape[1]))
                        pdi.append(dsel.ravel())
                        pi.append((lo + seli).ravel())
                    if not pr:
                        continue
                    ar = np.concatenate(pr)
                    ad = np.concatenate(pdi)
                    ai = np.concatenate(pi)
                    # per-row top-c over the pooled candidates; ties at
                    # the boundary break by flat slot (deterministic)
                    o2 = np.lexsort((ai, ad, ar))
                    ar, ad, ai = ar[o2], ad[o2], ai[o2]
                    first = np.ones(len(ar), dtype=bool)
                    first[1:] = ar[1:] != ar[:-1]
                    starts_idx = np.nonzero(first)[0]
                    seg_len = np.diff(np.append(starts_idx, len(ar)))
                    pos = np.arange(len(ar)) - np.repeat(
                        starts_idx, seg_len
                    )
                    keepm = pos < c
                    cand = np.zeros((b, c), dtype=np.int64)
                    d_c = np.full((b, c), np.inf)
                    cand[ar[keepm], pos[keepm]] = ai[keepm]
                    d_c[ar[keepm], pos[keepm]] = ad[keepm]
                    h2, d2, acc = _prune_block(
                        cand, d_c, head_ids, H, HH, metric,
                        replica_count, rng_factor, routed=True,
                    )
                    rows, cols = np.nonzero(acc)
                    if len(rows) == 0:
                        continue
                    yield pd.DataFrame(
                        {
                            "head_id": h2[rows, cols],
                            "id": ids[rsel[rows]],
                            "vector": vec_arr[rsel[rows]],
                            "dist": d2[rows, cols],
                        }
                    )
                continue

            for s in range(0, n, SUB):
                Vb = V[s : s + SUB]
                b = len(Vb)
                if routing is not None:
                    # legacy routed path: per-probe (b, m, d) gather +
                    # batched einsum — kept for the identical-rows A/B
                    # (routed_impl="legacy"); the grouped path above is
                    # the default
                    gc_, Hg, _idsg, valid = routing
                    g, m, _ = Hg.shape
                    f = min(ROUTE_FANOUT, g)
                    Dg = _block_distances(Vb, gc_, metric)  # (b, g)
                    topf = (
                        np.argpartition(Dg, f - 1, axis=1)[:, :f]
                        if f < g
                        else np.broadcast_to(np.arange(g), (b, g)).copy()
                    )
                    dc_parts, ic_parts = [], []
                    slot = np.arange(m)[None, :]
                    for j in range(topf.shape[1]):
                        gj = topf[:, j]
                        dj = _bmd_dists(Vb, Hg[gj], metric)  # (b, m)
                        dj[~valid[gj]] = np.inf  # padded slots
                        dc_parts.append(dj)
                        ic_parts.append(gj[:, None] * m + slot)
                    Dc = np.concatenate(dc_parts, axis=1)  # (b, f·m)
                    Ic = np.concatenate(ic_parts, axis=1)
                    cc = min(c, Dc.shape[1])
                    sel = np.argpartition(Dc, cc - 1, axis=1)[:, :cc]
                    cand = np.take_along_axis(Ic, sel, 1)
                    d_c = np.take_along_axis(Dc, sel, 1)
                else:
                    D = _block_distances(Vb, H, metric)  # (b, h)
                    if c < len(head_ids):
                        cand = np.argpartition(D, c - 1, axis=1)[:, :c]
                    else:
                        cand = np.broadcast_to(
                            np.arange(len(head_ids)), (b, len(head_ids))
                        ).copy()
                    d_c = np.take_along_axis(D, cand, 1)
                h2, d2, acc = _prune_block(
                    cand, d_c, head_ids, H, HH, metric,
                    replica_count, rng_factor, routed=routing is not None,
                )
                rows, cols = np.nonzero(acc)
                if len(rows) == 0:
                    continue
                yield pd.DataFrame(
                    {
                        "head_id": h2[rows, cols],
                        "id": ids[s + rows],
                        "vector": vec_arr[s + rows],
                        "dist": d2[rows, cols],
                    }
                )

    src = vectors.select("id", "vector")
    # The assignment kernel is CPU-bound (N×h BLAS block per row-batch), so
    # its parallelism is the INPUT partition count — and a compact parquet
    # (tens of MB per 100k vectors) arrives as one or two
    # maxPartitionBytes-sized splits, serializing the whole build on one
    # core (measured 85 s → 7 s on a 128k×15k-head build). A real 100 TB
    # table has orders of magnitude more splits than cores and skips this.
    par = src.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < par:
        src = src.repartition(par)
    return src.mapInPandas(
        kernel, schema="head_id long, id long, vector array<float>, dist double"
    )


def cut_postings(
    postings: DataFrame,
    limit: int = POSTING_LIMIT,
    keep_primary: bool = True,
) -> DataFrame:
    """Posting truncation: keep the `limit` nearest members per head
    (`ExtraFullGraphSearcher.h:747-760`) — but never a vector's LAST
    replica. Plain truncation can orphan a vector outright (every one of
    its replicas past some cap), leaving it unreachable at ANY nprobe —
    measured at the r12 dim-100 probe: 78k of 2.1M vectors orphaned, a
    hard recall ceiling no search parameter can buy back. The reference
    leans on balanced closure clustering keeping posting sizes under the
    cap and truncates hard when it binds; here, when the cap does bind,
    each vector's PRIMARY replica (rank-1 by (dist, head_id)) survives
    past the limit, so coverage is total. A posting can exceed `limit`
    by its primary count only (documented divergence — safety over a
    strict page budget). keep_primary=False restores reference-exact
    truncation. When no posting exceeds `limit`, output is identical
    either way."""
    w = Window.partitionBy("head_id").orderBy(F.col("dist"), F.col("id"))
    out = postings.withColumn("_rn", F.row_number().over(w))
    if keep_primary:
        wp = Window.partitionBy("id").orderBy(F.col("dist"), F.col("head_id"))
        out = out.withColumn("_pr", F.row_number().over(wp)).filter(
            (F.col("_rn") <= limit) | (F.col("_pr") == 1)
        )
        return out.drop("_rn", "_pr")
    return out.filter(F.col("_rn") <= limit).drop("_rn")


def build_postings(
    vectors: DataFrame,
    heads: DataFrame,
    metric: str = "l2",
    replica_count: int = REPLICA_COUNT,
    posting_limit: int = POSTING_LIMIT,
) -> DataFrame:
    return cut_postings(
        assign_replicas(vectors, heads, metric, replica_count), posting_limit
    )


def write_postings(postings: DataFrame, path: str) -> None:
    """Persist partitioned by head_id with zstd — the Parquet translation of
    SPANN's page-aligned, optionally-zstd posting files (`Options.h:82-88`).
    Partition pruning on head_id is the SSD seek.

    Repartition by head_id before the partitioned write (guide §6 output
    sizing): without it every upstream shuffle partition sprays a fragment
    file into every head directory it touches — measured 8 files per head
    (480 files for a 4 MB store) at sf0.1, and every subsequent full scan
    of the store paid the per-file open cost 8× over. One task per head →
    one file per head posting list, exactly the reference's one-posting-
    one-extent layout; oversized heads are split by maxRecordsPerFile
    rather than fragmented by accident."""
    (
        postings.repartition("head_id")
        .write.mode("overwrite")
        .partitionBy("head_id")
        .option("compression", "zstd")
        .option("maxRecordsPerFile", 1 << 20)
        .parquet(path)
    )


def posting_stats(postings: DataFrame) -> DataFrame:
    """Posting-size histogram (`ExtraFullGraphSearcher.h:628-760` prints the
    same): (head_id, n_members, avg_dist)."""
    return postings.groupBy("head_id").agg(
        F.count("*").alias("n_members"),
        F.round(F.avg("dist"), 4).alias("avg_dist"),
    )


def replica_stats(postings: DataFrame) -> DataFrame:
    """Replica-count distribution: how many heads each vector landed in."""
    per_vec = postings.groupBy("id").agg(F.count("*").alias("n_replicas"))
    return per_vec.groupBy("n_replicas").agg(F.count("*").alias("n_vectors"))
