"""Product quantization + ADC search — SPTAG's quantizer layer, Spark-first.

Reference: `Common/PQQuantizer.h:23-209` — M subvectors × 256-entry codebooks;
encoding = per-subvector argmin over codebook entries; search uses ADC
(asymmetric distance computation): per query, precompute an M×256 lookup table
of subvector distances, then a candidate's distance ≈ Σ_m LUT[m, code[m]]
(`PQQuantizer.h:112-194`). OPQ (`Common/OPQQuantizer.h`) adds a learned
rotation before PQ — exposed here as an optional orthogonal matrix.

Spark shape: codebooks are trained on a driver-side sample (training is
sample-based in the reference too — `Tools/OPQ/OPQ_gpu_train_infer.py`),
broadcast in closures; encoding and ADC scoring are mapInPandas NumPy kernels
(Arrow-batched). Codes are `array<tinyint>` — 64 dims float32 (256 B) become
M=8 bytes, a 32× compression: this is what makes 100 TB of vectors scannable.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class PQCodebooks:
    """codebooks[m]: (256, sub_dim) float64; optional rotation (dim, dim)."""

    codebooks: np.ndarray  # (M, 256, sub_dim)
    rotation: np.ndarray | None = None

    @property
    def m(self) -> int:
        return self.codebooks.shape[0]

    @property
    def dim(self) -> int:
        return self.codebooks.shape[0] * self.codebooks.shape[2]


def _kmeans_1d(X: np.ndarray, k: int, iters: int, rng: np.random.Generator) -> np.ndarray:
    """Lloyd k-means on a sample (driver-side, small). Returns (≤k, d).
    Delegates to the blocked-BLAS loop in index/heads.py — the naive
    (X[:,None,:]-centers)² broadcast allocates an n×k×d temp per iteration
    and runs ~6× slower at codebook scale."""
    from sptag_spark.index.heads import lloyd_kmeans

    seed = int(rng.integers(0, 2**31 - 1))
    return lloyd_kmeans(X, k, iters=iters, seed=seed)


def _encode_inmem(X: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, M) argmin codes for rotated-space X — the training-loop twin of
    the pq_encode kernel."""
    m, _, sub = books.shape
    codes = np.empty((len(X), m), dtype=np.int64)
    for i in range(m):
        Xs = X[:, i * sub : (i + 1) * sub]
        d = -2.0 * (Xs @ books[i].T) + (books[i] ** 2).sum(1)[None, :]
        codes[:, i] = d.argmin(1)
    return codes


def _reconstruct_inmem(codes: np.ndarray, books: np.ndarray) -> np.ndarray:
    m = books.shape[0]
    return np.concatenate([books[i][codes[:, i]] for i in range(m)], axis=1)


def _lloyd_refine(X: np.ndarray, centers: np.ndarray, iters: int) -> np.ndarray:
    """Warm-started Lloyd steps (codebook update half of the OPQ loop)."""
    k = len(centers)
    for _ in range(iters):
        d = -2.0 * (X @ centers.T) + (centers**2).sum(1)[None, :]
        a = d.argmin(1)
        for c in range(k):
            mask = a == c
            if mask.any():
                centers[c] = X[mask].mean(0)
    return centers


def train_pq(
    vectors: DataFrame,
    m: int = 8,
    nbits: int = 8,
    sample_rows: int = 20_000,
    iters: int = 10,
    seed: int = 42,
    opq_rotation: bool = False,
    opq_iters: int = 8,
) -> PQCodebooks:
    """Train M codebooks of 2^nbits entries on a sample.

    With opq_rotation=True, runs full OPQ-NP (Ge et al., the optimization
    `Common/OPQQuantizer.h` consumes — its Tools/OPQ trainer implements the
    same loop): initialize R with PCA, then alternate (1) codebook refinement
    in the rotated space, (2) encode→reconstruct, (3) orthogonal Procrustes
    update R = UVᵀ from SVD(XᵀY). Each iteration cannot increase the
    quantization error ‖XR − Y‖²; opq_iters=0 degrades to the one-shot PCA
    rotation."""
    n = vectors.count()
    frac = min(1.0, sample_rows / max(n, 1))
    sample = vectors if frac >= 1.0 else vectors.sample(frac, seed=seed)
    X = np.array(
        [list(r["vector"]) for r in sample.select("vector").collect()],
        dtype=np.float64,
    )
    rng = np.random.default_rng(seed)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    k = 2**nbits

    if not opq_rotation:
        books = np.stack(
            [
                _kmeans_1d(X[:, i * sub : (i + 1) * sub], k, iters, rng)
                for i in range(m)
            ]
        )
        return PQCodebooks(codebooks=books, rotation=None)

    # OPQ init: PCA + eigenvalue allocation (OPQ-P, Ge et al. §4): raw PCA
    # order stuffs all variance into the first subspace, which is WORSE than
    # no rotation; greedily assign principal components to the subspace with
    # the smallest eigenvalue product (log-sum) until each holds `sub` dims,
    # balancing per-subspace information.
    _, sv, vt = np.linalg.svd(X - X.mean(0), full_matrices=False)
    eig = np.maximum(sv**2, 1e-12)
    bucket_log = np.zeros(m)
    bucket_fill = np.zeros(m, dtype=np.int64)
    perm: list[list[int]] = [[] for _ in range(m)]
    for comp in range(dim):  # eigenvalues already descending
        open_b = np.nonzero(bucket_fill < sub)[0]
        b = open_b[np.argmin(bucket_log[open_b])]
        perm[b].append(comp)
        bucket_log[b] += float(np.log(eig[comp]))
        bucket_fill[b] += 1
    order = [c for bucket in perm for c in bucket]
    R = vt.T[:, order]  # (dim, dim) orthogonal
    Xr = X @ R
    books = np.stack(
        [_kmeans_1d(Xr[:, i * sub : (i + 1) * sub], k, iters, rng) for i in range(m)]
    )
    for _ in range(opq_iters):
        # (1) refine codebooks in the current rotated space
        books = np.stack(
            [
                _lloyd_refine(Xr[:, i * sub : (i + 1) * sub], books[i], 2)
                for i in range(m)
            ]
        )
        # (2) reconstruction of the rotated sample
        Y = _reconstruct_inmem(_encode_inmem(Xr, books), books)
        # (3) Procrustes: min_R ‖XR − Y‖² over orthogonal R
        U, _, Vt = np.linalg.svd(X.T @ Y)
        R = U @ Vt
        Xr = X @ R
    return PQCodebooks(codebooks=books, rotation=R)


def pq_encode(vectors: DataFrame, books: PQCodebooks) -> DataFrame:
    """(id, codes array<smallint>): per-subvector argmin code assignment
    (`PQQuantizer.h:139-209`)."""
    cb, R = books.codebooks, books.rotation
    m, _, sub = cb.shape

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(pdf["vector"].tolist(), dtype=np.float64)
            if R is not None:
                V = V @ R
            codes = np.empty((len(V), m), dtype=np.int16)
            for i in range(m):
                Xs = V[:, i * sub : (i + 1) * sub]
                # ||x-c||² = ||x||² - 2xc + ||c||²; argmin ignores ||x||²
                d = -2.0 * (Xs @ cb[i].T) + (cb[i] ** 2).sum(1)[None, :]
                codes[:, i] = d.argmin(1)
            yield pd.DataFrame(
                {"id": pdf["id"].to_numpy(), "codes": list(codes)}
            )

    return vectors.select("id", "vector").mapInPandas(
        kernel, schema="id long, codes array<smallint>"
    )


def adc_search(
    codes: DataFrame,
    queries: DataFrame,
    books: PQCodebooks,
    k: int = 10,
    q_rows: list | None = None,
) -> DataFrame:
    """Approximate top-k over PQ codes via ADC LUTs (squared-L2 semantics).

    Per query: LUT[m, c] = ||q_sub_m - codebook[m][c]||²; candidate distance =
    Σ_m LUT[m, code[m]] — one M-byte gather per candidate instead of a D-dim
    float scan. Same map-side-top-k + merge shape as knn().
    Returns (query_id, rank, id, adc_dist).
    """
    cb, R = books.codebooks, books.rotation
    m, k_codes, sub = cb.shape
    qrows = (
        q_rows
        if q_rows is not None
        else queries.select("query_id", "vector").collect()
    )
    query_ids = np.array([r["query_id"] for r in qrows], dtype=np.int64)
    Q = np.array([list(r["vector"]) for r in qrows], dtype=np.float64)
    if R is not None:
        Q = Q @ R
    # (nq, M, 256) LUTs — broadcast once per query batch
    luts = np.stack(
        [
            ((Q[:, i * sub : (i + 1) * sub, None] - cb[i].T[None, :, :]) ** 2).sum(1)
            for i in range(m)
        ],
        axis=1,
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.array(pdf["codes"].tolist(), dtype=np.int64)  # (n, M)
            ids = pdf["id"].to_numpy(dtype=np.int64)
            out = []
            kk = min(k, len(ids))
            for qi in range(len(query_ids)):
                lut = luts[qi]  # (M, 256)
                d = lut[np.arange(m)[None, :], C].sum(1)  # (n,)
                cand = np.argpartition(d, kk - 1)[:kk] if kk < len(ids) else np.arange(len(ids))
                order = np.lexsort((ids[cand], d[cand]))[:kk]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": np.full(kk, query_ids[qi], dtype=np.int64),
                            "id": ids[cand[order]],
                            "adc_dist": d[cand[order]],
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    cand = codes.mapInPandas(kernel, schema="query_id long, id long, adc_dist double")
    # rank-window shuffle sized by |Q| (r13, guide §2.2; see knn_arrays)
    cand = cand.repartition(max(1, -(-len(query_ids) // 128)), "query_id")
    w = Window.partitionBy("query_id").orderBy(F.col("adc_dist"), F.col("id"))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "id", "adc_dist")
    )


def pq_decode(codes: DataFrame, books: PQCodebooks) -> DataFrame:
    """ReconstructVector (`OPQQuantizer.h:31,` `PQQuantizer.h` reconstruct):
    codes → approximate float vectors (inverse-rotated for OPQ). Map-only;
    codebooks ride in the closure."""
    cb, R = books.codebooks, books.rotation

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.array(pdf["codes"].tolist(), dtype=np.int64)
            Y = _reconstruct_inmem(C, cb)
            if R is not None:
                Y = Y @ R.T  # rotation is orthogonal: inverse = transpose
            yield pd.DataFrame(
                {"id": pdf["id"].to_numpy(), "vector": list(Y.astype(np.float32))}
            )

    return codes.select("id", "codes").mapInPandas(
        kernel, schema="id long, vector array<float>"
    )


def sdc_search(
    codes: DataFrame,
    queries: DataFrame,
    books: PQCodebooks,
    k: int = 10,
    q_rows: list | None = None,
) -> DataFrame:
    """Symmetric distance computation (the reference's EnableADC=false mode,
    `PQQuantizer.h:112-138`): the QUERY is also quantized and distance is a
    sum of precomputed code-to-code sub-distances — one (M, 256, 256) table
    derived from the codebooks alone, shared by every query. Coarser than
    ADC (both sides quantized) but the query never touches float vectors —
    the mode used when queries arrive pre-encoded.
    Returns (query_id, rank, id, sdc_dist)."""
    cb, R = books.codebooks, books.rotation
    m, k_codes, sub = cb.shape
    # (M, 256, 256) symmetric sub-distance tables
    tables = np.stack(
        [
            ((cb[i][:, None, :] - cb[i][None, :, :]) ** 2).sum(-1)
            for i in range(m)
        ]
    )
    qrows = (
        q_rows
        if q_rows is not None
        else queries.select("query_id", "vector").collect()
    )
    query_ids = np.array([r["query_id"] for r in qrows], dtype=np.int64)
    Q = np.array([list(r["vector"]) for r in qrows], dtype=np.float64)
    if R is not None:
        Q = Q @ R
    qcodes = _encode_inmem(Q, cb)  # (nq, M)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.array(pdf["codes"].tolist(), dtype=np.int64)  # (n, M)
            ids = pdf["id"].to_numpy(dtype=np.int64)
            out = []
            kk = min(k, len(ids))
            for qi in range(len(query_ids)):
                d = tables[np.arange(m)[None, :], qcodes[qi][None, :], C].sum(1)
                cand = (
                    np.argpartition(d, kk - 1)[:kk]
                    if kk < len(ids)
                    else np.arange(len(ids))
                )
                order = np.lexsort((ids[cand], d[cand]))[:kk]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": np.full(kk, query_ids[qi], dtype=np.int64),
                            "id": ids[cand[order]],
                            "sdc_dist": d[cand[order]],
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    cand = codes.mapInPandas(kernel, schema="query_id long, id long, sdc_dist double")
    # rank-window shuffle sized by |Q| (r13, guide §2.2; see knn_arrays)
    cand = cand.repartition(max(1, -(-len(query_ids) // 128)), "query_id")
    w = Window.partitionBy("query_id").orderBy(F.col("sdc_dist"), F.col("id"))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "id", "sdc_dist")
    )
