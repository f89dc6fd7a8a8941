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


def train_pq(
    vectors: DataFrame,
    m: int = 8,
    nbits: int = 8,
    sample_rows: int = 20_000,
    iters: int = 10,
    seed: int = 42,
    opq_rotation: bool = False,
) -> PQCodebooks:
    """Train M codebooks of 2^nbits entries on a sample. With
    opq_rotation=True, learns a PCA-based rotation first (OPQ-lite)."""
    n = vectors.count()
    frac = min(1.0, sample_rows / max(n, 1))
    sample = vectors if frac >= 1.0 else vectors.sample(frac, seed=seed)
    X = np.array(
        [list(r["vector"]) for r in sample.select("vector").collect()],
        dtype=np.float64,
    )
    rng = np.random.default_rng(seed)
    R = None
    if opq_rotation:
        # PCA rotation decorrelates dimensions — the simple non-iterative OPQ
        _, _, vt = np.linalg.svd(X - X.mean(0), full_matrices=False)
        R = vt.T  # (dim, dim) orthogonal
        X = X @ R
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    k = 2**nbits
    books = np.stack(
        [_kmeans_1d(X[:, i * sub : (i + 1) * sub], k, iters, rng) for i in range(m)]
    )
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
) -> DataFrame:
    """Approximate top-k over PQ codes via ADC LUTs (squared-L2 semantics).

    Per query: LUT[m, c] = ||q_sub_m - codebook[m][c]||²; candidate distance =
    Σ_m LUT[m, code[m]] — one M-byte gather per candidate instead of a D-dim
    float scan. Same map-side-top-k + merge shape as knn().
    Returns (query_id, rank, id, adc_dist).
    """
    cb, R = books.codebooks, books.rotation
    m, k_codes, sub = cb.shape
    qrows = queries.select("query_id", "vector").collect()
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
    w = Window.partitionBy("query_id").orderBy(F.col("adc_dist"), F.col("id"))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "id", "adc_dist")
    )
