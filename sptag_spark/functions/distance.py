"""Distance semantics of the reference, as pure Spark column expressions.

Reference semantics (AnnService/inc/Core/Common/DistanceUtils.h):
- L2 is the *squared* Euclidean distance — sum((a-b)^2), no sqrt
  (DistanceUtils.h:26-43). Smaller is closer.
- Cosine is a distance: SPTAG pre-normalizes vectors at build
  (src/Core/BKT/BKTIndex.cpp:749-756) and computes base^2 - dot; the public
  conversion is 1 - cosine_similarity (DistanceUtils.h:105-116). We implement
  cosine_dist = 1 - dot(a,b)/(|a||b|), which equals the reference's ranking on
  normalized data. Smaller is closer.
- InnerProduct shares the cosine kernel and is a negated dot product
  (DistanceUtils.h:124-125): ip_dist = -dot(a,b). Smaller is closer, so
  max-inner-product search is still a min-dist top-k.

All arithmetic is done in float64 regardless of the stored element type, like
the reference computes distances in float regardless of int8/int16 storage
(DistanceUtils.h:26-43). These are pure column expressions — JVM-side,
whole-stage-codegen'd, no Python in the loop. The vectorized NumPy kernel in
operators/knn.py is the bulk path; these expressions are the semantic
reference and are used where a single pairwise distance is needed inside a
larger plan (e.g. delete-by-vector's exact-match join).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

METRICS = ("l2", "cosine", "ip")


def _d(c: Column) -> Column:
    return c.cast("double")


def dot(a: Column, b: Column) -> Column:
    """Sum of element-wise products, accumulated left-to-right in float64."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _d(x) * _d(y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_sq(a: Column, b: Column) -> Column:
    """Squared L2 distance (no sqrt), per DistanceUtils.h:26-43."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (_d(x) - _d(y)) * (_d(x) - _d(y))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def normalize(a: Column) -> Column:
    """Scale to unit norm (Utils::Normalize, call site BKTIndex.cpp:753-755).

    Zero vectors are returned unchanged (norm guard) rather than NaN.
    """
    n = norm(a)
    return F.when(n == 0.0, a.cast("array<double>")).otherwise(
        F.transform(a, lambda x: _d(x) / n)
    )


def cosine_dist(a: Column, b: Column) -> Column:
    """1 - cosine similarity (ConvertCosineSimilarityToDistance,
    DistanceUtils.h:105-116). Zero-norm inputs get distance 1.0 (orthogonal)."""
    na, nb = norm(a), norm(b)
    # greatest(0, ...) clamps the tiny-negative self-distance rounding
    # artifact (cosine distance is mathematically >= 0) and normalizes
    # -0.0 to +0.0 so value hashes agree with SQL oracles.
    return F.when((na == 0.0) | (nb == 0.0), F.lit(1.0)).otherwise(
        F.greatest(F.lit(0.0), F.lit(1.0) - dot(a, b) / (na * nb))
    )


def ip_dist(a: Column, b: Column) -> Column:
    """Negated inner product — min-is-best, per DistanceUtils.h:124-125."""
    return -dot(a, b)


def dist_expr(a: Column, b: Column, metric: str) -> Column:
    if metric == "l2":
        return l2_sq(a, b)
    if metric == "cosine":
        return cosine_dist(a, b)
    if metric == "ip":
        return ip_dist(a, b)
    raise ValueError(f"unknown metric {metric!r}; expected one of {METRICS}")
