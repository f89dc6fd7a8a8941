"""Distance expressions vs NumPy ground truth (the reference's own pattern:
SIMD-vs-scalar kernel equivalence, Test/src/DistanceTest.cpp:88-96)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from sptag_spark.functions.distance import cosine_dist, dist_expr, dot, ip_dist, l2_sq, norm, normalize

RNG = np.random.default_rng(42)
DIM = 16


@pytest.fixture(scope="module")
def pairs_df(spark):
    rows = []
    for i in range(20):
        a = RNG.normal(size=DIM).astype(np.float32)
        b = RNG.normal(size=DIM).astype(np.float32)
        rows.append((i, [float(x) for x in a], [float(x) for x in b]))
    # include a zero vector edge case
    rows.append((99, [0.0] * DIM, [float(x) for x in RNG.normal(size=DIM)]))
    return spark.createDataFrame(
        rows, "id long, a array<float>, b array<float>"
    ).cache()


def _np(rows, fn):
    return {
        r["id"]: fn(np.array(r["a"], dtype=np.float64), np.array(r["b"], dtype=np.float64))
        for r in rows
    }


def test_l2_cosine_ip_match_numpy(pairs_df):
    got = pairs_df.select(
        "id",
        l2_sq(F.col("a"), F.col("b")).alias("l2"),
        cosine_dist(F.col("a"), F.col("b")).alias("cos"),
        ip_dist(F.col("a"), F.col("b")).alias("ip"),
        dot(F.col("a"), F.col("b")).alias("dot"),
    ).collect()
    raw = pairs_df.collect()
    exp_l2 = _np(raw, lambda a, b: ((a - b) ** 2).sum())
    exp_dot = _np(raw, lambda a, b: (a * b).sum())

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na == 0 or nb == 0:
            return 1.0
        return 1.0 - (a * b).sum() / (na * nb)

    exp_cos = _np(raw, cos)
    for r in got:
        assert math.isclose(r["l2"], exp_l2[r["id"]], rel_tol=1e-9, abs_tol=1e-12)
        assert math.isclose(r["cos"], exp_cos[r["id"]], rel_tol=1e-9, abs_tol=1e-12)
        assert math.isclose(r["ip"], -exp_dot[r["id"]], rel_tol=1e-9, abs_tol=1e-12)


def test_normalize_unit_norm(pairs_df):
    got = pairs_df.select("id", norm(normalize(F.col("a"))).alias("n")).collect()
    for r in got:
        if r["id"] == 99:
            assert r["n"] == 0.0  # zero vector stays zero, no NaN
        else:
            assert math.isclose(r["n"], 1.0, rel_tol=1e-9)


def test_dist_expr_dispatch(pairs_df):
    for metric in ("l2", "cosine", "ip"):
        assert (
            pairs_df.select(dist_expr(F.col("a"), F.col("b"), metric).alias("d"))
            .first()["d"]
            is not None
        )
    with pytest.raises(ValueError):
        dist_expr(F.col("a"), F.col("b"), "hamming")
