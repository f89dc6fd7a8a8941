"""Realistic-dimension probe (VERDICT r11 ask #3): the reference's
operating regime is 100-128-dim int8/uint8 (SPACEV1B is dim-100 int8,
`datasets/SPACEV1B/README.md:9-14`), while every scale probe so far ran
dim-16 float. This probe runs the dress-rehearsal build phases at
2,097,152 x dim-100 int8 THROUGH THE UPCAST INGEST PATH (DEFAULT-binary
int8 files -> read_binary_vectors -> float vectors, `io/readers.py`),
then composes the r12 native int8 packed store (VERDICT r11 ask #1):

  P0  gen: 32 DEFAULT-binary int8 files (65,536 rows each)
  P1  ingest via read_binary_vectors(value_type="int8") -> parquet
  P2  select_heads (distributed two-level Lloyd) at ratio 0.05
  P3  build_postings (grouped routed assignment, r12 kernel)
  P4  packed stores: value_type="int8" AND "float32" side by side ->
      store bytes (the 4x witness), build walls
  P5  serve both stores: recall@10 vs exact brute force (nprobe ladder
      24->48->96 until >=0.90), batch + single-query latency; rows must
      be IDENTICAL between the int8 and float32 stores (the lossless
      cast + float64 promotion contract).

Output: PROBE_DIM100_INT8.json + a SCALING.md-ready table printed.
Usage: python tools/probe_dim100_int8.py [--n 2097152] [--dim 100]
       [--ratio 0.05] [--queries 256]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from tools.probe_dress_rehearsal import RssWatch  # noqa: E402
from tools.probe_heads_distributed import posting_balance  # noqa: E402

WORK = "/tmp/dim100_int8"


def _arg(name: str, default: str) -> str:
    return (
        sys.argv[sys.argv.index(name) + 1] if name in sys.argv else default
    )


_N_SITES = 1024
_INTRINSIC = 8  # local manifold dimension per site


def _geometry(dim: int):
    """Fixture geometry: 1024 well-separated sites, each carrying an
    8-dim local manifold (site + B_site·z + small iso noise). Real
    embeddings have LOW INTRINSIC DIMENSION — the first fixture draw
    (iso Gaussian balls at dim 100) was routing-degenerate: within a
    site every head was equidistant from every query (distance
    concentration), so nearest-head routing carried no signal and
    recall plateaued at 0.77 no matter the nprobe. On a manifold,
    nearby vectors share nearby heads and routing works, which is the
    regime SPANN (and any IVF family) is designed for."""
    rng = np.random.default_rng(23)
    sites = rng.integers(-100, 101, size=(_N_SITES, dim)).astype(np.float64)
    B = rng.normal(scale=3.0, size=(_N_SITES, dim, _INTRINSIC))
    return sites, B


def _gen_rows(sites, B, file_idx: int, per: int) -> np.ndarray:
    """One file's int8 rows — deterministic per (geometry, file_idx);
    shared by the binary writer and the truth rebuild."""
    r = np.random.default_rng(31 + file_idx)
    a = r.integers(0, len(sites), size=per)
    z = r.normal(size=(per, _INTRINSIC))
    V = sites[a] + r.normal(scale=1.0, size=(per, sites.shape[1]))
    for s in np.unique(a):
        m = a == s
        V[m] += z[m] @ B[s].T
    return np.clip(np.rint(V), -128, 127).astype(np.int8)


def gen_int8_files(n: int, dim: int, n_files: int = 32) -> str:
    """Clustered low-intrinsic-dim int8 corpus as DEFAULT-binary int8
    files — the SPACEV wire shape. Deterministic per file."""
    from sptag_spark.io.readers import write_default_bin

    d = os.path.join(WORK, f"bin_{n}_{dim}")
    if os.path.isdir(d) and len(os.listdir(d)) == n_files:
        return d
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    sites, B = _geometry(dim)
    per = n // n_files
    for i in range(n_files):
        write_default_bin(
            _gen_rows(sites, B, i, per), os.path.join(d, f"part_{i:04d}.bin")
        )
    return d


def exact_truth(corpus8: np.ndarray, Q: np.ndarray, k: int = 10):
    """Brute-force float64 truth over the int8 corpus (chunked GEMM)."""
    ids = None
    best_d = np.full((len(Q), k), np.inf)
    best_i = np.zeros((len(Q), k), dtype=np.int64)
    for s in range(0, len(corpus8), 262_144):
        C = corpus8[s : s + 262_144].astype(np.float64)
        D = (
            -2.0 * (Q @ C.T)
            + (Q * Q).sum(1)[:, None]
            + (C * C).sum(1)[None, :]
        )
        np.maximum(D, 0.0, out=D)
        allD = np.concatenate([best_d, D], axis=1)
        allI = np.concatenate(
            [best_i, np.broadcast_to(np.arange(s, s + len(C)), D.shape)],
            axis=1,
        )
        sel = np.argpartition(allD, k - 1, axis=1)[:, :k]
        best_d = np.take_along_axis(allD, sel, 1)
        best_i = np.take_along_axis(allI, sel, 1)
    o = np.argsort(best_d, axis=1, kind="stable")
    return np.take_along_axis(best_i, o, 1)


def main() -> None:
    n = int(_arg("--n", str(1 << 21)))
    dim = int(_arg("--dim", "100"))
    ratio = float(_arg("--ratio", "0.05"))
    n_q = int(_arg("--queries", "256"))
    os.makedirs(WORK, exist_ok=True)
    out: dict = {"n": n, "dim": dim, "ratio": ratio, "phases": {}}

    os.environ.setdefault("SPTAG_SPARK_DRIVER_MEM", "40g")
    from sptag_spark.session import get_spark

    spark = get_spark("probe-dim100-int8", cpus=32, shuffle_partitions=32)

    # P0/P1: generate + ingest through the int8 upcast reader
    t0 = time.time()
    bin_dir = gen_int8_files(n, dim)
    gen_wall = time.time() - t0
    from sptag_spark.io.readers import read_binary_vectors

    pq = os.path.join(WORK, f"corpus_{n}_{dim}.parquet")
    t0 = time.time()
    with RssWatch() as w:
        if not os.path.isdir(pq):
            read_binary_vectors(
                spark, bin_dir, "default", value_type="int8"
            ).write.mode("overwrite").parquet(pq)
    vecs = spark.read.parquet(pq)
    n_rows = vecs.count()
    out["phases"]["p1_ingest"] = {
        "gen_wall_s": round(gen_wall, 1),
        "ingest_wall_s": round(time.time() - t0, 1),
        "rows": n_rows,
        "driver_rss_mb": round(w.peak, 1),
    }
    print(json.dumps(out["phases"]["p1_ingest"]), flush=True)
    assert n_rows == n

    # P2: distributed head selection
    from sptag_spark.index.heads import select_heads

    t0 = time.time()
    with RssWatch() as w:
        heads = select_heads(
            vecs, ratio=ratio, distributed=True
        ).persist()
        k_heads = heads.count()
    out["phases"]["p2_select_heads"] = {
        "wall_s": round(time.time() - t0, 1),
        "heads": k_heads,
        "driver_rss_mb": round(w.peak, 1),
    }
    print(json.dumps(out["phases"]["p2_select_heads"]), flush=True)

    # P3: posting build (grouped routed kernel)
    from sptag_spark.index.postings import build_postings

    t0 = time.time()
    with RssWatch() as w:
        postings = build_postings(vecs, heads).persist()
        post_rows = postings.count()
    bal = posting_balance(postings)
    out["phases"]["p3_build_postings"] = {
        "wall_s": round(time.time() - t0, 1),
        "posting_rows": post_rows,
        "balance": bal,
        "driver_rss_mb": round(w.peak, 1),
    }
    print(json.dumps(out["phases"]["p3_build_postings"]), flush=True)

    # P4: packed stores — native int8 vs float32
    from sptag_spark.serving_local import DiskSpannReplica

    stores = {}
    for vt in ("int8", "float32"):
        sdir = os.path.join(WORK, f"store_{vt}")
        shutil.rmtree(sdir, ignore_errors=True)
        t0 = time.time()
        with RssWatch() as w:
            rep = DiskSpannReplica(heads, postings, sdir, value_type=vt)
        vec_file = [
            f for f in os.listdir(sdir) if f.startswith("post_vectors")
        ][0]
        stores[vt] = {
            "build_wall_s": round(time.time() - t0, 1),
            "store_bytes": os.path.getsize(os.path.join(sdir, vec_file)),
            "resident_bytes": rep.memory_bytes(),
            "driver_rss_mb": round(w.peak, 1),
        }
        del rep
    stores["bytes_ratio_f32_over_i8"] = round(
        stores["float32"]["store_bytes"] / stores["int8"]["store_bytes"], 3
    )
    out["phases"]["p4_stores"] = stores
    print(json.dumps(stores), flush=True)

    # P5: serve — recall ladder + latency, int8 vs float32 row identity
    rng = np.random.default_rng(99)
    # rebuild the corpus matrix for truth (same generator as gen_int8_files)
    sites, B = _geometry(dim)
    per = n // 32
    corpus8 = np.empty((n, dim), dtype=np.int8)
    for i in range(32):
        corpus8[i * per : (i + 1) * per] = _gen_rows(sites, B, i, per)
    qsel = rng.choice(n, size=n_q, replace=False)
    Q = corpus8[qsel].astype(np.float64) + rng.normal(
        scale=1.0, size=(n_q, dim)
    )
    t0 = time.time()
    truth = exact_truth(corpus8, Q, k=10)
    truth_wall = time.time() - t0
    del corpus8

    reps = {
        vt: DiskSpannReplica.from_store(os.path.join(WORK, f"store_{vt}"))
        for vt in ("int8", "float32")
    }
    qlist = [(int(i), Q[i]) for i in range(n_q)]
    serve = {"truth_wall_s": round(truth_wall, 1)}
    rows_by_vt = {}
    for vt, rep in reps.items():
        curve = []
        for nprobe in (24, 48, 96):
            t0 = time.time()
            rows = rep.batch_search(qlist, k=10, nprobe=nprobe)
            batch_wall = time.time() - t0
            by_q: dict[int, list[int]] = {}
            for r in rows:
                by_q.setdefault(r[0], []).append(int(r[2]))
            hits = sum(
                len(set(by_q.get(i, [])) & set(truth[i].tolist()))
                for i in range(n_q)
            )
            rec = hits / (10 * n_q)
            curve.append(
                {
                    "nprobe": nprobe,
                    "recall_at_10": round(rec, 4),
                    "batch_qps": round(n_q / batch_wall, 1),
                }
            )
            if rec >= 0.90:
                rows_by_vt[vt] = rows
                # single-query latency at the operating point
                lat = []
                for qid, qv in qlist[:64]:
                    t1 = time.time()
                    rep.search_one(qv, k=10, nprobe=nprobe)
                    lat.append((time.time() - t1) * 1000)
                lat.sort()
                curve[-1]["p50_single_ms"] = round(lat[len(lat) // 2], 3)
                break
        serve[vt] = curve
    serve["rows_identical_i8_vs_f32"] = (
        rows_by_vt.get("int8") == rows_by_vt.get("float32")
    )
    out["phases"]["p5_serve"] = serve
    print(json.dumps(serve), flush=True)

    with open("/root/repo/PROBE_DIM100_INT8.json", "w") as f:
        json.dump(out, f, indent=1)
    print("WROTE /root/repo/PROBE_DIM100_INT8.json", flush=True)


if __name__ == "__main__":
    main()
