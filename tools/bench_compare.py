"""Calibration-normalized comparison of two bench artifacts (VERDICT r7 #7).

The machine swings ~2.7× between sittings for identical code (AB_R5R6.md),
so raw cross-round per-query ratios are noise unless normalized by the
fixed-work GEMM calibration each artifact carries
(sptag_spark/calibration.py — recorded before AND after the run). This
tool reads two artifacts — either the full BENCH_SELF.json shape or the
driver's BENCH_r{N}.json wrapper (whose payload is the JSON line inside
"tail") — normalizes every per-query wall by the artifact's mean
gemm_gflops, and reports ratios, flagging anything above the threshold.

Floor-bound exemption (VERDICT r9 #2): walls under --floor-sec (default
1.5 s) are fixed Spark stage/scheduling cost, which the gemm kernel does
NOT track (r8's sitting: raw walls flat while gemm swung 3.4×, so
normalization flagged 53/53 unchanged queries). Those gate on the RAW
ratio; each row carries floor_bound + gate_ratio so the choice is
auditable.

Usage:
  python tools/bench_compare.py OLD.json NEW.json [--threshold 2.0]
      [--floor-sec 1.5]

Exit code 1 if any query exceeds the threshold on its gate_ratio
(regression gate), 0 otherwise. One JSON summary line on stdout;
per-query table on stderr for humans.
"""

from __future__ import annotations

import json
import sys


def load_bench(path: str) -> dict:
    """Accept BENCH_SELF.json, bench.py's stdout line, or the driver's
    BENCH_r{N}.json wrapper ({"tail": "...<json line>..."})."""
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d
    tail = d.get("tail", "")
    for line in reversed(tail.splitlines()):
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            return json.loads(line)
    raise ValueError(f"{path}: no bench payload found")


def gflops(d: dict) -> float | None:
    cals = [
        c["gemm_gflops"]
        for c in (d.get("calibration"), d.get("calibration_after"))
        if isinstance(c, dict) and c.get("gemm_gflops")
    ]
    return sum(cals) / len(cals) if cals else None


FLOOR_SEC = 1.5  # walls under this are stage/scheduling-floor bound


def compare(
    old: dict, new: dict, threshold: float = 2.0, floor_sec: float = FLOOR_SEC
) -> dict:
    g_old, g_new = gflops(old), gflops(new)
    # wall ∝ 1/speed: normalize each wall to a reference-speed machine
    # (multiply by measured/reference gflops; the reference cancels in the
    # ratio, so use g_old as the reference). Pre-calibration artifacts
    # (≤ r6) carry no kernel — fall back to RAW ratios, flagged as such.
    calibrated = g_old is not None and g_new is not None
    speed_ratio = (g_new / g_old) if calibrated else 1.0
    rows = []
    qs_old, qs_new = old["queries"], new["queries"]
    for name in sorted(set(qs_old) & set(qs_new)):
        w_old, w_new = float(qs_old[name]), float(qs_new[name])
        raw = w_new / w_old if w_old else float("inf")
        norm = raw * speed_ratio
        # floor-bound queries (VERDICT r9 #2): a sub-floor wall is fixed
        # Spark stage/scheduling cost, which does NOT scale with the gemm
        # kernel's reading — r8's artifacts proved it (raw walls flat
        # while gemm swung 3.4×, so "normalized" ratios flagged 53/53
        # queries that hadn't changed). Gate those on the RAW ratio.
        floor_bound = max(w_old, w_new) < floor_sec
        rows.append(
            {
                "query": name,
                "old_sec": w_old,
                "new_sec": w_new,
                "raw_ratio": round(raw, 3),
                "norm_ratio": round(norm, 3),
                "floor_bound": floor_bound,
                "gate_ratio": round(raw if floor_bound else norm, 3),
            }
        )
    # calibration sanity: if the gemm reading claims the machine swung
    # hard (speed_ratio far from 1) but the raw wall medians are flat,
    # the kernel did not track effective speed for THIS pair (r8's
    # committed sitting: gemm 74.8 vs flat walls, NOTES.md) — normalized
    # ratios are then meaningless and every query gates on raw instead.
    med_raw = (
        sorted(r["raw_ratio"] for r in rows)[len(rows) // 2] if rows else 1.0
    )
    calibration_suspect = (
        calibrated
        and not (0.67 < speed_ratio < 1.5)
        and 0.67 < med_raw < 1.5
    )
    if calibration_suspect:
        for r in rows:
            r["gate_ratio"] = r["raw_ratio"]
    flagged = [r for r in rows if r["gate_ratio"] > threshold]
    # serving-tier tracking (r10 ask #5): throughput/latency rows diffed
    # informationally (never gated — QPS figures swing with machine load
    # in ways the gemm kernel does not normalize; the walls above are the
    # regression gate). "better" records the desired direction.
    serving = {}

    def _at(d: dict, sec: str, key: str):
        """Resolve a dotted key path ('io_rows_scanned.p99') into a
        bench section."""
        v = d.get(sec) or {}
        for part in key.split("."):
            if not isinstance(v, dict):
                return None
            v = v.get(part)
        return v

    for sec, key, better in (
        ("spann_local_replica_latency_ms", "qps_batch", "higher"),
        ("spann_local_replica_latency_ms", "qps_multiprocess", "higher"),
        ("spann_local_replica_latency_ms", "p50", "lower"),
        ("aggregator_ms", "batch_qps", "higher"),
        ("aggregator_ms", "p50_single_ms", "lower"),
        ("disk_replica_latency_ms", "p50", "lower"),
        ("pq_replica_latency_ms", "p50", "lower"),
        ("pq_replica_int8_latency_ms", "p50", "lower"),
        # per-query IO-count percentiles (r12 ask #2) — machine-load
        # independent, so a drift here is a real layout/routing change,
        # not noise; still informational (the walls gate)
        ("spann_operating_point", "postings_read.p99", "lower"),
        ("spann_operating_point", "rows_scanned.p99", "lower"),
        ("disk_replica_latency_ms", "io_postings_read.p99", "lower"),
        ("disk_replica_latency_ms", "io_rows_scanned.p99", "lower"),
    ):
        vo = _at(old, sec, key)
        vn = _at(new, sec, key)
        if (
            isinstance(vo, (int, float))
            and isinstance(vn, (int, float))
            and vo
        ):
            serving[f"{sec}.{key}"] = {
                "old": vo,
                "new": vn,
                "ratio": round(vn / vo, 3),
                "better": better,
            }
    return {
        "serving": serving,
        "gemm_gflops": {"old": g_old, "new": g_new},
        "calibrated": calibrated,
        "calibration_suspect": calibration_suspect,
        "gating": "raw (calibration_suspect)"
        if calibration_suspect
        else "norm, raw under floor_sec",
        "speed_ratio_new_over_old": round(speed_ratio, 3),
        "median_raw_ratio": round(med_raw, 3),
        "floor_sec": floor_sec,
        "n_floor_bound": sum(1 for r in rows if r["floor_bound"]),
        "n_compared": len(rows),
        "only_in_old": sorted(set(qs_old) - set(qs_new)),
        "only_in_new": sorted(set(qs_new) - set(qs_old)),
        "threshold": threshold,
        "flagged": flagged,
        "median_norm_ratio": round(
            sorted(r["norm_ratio"] for r in rows)[len(rows) // 2], 3
        )
        if rows
        else None,
        "median_gate_ratio": round(
            sorted(r["gate_ratio"] for r in rows)[len(rows) // 2], 3
        )
        if rows
        else None,
        "rows": rows,
    }


def main() -> int:
    # argparse so BOTH documented forms work: `--threshold 2.0` and
    # `--threshold=2.0` (ADVICE r8: the hand-rolled filter treated the
    # space-separated value as a third positional and exited 2)
    import argparse

    ap = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    ap.add_argument("old", help="older bench artifact (JSON)")
    ap.add_argument("new", help="newer bench artifact (JSON)")
    ap.add_argument("--threshold", type=float, default=2.0)
    ap.add_argument("--floor-sec", type=float, default=FLOOR_SEC)
    ns = ap.parse_args()
    threshold = ns.threshold
    old, new = load_bench(ns.old), load_bench(ns.new)
    result = compare(old, new, threshold, floor_sec=ns.floor_sec)
    # provenance (VERDICT r9 #2): the committed compare must name the
    # exact committed inputs it was computed from, so a reviewer rerunning
    # `bench_compare.py <inputs>` reproduces the committed output
    result = {"inputs": {"old": ns.old, "new": ns.new}, **result}
    rows = result.pop("rows")
    for r in sorted(rows, key=lambda r: -r["gate_ratio"]):
        mark = " <-- FLAG" if r["gate_ratio"] > threshold else ""
        fb = " (floor)" if r["floor_bound"] else ""
        print(
            f"{r['query']:35s} {r['old_sec']:7.2f} -> {r['new_sec']:7.2f}"
            f"  raw {r['raw_ratio']:6.2f}  norm {r['norm_ratio']:6.2f}"
            f"{fb}{mark}",
            file=sys.stderr,
        )
    print(json.dumps(result, separators=(",", ":")))
    return 1 if result["flagged"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
