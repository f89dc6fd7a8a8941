"""P2 posting-build wall at the ×1024 dress-rehearsal fixture (VERDICT
r11 ask #4): rerun ONLY build_postings over the SAME 8.4M-vector corpus
(deterministic generator) and the SAME r11 1,001,392-head checkpoint
(`/tmp/dress_rehearsal/heads_8388608_16.parquet`, commit 23e3ee7), now
through the r12 grouped-CSR routed kernel + memmap array shipping.

Baseline (r11, PROBE_DRESS_REHEARSAL.json): 2,060 s, 40,238,395 rows,
peak driver RSS 2.2 GB, capacity-greedy placement (which the dim-100
probe showed orphans heads — so rows are NOT expected identical here;
the r12 placement is the semantic fix, and the witness is row count,
balance, zero memberless heads, and the wall).

Output: PROBE_REHEARSAL_P2.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from tools.probe_dress_rehearsal import RssWatch  # noqa: E402
from tools.probe_heads_distributed import gen_corpus, posting_balance  # noqa: E402

N, DIM = 8_388_608, 16
HEADS_CKPT = "/tmp/dress_rehearsal/heads_8388608_16.parquet"


def main() -> None:
    os.environ.setdefault("SPTAG_SPARK_DRIVER_MEM", "40g")
    from sptag_spark.calibration import gemm_calibration
    from sptag_spark.session import get_spark

    out: dict = {"calibration": gemm_calibration()}
    spark = get_spark("probe-rehearsal-p2", cpus=32, shuffle_partitions=32)
    vecs = gen_corpus(spark, N, DIM).persist()
    n = vecs.count()
    heads = spark.read.parquet(HEADS_CKPT).persist()
    k = heads.count()
    out["n"], out["heads"] = n, k
    print(json.dumps({"n": n, "heads": k}), flush=True)

    from sptag_spark.index.postings import build_postings

    t0 = time.time()
    with RssWatch() as w:
        postings = build_postings(vecs, heads)
        # count + balance in one cached pass
        postings = postings.persist()
        rows = postings.count()
    wall = time.time() - t0
    bal = posting_balance(postings)
    memberless = k - bal["n_heads_with_members"]
    out.update(
        {
            "wall_s": round(wall, 1),
            "posting_rows": rows,
            "balance": bal,
            "memberless_heads": memberless,
            "driver_rss_mb": round(w.peak, 1),
            "r11_baseline": {
                "wall_s": 2060,
                "posting_rows": 40_238_395,
                "driver_rss_mb": 2200,
            },
        }
    )
    out["calibration_after"] = gemm_calibration()
    print(json.dumps({k2: v for k2, v in out.items() if k2 != "balance"}),
          flush=True)
    print(json.dumps(bal), flush=True)
    with open("/root/repo/PROBE_REHEARSAL_P2.json", "w") as f:
        json.dump(out, f, indent=1)
    print("WROTE /root/repo/PROBE_REHEARSAL_P2.json", flush=True)


if __name__ == "__main__":
    main()
