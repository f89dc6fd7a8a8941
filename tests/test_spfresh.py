"""SPFresh-style incremental maintenance: streamed vectors must be
searchable mid-stream (no rebuild), deletes must disappear, and the
rebuild threshold must trigger an atomic head/posting swap
(reference: BKTIndex.cpp:901-970 rebuild-after-adds discipline)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sptag_spark.streaming.spfresh import SpannLiveIndex
from sptag_spark.tables import vectors_table


@pytest.fixture()
def split_vectors(spark, sf_dir):
    v = vectors_table(spark, sf_dir).select("id", "vector").cache()
    base = v.filter(F.col("id") % 2 == 0).cache()
    held_out = v.filter(F.col("id") % 2 == 1).cache()
    return base, held_out


def _self_query(df, n=5):
    rows = df.limit(n).collect()
    return df.sparkSession.createDataFrame(
        [(r["id"], list(map(float, r["vector"]))) for r in rows],
        "query_id long, vector array<float>",
    )


def test_mid_stream_add_is_searchable(split_vectors):
    base, held_out = split_vectors
    idx = SpannLiveIndex(base, rebuild_threshold=10**9)
    q = _self_query(held_out)
    # before the add: the held-out vectors cannot be rank-1 self-hits
    before = idx.search(q, k=3).filter(
        (F.col("rank") == 1) & (F.col("id") == F.col("query_id"))
    )
    assert before.count() == 0
    idx.add_batch(held_out)
    assert idx.builds == 0  # visible WITHOUT a rebuild
    after = idx.search(q, k=3).filter(
        (F.col("rank") == 1)
        & (F.col("id") == F.col("query_id"))
        & (F.col("dist") == 0.0)
    )
    assert after.count() == q.count()


def test_mid_stream_delete_disappears(split_vectors):
    base, held_out = split_vectors
    idx = SpannLiveIndex(base, rebuild_threshold=10**9)
    idx.add_batch(held_out)
    victim = held_out.limit(1)
    vid = victim.first()["id"]
    idx.delete_ids(victim.select("id"))
    q = _self_query(victim, 1)
    got = idx.search(q, k=3).filter(F.col("id") == vid)
    assert got.count() == 0


def test_rebuild_threshold_swaps_index(split_vectors):
    base, held_out = split_vectors
    n_held = held_out.count()
    idx = SpannLiveIndex(base, rebuild_threshold=n_held)
    old_heads = idx.heads
    idx.add_batch(held_out)  # crosses the threshold → rebuild fires
    assert idx.builds == 1
    assert idx.adds_since_build == 0
    assert idx.heads is not old_heads  # atomic swap happened
    # post-rebuild: everything (base + streamed) still searchable
    q = _self_query(held_out)
    hits = idx.search(q, k=3).filter(
        (F.col("rank") == 1) & (F.col("id") == F.col("query_id"))
    )
    assert hits.count() == q.count()


def test_concurrent_add_delete_search(split_vectors):
    """Parity with `Test/src/ConcurrentTest.cpp:40-133` (ConcurrentAddSearchSave):
    an add thread, a delete thread and a search thread race against ONE live
    index. The snapshot contract under test: a search never sees a torn
    index (stable base vectors are rank-1 self-hits in EVERY search, no
    matter how the swaps interleave), and a search STARTED after add_batch
    returned sees that batch's vectors. Spark local mode schedules jobs
    from concurrent driver threads, so the searches genuinely overlap the
    maintenance work."""
    import threading
    import time

    base, held_out = split_vectors
    spark = base.sparkSession
    idx = SpannLiveIndex(base, rebuild_threshold=10**9)
    stable_q = _self_query(base, 3)
    held_rows = held_out.limit(40).collect()
    batches = [held_rows[i * 10 : (i + 1) * 10] for i in range(4)]

    errors: list = []
    added: list = []  # one entry (the batch's ids) per COMPLETED add_batch
    deleted: list = []
    n_searches = [0]
    done = threading.Event()

    def adder():
        try:
            for rows in batches:
                b = spark.createDataFrame(
                    [(r["id"], list(map(float, r["vector"]))) for r in rows],
                    "id long, vector array<float>",
                )
                idx.add_batch(b)
                added.append([r["id"] for r in rows])
                time.sleep(0.05)
        except Exception as e:  # pragma: no cover - failure surface
            errors.append(("add", e))

    def deleter():
        try:
            while not added and not done.is_set():
                time.sleep(0.02)
            victims = added[0][:3]
            idx.delete_ids(
                spark.createDataFrame([(v,) for v in victims], "id long")
            )
            deleted.extend(victims)
        except Exception as e:  # pragma: no cover
            errors.append(("delete", e))

    def searcher():
        try:
            while not done.is_set() or n_searches[0] < 3:
                seen_batches = [list(b) for b in added]  # snapshot BEFORE search
                seen_deleted = set(deleted)
                probe_rows = [r for b in seen_batches for r in b[3:5]]
                q = stable_q
                if probe_rows:
                    by_id = {r["id"]: r for r in held_rows}
                    q = stable_q.unionByName(
                        spark.createDataFrame(
                            [
                                (i, list(map(float, by_id[i]["vector"])))
                                for i in probe_rows
                            ],
                            "query_id long, vector array<float>",
                        )
                    )
                res = idx.search(q, k=3).collect()
                top = {r["query_id"]: r for r in res if r["rank"] == 1}
                # stable base probes: rank-1 exact self-hit, every time
                for r in stable_q.collect():
                    hit = top[r["query_id"]]
                    assert hit["id"] == r["query_id"] and hit["dist"] == 0.0
                # batches whose add_batch returned before this search began
                # (and that this thread saw before grabbing the snapshot)
                for i in probe_rows:
                    if i in seen_deleted:
                        continue
                    hit = top[i]
                    assert hit["id"] == i and hit["dist"] == 0.0
                n_searches[0] += 1
        except Exception as e:  # pragma: no cover
            errors.append(("search", e))

    threads = [
        threading.Thread(target=adder),
        threading.Thread(target=deleter),
        threading.Thread(target=searcher),
    ]
    for t in threads[:2]:
        t.start()
    threads[2].start()
    threads[0].join(timeout=300)
    threads[1].join(timeout=60)
    done.set()
    threads[2].join(timeout=300)
    assert not errors, errors
    assert len(added) == 4 and len(deleted) == 3
    assert n_searches[0] >= 3
    # final state: every added, undeleted vector searchable; victims gone
    final_ids = [i for b in added for i in b if i not in set(deleted)]
    by_id = {r["id"]: r for r in held_rows}
    fq = spark.createDataFrame(
        [(i, list(map(float, by_id[i]["vector"]))) for i in final_ids],
        "query_id long, vector array<float>",
    )
    hits = idx.search(fq, k=3).filter(
        (F.col("rank") == 1)
        & (F.col("id") == F.col("query_id"))
        & (F.col("dist") == 0.0)
    )
    assert hits.count() == len(final_ids)
    vq = spark.createDataFrame(
        [(i, list(map(float, by_id[i]["vector"]))) for i in deleted],
        "query_id long, vector array<float>",
    )
    assert idx.search(vq, k=3).filter(F.col("id").isin(deleted)).count() == 0
