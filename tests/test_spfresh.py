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
