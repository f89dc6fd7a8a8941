"""End-to-end AnnIndex API test — replays the reference's own CI gate.

Reference: `Test/src/AlgoTest.cpp:160-245` — n=2000, dim=10, vec[i][j]=i,
meta=str(i); 3 queries q[i][j]=2i; k=3. The golden expectations are the
reference's hard-coded metadata sets (truthmeta1/2/3/5), checked as
unordered membership per query exactly like `AlgoTest.cpp:102-105`:

  build            → {0,1,2} {2,1,3} {4,3,5}
  add same set     → {0,0,1} {2,2,1} {4,4,3}     (duplicate ids join)
  delete by vector → {1,1,3} {1,3,1} {3,5,3}     (0/2/4 copies tombstoned)
  meta-mapping add → {0,1,2} {2,1,3} {4,3,5}     (re-add evicts old holder)

plus Save/Load round-trips between stages, as the reference does.
"""

from __future__ import annotations

import numpy as np
import pytest

from sptag_spark.api import SparkAnnIndex

N, DIM, K = 2000, 10, 3


@pytest.fixture(scope="module")
def fixture_data():
    vec = np.array([[i] * DIM for i in range(N)], dtype=np.float32)
    metas = [str(i) for i in range(N)]
    queries = np.array([[2 * i] * DIM for i in range(3)], dtype=np.float32)
    return vec, metas, queries


def _meta_sets(index, queries, k=K):
    out = []
    for qv in queries:
        res = index.search(qv, k=k)
        out.append(sorted(m for _, _, m in res))
    return out


def test_algotest_build_search(spark, fixture_data):
    vec, metas, queries = fixture_data
    idx = SparkAnnIndex.build(spark, vec, metas)
    assert _meta_sets(idx, queries) == [
        sorted(["0", "1", "2"]),
        sorted(["2", "1", "3"]),
        sorted(["4", "3", "5"]),
    ]


def test_algotest_add_delete_flow(spark, fixture_data):
    vec, metas, queries = fixture_data
    idx = SparkAnnIndex.build(spark, vec, metas)
    idx.add(vec, metas)  # duplicates with new ids
    assert _meta_sets(idx, queries) == [
        sorted(["0", "0", "1"]),
        sorted(["2", "2", "1"]),
        sorted(["4", "4", "3"]),
    ]
    idx.delete_by_vector(queries)
    assert _meta_sets(idx, queries) == [
        sorted(["1", "1", "3"]),
        sorted(["1", "3", "1"]),
        sorted(["3", "5", "3"]),
    ]


def test_algotest_meta_mapping(spark, fixture_data):
    vec, metas, queries = fixture_data
    idx = SparkAnnIndex.build(spark, vec, metas, meta_mapping=True)
    idx.add(vec, metas)  # same keys: evicts previous holders, stays unique
    assert _meta_sets(idx, queries) == [
        sorted(["0", "1", "2"]),
        sorted(["2", "1", "3"]),
        sorted(["4", "3", "5"]),
    ]


def test_algotest_save_load(spark, fixture_data, tmp_path_factory):
    vec, metas, queries = fixture_data
    idx = SparkAnnIndex.build(spark, vec, metas)
    idx.delete([0, 2, 4])
    path = str(tmp_path_factory.mktemp("apiidx") / "index")
    idx.save(path)
    idx2 = SparkAnnIndex.load(spark, path)
    assert _meta_sets(idx2, queries) == [
        sorted(["1", "3", "5"]),
        sorted(["1", "3", "5"]),
        sorted(["3", "5", "6"]),
    ]
    # ids continue after the loaded max — positional semantics survive
    idx2.add(vec[:1], ["fresh"])
    assert idx2._next_id == N + 1


def test_api_dim_mismatch(spark):
    idx = SparkAnnIndex(spark, dim=4)
    with pytest.raises(ValueError, match="DimensionSizeMismatch"):
        idx.add(np.zeros((2, 5), dtype=np.float32))


def test_api_merge(spark):
    a = SparkAnnIndex.build(spark, np.eye(3, dtype=np.float32) * 1, ["a0", "a1", "a2"])
    b = SparkAnnIndex.build(spark, np.eye(3, dtype=np.float32) * 2, ["b0", "b1", "b2"])
    b.delete([1])
    merged = a.merge(b)
    assert merged.live().count() == 5
    metas = {r["meta"] for r in merged.live().collect()}
    assert metas == {"a0", "a1", "a2", "b0", "b2"}


def test_ann_serving_mode(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    V = rng.normal(size=(300, 12)).astype(np.float32)
    idx = SparkAnnIndex.build(spark, V, metas=[str(i) for i in range(300)])
    # ann=True serves through SPANN and still self-hits
    res = idx.batch_search(V[:5], k=3, ann=True).collect()
    top = {r["query_id"]: r for r in res if r["rank"] == 1}
    assert all(top[q]["id"] == q and top[q]["dist"] == 0.0 for q in range(5))
    # a mutation invalidates the structure; the rebuilt index excludes it
    idx.delete([0])
    res2 = idx.batch_search(V[:1], k=3, ann=True).collect()
    assert all(r["id"] != 0 for r in res2)
    assert len(res2) == 3


def test_local_replica_handoff(spark):
    """api → serving tier: local_replica() snapshots the live view (stale
    ANN structures rebuild first) and keeps serving that snapshot while the
    index mutates on — DataFrame immutability giving the reference's
    swap-under-lock guarantee for free."""
    import numpy as np

    from sptag_spark.api import SparkAnnIndex

    rng = np.random.default_rng(3)
    X = rng.normal(size=(60, 6)).astype(np.float64)
    idx = SparkAnnIndex.build(spark, X, [str(i) for i in range(60)])
    rep = idx.local_replica()
    # the index stores float32; query with the same rounded value for an
    # exact-zero self-distance
    q7 = X[7].astype(np.float32).astype(np.float64)
    ids, d = rep.search_one(q7, k=3, nprobe=4)
    assert ids[0] == 7 and d[0] == 0.0
    # mutate the index; the replica snapshot must keep answering consistently
    idx.delete([7])
    ids2, _ = rep.search_one(q7, k=3, nprobe=4)
    assert ids2[0] == 7  # snapshot semantics (old artifacts)
    rep2 = idx.local_replica()  # fresh handoff sees the delete
    ids3, _ = rep2.search_one(q7, k=3, nprobe=4)
    assert 7 not in ids3


def test_dump_load_from_dump_bytes_roundtrip(spark, fixture_data, tmp_path_factory):
    """Dump/LoadFromDump (`CoreInterface.h:67-69`, VERDICT r9 #8): one
    bytes blob round-trips the whole index — search results (including
    tombstones) are identical to the source's."""
    vec, metas, queries = fixture_data
    idx = SparkAnnIndex.build(spark, vec, metas)
    idx.delete([0, 2, 4])
    blob = idx.dump()
    assert isinstance(blob, bytes) and len(blob) > 0
    home = str(tmp_path_factory.mktemp("dumpidx") / "restored")
    idx2 = SparkAnnIndex.load_from_dump(spark, blob, home)
    assert _meta_sets(idx2, queries) == _meta_sets(idx, queries)
    assert idx2._next_id == idx._next_id
    # the blob is self-contained: a second restore from the same bytes
    # into a different home gives the same answers
    home2 = str(tmp_path_factory.mktemp("dumpidx2") / "restored")
    idx3 = SparkAnnIndex.load_from_dump(spark, blob, home2)
    assert _meta_sets(idx3, queries) == _meta_sets(idx, queries)


def test_load_from_dump_clears_stale_artifacts(
    spark, fixture_data, tmp_path_factory
):
    """ADVICE r9: restoring a dump into a previously-used index home must
    not leave the OLD index's artifacts (codes/, refine/, ...) attached to
    the freshly loaded index."""
    import os

    vec, metas, queries = fixture_data
    idx = SparkAnnIndex.build(spark, vec, metas)
    blob = idx.dump()  # no PQ: the dump carries no codes/ or refine/
    home = str(tmp_path_factory.mktemp("dumphome") / "idx")
    os.makedirs(os.path.join(home, "codes"))
    with open(os.path.join(home, "codes", "stale.txt"), "w") as f:
        f.write("stale")
    os.makedirs(os.path.join(home, "refine"))
    idx2 = SparkAnnIndex.load_from_dump(spark, blob, home)
    assert not os.path.exists(os.path.join(home, "codes"))
    assert not os.path.exists(os.path.join(home, "refine"))
    assert _meta_sets(idx2, queries) == _meta_sets(idx, queries)


def test_load_from_dump_corrupt_blob_preserves_existing_index(
    spark, fixture_data, tmp_path_factory
):
    """r10 review: a corrupt blob must fail BEFORE the existing index at
    the destination is cleared — restore validates the tar first."""
    import os

    import pytest

    vec, metas, queries = fixture_data
    idx = SparkAnnIndex.build(spark, vec, metas)
    blob = idx.dump()
    home = str(tmp_path_factory.mktemp("dumpsafe") / "idx")
    idx2 = SparkAnnIndex.load_from_dump(spark, blob, home)  # good restore
    before = _meta_sets(idx2, queries)
    with pytest.raises(Exception):
        SparkAnnIndex.load_from_dump(spark, blob[: len(blob) // 2], home)
    # the previously restored index is intact and still answers
    assert os.path.exists(os.path.join(home, "config.json"))
    idx3 = SparkAnnIndex.load(spark, home)
    assert _meta_sets(idx3, queries) == before
