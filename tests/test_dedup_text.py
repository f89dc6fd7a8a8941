"""Dedup + text-analysis operator tests on hand-built corpora."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sptag_spark.functions.text import token_shingles, tokens
from sptag_spark.operators.dedup import (
    dedup_exact_groups,
    doc_shingles,
    embedding_near_dup_pairs,
    exact_jaccard,
    minhash_near_dup_pairs,
    simhash,
)
from sptag_spark.operators.textops import doc_fingerprint, lang_id, text_quality, top_tokens


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "quick brown fox jumps over the lazy dog"),  # near dup (first tok dropped)
        (3, "completely different text about spark engines and distributed joins"),
        (4, "le chat est sur la table et il est content"),
        (5, "ab"),  # too short for 3-shingles
        (6, ""),  # empty
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_tokens_edges(spark):
    df = spark.createDataFrame([(0, "  a  b "), (1, ""), (2, "   ")], "id long, t string")
    got = df.select(F.size(tokens(F.col("t"))).alias("n")).collect()
    assert [r["n"] for r in got] == [2, 0, 0]


def test_shingles_short_doc_empty(corpus):
    got = corpus.select("doc_id", F.size(token_shingles(F.col("text"))).alias("n")).collect()
    n = {r["doc_id"]: r["n"] for r in got}
    assert n[5] == 0 and n[6] == 0  # no crash, empty
    assert n[0] == 7  # 9 tokens → 7 shingles (all distinct)


def test_dedup_exact(corpus):
    got = dedup_exact_groups(corpus).orderBy("doc_id").collect()
    assert [(r["doc_id"], r["group_min"], r["group_size"]) for r in got] == [
        (0, 0, 2),
        (1, 0, 2),
    ]


def test_exact_jaccard_and_minhash(corpus):
    jac = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in exact_jaccard(doc_shingles(corpus)).collect()
    }
    assert jac[(0, 1)] == 1.0
    assert 0.5 < jac[(0, 2)] < 1.0  # near dup
    assert (0, 3) not in jac  # nothing shared
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_near_dup_pairs(corpus, threshold=0.5).collect()
    }
    assert (0, 1) in pairs and (0, 2) in pairs and (1, 2) in pairs
    assert all(a < b for a, b in pairs)


def test_simhash_properties(corpus):
    got = {r["doc_id"]: r["simhash"] for r in simhash(corpus).collect()}
    assert got[0] == got[1]  # identical text → identical fingerprint
    assert 0 <= got[0] < 2**16
    # near dup differs in few bits
    ham = bin(got[0] ^ got[2]).count("1")
    assert ham <= 4
    ham_far = bin(got[0] ^ got[3]).count("1")
    assert ham_far > ham
    assert 6 not in got  # empty doc: no tokens → no fingerprint row


def test_embedding_near_dup(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [2.0, 0.0, 0.0]),  # same direction
        (2, [0.0, 1.0, 0.0]),  # orthogonal
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = embedding_near_dup_pairs(emb, 0.99).collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [(0, 1)]
    assert got[0]["cos_sim"] == 1.0


def test_embedding_near_dup_blocked_is_exact(spark):
    """The eps-margin blocked path must find EVERY pair brute force finds —
    forced to many blocks so correctness relies on the margin assignment."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 16))
    vecs, truth = [], set()
    vid = 0
    ids_of = []
    for b in base:
        ids_here = []
        for _ in range(3):  # 3 tight copies per center → in-cluster pairs
            vecs.append((vid, (b + rng.normal(scale=1e-3, size=16)).tolist()))
            ids_here.append(vid)
            vid += 1
        ids_of.append(ids_here)
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    t = 0.999
    got = embedding_near_dup_pairs(emb, t, n_blocks=16).collect()
    got_pairs = {(r["id_a"], r["id_b"]) for r in got}
    # brute-force truth on float32-rounded values (what Spark stored)
    M = np.array([np.array(v, dtype=np.float32) for _, v in vecs], dtype=np.float64)
    n = np.linalg.norm(M, axis=1)
    S = (M @ M.T) / np.outer(n, n)
    exp = {
        (i, j)
        for i in range(len(M))
        for j in range(i + 1, len(M))
        if S[i, j] >= t
    }
    assert got_pairs == exp
    assert len(exp) >= 40  # the fixture really has pairs


def test_embedding_near_dup_never_collects_table(spark, monkeypatch):
    """Scale guard: only the bounded centroid sample may reach the driver."""
    import numpy as np
    from pyspark.sql import DataFrame

    rng = np.random.default_rng(3)
    vecs = [(i, rng.normal(size=8).tolist()) for i in range(600)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")

    collected = []
    orig = DataFrame.collect

    def spy(self):
        out = orig(self)
        collected.append(len(out))
        return out

    monkeypatch.setattr(DataFrame, "collect", spy)
    result = orig(embedding_near_dup_pairs(emb, 0.99, sample_cap=128))
    assert all(c <= 128 for c in collected), collected
    assert isinstance(result, list)


def test_text_quality_edges(corpus):
    got = {r["doc_id"]: r for r in text_quality(corpus).collect()}
    assert got[6]["n_tokens"] == 0 and got[6]["avg_token_len"] == 0.0
    assert got[0]["n_tokens"] == 9
    assert got[0]["stopword_ratio"] == round(2 / 9, 4)  # 'the' twice


def test_lang_id(corpus):
    got = {r["doc_id"]: r["lang_pred"] for r in lang_id(corpus).collect()}
    assert got[0] == "en"
    assert got[4] == "fr"  # le, la, est, et markers
    assert got[6] == "en"  # empty → all scores 0 → tie → first lang


def test_fingerprint_stable(corpus):
    fp = {r["doc_id"]: r["fingerprint"] for r in doc_fingerprint(corpus).collect()}
    assert fp[0] == fp[1]
    assert fp[0] != fp[3]
    assert len(fp[0].split("|")) == 5


def test_top_tokens(corpus):
    got = top_tokens(corpus, k=3).collect()
    assert got[0]["token"] == "the" and got[0]["rank"] == 1
    assert got[0]["cnt"] >= got[1]["cnt"] >= got[2]["cnt"]


def test_lsh_banding_subsets_candidates(corpus):
    """r-row banding produces a SUBSET of the 1-row-band candidates and
    still finds the high-similarity (exact-duplicate) pairs."""
    from sptag_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signature,
    )

    sigs = minhash_signature(corpus).cache()
    c1 = {(r["doc_a"], r["doc_b"]) for r in lsh_candidate_pairs(sigs).collect()}
    c4 = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(sigs, rows_per_band=4).collect()
    }
    sigs.unpersist()
    assert c4 <= c1
    # exact duplicates agree on every minhash -> survive any banding
    assert (0, 1) in c1 and (0, 1) in c4
