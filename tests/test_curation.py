"""Semantic clustering, point lookup, and JSONL interchange tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from sptag_spark.tables import load_table, vectors_table


def test_semantic_clusters_cover_and_separate(spark, sf_dir):
    from sptag_spark.operators.curation import (
        cluster_exemplars,
        cluster_summary,
        semantic_clusters,
    )

    v = vectors_table(spark, sf_dir).select("id", "vector")
    n = v.count()
    assigned, scored = semantic_clusters(v, k=8)
    scored = scored.cache()
    # full coverage, one bucket per vector
    assert scored.count() == n
    assert scored.select("id").distinct().count() == n
    summary = cluster_summary(scored)
    rows = summary.collect()
    assert len(rows) == 8
    assert sum(r["n_docs"] for r in rows) == n
    # balanced loop keeps buckets near fair share (3x bound like the
    # balanced_kmeans contract) and mostly own-centroid-closest
    assert max(r["n_docs"] for r in rows) * 8 <= 3 * n
    assert min(r["separation"] for r in rows) >= 0.5
    # one exemplar per cluster; each belongs to its cluster and sits at
    # the cluster's minimum own_dist
    ex = cluster_exemplars(scored)
    assert ex.count() == 8
    chk = ex.join(
        scored.groupBy("cluster").agg(F.min("own_dist").alias("mn")), "cluster"
    )
    assert chk.filter(F.col("own_dist") != F.col("mn")).count() == 0


def test_cluster_exemplars_attach_text(spark, sf_dir):
    from sptag_spark.operators.curation import cluster_exemplars, semantic_clusters

    v = vectors_table(spark, sf_dir).select("id", "vector")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    _, scored = semantic_clusters(v, k=4)
    ex = cluster_exemplars(scored, docs=docs)
    assert ex.count() == 4
    assert "text" in ex.columns


def test_point_lookup_honors_tombstones(spark, sf_dir):
    from sptag_spark.operators.lookup import get_samples

    v = vectors_table(spark, sf_dir)
    ids = v.select("id").filter(F.col("id") % 5 == 0)
    dead = v.select("id").filter(F.col("id") % 10 == 0)
    out = get_samples(v, ids, tombstones=dead).cache()
    assert out.filter(F.col("id") % 10 == 0).count() == 0
    expect = v.filter((F.col("id") % 5 == 0) & (F.col("id") % 10 != 0)).count()
    assert out.count() == expect
    assert set(out.columns) == set(v.columns)
    # unknown ids produce no row
    spark_ids = spark.range(10**9, 10**9 + 5).select(F.col("id"))
    assert get_samples(v, spark_ids).count() == 0


def test_jsonl_roundtrip_exact(tmp_path, spark, sf_dir):
    from sptag_spark.io.jsonl import read_jsonl, write_jsonl

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    path = str(tmp_path / "corpus")
    write_jsonl(docs, path)
    back = read_jsonl(spark, path, "doc_id long, text string")
    # per-row identity both directions
    a = docs.withColumn("h", F.md5("text")).select("doc_id", "h")
    b = back.withColumn("h", F.md5("text")).select("doc_id", "h")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_rule_filters_edges(spark):
    from sptag_spark.operators.textops import rule_filters

    rows = [
        (1, "A clean sentence with enough words to pass every rule."),
        (2, ""),  # empty: min_words fails
        (3, "short text only."),  # < 5 tokens
        (4, "this has lorem ipsum filler inside it somewhere."),
        (5, "some code here { return x; } and more words after."),
        (6, "- a\n- b\n- c\n- d"),  # all bullet lines
        (7, "now ### many #### hashes ##### ruin the symbol ratio ###."),
        (8, "1 2 3 4 5 6 7 8 9 0."),  # numeric tokens: alpha ratio fails
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in rule_filters(df).collect()}
    assert out[1]["keep"] is True
    assert out[2]["keep"] is False and out[2]["n_tokens"] == 0
    assert out[3]["r_min_words"] is False
    assert out[4]["r_no_lorem"] is False
    assert out[5]["r_no_brace"] is False
    assert out[6]["r_bullet_ratio"] is False
    assert out[7]["r_symbol_ratio"] is False
    assert out[8]["r_alpha_ratio"] is False
    assert all(not out[i]["keep"] for i in range(2, 9))


def test_dsir_importance_weights(spark):
    """Target-exclusive vocabulary scores positive (selected); vocabulary
    absent from the target scores negative; a doc mixing both sits between
    the two extremes. Zero-token docs are dropped."""
    from pyspark.sql import functions as F

    from sptag_spark.operators.textops import dsir_importance_weights

    rows = [
        (1, "wiki", "alpha beta alpha beta gamma"),
        (2, "wiki", "alpha gamma gamma beta"),
        (3, "web", "zeta eta theta zeta eta"),
        (4, "web", "alpha beta zeta eta"),  # mixed vocab
        (5, "web", "alpha beta gamma alpha"),  # target-like vocab, raw doc
        (6, "web", ""),  # no tokens: dropped
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        r["doc_id"]: r
        for r in dsir_importance_weights(
            docs, F.col("source") == "wiki"
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}
    # pure target vocab → importance ratio > 1 regardless of which doc
    for i in (1, 2, 5):
        assert out[i]["avg_log_ratio"] > 0 and out[i]["selected"] is True
    # vocab never seen in target → ratio < 1
    assert out[3]["avg_log_ratio"] < 0 and out[3]["selected"] is False
    # mixed doc sits strictly between the extremes
    assert out[3]["avg_log_ratio"] < out[4]["avg_log_ratio"] < out[1]["avg_log_ratio"]
    assert out[1]["n_tokens"] == 5
