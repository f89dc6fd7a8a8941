"""Driver queries: deduplication family over the documents corpus.

The driver data has no natural duplicates, so each query runs on a
deterministic synthesized corpus = documents ∪ mutated copies:
- exact copies     (doc_id + 100000) for doc_id % 7 == 0
- near-dup copies  (doc_id + 200000, first token dropped) for doc_id % 11 == 0

Both mutations are closed-form SQL, so the oracle builds the same corpus.

Oracle strategy per query:
- dedup_exact: same hash-group logic in SQL.
- minhash_near_dup: Spark runs MinHash-LSH → exact-Jaccard verify; the oracle
  computes brute-force exact Jaccard ≥ τ. Equality relies on LSH recall: with
  16 one-row bands and true pairs at J ≥ 0.8, the miss probability is
  (1-J)^16 ≤ 7e-12 — deterministic md5 hashing, same on both engines.
- simhash: same bit arithmetic in SQL (md5 nibbles via instr).
- embedding_near_dup: same cosine expression, synthesized scaled copies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sptag_spark.operators.dedup import (
    dedup_exact_groups,
    embedding_near_dup_pairs,
    minhash_near_dup_pairs,
    simhash,
)
from sptag_spark.registry import register
from sptag_spark.tables import load_table

JACCARD_T = 0.6
COS_T = 0.999

# -- corpus construction (Spark + SQL twins) --------------------------------


def corpus_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    exact = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    near = (
        docs.filter(F.col("doc_id") % 11 == 0)
        .select(
            (F.col("doc_id") + 200000).alias("doc_id"),
            F.regexp_replace("text", r"^\S+\s+", "").alias("text"),
        )
    )
    return docs.unionByName(exact).unionByName(near)


ORACLE_CORPUS = r"""
SELECT doc_id, text FROM documents
UNION ALL
SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
UNION ALL
SELECT doc_id + 200000 AS doc_id, regexp_replace(text, '^\S+\s+', '') AS text
FROM documents WHERE doc_id % 11 = 0
"""

# shared SQL fragment: distinct 3-token shingles per corpus doc
_SH = r"""
tok AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS toks
  FROM corpus
),
shingles AS (
  SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle
  FROM tok, UNNEST(range(1, greatest(len(toks) - 1, 1))) AS u(i)
  WHERE len(toks) >= 3
)
"""


# -- exact dedup ------------------------------------------------------------


def _dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_exact_groups(corpus_table(spark, sf_dir))


register(
    "dedup_exact",
    _dedup_exact,
    f"""
WITH corpus AS ({ORACLE_CORPUS}),
hashed AS (SELECT doc_id, md5(text) AS h FROM corpus),
grouped AS (
  SELECT doc_id,
         min(doc_id) OVER (PARTITION BY h) AS group_min,
         count(*) OVER (PARTITION BY h) AS group_size
  FROM hashed
)
SELECT doc_id, group_min, CAST(group_size AS BIGINT) AS group_size
FROM grouped WHERE group_size > 1
""",
)


# -- minhash LSH near-dup ---------------------------------------------------


def _minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sptag_spark.resources import carry_artifacts

    pairs = minhash_near_dup_pairs(corpus_table(spark, sf_dir), JACCARD_T)
    return carry_artifacts(
        pairs.select(
            "doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard")
        ),
        pairs,
    )


register(
    "minhash_near_dup",
    _minhash_near_dup,
    f"""
WITH corpus AS ({ORACLE_CORPUS}),
{_SH},
sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM shingles a JOIN shingles b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter) >= {JACCARD_T}
""",
)


# -- simhash ----------------------------------------------------------------


def _simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return simhash(docs)


register(
    "simhash_fingerprints",
    _simhash,
    r"""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')) AS tok
  FROM documents
),
tokh AS (SELECT doc_id, md5(tok) AS h FROM tok),
bits AS (
  SELECT doc_id, b,
    CASE WHEN floor(
        (instr('0123456789abcdef', substring(h, CAST(floor(b/4) AS INT) + 1, 1)) - 1)
        / power(2, b % 4)) % 2 = 1
      THEN 1 ELSE -1 END AS vote
  FROM tokh, UNNEST(range(0, 16)) AS u(b)
),
votes AS (SELECT doc_id, b, sum(vote) AS v FROM bits GROUP BY doc_id, b)
SELECT doc_id,
       CAST(sum(CASE WHEN v > 0 THEN CAST(power(2, b) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
FROM votes GROUP BY doc_id
""",
)


# -- embedding near-dup -----------------------------------------------------

_COS_SIM = (
    "list_sum(list_transform(list_zip(a.va, b.vb), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / "
    "(sqrt(list_sum(list_transform(a.va, x -> CAST(x AS DOUBLE)^2))) * "
    "sqrt(list_sum(list_transform(b.vb, x -> CAST(x AS DOUBLE)^2))))"
)


def _embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    scaled = emb.filter(F.col("vec_id") % 13 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.5)).alias("embedding"),
    )
    corpus = emb.unionByName(scaled)
    pairs = embedding_near_dup_pairs(corpus, COS_T)
    return pairs.select("id_a", "id_b", F.round("cos_sim", 4).alias("cos_sim"))


# -- corpus-wide duplicate spans --------------------------------------------

SPAN_N = 10


def _duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sptag_spark.operators.dedup import duplicate_spans

    return duplicate_spans(corpus_table(spark, sf_dir), SPAN_N)


register(
    "duplicate_spans",
    _duplicate_spans,
    f"""
WITH corpus AS ({ORACLE_CORPUS}),
tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '') AS toks
  FROM corpus
),
spans AS (
  SELECT doc_id, md5(array_to_string(toks[i:i+{SPAN_N - 1}], ' ')) AS h
  FROM tok, UNNEST(range(1, len(toks) - {SPAN_N} + 2)) AS u(i)
  WHERE len(toks) >= {SPAN_N}
),
counts AS (SELECT h, count(*) AS cnt FROM spans GROUP BY h)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
       round(sum(CASE WHEN cnt > 1 THEN 1.0 ELSE 0.0 END) / count(*), 4) AS dup_frac
FROM spans JOIN counts USING (h)
GROUP BY doc_id
""",
)


# -- duplicate clusters (connected components over dup edges) ---------------
#
# Oracle: DuckDB recursive CTE computes the transitive closure of the same
# edge set (exact-dup edges doc→group_min ∪ exact-Jaccard ≥ τ pairs); the
# closure is tiny at sf0.01 (≤ a few hundred edges). Spark runs the
# distributed min-label-propagation operator — same clusters, proven by the
# hash compare.


def _dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sptag_spark.operators.components import dedup_clusters

    return dedup_clusters(corpus_table(spark, sf_dir), JACCARD_T)


register(
    "dedup_clusters",
    _dedup_clusters,
    f"""
WITH RECURSIVE corpus AS ({ORACLE_CORPUS}),
{_SH},
sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM shingles a JOIN shingles b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
near AS (
  SELECT doc_a, doc_b FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter) >= {JACCARD_T}
),
exact_groups AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS group_min
  FROM corpus
),
exact_edges AS (
  SELECT doc_id AS doc_a, group_min AS doc_b FROM exact_groups
  WHERE doc_id <> group_min
),
all_pairs AS (SELECT * FROM near UNION SELECT * FROM exact_edges),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM all_pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM all_pairs
),
reach(a, label) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT e.a, r.label FROM edges e JOIN reach r ON r.a = e.b
),
comp AS (SELECT a AS doc_id, min(label) AS cluster_rep FROM reach GROUP BY a),
csizes AS (
  SELECT cluster_rep, count(*) AS cluster_size FROM comp GROUP BY cluster_rep
)
SELECT comp.doc_id, comp.cluster_rep,
       CAST(csizes.cluster_size AS BIGINT) AS cluster_size
FROM comp JOIN csizes USING (cluster_rep)
WHERE csizes.cluster_size > 1
""",
)


register(
    "embedding_near_dup",
    _embedding_near_dup,
    f"""
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id,
         list_transform(embedding, x -> x * 1.5) AS embedding
  FROM embeddings WHERE vec_id % 13 = 0
),
a AS (SELECT vec_id AS id_a, embedding AS va FROM corpus),
b AS (SELECT vec_id AS id_b, embedding AS vb FROM corpus)
SELECT id_a, id_b, round({_COS_SIM}, 4) AS cos_sim
FROM a JOIN b ON id_a < id_b
WHERE {_COS_SIM} >= {COS_T}
""",
)


# -- semantic clustering (cluster-then-curate, SemDeDup-style) ---------------
#
# Self-verifying like the kmeans-derived ANN queries: the clustering itself
# is not SQL-expressible, so the Spark side MEASURES its contract — full
# coverage, k non-empty buckets, majority-own-centroid separation, one
# valid exemplar per bucket — and the oracle states the expected outcome
# from the base tables alone.

CLUSTER_K = 16


def _doc_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sptag_spark.operators.curation import (
        cluster_exemplars,
        cluster_summary,
        semantic_clusters,
    )
    from sptag_spark.queries.ann_queries import _memo
    from sptag_spark.tables import vectors_table

    def build():
        from sptag_spark.resources import release

        v = vectors_table(spark, sf_dir).select("id", "vector")
        assigned, scored = semantic_clusters(v, k=CLUSTER_K)
        scored = scored.persist()
        scored.count()
        # scored's cache now holds the data — drop any build-time frames
        # the hier k-means path pinned (no-op on the flat path)
        release(scored, include_self=False)
        return (scored,)

    (scored,) = _memo(spark, sf_dir, f"doc_clusters{CLUSTER_K}", build)
    # ONE cluster-keyed exchange feeds both verify branches (r14, guide
    # §2.4): the summary groupBy and the exemplar window each require
    # clustering on `cluster`; repartitioning the cached frame once at
    # min(k, parallelism) satisfies both (no further exchange in either
    # branch) and replaces two session-wide near-empty shuffles — k is a
    # constant 16, so the width is the natural cap at any scale.
    _wk = min(CLUSTER_K, spark.sparkContext.defaultParallelism)
    clustered = scored.repartition(_wk, "cluster")
    summary = cluster_summary(clustered)
    ex = cluster_exemplars(clustered)
    ex_inv = ex.agg(
        (F.count("*") == CLUSTER_K).alias("exemplars_ok"),
    )
    agg = summary.agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        (F.count("*") == CLUSTER_K).alias("k_clusters"),
        (F.min("separation") >= 0.5).alias("separation_ok"),
    )
    cover = scored.agg(
        (F.count_distinct("id") == F.count("*")).alias("cover_ok")
    )
    return agg.crossJoin(F.broadcast(ex_inv)).crossJoin(F.broadcast(cover))


register(
    "doc_clusters",
    _doc_clusters,
    """
SELECT CAST(count(*) AS BIGINT) AS n_docs, TRUE AS k_clusters,
       TRUE AS separation_ok, TRUE AS exemplars_ok, TRUE AS cover_ok
FROM embeddings
""",
)


# -- quality-retention dedup (keep the BEST doc per duplicate cluster) ------
#
# The production near-dedup policy: inside each duplicate cluster keep the
# highest-quality member (here: most tokens, doc_id tie-break), not the
# arbitrary smallest id; singletons pass through. Composes the connected-
# components operator with the text-quality scan — the standard curation
# step after clustering. The per-cluster argmax is a window PARTITIONED by
# cluster rep (scalable — cluster sizes are bounded by the dedup
# structure), never a global rank.


def _dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from sptag_spark.functions.text import token_count
    from sptag_spark.operators.components import dedup_clusters

    corpus = corpus_table(spark, sf_dir)
    clusters = dedup_clusters(corpus, JACCARD_T)
    toks = corpus.select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    # when connected_components took its measured-small local dispatch, the
    # cluster table is a stats-less driver-created frame bounded by the
    # dispatch threshold — broadcast it explicitly (guide §3.1: use a hint
    # when you KNOW a side is small; Catalyst can't see it and was
    # sort-merge-joining both uses, shuffling the corpus side). The
    # distributed dispatch leaves the planner's choice alone.
    cl = (
        F.broadcast(clusters)
        if getattr(clusters, "_sptag_local_components", False)
        else clusters
    )
    # ONE tokenize pass: the former two-branch shape (inner join for cluster
    # members + anti join for singletons) scanned and regex-split the corpus
    # text twice — 7 parquet scans in the r13 mid-plan. A single LEFT join
    # + one window does both branches: a singleton's group key is its own
    # doc_id, which cannot collide with a cluster_rep (a rep is the min
    # MEMBER of its cluster, so a doc that IS a rep is never a singleton),
    # and its cluster_size coalesces to 1. The window now ranks the whole
    # corpus instead of only cluster members, but it moves 4 narrow columns
    # — at 100 TB that exchange is ~32 B/row vs re-scanning and re-splitting
    # the text payload (guide §2.3 shuffle fewer bytes vs §6 scan twice).
    labeled = toks.join(cl, "doc_id", "left")
    grp = F.coalesce(F.col("cluster_rep"), F.col("doc_id"))
    w = Window.partitionBy(grp).orderBy(F.col("n_tokens").desc(), "doc_id")
    kept = (
        labeled.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("cluster_size", F.lit(1)).cast("long").alias(
                "cluster_size"
            ),
        )
    )
    from sptag_spark.resources import carry_artifacts

    return carry_artifacts(kept, clusters)


def _keep_best_oracle() -> str:
    return f"""
WITH RECURSIVE corpus AS ({ORACLE_CORPUS}),
{_SH},
sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM shingles a JOIN shingles b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
near AS (
  SELECT doc_a, doc_b FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter) >= {JACCARD_T}
),
exact_groups AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS group_min
  FROM corpus
),
exact_edges AS (
  SELECT doc_id AS doc_a, group_min AS doc_b FROM exact_groups
  WHERE doc_id <> group_min
),
all_pairs AS (SELECT * FROM near UNION SELECT * FROM exact_edges),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM all_pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM all_pairs
),
reach(a, label) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT e.a, r.label FROM edges e JOIN reach r ON r.a = e.b
),
comp AS (SELECT a AS doc_id, min(label) AS cluster_rep FROM reach GROUP BY a),
csizes AS (
  SELECT cluster_rep, count(*) AS cluster_size FROM comp GROUP BY cluster_rep
),
tokc AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')) AS BIGINT) AS n_tokens
  FROM corpus
),
multi AS (
  SELECT comp.doc_id, comp.cluster_rep, csizes.cluster_size
  FROM comp JOIN csizes USING (cluster_rep)
  WHERE csizes.cluster_size > 1
),
ranked AS (
  SELECT m.doc_id, t.n_tokens, m.cluster_size,
         row_number() OVER (
           PARTITION BY m.cluster_rep ORDER BY t.n_tokens DESC, m.doc_id
         ) AS rk
  FROM multi m JOIN tokc t USING (doc_id)
)
SELECT doc_id, n_tokens, CAST(cluster_size AS BIGINT) AS cluster_size
FROM ranked WHERE rk = 1
UNION ALL
SELECT t.doc_id, t.n_tokens, CAST(1 AS BIGINT) AS cluster_size
FROM tokc t LEFT JOIN multi m USING (doc_id)
WHERE m.doc_id IS NULL
"""


register("dedup_keep_best", _dedup_keep_best, _keep_best_oracle())
