"""Driver queries: BM25 keyword retrieval + hybrid keyword/vector fusion.

Query terms are a fixed literal list (the corpus is synthetic OLAP-flavored
text, so the terms are common corpus words — every engine run scores the
same query). The hybrid query fuses the BM25 ranking with an exact cosine
ranking for one fixed query vector over the SAME item universe (documents
that have an embedding: vec_id = doc_id), which is the multimodal-corpus
shape hybrid search assumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sptag_spark.registry import register
from sptag_spark.tables import load_table

BM25_TERMS = ["merge", "scan", "hash"]
RETR_DEPTH = 100  # per-list candidate depth fed into fusion
RRF_C = 60
HYBRID_QUERY_ID = 0  # vec_id whose embedding is the vector query

_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)

# BM25 over lowercased whitespace tokens — the SQL twin of
# operators/retrieval.py bm25_scores (same Okapi/Lucene formula).
# Parameterized on the corpus CTE so the curated composite below can run
# the SAME formula over the rule-filtered universe.
def _bm25_scores_sql(src: str = "documents") -> str:
    return f"""
tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> t <> '') AS toks
  FROM {src}
),
stats AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl, toks FROM tok),
scal AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM stats),
tf AS (
  SELECT doc_id, dl, t.tok AS tok, CAST(count(*) AS DOUBLE) AS tf
  FROM stats, UNNEST(toks) AS t(tok)
  WHERE t.tok IN ({_TERMS_SQL})
  GROUP BY 1, 2, 3
),
dfs AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY tok),
bm25 AS (
  -- tok-ordered fold, mirroring the Spark side's deterministic
  -- summation (float addition is not associative; an unordered 3-term
  -- sum can break exact ties between identical docs)
  SELECT doc_id,
         sum( ln(1 + (n_docs - df + 0.5) / (df + 0.5))
              * tf * (1.2 + 1.0)
              / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
              ORDER BY tok ) AS score
  FROM tf JOIN dfs USING (tok), scal
  GROUP BY doc_id
)
"""


_BM25_SCORES = _bm25_scores_sql()


# BM25 corpus statistics are an INDEX artifact (VERDICT r8 #2): built from
# one tokenize pass per (session, sf_dir) — the spann_index memo discipline
# — so every query here (and hybrid fusion below) serves from the persisted
# inverted index without re-scanning the corpus.
_BM25_CACHE: dict[tuple, object] = {}


def bm25_index(spark: SparkSession, sf_dir: str):
    from sptag_spark.operators.retrieval import build_bm25_index

    key = (id(spark.sparkContext), sf_dir)
    if key not in _BM25_CACHE:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        _BM25_CACHE[key] = build_bm25_index(docs)
    return _BM25_CACHE[key]


def _bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sptag_spark.operators.retrieval import bm25_topk

    return bm25_topk(None, BM25_TERMS, k=20, index=bm25_index(spark, sf_dir))


register(
    "bm25_topk",
    _bm25_topk,
    f"""
WITH {_BM25_SCORES}
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
       doc_id, round(score, 4) AS bm25
FROM bm25
QUALIFY rank <= 20
""",
)


# -- hybrid: BM25 rank ⊕ cosine rank via reciprocal-rank fusion --------------

_COS_SIM_Q = (
    "list_sum(list_transform(list_zip(e.embedding, q.qv), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / "
    "(sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE)^2))) * "
    "sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE)^2))))"
)


def _hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sptag_spark.functions.distance import cosine_dist
    from sptag_spark.operators.retrieval import bm25_topk, rrf_fuse

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    lex = bm25_topk(
        docs, BM25_TERMS, k=RETR_DEPTH, index=bm25_index(spark, sf_dir)
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # same item universe as the text list: documents that have an embedding
    emb = emb.join(
        docs.select(F.col("doc_id").alias("vec_id")), "vec_id"
    )
    q = emb.filter(F.col("vec_id") == HYBRID_QUERY_ID).select(
        F.col("embedding").alias("qv")
    )
    # TakeOrderedAndProject tail (operators/rank.py), not a global window —
    # the scored candidate set is the whole embedding table
    from sptag_spark.operators.rank import ranked_topk

    scored = emb.crossJoin(F.broadcast(q)).select(
        "vec_id", cosine_dist(F.col("embedding"), F.col("qv")).alias("cos_dist")
    )
    vec = ranked_topk(
        scored, [F.col("cos_dist"), F.col("vec_id")], RETR_DEPTH
    ).select(F.col("vec_id").alias("doc_id"), "rank")
    from sptag_spark.resources import carry_artifacts

    # bm25_topk pins its tf stream; the fused result carries the handle so
    # the harness release() reaches it
    return carry_artifacts(rrf_fuse(lex, vec, k=20, c=RRF_C), lex)


register(
    "hybrid_rrf_search",
    _hybrid_rrf,
    f"""
WITH {_BM25_SCORES},
lex AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS ra
  FROM bm25 QUALIFY ra <= {RETR_DEPTH}
),
emb AS (
  SELECT e.vec_id, e.embedding FROM embeddings e
  JOIN documents d ON d.doc_id = e.vec_id
),
q AS (SELECT embedding AS qv FROM emb WHERE vec_id = {HYBRID_QUERY_ID}),
vec AS (
  SELECT vec_id AS doc_id,
         row_number() OVER (
           ORDER BY greatest(0.0, 1.0 - ({_COS_SIM_Q})), vec_id
         ) AS rb
  FROM emb e, q
  QUALIFY rb <= {RETR_DEPTH}
),
fused AS (
  SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
         COALESCE(1.0 / ({RRF_C} + ra), 0.0)
           + COALESCE(1.0 / ({RRF_C} + rb), 0.0) AS rrf
  FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
)
SELECT CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT) AS rank,
       doc_id, round(rrf, 6) AS rrf
FROM fused
QUALIFY rank <= 20
""",
)


# -- composite: rule-filtered corpus -> BM25 + vector RRF fusion -------------
#
# VERDICT r11 ask #6: fold perennially-unsampled semantics (rule_filters,
# bm25_topk, hybrid_rrf_search) into one composite driver query — the
# realistic retrieval deployment: curate the corpus with the C4/Gopher
# rule pass, index ONLY the kept documents, and serve hybrid
# keyword+vector retrieval over that curated universe. The oracle
# recomputes the whole chain (rules -> kept universe -> BM25 -> cosine ->
# RRF) independently in SQL.

_BM25_CURATED_CACHE: dict[tuple, object] = {}


def _bm25_curated_index(spark: SparkSession, sf_dir: str):
    from sptag_spark.operators.retrieval import build_bm25_index
    from sptag_spark.queries.text_queries import curated_docs

    key = (id(spark.sparkContext), sf_dir)
    if key not in _BM25_CURATED_CACHE:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        # curated universe map-side (no rules-ids self-join back onto the
        # corpus — guide §8), and the keep-id set persisted + counted as
        # part of THIS cached index artifact: the curated universe IS the
        # index's document set, and the measured count lets the per-run
        # candidate join broadcast it when small (components.py's
        # measured-small discipline) instead of shuffling embedding rows.
        kept = curated_docs(docs, ["text"])
        keep = kept.select("doc_id").persist()
        n_keep = keep.count()
        _BM25_CURATED_CACHE[key] = (
            build_bm25_index(kept),
            keep,
            n_keep,
        )
    return _BM25_CURATED_CACHE[key]


def _retrieval_curated(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sptag_spark.functions.distance import cosine_dist
    from sptag_spark.operators.rank import ranked_topk
    from sptag_spark.operators.retrieval import bm25_topk, rrf_fuse
    from sptag_spark.resources import carry_artifacts

    index, keep, n_keep = _bm25_curated_index(spark, sf_dir)
    lex = bm25_topk(None, BM25_TERMS, k=RETR_DEPTH, index=index)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    # the QUERY vector is external input (taken from the full embedding
    # table so it exists even if its document was filtered out); the
    # CANDIDATE universe is the curated corpus only
    q = emb.filter(F.col("vec_id") == HYBRID_QUERY_ID).select(
        F.col("embedding").alias("qv")
    )
    # the keep side is measured at index-build time: under ~2M ids (16 MB
    # of longs) broadcast it so the embedding rows are never shuffled for
    # this semi-decision (guide §3.1/§8); a bigger curated universe falls
    # back to the planner's shuffled join, which is the correct shape then
    keep_ids = keep.select(F.col("doc_id").alias("vec_id"))
    if n_keep <= 2_000_000:
        keep_ids = F.broadcast(keep_ids)
    cand = emb.join(keep_ids, "vec_id")
    scored = cand.crossJoin(F.broadcast(q)).select(
        "vec_id",
        cosine_dist(F.col("embedding"), F.col("qv")).alias("cos_dist"),
    )
    vec = ranked_topk(
        scored, [F.col("cos_dist"), F.col("vec_id")], RETR_DEPTH
    ).select(F.col("vec_id").alias("doc_id"), "rank")
    return carry_artifacts(rrf_fuse(lex, vec, k=20, c=RRF_C), lex)


def _curated_oracle() -> str:
    from sptag_spark.queries.text_queries import _CURATE_PRED, _RULES_CTES

    return f"""
WITH {_RULES_CTES},
keepd AS (SELECT doc_id FROM rules WHERE {_CURATE_PRED}),
kdocs AS (SELECT d.doc_id, d.text FROM documents d JOIN keepd USING (doc_id)),
{_bm25_scores_sql("kdocs")},
lex AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS ra
  FROM bm25 QUALIFY ra <= {RETR_DEPTH}
),
emb AS (
  SELECT e.vec_id, e.embedding FROM embeddings e
  JOIN keepd k ON k.doc_id = e.vec_id
),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {HYBRID_QUERY_ID}),
vec AS (
  SELECT vec_id AS doc_id,
         row_number() OVER (
           ORDER BY greatest(0.0, 1.0 - ({_COS_SIM_Q})), vec_id
         ) AS rb
  FROM emb e, q
  QUALIFY rb <= {RETR_DEPTH}
),
fused AS (
  SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
         COALESCE(1.0 / ({RRF_C} + ra), 0.0)
           + COALESCE(1.0 / ({RRF_C} + rb), 0.0) AS rrf
  FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
)
SELECT CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT) AS rank,
       doc_id, round(rrf, 6) AS rrf
FROM fused
QUALIFY rank <= 20
"""


register("pipeline_retrieval_curated", _retrieval_curated, _curated_oracle())
