"""Keyword (BM25) and hybrid keyword+vector retrieval.

The reference is a pure vector engine; a training-data / RAG pipeline over
the same corpus also needs lexical retrieval and rank fusion — the classic
hybrid-search pair (BM25 candidates ∪ ANN candidates → reciprocal-rank
fusion). Both stages here are pure DataFrame plans.

Scale notes (100 TB):
- BM25 prunes to the QUERY'S terms before any shuffle: the exploded token
  stream is filtered map-side against the (tiny, broadcast) term list, so
  the per-(doc, term) aggregation shuffles only matching tokens, not the
  corpus token stream. df(t) is |terms| rows; corpus scalars (N, avgdl) are
  one partial-agg job; both broadcast back into the scoring join.
- RRF joins two (id, rank) lists of length ≤ depth per query — driver-bounded
  candidate sets, outer-joined and fused without touching the corpus again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sptag_spark.functions.text import tokens

BM25_K1 = 1.2
BM25_B = 0.75


def _bm25_stats(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(doc_id, dl, toks) — the tokenized corpus stream."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.lower(F.col(text_col))).alias("toks"),
    ).select("doc_id", F.size("toks").cast("double").alias("dl"), "toks")


def _bm25_tf(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, dl, tok, tf) for matching (doc, term) pairs. The term
    filter runs MAP-SIDE against the (tiny, literal) term array before the
    explode, so the aggregation shuffles only matching tokens — never the
    corpus token stream. Split out so the plan stays testable past the
    localCheckpoint bm25_scores puts above it (the duplicate_spans
    discipline)."""
    stats = _bm25_stats(docs, id_col, text_col)
    term_arr = F.array(*[F.lit(t) for t in terms])
    return (
        stats.select(
            "doc_id",
            "dl",
            F.explode(
                F.filter("toks", lambda t: F.array_contains(term_arr, t))
            ).alias("tok"),
        )
        .groupBy("doc_id", "dl", "tok")
        .agg(F.count("*").cast("double").alias("tf"))
    )


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, bm25 DOUBLE) for every doc containing ≥ 1 query term.

    Okapi/Lucene BM25: idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)),
    contribution = idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    over lowercased whitespace tokens.
    """
    scal = _bm25_stats(docs, id_col, text_col).agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    tf = _bm25_tf(docs, terms, id_col, text_col)
    # tf is consumed by the df(t) aggregate AND as the scoring probe;
    # unmaterialized, the second branch re-runs the full scan+tokenize+
    # explode lineage. The term filter already pruned the corpus stream,
    # but common terms still make tf corpus-scale, so the pin is a
    # columnar persist (the duplicate_spans GC-wall fix), attached to the
    # result for release(). One full text scan remains for the corpus
    # scalars (N, avgdl) — the classic two-pass BM25 shape.
    tf = tf.persist()
    dfs = tf.groupBy("tok").agg(F.count("*").cast("double").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    contrib = idf * F.col("tf") * (k1 + 1.0) / denom
    from sptag_spark.resources import attach_artifacts

    return attach_artifacts(
        tf.join(F.broadcast(dfs), "tok")
        .crossJoin(F.broadcast(scal))
        .groupBy("doc_id")
        .agg(F.sum(contrib).alias("bm25")),
        [tf],
    )


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 20,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(rank, doc_id, bm25) — top-k by (score desc, doc_id asc); rank on the
    unrounded score, ties broken by id like every other top-k in the engine.

    The tail is TakeOrderedAndProject (per-partition heap), not a global
    window — the scored candidate set (every doc matching ≥ 1 term) never
    funnels through one task. See operators/rank.py.
    """
    from sptag_spark.operators.rank import ranked_topk
    from sptag_spark.resources import carry_artifacts

    scores = bm25_scores(docs, terms, k1=k1, b=b, id_col=id_col, text_col=text_col)
    top = ranked_topk(scores, [F.col("bm25").desc(), F.col("doc_id")], k)
    return carry_artifacts(
        top.select("rank", "doc_id", F.round("bm25", 4).alias("bm25")), scores
    )


def rrf_fuse(
    list_a: DataFrame,
    list_b: DataFrame,
    k: int = 20,
    c: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion of two (id, rank) candidate lists:
    rrf(d) = Σ_lists 1/(c + rank_d); absent-from-a-list contributes 0.

    Returns (rank, doc_id, rrf) top-k by (rrf desc, doc_id asc). Tail is
    TakeOrderedAndProject, not a global window (operators/rank.py) — the
    fused candidate union can be |queries|·depth rows in a batch run.
    """
    from sptag_spark.operators.rank import ranked_topk

    a = list_a.select(F.col(id_col).alias("doc_id"), F.col("rank").alias("ra"))
    bdf = list_b.select(F.col(id_col).alias("doc_id"), F.col("rank").alias("rb"))
    fused = a.join(bdf, "doc_id", "full_outer").select(
        "doc_id",
        (
            F.coalesce(1.0 / (F.lit(c) + F.col("ra")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(c) + F.col("rb")), F.lit(0.0))
        ).alias("rrf"),
    )
    top = ranked_topk(fused, [F.col("rrf").desc(), F.col("doc_id")], k)
    return top.select("rank", "doc_id", F.round("rrf", 6).alias("rrf"))
