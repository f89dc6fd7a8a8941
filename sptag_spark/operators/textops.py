"""Text-analysis operators: quality scoring, language ID, fingerprinting,
corpus token stats — the per-document scan passes of a training-data
pipeline. All pure column expressions over the documents table; one scan,
no shuffle except the explicitly-noted aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sptag_spark.functions.text import (
    md5_hex,
    regex_token_count,
    stopword_count,
    token_count,
    token_shingles,
    tokens,
)

# Marker function words per language for the n-gram/stopword lang-id
# heuristic. Deterministic tie-break: the LANGS order below (first wins).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "is", "in"),
    "de": ("der", "die", "und", "das", "ist", "nicht"),
    "es": ("el", "los", "las", "que", "y", "es"),
    "fr": ("le", "la", "les", "et", "est", "une"),
    "zh": ("的", "是", "在", "了", "和"),
}
LANGS = tuple(LANG_MARKERS)


def text_quality(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc quality features: lengths, token stats, punctuation and
    stopword ratios. The standard cheap quality-filter signals."""
    toks = tokens(F.col(text_col))
    n_tok = token_count(F.col(text_col))
    n_chars = F.length(F.col(text_col)).cast("long")
    punct = F.length(
        F.regexp_replace(F.col(text_col), r"[^.!?,;:]", "")
    ).cast("long")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        regex_token_count(F.col(text_col)).alias("n_regex_tokens"),
        F.round(
            F.when(n_tok > 0, F.length(F.array_join(toks, "")) / n_tok).otherwise(0.0),
            4,
        ).alias("avg_token_len"),
        F.round(
            F.when(n_chars > 0, punct / n_chars).otherwise(0.0), 4
        ).alias("punct_ratio"),
        F.round(
            F.when(n_tok > 0, stopword_count(toks) / n_tok).otherwise(0.0), 4
        ).alias("stopword_ratio"),
    )


def lang_scores(text: F.Column) -> dict[str, F.Column]:
    toks = tokens(text)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast(
            "long"
        )
    return out


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic language ID: marker-word hit counts per language, argmax
    with fixed priority order (LANGS) as tie-break. Returns
    (doc_id, lang_pred, lang_score)."""
    scores = lang_scores(F.col(text_col))
    # argmax by CASE cascade in LANGS order — ties resolve to the earlier lang
    best = F.greatest(*scores.values())
    pred = F.when(scores[LANGS[0]] == best, F.lit(LANGS[0]))
    for lang in LANGS[1:-1]:
        pred = pred.when(scores[lang] == best, F.lit(lang))
    pred = pred.otherwise(F.lit(LANGS[-1]))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        pred.alias("lang_pred"),
        best.alias("lang_score"),
    )


FINGERPRINT_K = 5


def doc_fingerprint(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = FINGERPRINT_K
) -> DataFrame:
    """Winnowing-style document fingerprint: the k lexicographically-smallest
    md5(shingle) hashes, joined with '|'. Stable under token reordering noise
    elsewhere in the doc. Returns (doc_id, fingerprint STRING).

    Shuffle-free: the per-doc top-k over hashes is array_sort + slice inside
    one projection — a narrow map-only plan (an explode → window → collect
    formulation shuffles every shingle row on doc_id for no reason)."""
    hashes = F.transform(
        token_shingles(F.col(text_col)), lambda s: md5_hex(s)
    )
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.array_join(
                F.slice(F.array_sort(hashes), 1, k), "|"
            ).alias("fingerprint"),
        )
        # docs with no shingles (< n tokens) produce '' — drop them, matching
        # the exploded formulation where they simply yield no rows
        .filter(F.col("fingerprint") != "")
    )


def top_tokens(docs: DataFrame, text_col: str = "text", k: int = 20) -> DataFrame:
    """Corpus-level token frequency top-k: (rank, token, cnt). Partial
    aggregation makes the explode→groupBy map-side-combine; the final top-k
    is a single window over the (small) distinct-token aggregate."""
    tok = docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
    counts = tok.groupBy("token").agg(F.count("*").alias("cnt"))
    w = Window.orderBy(F.col("cnt").desc(), F.col("token"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("rank", "token", "cnt")
    )


def contamination_flags(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing ≥1 n-token
    shingle with any benchmark doc. → (doc_id, contaminated BOOLEAN,
    n_shared BIGINT distinct shared shingles).

    The standard pre-training hygiene pass (n-gram overlap against eval
    sets). 100 TB shape: the benchmark side is SMALL (eval sets are
    thousands of docs) — its distinct shingle set broadcasts, so flagging
    is a map-side semi-join over the corpus shingle stream plus one
    doc_id-keyed count agg; the corpus text is scanned exactly once and
    never shuffled. No reference analog (SPTAG is a vector engine) — this
    extends the dedup family (operators/dedup.py) the same way
    exact_jaccard does, sharing its shingle derivation.
    """
    from sptag_spark.operators.dedup import doc_shingles

    bench_shingles = doc_shingles(benchmark, id_col, text_col, n).select(
        "shingle"
    ).distinct()
    corpus_shingles = doc_shingles(corpus, id_col, text_col, n).dropDuplicates(
        ["doc_id", "shingle"]
    )
    shared = (
        corpus_shingles.join(F.broadcast(bench_shingles), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        corpus.select(F.col(id_col).alias("doc_id"))
        .join(shared, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_shared").isNotNull().alias("contaminated"),
            F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared"),
        )
    )
