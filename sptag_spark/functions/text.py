"""Text primitives for the pipeline operators — pure column expressions.

These are the building blocks for dedup / quality / lang-id over the
`documents` table. Everything is deterministic and portable: hashes are md5
hex strings (identical in Spark and DuckDB), tokenization is a whitespace
split, shingles are n-token windows.

All JVM-side (no Python UDFs): split/transform/filter/md5 are codegen'd, so
these run at scan speed at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small English function-word list used by quality scoring; mirrors the usual
# heuristic stopword ratios in data-pipeline quality filters.
STOPWORDS = ("the", "a", "an", "of", "and", "to", "in", "is", "it", "that")


def tokens(text: Column) -> Column:
    """Whitespace tokenization. Empty/blank text → empty array (split of ''
    yields [''] — filtered out)."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def regex_token_count(text: Column) -> Column:
    """BPE-ish proxy: count word-or-punctuation tokens (\\w+ | single
    non-word-non-space). The usual quick estimator for LLM token budgets."""
    return F.regexp_count(text, F.lit(r"\w+|[^\w\s]")).cast("long")


def _positions(last: Column) -> Column:
    """1..last, or empty when last < 1 (Spark's sequence(1, 0) would count
    DOWN — [1, 0] — so the guard is required, not cosmetic)."""
    return F.when(last >= 1, F.sequence(F.lit(1), last)).otherwise(
        F.array().cast("array<int>")
    )


def token_shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-token shingles (space-joined). Docs with < n tokens yield
    an empty array.

    Implemented as ONE overlapping-window regex over whitespace-normalized
    text: at each token start (lookbehind anchor) a lookahead captures the
    next n tokens, then `\\S+ ` is consumed so the scan advances a token at
    a time. Equivalent to the transform(slice(tokens))) formulation but with
    a ~10-node expression tree instead of a nested higher-order-function
    tree — which matters because nested lambda expressions cost seconds of
    Catalyst planning + codegen per query (measured 4-9s cold vs 0.6s for
    this form; execution time is identical)."""
    norm = F.regexp_replace(F.trim(text), r"\s+", " ")
    pat = r"(?:^|(?<= ))(?=((?:\S+ ){%d}\S+))\S+ " % (n - 1)
    return F.array_distinct(F.regexp_extract_all(norm, F.lit(pat), 1))


def token_shingles_all(text: Column, n: int = 2) -> Column:
    """ALL overlapping n-token shingles, duplicates preserved — the input to
    intra-document repetition measures, where the duplicate count IS the
    signal (token_shingles dedups because near-dup jaccard wants sets)."""
    norm = F.regexp_replace(F.trim(text), r"\s+", " ")
    pat = r"(?:^|(?<= ))(?=((?:\S+ ){%d}\S+))\S+ " % (n - 1)
    return F.regexp_extract_all(norm, F.lit(pat), 1)


def char_ngrams(text: Column, n: int = 5) -> Column:
    """Distinct character n-grams of the trimmed text. Same overlapping-
    regex shape as token_shingles ((?s) so newlines count as characters,
    matching a substring-window formulation)."""
    pat = r"(?s)(?=(.{%d}))." % n
    return F.array_distinct(
        F.regexp_extract_all(F.trim(text), F.lit(pat), 1)
    )


def md5_hex(c: Column) -> Column:
    """Lowercase md5 hex — byte-identical across Spark and DuckDB, our
    portable hash primitive (the reference ships SIMD hash kernels; we need
    engine-portable determinism more than raw speed here)."""
    return F.md5(c.cast("string"))


def seeded_min_hash(shingles: Column, seed: int) -> Column:
    """MinHash for one hash function: min over shingles of xxhash64(seed,
    shingle) — a 64-bit integer min per seed, a valid random-permutation
    surrogate. xxhash64 stays inside whole-stage codegen and yields BIGINT
    LSH bucket keys (an md5-hex variant works too but shuffles 32-char
    strings and runs ~4× slower). Empty shingle set → NULL.

    Signatures are engine-internal: the driver oracle checks the final
    exact-Jaccard pairs, never the hash values, so the hash needs only
    determinism, not cross-engine portability."""
    hashed = F.transform(shingles, lambda s: F.xxhash64(F.lit(seed), s))
    return F.array_min(hashed)


def stopword_count(toks: Column) -> Column:
    arr = F.array(*[F.lit(w) for w in STOPWORDS])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("long")
