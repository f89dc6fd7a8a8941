"""Deduplication operators for large-scale training-data pipelines.

Four families, each with a clear 100 TB story:

- exact:     md5(text) hash → groupBy → keep min id. One shuffle on a short
             hash key; the classic first pass.
- MinHash+LSH: shingle → seeded minhash signature → band buckets → candidate
             pairs → exact-Jaccard verify. The candidate join is on short hash
             keys, never on raw text; verification touches only candidates.
- SimHash:   per-token hash bits → weighted bit vote → compact integer
             fingerprint; near-dup = small Hamming distance. One groupBy.
- embedding: cosine-similarity pairs over the embedding column; exact
             (crossJoin expr) at test scale, IVF/LSH-blocked at 100 TB
             (see index/ for the blocking structures).

All hashing is md5-hex (portable to the DuckDB oracle). No Python UDFs —
everything is explode/groupBy/join on JVM columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sptag_spark.functions.distance import dot, norm
from sptag_spark.functions.text import (
    md5_hex,
    seeded_min_hash,
    token_shingles,
    tokens,
)

N_MINHASH = 16
SHINGLE_N = 3


def dedup_exact_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups: all members of text-hash groups with >1 member.

    Returns (doc_id, group_min BIGINT, group_size BIGINT); `group_min` is the
    canonical survivor (smallest id), so `doc_id != group_min` rows are the
    drop set.
    """
    hashed = docs.select(
        F.col(id_col).alias("doc_id"), md5_hex(F.col(text_col)).alias("h")
    )
    w = Window.partitionBy("h")
    return (
        hashed.withColumn("group_min", F.min("doc_id").over(w))
        .withColumn("group_size", F.count("*").over(w))
        .filter(F.col("group_size") > 1)
        .select("doc_id", "group_min", "group_size")
    )


def doc_shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = SHINGLE_N) -> DataFrame:
    """(doc_id, shingle) — distinct n-token shingles, exploded."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(token_shingles(F.col(text_col), n)).alias("shingle"),
    )


def minhash_signature(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n_hashes: int = N_MINHASH) -> DataFrame:
    """(doc_id, seed, minhash) — one row per hash function. Docs with no
    shingles (< n tokens) drop out (NULL minhash)."""
    sh = F.col("_shingles")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        token_shingles(F.col(text_col), SHINGLE_N).alias("_shingles"),
    )
    per_seed = [
        base.select(
            "doc_id", F.lit(s).alias("seed"), seeded_min_hash(sh, s).alias("minhash")
        )
        for s in range(n_hashes)
    ]
    out = per_seed[0]
    for p in per_seed[1:]:
        out = out.unionByName(p)
    return out.filter(F.col("minhash").isNotNull())


def lsh_candidate_pairs(signatures: DataFrame) -> DataFrame:
    """Candidate pairs: docs sharing ANY (seed, minhash) bucket (1-row bands —
    max recall; precision comes from the exact verify step). The self-join is
    on short hash keys; buckets are tiny, so the pair blow-up is bounded."""
    a = signatures.alias("a")
    b = signatures.alias("b")
    return (
        a.join(
            b,
            (F.col("a.seed") == F.col("b.seed"))
            & (F.col("a.minhash") == F.col("b.minhash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def exact_jaccard(
    shingles: DataFrame, pairs: DataFrame | None = None
) -> DataFrame:
    """Exact n-gram Jaccard per pair: |A∩B| via shingle equi-join, |A∪B| =
    |A|+|B|-|A∩B|. If `pairs` given, restrict to those (the LSH-verified
    path); else all pairs sharing ≥1 shingle (exact path, test scale)."""
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = shingles.alias("sa")
    b = shingles.alias("sb")
    inter = (
        a.join(
            b,
            (F.col("sa.shingle") == F.col("sb.shingle"))
            & (F.col("sa.doc_id") < F.col("sb.doc_id")),
        )
        .groupBy(
            F.col("sa.doc_id").alias("doc_a"), F.col("sb.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    if pairs is not None:
        inter = inter.join(pairs, ["doc_a", "doc_b"], "left_semi")
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
    )


def minhash_near_dup_pairs(
    docs: DataFrame,
    threshold: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash-LSH candidates → exact-Jaccard verify → pairs ≥ threshold.
    (doc_a, doc_b, jaccard). The 100 TB shape: signatures and buckets are
    narrow; raw text is only touched at shingling time."""
    sigs = minhash_signature(docs, id_col, text_col)
    cands = lsh_candidate_pairs(sigs)
    sh = doc_shingles(docs, id_col, text_col)
    jac = exact_jaccard(sh, pairs=cands)
    return jac.filter(F.col("jaccard") >= threshold)


SIMHASH_BITS = 16


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = SIMHASH_BITS) -> DataFrame:
    """Per-doc SimHash fingerprint from token-frequency-weighted bit votes.

    Bit b of md5(token) is nibble (b/4) of the hex digest, bit (b%4). A bit of
    the fingerprint is set when the weighted vote (each token occurrence votes
    ±1) is positive. Returns (doc_id, simhash BIGINT). Pure explode+groupBy —
    one shuffle on doc_id.
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).withColumn("h", md5_hex(F.col("tok")))
    positions = F.sequence(F.lit(0), F.lit(bits - 1))
    tok_bits = tok.select(
        "doc_id",
        F.explode(positions).alias("b"),
        F.col("h"),
    ).withColumn(
        "nib",
        # nibble value of hex char at index b/4 (1-based substring)
        F.expr(
            "instr('0123456789abcdef', substring(h, CAST(floor(b/4) AS INT) + 1, 1)) - 1"
        ),
    ).withColumn(
        "vote",
        F.when(
            (F.floor(F.col("nib") / F.pow(F.lit(2), F.col("b") % 4)) % 2) == 1,
            F.lit(1),
        ).otherwise(F.lit(-1)),
    )
    return (
        tok_bits.groupBy("doc_id", "b")
        .agg(F.sum("vote").alias("v"))
        .withColumn(
            "bitval",
            F.when(F.col("v") > 0, F.pow(F.lit(2), F.col("b")).cast("long")).otherwise(
                F.lit(0)
            ),
        )
        .groupBy("doc_id")
        .agg(F.sum("bitval").cast("long").alias("simhash"))
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pairs with cosine similarity ≥ threshold: (id_a, id_b, cos_sim).

    Exact quadratic form (declarative crossJoin + JVM expression) — correct at
    any scale but O(n²); at 100 TB, block first with IVF cluster assignment
    (index/ivf.py) or LSH bands and run this within blocks.
    """
    a = embeddings.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    va, vb = F.col("va"), F.col("vb")
    sim = dot(va, vb) / (norm(va) * norm(vb))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", sim)
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )
