"""Deduplication operators for large-scale training-data pipelines.

Four families, each with a clear 100 TB story:

- exact:     md5(text) hash → groupBy → keep min id. One shuffle on a short
             hash key; the classic first pass.
- MinHash+LSH: shingle → seeded minhash signature → band buckets → candidate
             pairs → exact-Jaccard verify. The candidate join is on short hash
             keys, never on raw text; verification touches only candidates.
- SimHash:   per-token hash bits → weighted bit vote → compact integer
             fingerprint; near-dup = small Hamming distance. One groupBy.
- embedding: cosine-similarity pairs over the embedding column via a BLAS
             block kernel; IVF/LSH-blocked at 100 TB (see index/ for the
             blocking structures).

Hashing: md5-hex where a value must match the DuckDB oracle byte-for-byte
(exact dedup, simhash nibbles); engine-internal hashing (shingle hashes,
minhash, LSH buckets) is xxhash64 — int64 keys through every shuffle, and
the oracle only ever checks the exact-verified outputs. Python appears only
in Arrow-batched kernels (the embedding block matmul); everything else is
JVM columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

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


def shingle_hashes(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, hh, sz): per-doc array of distinct xxhash64 shingle hashes.

    This is the narrow side table the whole MinHash family derives from —
    raw text is tokenized and shingled exactly once, and everything
    downstream (signatures, LSH buckets, exact-Jaccard verify) works on
    int64 arrays. Docs with < n tokens (empty shingle set) drop out.

    Small inputs are re-spread to the session's parallelism first: a corpus
    that arrives as one file is one scan split, and the per-row
    shingle+hash work would otherwise run on a single core. On a table that
    already has ≥ cores splits (any real deployment) this is a no-op — no
    shuffle is added at scale."""
    spark = docs.sparkSession
    target = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < target:
        docs = docs.repartition(target)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.transform(
            token_shingles(F.col(text_col), SHINGLE_N),
            lambda s: F.xxhash64(s),
        ).alias("hh"),
    ).filter(F.size("hh") > 0).withColumn("sz", F.size("hh"))


def minhash_signature(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n_hashes: int = N_MINHASH) -> DataFrame:
    """(doc_id, seed, minhash) — one row per hash function, from a SINGLE
    text scan. The seed fan-out happens via explode BELOW the minhash
    projection: the Generate is a barrier Catalyst cannot collapse
    projections through, so tokenize/shingle/hash run once per doc, not once
    per seed (the collapsed form re-inlines the shingle expression 16× and
    runs ~3× slower end-to-end). Per (doc, seed) row the minhash is then an
    array_min over cheap int-int xxhash64 re-hashes."""
    base = shingle_hashes(docs, id_col, text_col)
    exploded = base.select(
        "doc_id", "hh",
        F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("seed"),
    )
    return exploded.select(
        "doc_id",
        "seed",
        F.array_min(
            F.transform("hh", lambda h: F.xxhash64(F.col("seed"), h))
        ).alias("minhash"),
    )


def lsh_candidate_pairs(
    signatures: DataFrame, rows_per_band: int = 1
) -> DataFrame:
    """Candidate pairs: docs sharing an LSH band bucket.

    rows_per_band=1 (default): a bucket is a single (seed, minhash) value —
    maximum recall (miss probability (1-J)^n_hashes, ≤ 4e-7 at J=0.6 with 16
    hashes), which is what lets the exact-verify output hash-match a
    brute-force oracle. Precision comes entirely from the verify step.

    rows_per_band=r>1: classic banding — a bucket is the hash of r
    consecutive seeds' minhashes, so low-similarity pairs stop becoming
    candidates (P(candidate) = 1-(1-J^r)^(n/r)). This is the 100 TB knob:
    at web scale the 1-row-band candidate set grows quadratically in bucket
    occupancy and the verify join becomes the bottleneck; r=2..4 trades a
    bounded recall loss near the threshold for orders less verify work.

    Either way the self-join is on short int keys and `distinct` bounds the
    output; the band aggregation is a map-side-combinable groupBy."""
    if rows_per_band > 1:
        banded = (
            signatures.withColumn(
                "band", (F.col("seed") / rows_per_band).cast("int")
            )
            .groupBy("doc_id", "band")
            .agg(
                F.xxhash64(
                    F.array_join(
                        F.transform(
                            F.array_sort(
                                F.collect_list(
                                    F.struct("seed", "minhash")
                                )
                            ),
                            lambda s: s["minhash"].cast("string"),
                        ),
                        ",",
                    )
                ).alias("minhash")
            )
            .withColumnRenamed("band", "seed")
        )
        signatures = banded
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
    if pairs is not None:
        # Restrict BEFORE the shingle join: candidates are few (LSH output),
        # so broadcast them and only intersect candidate pairs' shingle sets —
        # the unrestricted shingle self-join blows up on frequent shingles.
        sa = shingles.select(F.col("doc_id").alias("doc_a"), "shingle")
        sb = shingles.select(
            F.col("doc_id").alias("_b_id"), F.col("shingle").alias("shingle_b")
        )
        inter = (
            F.broadcast(pairs)
            .join(sa, "doc_a")
            .join(
                sb,
                (F.col("doc_b") == F.col("_b_id"))
                & (F.col("shingle") == F.col("shingle_b")),
            )
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("n_inter"))
        )
    else:
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
    (doc_a, doc_b, jaccard).

    The 100 TB shape: raw text is shingled ONCE into the narrow
    (doc_id, hash-array) side table from shingle_hashes(), persisted for the
    query's lifetime (at warehouse scale this is a written table, not a
    cache); signatures, LSH buckets, and the verify step all derive from it.
    Verification is pair-level — candidate pairs join the side table twice
    and compute size(array_intersect)/size(union) over the int64 hash
    arrays, so the cost is O(candidates · shingles-per-doc), never a
    corpus-wide shingle self-join. Jaccard over 64-bit shingle hashes equals
    Jaccard over the shingles themselves up to a ~1e-15 collision
    probability per pair. Both verify joins are plain equi-joins on doc_id:
    Catalyst broadcasts the small side at test scale and falls back to
    sort-merge when the corpus doesn't fit an executor."""
    sets = shingle_hashes(docs, id_col, text_col).persist()
    exploded = sets.select(
        "doc_id", "hh",
        F.explode(F.sequence(F.lit(0), F.lit(N_MINHASH - 1))).alias("seed"),
    )
    signatures = exploded.select(
        "doc_id",
        "seed",
        F.array_min(
            F.transform("hh", lambda h: F.xxhash64(F.col("seed"), h))
        ).alias("minhash"),
    )
    cands = lsh_candidate_pairs(signatures)
    sa = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("hh").alias("hh_a"),
        F.col("sz").alias("sz_a"),
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("hh").alias("hh_b"),
        F.col("sz").alias("sz_b"),
    )
    inter = F.size(F.array_intersect(F.col("hh_a"), F.col("hh_b")))
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", inter / (F.col("sz_a") + F.col("sz_b") - inter))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


SIMHASH_BITS = 16


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = SIMHASH_BITS) -> DataFrame:
    """Per-doc SimHash fingerprint from token-frequency-weighted bit votes.

    Bit b of md5(token) is nibble (b/4) of the hex digest, bit (b%4). A bit of
    the fingerprint is set when the weighted vote (each token occurrence votes
    ±1) is positive. Returns (doc_id, simhash BIGINT).

    One shuffle of one row per TOKEN: the `bits` per-bit votes are computed
    as separate aggregate columns of a single groupBy (all map-side
    combinable), not by exploding a (token × bit) row set — the exploded
    formulation shuffles `bits`× the rows to compute the same sums.
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).withColumn("h", md5_hex(F.col("tok")))

    def vote(b: int):
        # nibble value of hex char (b//4), bit (b%4) of it, as a ±1 vote
        nib = f"(instr('0123456789abcdef', substring(h, {b // 4 + 1}, 1)) - 1)"
        bit = f"(CAST(floor({nib} / {2 ** (b % 4)}) AS INT) % 2)"
        return F.expr(f"CASE WHEN {bit} = 1 THEN 1 ELSE -1 END")

    agg = [F.sum(vote(b)).alias(f"_v{b}") for b in range(bits)]
    votes = tok.groupBy("doc_id").agg(*agg)
    sim = None
    for b in range(bits):
        term = F.when(F.col(f"_v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return votes.select("doc_id", sim.cast("long").alias("simhash"))


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pairs with cosine similarity ≥ threshold: (id_a, id_b, cos_sim).

    Block kernel: the normalized matrix is broadcast in the closure and each
    partition computes its block-vs-all similarities with one BLAS matmul,
    emitting only above-threshold pairs (exact per-pair recompute on the
    winners for oracle-stable values). A declarative crossJoin + aggregate/
    zip_with expression computes the same thing ~50× slower — the lambda is
    interpreted per element, not codegen'd.

    The closure broadcast bounds this at "matrix fits in executor memory" —
    the same regime where exact O(n²) compute is affordable at all. At 100 TB,
    block first with IVF cluster assignment (index/ivf.py) or LSH bands and
    run this kernel within blocks.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    rows = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vector")
    ).collect()
    all_ids = np.array([r["id"] for r in rows], dtype=np.int64)
    M = np.array([list(r["vector"]) for r in rows], dtype=np.float64)
    norms = np.linalg.norm(M, axis=1)
    safe = np.where(norms == 0, 1.0, norms)
    Mn = M / safe[:, None]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["id"].to_numpy(dtype=np.int64)
            V = np.array(pdf["vector"].tolist(), dtype=np.float64)
            vn = np.linalg.norm(V, axis=1)
            Vn = V / np.where(vn == 0, 1.0, vn)[:, None]
            S = Vn @ Mn.T  # (n_part, N)
            r_idx, c_idx = np.nonzero((S >= threshold) & (ids[:, None] < all_ids[None, :]))
            if len(r_idx) == 0:
                continue
            # exact per-pair recompute: dot/(na*nb) — the oracle's formula
            sims = np.einsum("ij,ij->i", V[r_idx], M[c_idx]) / (
                vn[r_idx] * norms[c_idx]
            )
            yield pd.DataFrame(
                {
                    "id_a": ids[r_idx],
                    "id_b": all_ids[c_idx],
                    "cos_sim": sims,
                }
            )

    return embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vector")
    ).mapInPandas(kernel, schema="id_a long, id_b long, cos_sim double")
