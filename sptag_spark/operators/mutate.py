"""Mutation semantics: soft delete, delete-by-vector/meta, append, compaction.

Reference model (SURVEY.md §1.1, §2.9): deletes are *soft* — BKT::DeleteIndex
just inserts the id into a Labelset tombstone set
(`src/Core/BKT/BKTIndex.cpp:892-899`, `Common/Labelset.h:14-120`) and search
skips tombstoned ids (`BKTIndex.cpp:437-440`). When the deleted fraction
exceeds DeletePercentageForRefine=0.4 (`BKT/ParameterDefinitionList.h:43`),
RefineIndex (`BKTIndex.cpp:774-873`) rewrites the index densely, remapping ids.

Spark mapping: a `tombstones(id)` side table + LEFT ANTI JOIN at query time;
compaction is a batch rewrite. At 100 TB the anti-join broadcasts the (small)
tombstone table; compaction is the rare full rewrite, exactly like the
reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sptag_spark.operators.rank import (
    global_row_number_arbitrary,
    global_row_number_by,
)

# Reference: exact-match threshold for delete-by-vector is dist < 1e-6
# (`BKTIndex.cpp:884` — search then tombstone everything at distance ~0).
EXACT_MATCH_EPS = 1e-6

# DeletePercentageForRefine (`BKT/ParameterDefinitionList.h:43`).
REFINE_DELETED_FRACTION = 0.4


def apply_tombstones(vectors: DataFrame, tombstones: DataFrame) -> DataFrame:
    """Live view of the index: anti-join the tombstone set.

    Tombstones are tiny relative to vectors → Catalyst broadcasts the anti
    side; no shuffle of the big table.
    """
    return vectors.join(F.broadcast(tombstones.select("id")), "id", "left_anti")


def delete_by_vector(
    vectors: DataFrame, targets: DataFrame, target_rows: list | None = None
) -> DataFrame:
    """Ids whose vector exactly matches any target vector (dist < 1e-6),
    per `BKTIndex.cpp:875-890`. Returns a tombstone DataFrame (id).

    targets: (vector ARRAY<FLOAT>) — small (a delete request batch), so it
    ships to executors in the kernel closure; each partition computes its
    block×targets L2 distances with one BLAS matmul and emits only matching
    ids. (The crossJoin + interpreted aggregate/zip_with distance expression
    computes the same predicate ~10× slower per pair.) Exact per-pair
    recompute on the BLAS winners keeps the eps comparison identical to the
    declarative/oracle arithmetic.

    ``target_rows``: the already-collected target rows (any Row/mapping with
    a ``vector`` field) when the caller holds them — the q_rows discipline
    of knn/ann_search: a steady-state caller whose delete batch is a
    memoized input artifact skips this call's collect job.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    rows = (
        target_rows
        if target_rows is not None
        else targets.select("vector").collect()
    )
    T = np.array([list(r["vector"]) for r in rows], dtype=np.float64)
    if len(T) == 0:
        return vectors.sparkSession.createDataFrame([], "id long")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(pdf["vector"].tolist(), dtype=np.float64)
            ids = pdf["id"].to_numpy(dtype=np.int64)
            D = -2.0 * (V @ T.T)
            D += (V * V).sum(axis=1)[:, None]
            D += (T * T).sum(axis=1)[None, :]
            # BLAS expansion has ~1e-15 noise; re-check candidates near the
            # threshold with direct (v-t)² arithmetic
            r_idx, c_idx = np.nonzero(D < EXACT_MATCH_EPS * 2)
            if len(r_idx) == 0:
                continue
            d = V[r_idx] - T[c_idx]
            exact = (d * d).sum(axis=1)
            hit = np.unique(r_idx[exact < EXACT_MATCH_EPS])
            if len(hit):
                yield pd.DataFrame({"id": ids[hit]})

    return (
        vectors.select("id", "vector")
        .mapInPandas(kernel, schema="id long")
        .distinct()
    )


def meta_mapping(vectors: DataFrame) -> DataFrame:
    """Meta-key → vector-id mapping, newest (largest id) wins — the
    GetMetaMapping/UpdateMetaMapping upsert semantics
    (`inc/Core/VectorIndex.h:187-193`, `src/Core/VectorIndex.cpp:246`).
    """
    w = Window.partitionBy("meta").orderBy(F.col("id").desc())
    return (
        vectors.select("meta", "id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("meta", "id")
    )


def delete_by_meta(vectors: DataFrame, keys: DataFrame) -> DataFrame:
    """DeleteByMetaData (`VectorIndex.cpp:478-487`): resolve keys through the
    latest-wins mapping, emit tombstones. keys: (meta STRING)."""
    return meta_mapping(vectors).join(F.broadcast(keys), "meta", "left_semi").select("id")


def add_batch(vectors: DataFrame, new_vectors: DataFrame) -> DataFrame:
    """AddIndex append (`Dataset.h:106-124`, `BKTIndex.cpp:901-970`): ids are
    positional — new rows get ids after the current max. new_vectors:
    (vector, meta). Returns the unioned index.

    Rejects dimension mismatches like the reference's add-time check
    (`BKTIndex.cpp:924`: DimensionSizeMismatch) — the index dimension is
    fixed at creation (`CoreInterface.h:19`).

    Note: like the reference (single add lock, `m_dataAddLock`), id assignment
    is a serial decision: new rows get max(id)+1.. in an arbitrary but
    internally consistent order. Numbering is distributed
    (global_row_number_arbitrary: per-partition offsets, map-only — no
    single-partition window), so a large offline add batch does not funnel
    through one task.

    EAGER, not a lazy plan builder: calling this runs Spark jobs NOW — the
    dimension check, the max-id lookup, and global_row_number_arbitrary's
    localCheckpoint + per-partition counts all execute at call time (the
    numbering must be pinned before anyone acts on the result, or re-
    execution could renumber). Construct it only when you will execute it.
    """
    first = vectors.select(F.size("vector").alias("d")).first()
    if first is not None:
        dim = first["d"]
        bad = new_vectors.filter(F.size("vector") != dim).count()
        if bad:
            raise ValueError(
                f"DimensionSizeMismatch: {bad} row(s) do not have the "
                f"index dimension {dim}"
            )
    start = vectors.agg(F.coalesce(F.max("id") + 1, F.lit(0))).first()[0]
    numbered = (
        global_row_number_arbitrary(new_vectors, out_col="_rn")
        .withColumn("id", (F.col("_rn") + F.lit(start)).cast("long"))
        .select("id", "vector", "meta")
    )
    return vectors.select("id", "vector", "meta").unionByName(numbered)


def need_refine(vectors: DataFrame, tombstones: DataFrame) -> bool:
    """NeedRefine: deleted fraction > 0.4 (`BKTIndex.cpp:774-786`)."""
    total = vectors.count()
    if total == 0:
        return False
    ndel = tombstones.join(vectors, "id", "left_semi").count()
    return ndel / total > REFINE_DELETED_FRACTION


def refine_index(
    vectors: DataFrame,
    tombstones: DataFrame,
    known_count: int | None = None,
) -> DataFrame:
    """RefineIndex compaction (`BKTIndex.cpp:774-873`): drop tombstoned rows
    and remap ids densely (ascending old id → 0..n-1), returning the new index
    with an old_id column for side-table remapping.

    At scale: dense renumbering is distributed (global_row_number_by:
    sampled range-partitioned sort + map-only partition offsets), so the
    compaction rewrite parallelizes across partitions instead of funneling
    the whole index through one global-sort task, while keeping the
    reference's deterministic ascending-old-id order. Small indexes (below
    global_row_number_by's measured dispatch threshold) take the one-task
    sort instead — sized by the PRE-anti-join base count, a column-pruned
    (often footer-only) count that never re-evaluates the anti-join; any
    upper bound on the live rows is a correct dispatch key.

    ``known_count``: that upper bound, when the caller already holds one
    (e.g. the memoized base-table count) — the dispatch needs ANY cheap
    bound on the live rows, and a caller-supplied constant saves counting
    ``vectors`` here, which for a composed mutation pipeline re-executes
    every upstream stage (delete scans, anti-joins, unions) once per call
    purely to pick a code path.

    EAGER, not a lazy plan builder: (without ``known_count``) the dispatch
    count and (on the distributed path) global_row_number_by's range-sample
    + offset jobs run at call time. Construct it only when you will execute
    the compaction.
    """
    live = apply_tombstones(vectors, tombstones)
    return (
        global_row_number_by(
            live.withColumn("old_id", F.col("id")),
            "old_id",
            out_col="_rn",
            known_count=known_count if known_count is not None else vectors.count(),
        )
        .withColumn("id", F.col("_rn"))
        .select("id", "old_id", "vector", "meta")
    )


def merge_index(
    v1: DataFrame,
    t1: DataFrame,
    v2: DataFrame,
    t2: DataFrame,
) -> DataFrame:
    """MergeIndex (`src/Core/VectorIndex.cpp:489-560`): union two indexes by
    re-inserting the live (non-tombstoned) vectors of the second into the
    first. Ids of the second index are remapped past the first's max id —
    the positional-id append semantics of the reference's re-insertion.

    Plan shape: two broadcast anti-joins (tombstones are small), one scalar
    subquery for the offset (a single-row cross join — no shuffle of the big
    tables), one union. No global sort; id remap is a column expression.
    """
    live1 = apply_tombstones(v1, t1)
    live2 = apply_tombstones(v2, t2)
    offset = live1.agg((F.coalesce(F.max("id"), F.lit(-1)) + 1).alias("_off"))
    remapped = (
        live2.crossJoin(F.broadcast(offset))
        .withColumn("id", F.col("id") + F.col("_off"))
        .drop("_off")
    )
    return live1.unionByName(remapped)
