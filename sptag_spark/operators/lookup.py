"""Point lookup — GetSample / GetMetadata parity.

Reference: `AnnService/inc/Core/VectorIndex.h:64` (`GetSample(idx)` returns
the stored vector bytes) and `:112` (`GetMetadata(vectorID)` returns the
metadata blob); both are O(1) array indexing in a RAM-resident index.

Spark translation: the id set is small (a service answers one id, a batch
a few thousand), so the lookup is a broadcast semi-join against the
canonical table — the big side streams through a hash filter, never
shuffles, and parquet row-group statistics on a sorted/bucketed id column
prune most of the scan before it starts (io/warehouse.py's layout makes
that pruning exact). Tombstoned rows are excluded the same way search
excludes them: deleted ids return no row, matching the reference's
`CheckIfNotDeleted` discipline rather than resurrecting stale vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def get_samples(
    vectors: DataFrame,
    ids: DataFrame,
    tombstones: DataFrame | None = None,
) -> DataFrame:
    """Rows of the canonical table for the requested ids.

    `ids` is a 1-column (id) DataFrame; output keeps the canonical column
    set (id, vector, meta, ...) for the surviving ids. Requested ids that
    do not exist (or are tombstoned) simply produce no row — the
    DataFrame spelling of the reference returning null for a bad VID."""
    out = vectors.join(F.broadcast(ids.select("id").distinct()), "id")
    if tombstones is not None:
        from sptag_spark.operators.mutate import apply_tombstones

        out = apply_tombstones(out, tombstones)
    return out
