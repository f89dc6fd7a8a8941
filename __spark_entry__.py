"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``sptag_spark`` package; this module only adapts
its query registry (sptag_spark/registry.py) to the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sptag_spark.registry import all_specs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: exact batch k-NN (L2) with metadata attach on sf0.001.

    This is SPTAG's BatchSearch+SearchWithMetaData re-expressed as a Spark
    plan: map-side local top-k kernel, global merge rank, broadcast meta join.
    """
    from pyspark.sql import functions as F

    from sptag_spark.operators.knn import attach_meta, knn
    from sptag_spark.tables import queries_table, vectors_table

    sf_dir = "/root/testdata/sf0.001"
    vectors = vectors_table(spark, sf_dir)
    res = knn(vectors, queries_table(spark, sf_dir), k=10, metric="l2")
    return attach_meta(res, vectors).withColumn("dist", F.round("dist", 4))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.query for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
