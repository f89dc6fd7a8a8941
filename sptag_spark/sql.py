"""SQL API surface: the engine's semantics as `spark.sql` text.

SPTAG exposes its capabilities through a C++/SWIG API; this engine's second
front door (beside the DataFrame operators) is plain Spark SQL over
registered views — the idiomatic way a Spark shop's analysts would consume
it. Distances are inline higher-order-function expressions (aggregate over
zip_with), so an exact k-NN is literally "ORDER BY dist LIMIT k per query"
— the logical form plans/planner.py's TopKByDistance names, here written by
hand in SQL and left to Catalyst.

Scale note: the SQL text below expresses the all-pairs join declaratively;
Catalyst plans the broadcast of the small query side and whole-stage-codegens
the distance lambda JVM-side. For the big-batch serve path the DataFrame
kernel (operators/knn.py: map-side top-k, candidates = partitions·|Q|·k) is
the faster physical strategy — the SQL door is for ad-hoc analytics, and its
per-query LIMIT still caps the window output. Both produce identical rows
(test-pinned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sptag_spark.tables import (
    TABLE_NAMES,
    load_table,
    queries_table,
    vectors_table,
)

# Spark SQL higher-order-function distance expressions — the engine's
# functions/distance.py column builders, as SQL text. (DuckDB twins live in
# queries/knn_queries.py; these are SPARK-dialect: aggregate/zip_with.)
_DOT = (
    "aggregate(zip_with(q.vector, v.vector, "
    "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (a, x) -> a + x)"
)
_NORM_Q = (
    "sqrt(aggregate(transform(q.vector, x -> CAST(x AS DOUBLE) * x), "
    "0D, (a, x) -> a + x))"
)
_NORM_V = (
    "sqrt(aggregate(transform(v.vector, x -> CAST(x AS DOUBLE) * x), "
    "0D, (a, x) -> a + x))"
)

DIST_SQL = {
    "l2": (
        "aggregate(zip_with(q.vector, v.vector, "
        "(x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * "
        "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), 0D, (a, x) -> a + x)"
    ),
    "cosine": (
        f"CASE WHEN {_NORM_Q} = 0D OR {_NORM_V} = 0D THEN 1.0D "
        f"ELSE greatest(0D, 1.0D - {_DOT} / ({_NORM_Q} * {_NORM_V})) END"
    ),
    "ip": f"-({_DOT})",
}


_VIEWS_READY: set[tuple[int, str]] = set()


def create_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every canonical table plus the derived `vectors` and
    `queries` views, so `spark.sql` works against the same names the DuckDB
    oracle uses. Idempotent per (session, sf_dir) — the views are lazy
    plans over the table catalog (tables.py reader cache), so re-running
    the registrations every call would only repeat driver-side work; a
    DIFFERENT sf_dir re-registers (latest wins, matching temp-view
    semantics)."""
    key = (id(spark.sparkContext), sf_dir)
    if key in _VIEWS_READY:
        return
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    vectors_table(spark, sf_dir).createOrReplaceTempView("vectors")
    queries_table(spark, sf_dir).createOrReplaceTempView("queries")
    # registering for one sf_dir invalidates any other's registration on
    # this session — drop stale keys so a later call re-registers
    _VIEWS_READY.difference_update(
        {k for k in _VIEWS_READY if k[0] == key[0]}
    )
    _VIEWS_READY.add(key)


def knn_sql(metric: str = "l2", k: int = 10, query_filter: str = "TRUE") -> str:
    """Exact batch k-NN as one SQL statement over the `vectors`/`queries`
    views: per-query ORDER BY dist LIMIT k with the engine's (dist, id)
    tie-break."""
    return f"""
WITH pairs AS (
  SELECT q.query_id, v.id, {DIST_SQL[metric]} AS dist
  FROM queries q CROSS JOIN vectors v
  WHERE {query_filter}
),
ranked AS (
  SELECT query_id, id, dist,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY dist, id) AS BIGINT) AS rank
  FROM pairs
)
SELECT query_id, rank, id, round(dist, 4) AS dist
FROM ranked WHERE rank <= {k}
"""


def sql_knn(
    spark: SparkSession,
    sf_dir: str,
    metric: str = "l2",
    k: int = 10,
    query_modulus: int | None = None,
) -> DataFrame:
    """Run the SQL-door k-NN. query_modulus subsets the query view (ad-hoc
    analytics sends a handful of probes, not the whole feed)."""
    create_views(spark, sf_dir)
    qf = "TRUE" if query_modulus is None else f"q.query_id % {query_modulus} = 0"
    return spark.sql(knn_sql(metric, k, qf))
