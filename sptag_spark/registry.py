"""Registry wiring operators to the driver contract in __spark_entry__.py.

Each entry pairs a Spark query callable ``(spark, sf_dir) -> DataFrame`` with
an equivalent DuckDB-runnable ANSI-SQL oracle string (or None for ops that
are not SQL-expressible — those get a weaker rows-only check).

Conventions that keep the driver's hash-compare honest:
- every computed column is aliased identically on both sides;
- float outputs are rounded to 4 decimals on both sides (engines agree to
  ~1e-12; 1e-4 rounding absorbs accumulation-order noise);
- rank/count columns are BIGINT on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    query: QueryFn
    oracle: str | None  # DuckDB SQL, or None → rows-only check


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, query: QueryFn, oracle: str | None) -> None:
    if name in _REGISTRY:
        raise ValueError(f"duplicate query spec {name!r}")
    _REGISTRY[name] = QuerySpec(name, query, oracle)


def all_specs() -> dict[str, QuerySpec]:
    # Import modules for their registration side effects.
    import sptag_spark.queries  # noqa: F401

    return dict(_REGISTRY)
