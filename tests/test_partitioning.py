"""spread_width: scale-adaptive compute-spread sizing (r14).

The dedup/text operators re-spread small inputs before CPU-heavy map
passes; the width must grow with input bytes and cap at the session
parallelism so cluster behavior is unchanged while bench-scale inputs
stop paying ``cores`` near-empty tasks.
"""

import pyspark.sql.functions as F

from sptag_spark.partitioning import plan_size_bytes, spread_width


def test_width_caps_at_parallelism(spark):
    df = spark.range(10).select(F.col("id"))
    cap = spark.sparkContext.defaultParallelism
    # force a huge bytes estimate downward via tiny bytes_per_task
    assert spread_width(df, bytes_per_task=1) == cap


def test_width_floors_at_one(spark):
    df = spark.range(1).select(F.col("id"))
    assert spread_width(df, bytes_per_task=1 << 40) == 1


def test_width_scales_with_estimated_bytes(spark):
    df = spark.range(10_000).select(
        F.col("id"), F.repeat(F.lit("x"), 100).alias("pad")
    )
    size = plan_size_bytes(df)
    assert size > 0
    # pick bytes_per_task so the expected width is strictly between the
    # floor and the cap, then check the ceil-divide exactly
    cap = spark.sparkContext.defaultParallelism
    bpt = max(1, size // min(3, cap))
    expect = min(max(1, -(-size // bpt)), cap)
    assert spread_width(df, bytes_per_task=bpt) == expect
