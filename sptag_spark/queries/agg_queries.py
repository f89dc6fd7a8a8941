"""Relational scaffolding queries (FIXTURES.md F9): aggregation, join, window
and percentile coverage on the TPC-H-ish tables.

These exercise the engine surfaces SPTAG's metadata layer maps onto in Spark
(metadata attach = joins; latency percentiles = `SSDIndex.h:288-345`;
partial/final agg = the aggregator merge) on relational data.

Numeric discipline for the oracle hash: money columns are exact 2-decimal
values stored as double, so both engines cast to DECIMAL before SUM — sums are
then exact and hash-stable; averages/percentiles are rounded doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sptag_spark.registry import register
from sptag_spark.tables import load_table

ROUND = 4

# -- TPC-H Q1-style pricing summary ----------------------------------------


def _q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    qty = F.col("l_quantity").cast("decimal(10,2)")
    price = F.col("l_extendedprice").cast("decimal(10,2)")
    disc = (F.lit(1.0) - F.col("l_discount")).cast("decimal(4,2)")
    tax = (F.lit(1.0) + F.col("l_tax")).cast("decimal(4,2)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).cast("double").alias("sum_qty"),
        F.sum(price).cast("double").alias("sum_base_price"),
        F.sum(price * disc).cast("double").alias("sum_disc_price"),
        F.sum(price * disc * tax).cast("double").alias("sum_charge"),
        F.round(F.sum(qty).cast("double") / F.count("*"), ROUND).alias("avg_qty"),
        F.round(F.sum(price).cast("double") / F.count("*"), ROUND).alias("avg_price"),
        F.count("*").alias("count_order"),
    )


register(
    "q1_pricing_summary",
    _q1,
    f"""
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2)) * CAST(1.0 + l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
  round(CAST(SUM(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) / COUNT(*), {ROUND}) AS avg_qty,
  round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))) AS DOUBLE) / COUNT(*), {ROUND}) AS avg_price,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)


# -- revenue by nation (multi-join; broadcast-able dims) --------------------


def _revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    # dims are small → broadcast; the fact table never shuffles for the join
    joined = orders.join(
        F.broadcast(customer.select("c_custkey", "c_nationkey")),
        orders.o_custkey == customer.c_custkey,
    ).join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    return joined.groupBy("n_name").agg(
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_orders"),
    )


register(
    "revenue_by_nation",
    _revenue_by_nation,
    """
SELECT n_name,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
)


# -- top-N orders per customer (window on relational data) ------------------


def _top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select(
            "o_custkey",
            "rank",
            "o_orderkey",
            F.col("o_totalprice").alias("totalprice"),
        )
    )


register(
    "top_orders_per_customer",
    _top_orders_per_customer,
    """
SELECT o_custkey, rank, o_orderkey, totalprice FROM (
  SELECT o_custkey, o_orderkey, o_totalprice AS totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rank
  FROM orders
) WHERE rank <= 3
""",
)


# -- events: tumbling-window aggregation (streaming semantics, batch check) --


def _events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch"),
        "event_type",
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
    )


register(
    "events_hourly_agg",
    _events_hourly,
    """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
)


# -- percentiles (the latency-percentile table shape, SSDIndex.h:288-345) ---


def _value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pct = F.expr("percentile(value, array(0.5D, 0.9D, 0.99D))")
    return ev.groupBy("event_type").agg(
        F.round(pct.getItem(0), ROUND).alias("p50"),
        F.round(pct.getItem(1), ROUND).alias("p90"),
        F.round(pct.getItem(2), ROUND).alias("p99"),
        F.count("*").alias("n"),
    )


register(
    "value_percentiles",
    _value_percentiles,
    f"""
SELECT event_type,
  round(quantile_cont(value, 0.5), {ROUND}) AS p50,
  round(quantile_cont(value, 0.9), {ROUND}) AS p90,
  round(quantile_cont(value, 0.99), {ROUND}) AS p99,
  COUNT(*) AS n
FROM events
GROUP BY event_type
""",
)


# -- events: per-user sessionization (session_window; gaps-and-islands twin) -
#
# Spark's native session_window (the SAME operator Structured Streaming
# runs with a watermark for state expiry) merges a user's events into
# sessions; a session's window is [start, last_ts + gap), so an event at
# EXACTLY last_ts + gap begins a new session (gap >= threshold splits —
# pinned by 12 real boundary sessions in the driver data). The DuckDB
# oracle is the classic gaps-and-islands rewrite: flag rows whose lag-gap
# reaches the threshold, running-sum the flags into session ids,
# aggregate. Hash-equality of the two formulations is exactly the
# session-semantics check; floor(epoch()) matches unix_timestamp's
# truncation of fractional seconds.

SESSION_GAP_MIN = 30


def _user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id",
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_timestamp("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


register(
    "user_sessions",
    _user_sessions,
    f"""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER (
                PARTITION BY user_id ORDER BY ts)) >= {SESSION_GAP_MIN * 60}
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id,
       CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM sessions
GROUP BY user_id, session_id
""",
)
