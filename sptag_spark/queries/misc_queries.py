"""Driver queries: multimodal plumbing and result-iterator paging."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sptag_spark.multimodal import attach_fake_media, decode_media
from sptag_spark.operators.iterator import ResultIterator
from sptag_spark.queries.knn_queries import ROUND, knn_oracle_sql
from sptag_spark.registry import register
from sptag_spark.tables import load_table, queries_table, vectors_table


def _multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    media = attach_fake_media(docs)
    decoded = decode_media(media, mode="fake")
    # features → one rounded column for hashing (arrays hash awkwardly in
    # some drivers; first feature component is representative)
    return decoded.select(
        F.col("id").alias("doc_id"),
        "width",
        "height",
        "n_pixels",
        F.round(F.element_at("feat", 1).cast("double"), ROUND).alias("feat0"),
    )


# The fake decode is md5-closed-form, so the oracle can replicate it exactly:
# width = 1 + hex[0:2] % 64, height = 1 + hex[2:4] % 64, feat0 = hex[4:6]/255.
_HEX_AT = (
    "(instr('0123456789abcdef', substring(h, {i}, 1)) - 1) * 16 + "
    "(instr('0123456789abcdef', substring(h, {j}, 1)) - 1)"
)

register(
    "multimodal_decode",
    _multimodal_decode,
    f"""
WITH hashed AS (
  SELECT doc_id, md5(text) AS h FROM documents
)
SELECT doc_id,
  CAST(1 + ({_HEX_AT.format(i=1, j=2)}) % 64 AS INT) AS width,
  CAST(1 + ({_HEX_AT.format(i=3, j=4)}) % 64 AS INT) AS height,
  CAST((1 + ({_HEX_AT.format(i=1, j=2)}) % 64) * (1 + ({_HEX_AT.format(i=3, j=4)}) % 64) AS BIGINT) AS n_pixels,
  round(CAST(CAST(({_HEX_AT.format(i=5, j=6)}) / 255.0 AS FLOAT) AS DOUBLE), {ROUND}) AS feat0
FROM hashed
""",
)


def _iterator_page2(spark: SparkSession, sf_dir: str) -> DataFrame:
    it = ResultIterator(
        vectors_table(spark, sf_dir), queries_table(spark, sf_dir), max_results=20
    )
    it.next_batch(10)  # consume page 1
    page2 = it.next_batch(10)
    return page2.select(
        "query_id", "rank", "id", F.round("dist", ROUND).alias("dist")
    )


register(
    "result_iterator_page2",
    _iterator_page2,
    knn_oracle_sql("l2", k=20).replace(
        "WHERE rank <= 20", "WHERE rank BETWEEN 11 AND 20"
    ),
)


def _frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sptag_spark.multimodal import frame_sample_plan

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    media = attach_fake_media(docs)
    frames = frame_sample_plan(media, every_n=10)
    return frames.select(
        F.col("id").alias("doc_id"), F.col("frame_no").cast("int").alias("frame_no")
    )


# Fake frame count is closed-form over the payload length (UTF-8 octets), so
# the sampling grid is SQL-expressible: frames 0, 10, ... < n_frames.
register(
    "multimodal_frame_sample",
    _frame_sample,
    """
WITH m AS (
  SELECT doc_id, octet_length(encode(text)) % 300 + 1 AS n_frames
  FROM documents
)
SELECT doc_id, CAST(u.f AS INT) AS frame_no
FROM m, UNNEST(range(0, n_frames, 10)) AS u(f)
""",
)
