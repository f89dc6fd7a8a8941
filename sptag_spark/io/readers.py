"""Vector file-format readers/writers — the reference's ingestion surface.

Reference formats (`inc/Helper/VectorSetReaders/`, `DefinitionList.h:101-109`):
- DEFAULT: header `int32 count, int32 dim`, then count rows of dim packed
  values (`DefaultReader.cpp`).
- XVEC (fvecs/ivecs): per vector `int32 dim` prefix then dim values
  (`XvecReader.h`).
- TXT/TSV: `metadata\\tv1|v2|...\\n` (`TxtReader.h:19-37`), which also yields
  the MetadataSet.

Spark mapping: TSV goes through spark.read.csv (splittable, scales); the
binary formats are decoded with a NumPy kernel over spark.read.format
("binaryFile") — each file is one record, so parallelism is per-file (the
reference's chunked parallel parse is within-file; at 100 TB you'd convert
once to Parquet and never touch the binary format again, which is what
to_parquet_index does).

Value types mirror `DefinitionList.h:6-9` (Int8, UInt8, Int16, Float).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DTYPES = {
    "float32": np.float32,
    "int8": np.int8,
    "uint8": np.uint8,
    "int16": np.int16,
}


def with_positional_ids(df: DataFrame, col: str = "id") -> DataFrame:
    """0-based positional row ids in scan order, WITHOUT funneling the data
    through a single task (a global `Window.orderBy(monotonically_increasing_
    id())` sorts everything into one partition — a non-starter on the main
    ingest path at scale).

    Two jobs over the same deterministic file-split plan:
    1. count rows per partition (tiny result: one row per partition);
    2. id = cumulative base of the partition + the row's within-partition
       counter, recovered from monotonically_increasing_id's layout
       (partition_id << 33 | counter).

    File-based scans plan identical splits for both jobs and preserve
    in-file row order, so the two passes agree — the distributed analog of
    RDD.zipWithIndex, kept in DataFrame land.

    Id order note: ids follow SCAN order — Spark packs file splits largest
    first, so across multiple input files this is not path order (single
    file: identical). Callers needing path-ordered ids across files should
    derive per-file bases from input_file_name() sorted by path, as
    read_binary_vectors does.

    The (pid → base) pairs join back as a small broadcast DataFrame: a
    create_map literal over hundreds of thousands of partitions (100 TB /
    128 MB splits) would build a giant Catalyst expression whose lookup
    degrades to a linear scan once codegen bails out.
    """
    part = df.withColumn("_pid", F.spark_partition_id()).withColumn(
        "_mid", F.monotonically_increasing_id()
    )
    counts = {
        r["_pid"]: r["cnt"]
        for r in part.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    bases, acc = [], 0
    for pid in sorted(counts):
        bases.append((pid, acc))
        acc += counts[pid]
    base_df = df.sparkSession.createDataFrame(bases, "_pid int, _base long")
    return (
        part.join(F.broadcast(base_df), "_pid")
        .withColumn(
            col,
            (
                F.col("_base")
                + F.col("_mid")
                - F.shiftleft(F.col("_pid").cast("long"), 33)
            ).cast("long"),
        )
        .drop("_pid", "_mid", "_base")
    )


def read_tsv_vectors(
    spark: SparkSession, path: str, delimiter: str = "|"
) -> DataFrame:
    """TSV `meta\\tv1|v2|...` → (id, vector, meta). Ids are positional in
    file order (the reference assigns ids by read order)."""
    raw = spark.read.csv(path, sep="\t", schema="meta string, vec string")
    return (
        with_positional_ids(raw)
        .withColumn(
            "vector",
            F.split(F.col("vec"), f"[{delimiter}]").cast("array<float>"),
        )
        .select("id", "vector", "meta")
    )


def write_tsv_vectors(df: DataFrame, path: str, delimiter: str = "|") -> None:
    out = df.orderBy("id").select(
        "meta", F.array_join(F.col("vector").cast("array<string>"), delimiter).alias("vec")
    )
    out.coalesce(1).write.mode("overwrite").option("sep", "\t").csv(path)


# -- binary formats ---------------------------------------------------------


def write_default_bin(rows: np.ndarray, path: str) -> None:
    """DEFAULT format: int32 count, int32 dim, packed rows."""
    n, d = rows.shape
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", n, d))
        f.write(np.ascontiguousarray(rows).tobytes())


def write_default_bin_streamed(
    vectors,
    path: str,
    dtype: str = "float32",
    chunk_rows: int = 65_536,
) -> int:
    """DEFAULT-binary writer that STREAMS a ``(id, vector)`` DataFrame
    through the driver in id order — rows are positional in the format,
    so the sort is the contract. The reference's DEFAULT file is a single
    monolithic blob, but the corpus it packs need not fit driver RAM
    (ADVICE r12: the collect-based fixture writer was the one
    corpus-sized ``.collect()`` reachable from a driver query): one
    footer-count job sizes the header, then ``toLocalIterator`` feeds
    fixed-size chunks straight to disk. → rows written."""
    n = vectors.count()
    it = (
        vectors.select("id", "vector")
        .orderBy("id")
        .toLocalIterator(prefetchPartitions=False)
    )
    written = 0
    dim = 0
    buf: list = []
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", n, 0))  # dim patched after first chunk

        def flush() -> None:
            nonlocal written, dim
            if not buf:
                return
            block = np.array(buf, dtype=dtype)
            if dim == 0:
                dim = int(block.shape[1])
            f.write(np.ascontiguousarray(block).tobytes())
            written += len(buf)
            buf.clear()

        for row in it:
            buf.append(row["vector"])
            if len(buf) >= chunk_rows:
                flush()
        flush()
        f.seek(0)
        f.write(struct.pack("<ii", n, dim))
    if written != n:
        raise RuntimeError(
            f"DEFAULT writer streamed {written} rows but the header "
            f"promised {n} — the source changed mid-write"
        )
    return written


def write_xvec(rows: np.ndarray, path: str) -> None:
    """XVEC: per-vector int32 dim prefix."""
    n, d = rows.shape
    with open(path, "wb") as f:
        for i in range(n):
            f.write(struct.pack("<i", d))
            f.write(np.ascontiguousarray(rows[i]).tobytes())


def _decode_default(content: bytes, dtype: np.dtype) -> np.ndarray:
    n, d = struct.unpack_from("<ii", content, 0)
    arr = np.frombuffer(content, dtype=dtype, offset=8, count=n * d)
    return arr.reshape(n, d)


def _decode_xvec(content: bytes, dtype: np.dtype) -> np.ndarray:
    d = struct.unpack_from("<i", content, 0)[0]
    itemsize = np.dtype(dtype).itemsize
    rec = 4 + d * itemsize
    n = len(content) // rec
    raw = np.frombuffer(content, dtype=np.uint8).reshape(n, rec)
    return raw[:, 4:].copy().view(dtype).reshape(n, d)


def read_binary_vectors(
    spark: SparkSession,
    path: str,
    fmt: str = "default",
    value_type: str = "float32",
) -> DataFrame:
    """Decode DEFAULT/XVEC files under `path` → (id, vector ARRAY<FLOAT>).

    Ids are positional within each file, offset by a stable per-file base
    (files sorted by path; requires a count pass for multi-file inputs).
    Int types upcast to float like the reference's distance kernels do.
    """
    dtype = DTYPES[value_type]
    files = spark.read.format("binaryFile").load(path).select(
        "path", "length", "content"
    )
    decode = _decode_default if fmt == "default" else _decode_xvec
    # Per-file row counts → positional id bases. Only (path, 8 header bytes,
    # length) ever reach the driver — never file CONTENT (collecting content
    # would stream the whole dataset through the driver and OOM it long
    # before 100 TB). DEFAULT carries the count in its header; XVEC's count
    # is file_size / record_size with the dim from its first int32.
    itemsize = np.dtype(dtype).itemsize
    headers = files.select(
        "path", "length", F.substring("content", 1, 8).alias("hdr")
    ).collect()
    counts = {}
    for r in headers:
        hdr = bytes(r["hdr"]) if r["hdr"] is not None else b""
        if len(hdr) < 4:
            raise ValueError(
                f"{r['path']}: file too short for a {fmt} header "
                f"({int(r['length'])} bytes; need >= 4)"
            )
        if fmt == "default":
            counts[r["path"]] = struct.unpack_from("<i", hdr, 0)[0]
        else:
            # XVEC: dim comes from the FIRST record's int32 and every record
            # is assumed to share it (the decoder makes the same assumption,
            # so a ragged file fails loudly there, not silently here)
            d = struct.unpack_from("<i", hdr, 0)[0]
            counts[r["path"]] = int(r["length"]) // (4 + d * itemsize)
    bases = {}
    acc = 0
    for p in sorted(counts):
        bases[p] = acc
        acc += counts[p]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                mat = decode(row["content"], dtype).astype(np.float32)
                base = bases[row["path"]]
                yield pd.DataFrame(
                    {
                        "id": np.arange(base, base + len(mat), dtype=np.int64),
                        "vector": list(mat),
                    }
                )

    return files.mapInPandas(kernel, schema="id long, vector array<float>")


def to_parquet_index(df: DataFrame, path: str) -> None:
    """One-time conversion to the canonical Parquet layout — after this the
    binary formats are never re-read (columnar scans, pushdown, pruning)."""
    df.write.mode("overwrite").option("compression", "zstd").parquet(path)


# -- ground-truth files (Common/TruthSet.h:24-160) --------------------------
#
# DEFAULT truth: int32 numQueries, int32 K, then numQueries*K int32 neighbor
# ids (row-major, rank order). TXT truth: one line per query, ids separated
# by whitespace. The loaded shape is (query_id, rank, id) — the golden-table
# form recall_per_query consumes.


def write_truth_default(ids: np.ndarray, path: str) -> None:
    """ids: (num_queries, k) int32 neighbor matrix in rank order."""
    ids = np.asarray(ids, dtype=np.int32)
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", ids.shape[0], ids.shape[1]))
        f.write(ids.tobytes())


def read_truth_default(spark: SparkSession, path: str) -> DataFrame:
    """DEFAULT truth file → (query_id, rank, id). One file = one record via
    binaryFile (truth files are tiny: queries × k int32s)."""
    bin_df = spark.read.format("binaryFile").load(path)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                nq, k = struct.unpack("<ii", content[:8])
                ids = np.frombuffer(content[8 : 8 + 4 * nq * k], dtype=np.int32)
                ids = ids.reshape(nq, k)
                yield pd.DataFrame(
                    {
                        "query_id": np.repeat(np.arange(nq, dtype=np.int64), k),
                        "rank": np.tile(np.arange(1, k + 1, dtype=np.int64), nq),
                        "id": ids.reshape(-1).astype(np.int64),
                    }
                )

    return bin_df.select("content").mapInPandas(
        kernel, schema="query_id long, rank long, id long"
    )


def write_truth_txt(ids: np.ndarray, path: str) -> None:
    with open(path, "w") as f:
        for row in np.asarray(ids):
            f.write(" ".join(str(int(x)) for x in row) + "\n")


def read_truth_txt(spark: SparkSession, path: str) -> DataFrame:
    """TXT truth file → (query_id, rank, id). Line number = query id (the
    reference's positional convention); splittable text scan + posexplode."""
    lines = spark.read.text(path)
    numbered = with_positional_ids(lines, "query_id")
    return (
        numbered.select(
            "query_id",
            F.posexplode(
                F.filter(F.split(F.trim("value"), r"\s+"), lambda t: t != "")
            ).alias("pos", "id_str"),
        )
        .select(
            F.col("query_id").cast("long"),
            (F.col("pos") + 1).cast("long").alias("rank"),
            F.col("id_str").cast("long").alias("id"),
        )
    )
