"""SSDServing pipeline: INI-driven SelectHead → BuildHead → BuildSSDIndex →
SearchSSDIndex end-to-end (main.h:12-25, docs/GettingStart.md buildconfig)."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from sptag_spark.io.readers import write_truth_default
from sptag_spark.operators.knn import knn
from sptag_spark.ssd_serving import boot_program
from sptag_spark.tables import vectors_table

INI_TEMPLATE = """
[Base]
ValueType=Float
DistCalcMethod=L2
IndexAlgoType=BKT
VectorPath={vec_path}
VectorType=PARQUET
QueryPath={query_path}
QueryType=PARQUET
TruthPath={truth_path}
TruthType=DEFAULT
IndexDirectory={index_dir}

[SelectHead]
isExecute=true
BKTKmeansK=8
BKTLeafSize=8
SelectThreshold=12
Ratio=0.12

[BuildHead]
isExecute=true

[BuildSSDIndex]
isExecute=true
ReplicaCount=8
PostingPageLimit=1

[SearchSSDIndex]
isExecute=true
SearchInternalResultNum=10
ResultNum=10
MaxDistRatio=8.0
SearchResult=result.parquet
"""


@pytest.fixture(scope="module")
def pipeline_run(spark, sf_dir, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ssdserving")
    vec_path = str(tmp / "vectors.parquet")
    query_path = str(tmp / "queries.parquet")
    truth_path = str(tmp / "truth.bin")
    index_dir = str(tmp / "index")
    vectors = vectors_table(spark, sf_dir).select("id", "vector")
    vectors.write.parquet(vec_path)
    # queries MUST have positional ids 0..nq-1: DEFAULT truth files address
    # queries by row position (TruthSet.h layout)
    qrows = vectors.filter(F.col("id") % 25 == 0).orderBy("id").collect()
    queries = spark.createDataFrame(
        [(i, list(map(float, r["vector"]))) for i, r in enumerate(qrows)],
        "query_id long, vector array<float>",
    )
    queries.write.parquet(query_path)
    truth_rows = knn(vectors, queries, k=10).collect()
    mat = np.zeros((len(qrows), 10), dtype=np.int32)
    for r in truth_rows:
        mat[r["query_id"], r["rank"] - 1] = r["id"]
    write_truth_default(mat, truth_path)
    ini = tmp / "buildconfig.ini"
    ini.write_text(
        INI_TEMPLATE.format(
            vec_path=vec_path, query_path=query_path,
            truth_path=truth_path, index_dir=index_dir,
        )
    )
    out = boot_program(spark, str(ini))
    return out, index_dir, len(qrows)


def test_all_stages_ran(pipeline_run):
    out, index_dir, _ = pipeline_run
    assert set(out["stages"]) == {
        "SelectHead", "BuildHead", "BuildSSDIndex", "SearchSSDIndex",
    }
    assert os.path.exists(os.path.join(index_dir, "heads.parquet"))
    assert os.path.exists(os.path.join(index_dir, "postings"))
    assert os.path.exists(os.path.join(index_dir, "result.parquet"))
    # postings written partitioned by head_id (the SSD-seek layout)
    assert any(
        d.startswith("head_id=")
        for d in os.listdir(os.path.join(index_dir, "postings"))
    )


def test_search_results_and_recall(pipeline_run):
    out, _, nq = pipeline_run
    assert out["results"].count() == nq * 10
    assert out["recall"] >= 0.9, out["recall"]
    assert out["mrr"] == 1.0  # queries are base vectors → self-hit


def test_config_dict_overrides(spark, sf_dir, tmp_path):
    """BootProgram's config_map parameter: run head selection only."""
    vec_path = str(tmp_path / "v.parquet")
    vectors_table(spark, sf_dir).select("id", "vector").write.parquet(vec_path)
    out = boot_program(
        spark,
        config={
            "Base": {"VectorPath": vec_path, "DistCalcMethod": "L2",
                     "IndexDirectory": str(tmp_path / "idx")},
            "SelectHead": {"isExecute": "true", "Ratio": "0.12"},
        },
    )
    assert set(out["stages"]) == {"SelectHead"}
    assert out["n_heads"] > 0
