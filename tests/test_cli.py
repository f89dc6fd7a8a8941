"""CLI parity layer (IndexBuilder / IndexSearcher / Quantizer mains)."""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _write_txt(path, X, prefix):
    with open(path, "w") as f:
        for i, row in enumerate(X):
            f.write(
                f"{prefix}{i}\t" + "|".join(f"{v:.5f}" for v in row) + "\n"
            )


def test_cli_build_search_quantize_roundtrip(spark, tmp_path, capsys):
    from sptag_spark.cli import cmd_build, cmd_quantize, cmd_search

    rng = np.random.default_rng(5)
    X = rng.normal(size=(200, 8)).astype("float32")
    corpus = str(tmp_path / "corpus.tsv")
    queries = str(tmp_path / "queries.tsv")
    _write_txt(corpus, X, "m")
    q_rows = X[[i * 9 for i in range(8)]]
    _write_txt(queries, q_rows, "q")
    # TXT truth: exact self-neighbor first (queries are corpus rows)
    truth = str(tmp_path / "truth.txt")
    D = ((X[:, None, :] - q_rows[None, :, :]) ** 2).sum(-1)  # (n, q)
    with open(truth, "w") as f:
        for j in range(len(q_rows)):
            top = np.lexsort((np.arange(len(X)), D[:, j]))[:5]
            f.write(" ".join(str(int(i)) for i in top) + "\n")

    idx = str(tmp_path / "idx")
    rc = cmd_build(
        argparse.Namespace(
            input=corpus, output=idx, algo="SPANN",
            valuetype="float32", filetype="TXT", delimiter="|",
            overrides=["SelectHead.Ratio=0.2", "Index.ReplicaCount=4"],
        ),
        spark,
    )
    assert rc == 0
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["vectors"] == 200 and built["config"]["replica_count"] == 4
    assert os.path.isdir(os.path.join(idx, "postings"))

    result = str(tmp_path / "result.txt")
    rc = cmd_search(
        argparse.Namespace(
            input=queries, index=idx, truth=truth, result=result,
            k=5, truthk=5, maxcheck=4096, withmeta=True,
            valuetype="float32", filetype="TXT", delimiter="|",
        ),
        spark,
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["queries"] == 8
    assert report["recall_at_k"] >= 0.9, report
    lines = open(result).read().splitlines()
    assert len(lines) == 8 and all(len(l.split("|")) == 5 for l in lines)
    # --withmeta labels neighbors by metadata; query j is corpus row 9j,
    # whose self-hit must lead its line at distance 0
    assert lines[0].split("|")[0].startswith("m0@0.000000")
    assert lines[1].split("|")[0].startswith("m9@0.000000")

    out = str(tmp_path / "pq")
    rc = cmd_quantize(
        argparse.Namespace(
            input=corpus, output=out, qt="PQQuantizer", qd=4,
            valuetype="float32", filetype="TXT", delimiter="|",
        ),
        spark,
    )
    assert rc == 0
    assert os.path.isfile(os.path.join(out, "quantizer", "codebooks.npy"))
    codes = spark.read.parquet(os.path.join(out, "codes"))
    assert codes.count() == 200


def test_cli_bkt_graph_index_roundtrip(spark, tmp_path, capsys):
    from sptag_spark.cli import cmd_build, cmd_search

    rng = np.random.default_rng(9)
    X = rng.normal(size=(150, 6)).astype("float32")
    corpus = str(tmp_path / "c.tsv")
    queries = str(tmp_path / "q.tsv")
    _write_txt(corpus, X, "d")
    _write_txt(queries, X[:5], "q")
    idx = str(tmp_path / "bkt")
    assert cmd_build(
        argparse.Namespace(
            input=corpus, output=idx, algo="BKT",
            valuetype="float32", filetype="TXT", delimiter="|",
            overrides=[],
        ),
        spark,
    ) == 0
    assert os.path.isdir(os.path.join(idx, "graph_edges"))
    capsys.readouterr()
    assert cmd_search(
        argparse.Namespace(
            input=queries, index=idx, truth=None, result=None,
            k=3, truthk=None, maxcheck=None, withmeta=False,
            valuetype="float32", filetype="TXT", delimiter="|",
        ),
        spark,
    ) == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["queries"] == 5 and report["k"] == 3
