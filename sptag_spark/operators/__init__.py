from sptag_spark.operators.knn import knn, knn_brute_expr  # noqa: F401
