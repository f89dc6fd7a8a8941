from sptag_spark.functions.distance import (  # noqa: F401
    cosine_dist,
    dist_expr,
    dot,
    ip_dist,
    l2_sq,
    norm,
    normalize,
)
