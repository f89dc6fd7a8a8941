from sptag_spark.plans.planner import (  # noqa: F401
    PlannedSearch,
    TopKByDistance,
    plan_topk,
)
