from sptag_spark.plans.planner import (  # noqa: F401
    DEFAULT_COST_MODEL,
    CostModel,
    PlannedSearch,
    TopKByDistance,
    plan_topk,
)
