"""Plan inspection and shape assertions (SURVEY §4).

The engine's performance contract is a set of *plan shapes* — filters
pushed to scans, dimensions broadcast, top-k as heaps, no expensive
expressions re-evaluated below a repartition — pinned by tests so a
refactor that silently degrades a plan fails CI, not the cluster.
"""

from cdc_pipeline_spark.plans.inspect import (
    count_op,
    executed_plan,
    hof_filter_below_repartition,
    plan_string,
    pushed_filters,
    read_schemas,
)

__all__ = [
    "plan_string",
    "executed_plan",
    "read_schemas",
    "pushed_filters",
    "count_op",
    "hof_filter_below_repartition",
]
