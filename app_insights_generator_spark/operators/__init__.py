from app_insights_generator_spark.operators.cleaning import cast_to_int, range_filter  # noqa: F401
from app_insights_generator_spark.operators.bucketing import bucketize  # noqa: F401
from app_insights_generator_spark.operators.insights import insight_query, prepare  # noqa: F401
from app_insights_generator_spark.operators.sweep import (  # noqa: F401
    sweep_loop,
    sweep_grouping_sets,
)
