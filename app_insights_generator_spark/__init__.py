"""app_insights_generator_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first rebuild of the query & data-processing
capabilities of ``grey-h/app-insights-generator`` (see SURVEY.md), plus the
LLM-data-pipeline operator surface (dedup, similarity search, text analysis,
multimodal columns) it never had, designed for 100 TB scale:

- declarative DataFrame/SQL plans (Catalyst handles pushdown/pruning/AQE)
- native grouping-sets instead of a 16,383-query Python loop
- broadcast joins for dims, no ``coalesce(1)`` in the hot path
- Pandas UDFs only where built-ins genuinely can't express the semantics
"""

__version__ = "0.1.0"

from app_insights_generator_spark.session import get_spark  # noqa: F401
from app_insights_generator_spark.config import InsightsConfig  # noqa: F401
