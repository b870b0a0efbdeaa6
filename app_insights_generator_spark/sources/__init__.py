from app_insights_generator_spark.sources.readers import (  # noqa: F401
    TPCH_TABLES,
    load_table,
    load_tables,
    read_csv,
    read_json,
)
from app_insights_generator_spark.sources.writers import write_csv, write_parquet  # noqa: F401
