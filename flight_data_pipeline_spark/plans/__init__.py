from flight_data_pipeline_spark.plans.registry import (  # noqa: F401
    QUERIES,
    ORACLE_SQL,
    query,
)
