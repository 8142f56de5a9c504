from flight_data_pipeline_spark.functions.scalars import (  # noqa: F401
    age_hours,
    coalesce_falsy,
    default_to,
    parse_iso8601,
)
