from sqoop_spark.sources.freeform import (  # noqa: F401
    CONDITIONS_TOKEN,
    bounding_values,
    freeform_query,
)
