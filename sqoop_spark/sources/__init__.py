from sqoop_spark.sources.freeform import (  # noqa: F401
    CONDITIONS_TOKEN,
    bounding_values,
    freeform_query,
)
from sqoop_spark.sources.jdbc import (  # noqa: F401
    JdbcImportPlan,
    build_import_plan,
    jdbc_export,
    jdbc_export_spark,
    jdbc_import,
)
