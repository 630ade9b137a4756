from sqoop_spark.sources.debezium import (  # noqa: F401
    envelope_schema,
    parse_debezium,
    parse_debezium_split,
    to_debezium,
)
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
