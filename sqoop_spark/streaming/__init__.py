from sqoop_spark.streaming.changelog import (  # noqa: F401
    apply_changes,
    follow_changes,
    iter_changes,
    replicate_to_table,
)
from sqoop_spark.streaming.foreach import stream_apply  # noqa: F401
from sqoop_spark.streaming.stateful import latest_state_stream  # noqa: F401
