from sqoop_spark.streaming.foreach import stream_apply  # noqa: F401
