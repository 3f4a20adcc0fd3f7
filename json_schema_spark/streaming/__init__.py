"""json_schema_spark.streaming"""
