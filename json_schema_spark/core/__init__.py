"""json_schema_spark.core"""
