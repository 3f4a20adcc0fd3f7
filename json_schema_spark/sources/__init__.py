"""json_schema_spark.sources"""
