"""json_schema_spark.operators"""
