"""json_schema_spark.plans"""
