"""json_schema_spark.functions"""
