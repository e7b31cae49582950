"""swiftsoup_spark.spark"""
