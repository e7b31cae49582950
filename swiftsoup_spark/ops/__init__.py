"""swiftsoup_spark.ops"""
