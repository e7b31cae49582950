"""swiftsoup_spark.kernel"""
