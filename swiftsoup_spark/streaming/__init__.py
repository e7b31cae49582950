"""swiftsoup_spark.streaming"""
