"""swiftsoup_spark.clean"""
