"""swiftsoup_spark.select"""
