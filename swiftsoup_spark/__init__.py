"""swiftsoup_spark — a PySpark-native HTML main-content extraction engine.

A from-scratch reimplementation of the *capabilities* of scinfu/SwiftSoup
(WHATWG HTML5 parser, DOM, CSS selector engine, whitelist Cleaner) designed
for Spark: documents are parsed inside Arrow record batches by a
per-document kernel (``swiftsoup_spark.kernel``), DOMs are flat
struct-of-arrays arenas, and selector evaluation is vectorized over arena
columns. The outer dataflow (scan / partition / shuffle / write / metrics)
is plain Spark SQL (``swiftsoup_spark.spark``).

Reference behavior studied from /root/reference (scinfu/SwiftSoup); all
code here is original and Spark-first.
"""

from swiftsoup_spark.api import (parse, parse_fragment, parse_body_fragment, clean,
                                 is_valid, main_content)

__all__ = ["parse", "parse_fragment", "parse_body_fragment", "clean", "is_valid"]
__version__ = "0.1.0"
