"""Pinot-compatible function packages, implemented as compositions of
built-in pyspark.sql.functions (JVM-side, codegen-friendly). No Python UDFs
in any hot path."""

from apache_pinot_spark.functions.text import text_match, text_contains, tokens_expr  # noqa: F401
from apache_pinot_spark.functions.json import json_match, json_extract_scalar, infer_json_schema  # noqa: F401
from apache_pinot_spark.functions.datetime import date_trunc_millis, from_datetime  # noqa: F401
from apache_pinot_spark.functions.hll import hll_estimate_sql, hll_sketch_sql, hll_merge_estimate_sql  # noqa: F401
from apache_pinot_spark.functions.quantile import histogram_sketch_sql, histogram_merge_sql, estimate_percentile  # noqa: F401
