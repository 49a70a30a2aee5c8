"""apache_pinot_spark — a PySpark-native analytics engine with the query
surface of Apache Pinot (reference: /root/reference, a docs mirror of
docs.pinot.apache.org).

Architecture (see SURVEY.md):
  - Storage: columnar Parquet, time-partitioned ("segments"), layout policy
    (sort column / bloom / dictionary) driven by Pinot-style table config.
  - Query: Spark SQL / DataFrame; a thin Python dialect layer rewrites
    Pinot-isms (TOP n, dateTrunc, JSON_MATCH, TEXT_MATCH, MV predicates)
    into Catalyst-optimizable expressions. No JVM extensions.
  - Streaming: Structured Streaming micro-batch == Pinot segment completion.

Everything here is public-knowledge PySpark; nothing is copied from the
reference (which contains no implementation code).
"""

__version__ = "0.1.0"

from apache_pinot_spark.session import get_spark  # noqa: F401
from apache_pinot_spark.catalog import load_tables, TABLES  # noqa: F401
