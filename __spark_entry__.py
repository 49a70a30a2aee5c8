"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the declared operator suite from
``apache_pinot_spark.querysuite`` (one entry per SURVEY.md §2 row).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from apache_pinot_spark import querysuite  # noqa: E402
import apache_pinot_spark.suites  # noqa: E402,F401  (registers extended suites)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return querysuite.REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return querysuite.queries()


def oracle_sql() -> dict[str, str]:
    return querysuite.oracle_sql()
