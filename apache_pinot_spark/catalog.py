"""Table registration over the driver's parquet test tables.

In Pinot terms (reference basics/Concepts.md:9-25): each parquet file is a
TABLE whose row-groups play the role of SEGMENTS; registering it as a temp
view is the broker "routing table" entry. The full Pinot-style schema/
table-config catalog (sentinel nulls, datetime formats, layout policy)
lives in plans/schema.py; this module is the fast path used by the query
suite and bench.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from apache_pinot_spark.session import configure

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_tables(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> dict[str, DataFrame]:
    """Register each parquet table as a temp view; returns name → DataFrame.

    Reads are lazy: Catalyst prunes columns and pushes filters into the
    parquet scan, so registering all tables costs only file-footer reads.
    """
    configure(spark)
    # events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 refuses natively;
    # read nanos as LONG and rebuild a microsecond timestamp (Pinot stores
    # time as LONG epoch anyway — reference configuration-reference/schema.md:69).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out: dict[str, DataFrame] = {}
    for name in tables or TABLES:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
