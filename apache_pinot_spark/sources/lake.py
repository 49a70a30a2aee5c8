"""Open-table-format connectors (Delta Lake / Apache Iceberg).

Two tiers:

  * **Connector jar present** (a real cluster): reads/writes go through
    the first-class DataSourceV2 connector — full pushdown, pruning,
    AQE, and the connector's own commit protocols.
  * **Jar absent** (this container, and any pyspark-only install): the
    NATIVE implementations take over — sources/delta.py implements the
    published Delta transaction-log protocol (read + single-writer
    write, time travel, checkpoints, metadata-level partition pruning)
    and sources/iceberg.py implements the Iceberg table spec read path
    (metadata JSON → Avro manifests → parquet scan, v2 position
    deletes). Both operate on plain parquet + metadata files, so tables
    interop with the real connectors in both directions.

The probe stays: `lake_format_available` tells which tier will serve,
and `read_lake`/`write_lake` route automatically. Both native writers
are single-writer per table (atomic O_EXCL metadata commits);
multi-cluster coordination needs the connector + a real catalog, and
the writers' docstrings say so rather than silently degrading.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: format name → (probe class, artifact hint for the error message)
LAKE_FORMATS: dict[str, tuple[str, str]] = {
    "delta": (
        "org.apache.spark.sql.delta.sources.DeltaDataSource",
        "io.delta:delta-spark_2.13 (+ spark.sql.extensions="
        "io.delta.sql.DeltaSparkSessionExtension)",
    ),
    "iceberg": (
        "org.apache.iceberg.spark.source.IcebergSource",
        "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13 (+ catalog conf "
        "spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog)",
    ),
}


def lake_format_available(spark: SparkSession, fmt: str) -> bool:
    """True iff the connector's DataSource class is loadable in the
    driver JVM. Probing the class is cheap and side-effect free (no
    path is touched, no session conf is required)."""
    cls, _ = _spec(fmt)
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(cls)  # noqa: SLF001
        return True
    except Exception:
        return False


def available_formats(spark: SparkSession) -> dict[str, bool]:
    return {f: lake_format_available(spark, f) for f in LAKE_FORMATS}


def read_lake(spark: SparkSession, path: str, fmt: str,
              **native_kwargs) -> DataFrame:
    """Read a Delta/Iceberg table (path-based): connector when the jar
    is on the classpath, native protocol implementation otherwise.
    ``native_kwargs`` (version=..., timestamp_ms=..., partition_filter=)
    reach the native readers' time-travel/pruning knobs."""
    _spec(fmt)
    if lake_format_available(spark, fmt):
        return spark.read.format(fmt).load(path)
    if fmt == "delta":
        from apache_pinot_spark.sources.delta import read_delta

        return read_delta(spark, path, **native_kwargs)
    from apache_pinot_spark.sources.iceberg import read_iceberg

    return read_iceberg(spark, path, **native_kwargs)


def write_lake(df: DataFrame, path: str, fmt: str, mode: str = "append",
               **native_kwargs) -> None:
    """Write a DataFrame to a Delta/Iceberg table (path-based):
    connector when the jar is on the classpath, native protocol
    implementation otherwise (Delta transaction log / Iceberg v2
    HadoopCatalog-style snapshots — both single-writer per table)."""
    _spec(fmt)
    spark = df.sparkSession
    if lake_format_available(spark, fmt):
        df.write.format(fmt).mode(mode).save(path)
        return
    if fmt == "delta":
        from apache_pinot_spark.sources.delta import write_delta

        write_delta(df, path, mode=mode, **native_kwargs)
        return
    from apache_pinot_spark.sources.iceberg import write_iceberg

    write_iceberg(df, path, mode=mode, **native_kwargs)


def _spec(fmt: str) -> tuple[str, str]:
    try:
        return LAKE_FORMATS[fmt]
    except KeyError:
        raise ValueError(
            f"unknown lake format {fmt!r}; supported: {sorted(LAKE_FORMATS)}"
        ) from None
