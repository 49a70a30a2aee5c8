"""Open-table-format connectors (Delta Lake / Apache Iceberg), gated by
a classpath capability probe.

The segment store's native layout is partitioned parquet
(sources/batch.py); production deployments increasingly keep the
offline half of a hybrid table in a lakehouse table format instead.
Both formats are first-class Spark DataSourceV2 connectors, so reads
land in the same scan machinery (pushdown, pruning, AQE) as the native
parquet path — the engine only needs to (a) detect whether the
connector jar is on the classpath and (b) fail with actionable
guidance when it is not, instead of Spark's raw
DATA_SOURCE_NOT_FOUND.

This container ships neither jar, so the real read/write paths are
exercised by @skipif tests that activate wherever the connectors
exist (same capability-probe pattern as the multimodal decoders,
operators/multimodal.py); the probe and the failure mode are tested
everywhere.
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


def read_lake(spark: SparkSession, path: str, fmt: str) -> DataFrame:
    """Read a Delta/Iceberg table as a DataFrame (path-based). Raises
    RuntimeError with the artifact to add when the connector is not on
    the classpath."""
    _require(spark, fmt)
    return spark.read.format(fmt).load(path)


def write_lake(df: DataFrame, path: str, fmt: str, mode: str = "append") -> None:
    """Write a DataFrame to a Delta/Iceberg table (path-based)."""
    _require(df.sparkSession, fmt)
    df.write.format(fmt).mode(mode).save(path)


def _spec(fmt: str) -> tuple[str, str]:
    try:
        return LAKE_FORMATS[fmt]
    except KeyError:
        raise ValueError(
            f"unknown lake format {fmt!r}; supported: {sorted(LAKE_FORMATS)}"
        ) from None


def _require(spark: SparkSession, fmt: str) -> None:
    cls, artifact = _spec(fmt)
    if not lake_format_available(spark, fmt):
        raise RuntimeError(
            f"lake format {fmt!r} needs its connector on the Spark classpath: "
            f"add {artifact} (probe class {cls} not loadable)"
        )
