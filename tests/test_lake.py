"""Lake-format routing (sources/lake.py): the connector-jar probe, the
native-protocol fallbacks (Delta read/write, Iceberg read), and the
honest reject for natively-unimplementable operations (Iceberg write
without the connector)."""

from __future__ import annotations

import pytest

from apache_pinot_spark.sources import lake as L


def test_probe_reports_each_format(spark):
    avail = L.available_formats(spark)
    assert set(avail) == {"delta", "iceberg"}
    assert all(isinstance(v, bool) for v in avail.values())


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError, match="unknown lake format"):
        L.read_lake(spark, "/nowhere", "hudi")


def test_delta_round_trip_regardless_of_jar(spark, tmp_path):
    """Delta works EVERYWHERE now: connector when present, the native
    transaction-log implementation otherwise."""
    df = spark.range(10).withColumnRenamed("id", "k")
    L.write_lake(df, str(tmp_path / "d"), "delta", mode="append")
    back = L.read_lake(spark, str(tmp_path / "d"), "delta")
    assert sorted(r["k"] for r in back.collect()) == list(range(10))


def test_iceberg_round_trip_regardless_of_jar(spark, tmp_path):
    """Iceberg works everywhere too: connector when present, the native
    v2 snapshot writer + manifest-walk reader otherwise."""
    df = spark.range(7).withColumnRenamed("id", "k")
    L.write_lake(df, str(tmp_path / "i"), "iceberg", mode="append")
    back = L.read_lake(spark, str(tmp_path / "i"), "iceberg")
    assert sorted(r["k"] for r in back.collect()) == list(range(7))


@pytest.mark.parametrize("fmt", ["delta", "iceberg"])
def test_connector_round_trip_when_jar_present(spark, tmp_path, fmt):
    if not L.lake_format_available(spark, fmt):
        pytest.skip(f"{fmt} connector not on classpath in this environment")
    df = spark.range(10).withColumnRenamed("id", "k")
    L.write_lake(df, str(tmp_path / fmt), fmt, mode="overwrite")
    back = L.read_lake(spark, str(tmp_path / fmt), fmt)
    assert sorted(r["k"] for r in back.collect()) == list(range(10))
