"""Lake-format capability gate (sources/lake.py): probe behavior, the
actionable failure mode, and — wherever a connector jar actually exists
on the classpath — a real round-trip."""

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


def test_missing_connector_error_names_the_artifact(spark, tmp_path):
    for fmt in ("delta", "iceberg"):
        if L.lake_format_available(spark, fmt):
            continue  # covered by the round-trip test instead
        with pytest.raises(RuntimeError) as ei:
            L.read_lake(spark, str(tmp_path), fmt)
        msg = str(ei.value)
        assert fmt in msg and "classpath" in msg
        # the message must carry the artifact coordinate, not just "missing"
        assert ":" in msg.split("add ", 1)[1]


@pytest.mark.parametrize("fmt", ["delta", "iceberg"])
def test_lake_round_trip_when_connector_present(spark, tmp_path, fmt):
    if not L.lake_format_available(spark, fmt):
        pytest.skip(f"{fmt} connector not on classpath in this environment")
    df = spark.range(10).withColumnRenamed("id", "k")
    L.write_lake(df, str(tmp_path / fmt), fmt, mode="overwrite")
    back = L.read_lake(spark, str(tmp_path / fmt), fmt)
    assert sorted(r["k"] for r in back.collect()) == list(range(10))
