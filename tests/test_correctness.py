"""Mirror of the driver's correctness gate: run every REGISTRY query on
Spark and its oracle on DuckDB over the same parquet tables, then compare
row count, column names, and values (exactly for ints/strings, to 1e-9
relative for floats — the driver hashes, so we additionally assert exact
equality of stringified values to catch last-ulp drift early)."""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_CORRECTNESS

pytestmark = pytest.mark.slow  # excluded from the default driver-verify lane (see pytest.ini)


def _canon(df_pandas):
    """Sort columns by name, rows by all values → list of tuples."""
    cols = sorted(df_pandas.columns)
    out = df_pandas[cols]
    rows = [tuple(r) for r in out.itertuples(index=False, name=None)]
    return cols, sorted(rows, key=lambda r: tuple(str(x) for x in r))


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b or abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return str(a) == str(b)


def _all_query_names():
    import apache_pinot_spark.suites  # noqa: F401
    from apache_pinot_spark.querysuite import REGISTRY

    return sorted(REGISTRY)


@pytest.mark.parametrize("name", _all_query_names())
def test_query_matches_oracle(name, spark, duck):
    import apache_pinot_spark.suites  # noqa: F401
    from apache_pinot_spark.querysuite import REGISTRY

    q = REGISTRY[name]
    sdf = q.fn(spark, SF_CORRECTNESS).toPandas()
    if q.oracle is None:
        assert len(sdf) >= 0  # rows-only check, mirrors driver's weak gate
        return
    odf = duck.sql(q.oracle).df()

    assert len(sdf) == len(odf), f"{name}: row count {len(sdf)} vs oracle {len(odf)}"
    scols, srows = _canon(sdf)
    ocols, orows = _canon(odf)
    assert scols == ocols, f"{name}: columns {scols} vs oracle {ocols}"
    mismatches = []
    exact = True
    for i, (sr, orow) in enumerate(zip(srows, orows)):
        for c, (sv, ov) in zip(scols, zip(sr, orow)):
            if not _values_equal(sv, ov):
                mismatches.append((i, c, sv, ov))
            elif str(sv) != str(ov) and not (
                isinstance(sv, float) and isinstance(ov, float) and sv == ov
            ):
                exact = False
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"
    assert exact, f"{name}: values equal but stringified forms differ (hash risk)"


def test_registry_is_exactly_the_driver_window():
    """The driver's correctness ledger covers the FIRST 50 registered
    queries; a 51st registration silently loses its ledger row (bit us in
    rounds 1 and 3). Every declared query must be inside the window and
    oracle-backed."""
    import apache_pinot_spark.suites  # noqa: F401
    from apache_pinot_spark.querysuite import REGISTRY

    assert len(REGISTRY) == 50, (
        f"declared suite must be exactly the driver's 50-query window, got "
        f"{len(REGISTRY)}: trim or fold (see suites/__init__.py)"
    )
    no_oracle = [n for n, q in REGISTRY.items() if q.oracle is None]
    assert no_oracle == [], f"queries without a DuckDB oracle: {no_oracle}"
