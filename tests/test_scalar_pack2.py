"""Round-6 scalar pack II: JSONPATH family, epoch-millis datetime
extractors (Joda dayOfWeek convention, tz arg, dual typeof branch so
Spark date/timestamp usage keeps its meaning), typed MV array
transforms, SPLIT literal-delimiter semantics, HAMMINGDISTANCE,
REMOVE, NORMALIZE, URL aliases."""

from __future__ import annotations

import datetime as dt

import pytest

from apache_pinot_spark.sqlfront import PinotEngine

pytestmark = pytest.mark.slow  # excluded from the default driver-verify lane (see pytest.ini)


@pytest.fixture(scope="module")
def eng(spark):
    e = PinotEngine(spark)
    e.register(
        "sc2",
        spark.createDataFrame(
            [
                (
                    1,
                    '{"a": {"b": 3.7, "s": "hi", "arr": [1, 2, 3]}}',
                    1577836800000,  # 2020-01-01T00:00:00Z (a Wednesday)
                    "a.b.c",
                    [3, 1, 2, 1],
                )
            ],
            "id int, js string, ms long, txt string, mv array<int>",
        ),
    )
    return e


def _one(eng, expr):
    return eng.sql(f"SELECT {expr} AS v FROM sc2").collect()[0]["v"]


def test_jsonpath_family(eng):
    assert _one(eng, "JSONPATH(js, '$.a.s')") == "hi"
    assert _one(eng, "JSONPATHSTRING(js, '$.a.s')") == "hi"
    assert _one(eng, "JSONPATHSTRING(js, '$.a.zz', 'dflt')") == "dflt"
    # long coerces through double: (long) 3.7 == 3
    assert _one(eng, "JSONPATHLONG(js, '$.a.b')") == 3
    assert _one(eng, "JSONPATHLONG(js, '$.a.zz')") == -(1 << 63)
    assert _one(eng, "JSONPATHLONG(js, '$.a.zz', 42)") == 42
    assert _one(eng, "JSONPATHDOUBLE(js, '$.a.b')") == pytest.approx(3.7)
    assert _one(eng, "JSONPATHDOUBLE(js, '$.a.zz')") == float("-inf")
    assert _one(eng, "JSONPATHARRAY(js, '$.a.arr')") == ["1", "2", "3"]


def test_epoch_millis_datetime_extractors(eng):
    # 2020-01-01T00:00:00Z was a Wednesday (Joda dayOfWeek = 3)
    assert _one(eng, "YEAR(ms)") == 2020
    assert _one(eng, "MONTH(ms)") == 1
    assert _one(eng, "MONTHOFYEAR(ms)") == 1
    assert _one(eng, "DAYOFMONTH(ms)") == 1
    assert _one(eng, "DAYOFWEEK(ms)") == 3
    assert _one(eng, "DOW(ms)") == 3
    assert _one(eng, "HOUR(ms)") == 0
    assert _one(eng, "MINUTE(ms)") == 0
    assert _one(eng, "MILLISECOND(ms + 123)") == 123
    assert _one(eng, "QUARTER(ms)") == 1
    assert _one(eng, "WEEKOFYEAR(ms)") == 1
    assert _one(eng, "YEAROFWEEK(ms)") == 2020
    assert _one(eng, "DAYOFYEAR(ms)") == 1
    # timezone argument shifts the reading (UTC midnight = previous
    # evening in New York — Tuesday, Joda 2)
    assert _one(eng, "YEAR(ms, 'America/New_York')") == 2019
    assert _one(eng, "DAYOFWEEK(ms, 'America/New_York')") == 2
    assert _one(eng, "HOUR(ms, 'America/New_York')") == 19
    # Joda range check across a full week
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)  # a Monday
    for i in range(7):
        millis = int((base + dt.timedelta(days=i)).timestamp() * 1000)
        got = _one(eng, f"DAYOFWEEK(ms * 0 + {millis})")
        assert got == i + 1
    # Spark semantics preserved for date/timestamp input (ELSE branch)
    assert _one(eng, "YEAR(DATE'2023-05-04')") == 2023
    assert _one(eng, "HOUR(TIMESTAMP'2023-05-04 07:08:09')") == 7


def test_typed_mv_array_family(eng):
    assert _one(eng, "ARRAYREVERSEINT(mv)") == [1, 2, 1, 3]
    assert _one(eng, "ARRAYDISTINCTINT(mv)") == [3, 1, 2]
    assert _one(eng, "ARRAYSORTINT(mv)") == [1, 1, 2, 3]
    assert _one(eng, "ARRAYUNIONINT(mv, mv)") == [3, 1, 2]
    assert _one(eng, "ARRAYCONCATINT(mv, mv)") == [3, 1, 2, 1, 3, 1, 2, 1]
    assert _one(eng, "ARRAYCONTAINSINT(mv, 2)") is True
    assert _one(eng, "ARRAYINDEXOFINT(mv, 2)") == 2  # 0-based
    assert _one(eng, "ARRAYINDEXOFINT(mv, 9)") == -1
    assert _one(eng, "ARRAYSLICEINT(mv, 1, 3)") == [1, 2]  # 0-based, excl
    assert _one(eng, "ARRAYSORTSTRING(ARRAYCONCATSTRING(array('b'), array('a')))") == ["a", "b"]


def test_split_remove_hamming_normalize_urls(eng):
    # literal-dot delimiter (regex split would explode every char)
    assert _one(eng, "SPLIT(txt, '.')") == ["a", "b", "c"]
    assert _one(eng, "SPLIT('x||y', '||')") == ["x", "y"]
    assert _one(eng, "REMOVE(txt, '.')") == "abc"
    assert _one(eng, "HAMMINGDISTANCE('karolin', 'kathrin')") == 3
    assert _one(eng, "HAMMINGDISTANCE('abc', 'abcd')") == -1
    assert _one(eng, "HAMMINGDISTANCE('', '')") == 0
    # NFC vs NFD: e + combining acute == é after NFC
    assert _one(eng, "NORMALIZE('é')") == "é"
    assert _one(eng, "NORMALIZE('é', 'NFD')") == "é"
    with pytest.raises(ValueError, match="unknown form"):
        eng.rewrite("SELECT NORMALIZE(txt, 'NFX') FROM sc2")
    assert _one(eng, "URLENCODE('a b')") == "a+b"
    assert _one(eng, "URLDECODE('a+b')") == "a b"


def test_duckdb_differentials(eng, duck):
    """Cross-engine value checks where DuckDB has the same primitive."""
    import json

    cases = [
        # DuckDB's decimal->bigint cast ROUNDS; the public (long) coercion
        # truncates — trunc first so the oracle states the same semantic
        ("JSONPATHLONG(js, '$.a.b')", "SELECT CAST(trunc(3.7) AS BIGINT)"),
        ("YEAR(ms)", "SELECT year(to_timestamp(1577836800000 / 1000))"),
        (
            "DAYOFWEEK(ms)",
            "SELECT isodow(to_timestamp(1577836800000 / 1000))",
        ),
        ("HAMMINGDISTANCE('abcde', 'abcxe')", "SELECT hamming('abcde','abcxe')"),
        ("WEEKOFYEAR(ms)", "SELECT weekofyear(to_timestamp(1577836800000 / 1000))"),
        ("QUARTER(ms)", "SELECT quarter(to_timestamp(1577836800000 / 1000))"),
        ("DAYOFYEAR(ms)", "SELECT dayofyear(to_timestamp(1577836800000 / 1000))"),
        ("MILLISECOND(ms + 789)", "SELECT 789"),
        ("REMOVE('a.b.c', '.')", "SELECT replace('a.b.c', '.', '')"),
        ("ARRAYINDEXOFINT(mv, 2)", "SELECT list_position([3,1,2,1], 2) - 1"),
        ("HOUR(ms + 3600000 * 5)", "SELECT hour(to_timestamp(1577836800 + 3600 * 5))"),
        ("YEAROFWEEK(ms)", "SELECT isoyear(to_timestamp(1577836800000 / 1000))"),
    ]
    for spark_expr, duck_sql in cases:
        got = _one(eng, spark_expr)
        want = duck.sql(duck_sql).fetchone()[0]
        assert got == want, (spark_expr, got, want)
    # SPLIT literal-delimiter semantics vs DuckDB string_split
    assert _one(eng, "SPLIT('a.b.c', '.')") == list(
        duck.sql("SELECT string_split('a.b.c', '.')").fetchone()[0]
    )


def test_typed_array_variants_all_types(eng):
    """Every TYPE suffix of the arrayFooTYPE families maps to the same
    Spark form; evaluate one row per type so the whole matrix is
    exercised (names written out for the handler-coverage meta-guard):
    ARRAYREVERSELONG ARRAYREVERSEFLOAT ARRAYREVERSEDOUBLE
    ARRAYREVERSESTRING ARRAYDISTINCTLONG ARRAYDISTINCTFLOAT
    ARRAYDISTINCTDOUBLE ARRAYDISTINCTSTRING ARRAYSORTLONG ARRAYSORTFLOAT
    ARRAYSORTDOUBLE ARRAYSORTSTRING ARRAYUNIONLONG ARRAYUNIONFLOAT
    ARRAYUNIONDOUBLE ARRAYUNIONSTRING ARRAYCONCATLONG ARRAYCONCATFLOAT
    ARRAYCONCATDOUBLE ARRAYCONCATSTRING ARRAYCONTAINSLONG
    ARRAYCONTAINSFLOAT ARRAYCONTAINSDOUBLE ARRAYCONTAINSSTRING
    ARRAYINDEXOFLONG ARRAYINDEXOFFLOAT ARRAYINDEXOFDOUBLE
    ARRAYINDEXOFSTRING ARRAYSLICELONG ARRAYSLICEFLOAT ARRAYSLICEDOUBLE
    ARRAYSLICESTRING, and DOY."""
    casts = {
        "LONG": "CAST(mv AS ARRAY<BIGINT>)",
        "FLOAT": "CAST(mv AS ARRAY<FLOAT>)",
        "DOUBLE": "CAST(mv AS ARRAY<DOUBLE>)",
        "STRING": "CAST(mv AS ARRAY<STRING>)",
    }
    for t, arr in casts.items():
        two = "'2'" if t == "STRING" else "2"
        assert [int(float(x)) for x in _one(eng, f"ARRAYREVERSE{t}({arr})")] == [
            1, 2, 1, 3,
        ]
        assert len(_one(eng, f"ARRAYDISTINCT{t}({arr})")) == 3
        assert [int(float(x)) for x in _one(eng, f"ARRAYSORT{t}({arr})")] == [1, 1, 2, 3]
        assert len(_one(eng, f"ARRAYUNION{t}({arr}, {arr})")) == 3
        assert len(_one(eng, f"ARRAYCONCAT{t}({arr}, {arr})")) == 8
        assert _one(eng, f"ARRAYCONTAINS{t}({arr}, {two})") is True
        assert _one(eng, f"ARRAYINDEXOF{t}({arr}, {two})") == 2
        assert [int(float(x)) for x in _one(eng, f"ARRAYSLICE{t}({arr}, 0, 2)")] == [3, 1]
        # ARRAYELEMENTATLONG ARRAYELEMENTATFLOAT ARRAYELEMENTATDOUBLE
        # ARRAYELEMENTATSTRING ARRAYELEMENTATINT: direct 0-based index
        assert int(float(_one(eng, f"ARRAYELEMENTAT{t}({arr}, 1)"))) == 1
        assert _one(eng, f"ARRAYELEMENTAT{t}({arr}, 9)") is None  # OOB -> NULL
    assert _one(eng, "ARRAYELEMENTATINT(mv, 0)") == 3
    assert _one(eng, "DOY(ms)") == 1


def test_json_extract_key_format_and_camelcase(eng):
    """jsonExtractKey returns the keys at a path; jsonFormat renders
    complex values as JSON text; JSONEXTRACTSCALAR (the camelCase
    public spelling, uppercased) reaches the same handler as
    JSON_EXTRACT_SCALAR."""
    assert sorted(_one(eng, "JSONEXTRACTKEY(js, '$.a')")) == ["arr", "b", "s"]
    assert _one(eng, "JSONFORMAT(mv)") == "[3,1,2,1]"
    assert (
        _one(eng, "JSONEXTRACTSCALAR(js, '$.a.s', 'STRING')")
        == _one(eng, "JSON_EXTRACT_SCALAR(js, '$.a.s', 'STRING')")
        == "hi"
    )
