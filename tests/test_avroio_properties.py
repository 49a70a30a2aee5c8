"""Property-based fuzz of the Avro codec (sources/avroio.py) with
hypothesis: random schemas + random conforming values must round-trip
byte-decode-exactly through write_container/read_container, and random
byte mutations must never escape AvroError (bounded, exception-clean —
the house mutation contract)."""

from __future__ import annotations

import json
import math

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from apache_pinot_spark.sources import avroio as A  # noqa: E402

pytestmark = pytest.mark.slow  # excluded from the default driver-verify lane (see pytest.ini)

# -- schema/value strategy pairs (recursion-bounded) -----------------------

_names = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,8}", fullmatch=True)


def _leaf():
    return st.sampled_from([
        ("null", st.none()),
        ("boolean", st.booleans()),
        ("int", st.integers(-2**31, 2**31 - 1)),
        ("long", st.integers(-2**63, 2**63 - 1)),
        ("double", st.floats(allow_nan=False, allow_infinity=False,
                             width=64)),
        ("string", st.text(max_size=20)),
        ("bytes", st.binary(max_size=20)),
    ])


@st.composite
def _schema_and_value(draw, depth=0):
    kinds = ["leaf", "union"]
    if depth < 2:
        kinds += ["record", "array", "map"]
    kind = draw(st.sampled_from(kinds))
    if kind == "leaf":
        schema, vs = draw(_leaf())
        return schema, draw(vs)
    if kind == "union":
        schema, vs = draw(_leaf())
        if schema == "null":
            schema, vs = "string", st.text(max_size=10)
        if draw(st.booleans()):
            return ["null", schema], None
        return ["null", schema], draw(vs)
    if kind == "record":
        n = draw(st.integers(1, 3))
        fields, value = [], {}
        used = set()
        for _ in range(n):
            fname = draw(_names.filter(lambda s: s not in used))
            used.add(fname)
            fs, fv = draw(_schema_and_value(depth=depth + 1))
            fields.append({"name": fname, "type": fs})
            value[fname] = fv
        rec_name = draw(_names) + f"R{depth}"
        return ({"type": "record", "name": rec_name, "fields": fields},
                value)
    if kind == "array":
        inner_schema, vs = draw(_leaf())
        items = draw(st.lists(vs, max_size=5))
        return {"type": "array", "items": inner_schema}, items
    inner_schema, vs = draw(_leaf())
    keys = draw(st.lists(st.text(max_size=8), max_size=4, unique=True))
    return ({"type": "map", "values": inner_schema},
            {k: draw(vs) for k in keys})


def _norm(schema, v):
    """float32 and map-key normalization is not needed here (we only
    generate doubles and text keys); bytes stay bytes."""
    return v


@settings(max_examples=120, deadline=None)
@given(st.data())
def test_random_schema_value_round_trip(data):
    schema, value = data.draw(_schema_and_value())
    root = {"type": "record", "name": "Root",
            "fields": [{"name": "v", "type": schema}]}
    records = [{"v": value}]
    blob = A.write_container(records, json.dumps(root),
                             codec=data.draw(
                                 st.sampled_from(["null", "deflate"])))
    box = A.read_container(blob)
    assert len(box.records) == 1
    got = box.records[0]["v"]
    if isinstance(value, float):
        assert got == value or (math.isnan(got) and math.isnan(value))
    else:
        assert got == _norm(schema, value)


@settings(max_examples=150, deadline=None)
@given(data=st.data())
def test_mutations_never_escape_avro_error(data):
    docs = [{"k": i, "s": f"v{i}", "tags": ["a"] * (i % 3)}
            for i in range(8)]
    schema = json.dumps({"type": "record", "name": "M", "fields": [
        {"name": "k", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "tags", "type": {"type": "array", "items": "string"}}]})
    blob = bytearray(A.write_container(docs, schema, codec="deflate"))
    n_flips = data.draw(st.integers(1, 4))
    for _ in range(n_flips):
        off = data.draw(st.integers(0, len(blob) - 1))
        blob[off] ^= data.draw(st.integers(1, 255))
    try:
        box = A.read_container(bytes(blob), on_error="skip",
                               max_block_bytes=1 << 20)
        assert len(box.records) <= len(docs) * 2  # bounded output
    except A.AvroError:
        pass  # clean reject is always acceptable


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(-2**63, 2**63 - 1), max_size=30))
def test_zigzag_round_trip_property(vals):
    buf = b"".join(A._zigzag(v) for v in vals)
    cur = A._Cursor(buf, 1 << 20, 1 << 20)
    assert [cur.read_long() for _ in vals] == vals
    assert cur.pos == len(buf)
