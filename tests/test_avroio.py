"""Avro object-container tier (sources/avroio.py): spec-vector encode
goldens, container round-trips across codecs, per-block corruption
isolation, bomb caps, logical-type widening, the Spark read operator,
and the ingest audit ledger."""

from __future__ import annotations

import json
import struct
import zlib
from datetime import date, datetime
from decimal import Decimal

import pytest

from apache_pinot_spark.sources import avroio as A


DOC_SCHEMA = json.dumps({
    "type": "record", "name": "Doc", "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "text", "type": ["null", "string"]},
        {"name": "lang", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "meta", "type": {"type": "map", "values": "long"}},
    ],
})

DOCS = [
    {"doc_id": 1, "text": "hello world", "lang": "en", "score": 0.5,
     "tags": ["a", "b"], "meta": {"k": 7}},
    {"doc_id": 2, "text": None, "lang": "de", "score": -1.25,
     "tags": [], "meta": {}},
    {"doc_id": 3, "text": "größer é", "lang": "de", "score": 2.0,
     "tags": ["x"], "meta": {"a": 1, "b": 2}},
]


# ---------------------------------------------------------------------------
# Binary-encoding spec vectors
# ---------------------------------------------------------------------------

def test_zigzag_spec_vectors():
    # the Avro spec's own table: 0→00, -1→01, 1→02, -2→03, 2→04, ...
    for n, b in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03"),
                 (2, b"\x04"), (-64, b"\x7f"), (64, b"\x80\x01")]:
        assert A._zigzag(n) == b
        cur = A._Cursor(b, 1 << 20, 1 << 20)
        assert cur.read_long() == n


def test_long_extremes_round_trip():
    for n in (2**63 - 1, -2**63, 2**31, -2**31 - 1):
        cur = A._Cursor(A._zigzag(n), 1 << 20, 1 << 20)
        assert cur.read_long() == n


def test_string_and_record_layout():
    # record {a: long=3, b: string="foo"} = 06 06 66 6f 6f
    s = A.parse_schema(json.dumps({
        "type": "record", "name": "R", "fields": [
            {"name": "a", "type": "long"}, {"name": "b", "type": "string"}]}))
    out = bytearray()
    A._encode(out, s, {"a": 3, "b": "foo"})
    assert bytes(out) == b"\x06\x06foo"
    cur = A._Cursor(bytes(out), 1 << 20, 1 << 20)
    assert A._decode(cur, s) == {"a": 3, "b": "foo"}


def test_union_branch_encoding():
    s = A.parse_schema(json.dumps(["null", "string"]))
    out = bytearray()
    A._encode(out, s, None)
    assert bytes(out) == b"\x00"
    out = bytearray()
    A._encode(out, s, "a")
    assert bytes(out) == b"\x02\x02a"


def test_float_double_little_endian():
    s = A.parse_schema('"double"')
    out = bytearray()
    A._encode(out, s, 1.5)
    assert bytes(out) == struct.pack("<d", 1.5)


def test_recursive_named_schema():
    node = json.dumps({
        "type": "record", "name": "Node", "fields": [
            {"name": "v", "type": "long"},
            {"name": "next", "type": ["null", "Node"]}]})
    s = A.parse_schema(node)
    val = {"v": 1, "next": {"v": 2, "next": None}}
    out = bytearray()
    A._encode(out, s, val)
    cur = A._Cursor(bytes(out), 1 << 20, 1 << 20)
    assert A._decode(cur, s) == val


# ---------------------------------------------------------------------------
# Container round-trips + hardening
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_round_trip(codec):
    blob = A.write_container(DOCS, DOC_SCHEMA, codec=codec)
    box = A.read_container(blob)
    assert box.codec == codec
    assert box.records == DOCS
    assert box.n_rejected_blocks == 0


def test_writer_deterministic():
    assert (A.write_container(DOCS, DOC_SCHEMA)
            == A.write_container(DOCS, DOC_SCHEMA))


def test_multi_block_layout():
    blob = A.write_container(DOCS * 10, DOC_SCHEMA, records_per_block=7)
    box = A.read_container(blob)
    assert len(box.records) == 30 and box.n_blocks == 5


def test_corrupt_block_isolated_with_resync():
    blob = bytearray(A.write_container(DOCS * 4, DOC_SCHEMA, codec="deflate",
                                       records_per_block=3))
    # find the second block start: after header+sync, block1; flip a byte
    # inside block 2's payload (locate via a clean re-parse of offsets)
    box = A.read_container(bytes(blob))
    assert box.n_blocks == 4
    # brute-force: flip bytes until exactly one block dies, rest survive
    flipped = None
    for off in range(len(blob) // 3, len(blob), 11):
        trial = bytearray(blob)
        trial[off] ^= 0xFF
        try:
            got = A.read_container(bytes(trial), on_error="skip")
        except A.AvroError:
            continue  # header-region flip: whole-file reject is correct
        if got.n_rejected_blocks >= 1 and len(got.records) >= 6:
            flipped = got
            break
    assert flipped is not None, "no single-byte flip produced isolation"
    with pytest.raises(A.AvroError):
        # strict mode refuses the same corruption
        trial = bytearray(blob)
        trial[len(blob) // 2] ^= 0xFF
        A.read_container(bytes(trial), on_error="raise")
        A.read_container(bytes(trial[:-1]), on_error="raise")


def test_deflate_bomb_rejects_at_cap():
    # 64 MB of zeros deflates tiny; a 1 MB cap must reject DURING inflate
    schema = json.dumps({"type": "record", "name": "B", "fields": [
        {"name": "payload", "type": "bytes"}]})
    bomb = A.write_container([{"payload": b"\x00" * (64 << 20)}], schema,
                             codec="deflate")
    assert len(bomb) < 1 << 20  # it really is a bomb
    with pytest.raises(A.AvroError, match="inflates past|out of bounds"):
        A.read_container(bomb, max_block_bytes=1 << 20)


def test_lying_lengths_reject():
    s = A.parse_schema('"string"')
    cur = A._Cursor(A._zigzag(10**9) + b"x", 1 << 20, 1 << 20)
    with pytest.raises(A.AvroError, match="length|truncated"):
        A._decode(cur, s)
    # huge array count of zero-width items (empty records) must hit the cap
    rec = A.parse_schema(json.dumps({
        "type": "array",
        "items": {"type": "record", "name": "E", "fields": []}}))
    cur = A._Cursor(A._zigzag(1 << 40), 1 << 20, 1 << 20)
    with pytest.raises(A.AvroError, match="cap"):
        A._decode(cur, rec)


def test_bad_magic_and_missing_schema_reject():
    with pytest.raises(A.AvroError, match="magic"):
        A.read_container(b"PK\x03\x04junk")
    with pytest.raises(A.AvroError, match="writer supports"):
        A.write_container([], DOC_SCHEMA, codec="zstandard")


def test_read_header_peek():
    blob = A.write_container(DOCS, DOC_SCHEMA)
    sj, codec = A.read_header(blob)
    assert json.loads(sj)["name"] == "Doc" and codec == "deflate"


def test_snappy_block_crc_contract():
    # build a snappy container by hand IF the codec is present
    pa = pytest.importorskip("pyarrow")
    try:
        comp = pa.Codec("snappy")
    except Exception:
        pytest.skip("pyarrow built without snappy")
    import binascii as ba
    schema = '"long"'
    s = A.parse_schema(schema)
    body = bytearray()
    for v in (1, 2, 3):
        A._encode(body, s, v)
    payload = comp.compress(bytes(body), asbytes=True)
    payload += struct.pack(">I", ba.crc32(bytes(body)) & 0xFFFFFFFF)
    sync = b"S" * 16
    out = bytearray(A.MAGIC)
    A._encode(out, A.Schema(kind="map", values=A.Schema(kind="bytes")),
              {"avro.schema": schema.encode(), "avro.codec": b"snappy"})
    out += sync + A._zigzag(3) + A._zigzag(len(payload)) + payload + sync
    box = A.read_container(bytes(out))
    assert box.records == [1, 2, 3]
    # flip a payload byte: CRC (or the snappy frame itself) must reject
    bad = bytearray(out)
    bad[-21] ^= 0x01
    with pytest.raises(A.AvroError):
        A.read_container(bytes(bad))


# ---------------------------------------------------------------------------
# Logical types + Spark schema mapping
# ---------------------------------------------------------------------------

LOGICAL_SCHEMA = json.dumps({
    "type": "record", "name": "L", "fields": [
        {"name": "d", "type": {"type": "int", "logicalType": "date"}},
        {"name": "ts", "type": {"type": "long",
                                "logicalType": "timestamp-micros"}},
        {"name": "amount", "type": {"type": "bytes", "logicalType": "decimal",
                                    "precision": 10, "scale": 2}},
    ],
})


def test_logical_type_widening():
    from datetime import timedelta

    amt = int(Decimal("123.45").scaleb(2))
    raw = {"d": 19000, "ts": 1_700_000_000_000_000,
           "amount": amt.to_bytes(4, "big", signed=True)}
    blob = A.write_container([raw], LOGICAL_SCHEMA)
    box = A.read_container(blob)
    conv = A._row_converter(box.schema)
    got = conv(box.records[0])
    assert got["d"] == date(1970, 1, 1) + timedelta(days=19000)
    assert got["ts"] == datetime(1970, 1, 1) + timedelta(
        microseconds=1_700_000_000_000_000)
    assert got["amount"] == Decimal("123.45")


def test_spark_schema_mapping():
    from pyspark.sql import types as T

    s = A.parse_schema(DOC_SCHEMA)
    st = A.avro_schema_to_spark(s)
    assert [f.name for f in st.fields] == ["doc_id", "text", "lang", "score",
                                           "tags", "meta"]
    assert isinstance(st["doc_id"].dataType, T.LongType)
    assert isinstance(st["tags"].dataType, T.ArrayType)
    assert isinstance(st["meta"].dataType, T.MapType)
    # multi-branch non-null unions reject honestly
    with pytest.raises(A.AvroError, match="union"):
        A.avro_schema_to_spark(A.parse_schema(json.dumps({
            "type": "record", "name": "U", "fields": [
                {"name": "x", "type": ["int", "string"]}]})))


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

def _write_fixture_dir(tmp_path, n_files=3):
    d = tmp_path / "avro"
    d.mkdir()
    for i in range(n_files):
        docs = [{**doc, "doc_id": doc["doc_id"] + 10 * i} for doc in DOCS]
        (d / f"part-{i:03d}.avro").write_bytes(
            A.write_container(docs, DOC_SCHEMA,
                              codec="deflate" if i % 2 else "null"))
    return str(d)


def test_read_avro_spark_round_trip(spark, tmp_path):
    d = _write_fixture_dir(tmp_path)
    df = A.read_avro(spark, d)
    rows = {r["doc_id"]: r for r in df.collect()}
    assert len(rows) == 9
    assert rows[1]["text"] == "hello world" and rows[2]["text"] is None
    assert rows[23]["lang"] == "de" and rows[23]["meta"]["b"] == 2
    assert sorted(rows[11]["tags"]) == ["a", "b"]


def test_read_avro_logical_types_spark(spark, tmp_path):
    amt = int(Decimal("9.99").scaleb(2))
    raw = {"d": 20000, "ts": 1_700_000_000_000_000,
           "amount": amt.to_bytes(3, "big", signed=True)}
    p = tmp_path / "l.avro"
    p.write_bytes(A.write_container([raw], LOGICAL_SCHEMA))
    row = A.read_avro(spark, str(p)).collect()[0]
    assert row["amount"] == Decimal("9.99")
    assert row["d"].toordinal() - date(1970, 1, 1).toordinal() == 20000
    assert row["ts"].year == 2023


def test_read_avro_corrupt_file_isolated(spark, tmp_path):
    d = _write_fixture_dir(tmp_path, n_files=2)
    (tmp_path / "avro" / "part-bad.avro").write_bytes(b"Obj\x01garbage")
    df = A.read_avro(spark, d)
    assert df.count() == 6  # good files survive
    audit = {r["path"].rsplit("/", 1)[-1]: r
             for r in A.avro_ingest_audit(spark, d).collect()}
    assert audit["part-bad.avro"]["ok"] is False
    assert audit["part-000.avro"]["ok"] is True
    assert audit["part-000.avro"]["n_records"] == 3


def test_read_avro_empty_glob_rejects(spark, tmp_path):
    with pytest.raises(Exception):  # binaryFile PATH_NOT_FOUND or AvroError
        A.read_avro(spark, str(tmp_path / "nope" / "*.avro"))
