"""Native Iceberg read tier (sources/iceberg.py) against hand-built
spec fixtures: metadata JSON + manifest-list/manifest Avro (written
with the repo's own from-scratch Avro writer) + pyarrow parquet data
files. Covers v1 and v2 layouts, snapshot time travel, metadata-level
partition pruning (proved with a corrupt pruned file), v2 position and
equality deletes with the sequence-number rules, rename/name-mapping
rejects, and the lake.py routing."""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from apache_pinot_spark.sources import avroio
from apache_pinot_spark.sources import iceberg as I

MANIFEST_LIST_SCHEMA = {
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "sequence_number", "type": "long"},
        {"name": "min_sequence_number", "type": "long"},
        {"name": "added_snapshot_id", "type": "long"},
    ],
}


def _manifest_schema(part_fields):
    return {
        "type": "record", "name": "manifest_entry", "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": ["null", "long"]},
            {"name": "sequence_number", "type": ["null", "long"]},
            {"name": "file_sequence_number", "type": ["null", "long"]},
            {"name": "data_file", "type": {
                "type": "record", "name": "r2", "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "partition", "type": {
                        "type": "record", "name": "r102",
                        "fields": part_fields}},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                    {"name": "equality_ids",
                     "type": ["null", {"type": "array", "items": "int"}]},
                ]}},
        ],
    }


class Fixture:
    """Builds an Iceberg table directory per the spec, one call per
    layer, with explicit sequence numbers — the independent test-side
    constructor (the encrypted-PDF/FLAC anchoring discipline)."""

    def __init__(self, root: str, schema_fields, part_avro_fields=()):
        self.root = str(root)
        self.schema_fields = schema_fields
        self.part_avro_fields = list(part_avro_fields)
        os.makedirs(os.path.join(self.root, "data"), exist_ok=True)
        os.makedirs(os.path.join(self.root, "metadata"), exist_ok=True)
        self.entries: list[dict] = []   # manifest entries (current)
        self.snapshots: list[dict] = []
        self.snapshot_log: list[dict] = []
        self._n = 0

    def uri(self, rel: str) -> str:
        return f"file://{self.root}/{rel}"

    def add_parquet(self, rel: str, table: pa.Table) -> str:
        p = os.path.join(self.root, rel)
        pq.write_table(table, p)
        return p

    def add_file(self, rel: str, table: pa.Table, *, seq: int,
                 content: int = 0, partition: dict | None = None,
                 equality_ids=None, status: int = 1) -> None:
        p = self.add_parquet(rel, table)
        self.entries.append({
            "status": status, "snapshot_id": None,
            "sequence_number": seq, "file_sequence_number": seq,
            "data_file": {
                "content": content, "file_path": self.uri(rel),
                "file_format": "PARQUET",
                "partition": partition or {},
                "record_count": table.num_rows,
                "file_size_in_bytes": os.path.getsize(p),
                "equality_ids": list(equality_ids) if equality_ids else None,
            }})

    def commit(self, snapshot_id: int, ts_ms: int | None = None) -> None:
        n = self._n
        self._n += 1
        man_rel = f"metadata/{snapshot_id}-m0.avro"
        man_abs = os.path.join(self.root, man_rel)
        with open(man_abs, "wb") as fh:
            fh.write(avroio.write_container(
                list(self.entries),
                _manifest_schema(self.part_avro_fields)))
        ml_rel = f"metadata/snap-{snapshot_id}.avro"
        with open(os.path.join(self.root, ml_rel), "wb") as fh:
            fh.write(avroio.write_container([{
                "manifest_path": self.uri(man_rel),
                "manifest_length": os.path.getsize(man_abs),
                "partition_spec_id": 0, "content": 0,
                "sequence_number": n + 1, "min_sequence_number": 1,
                "added_snapshot_id": snapshot_id,
            }], MANIFEST_LIST_SCHEMA))
        ts = ts_ms if ts_ms is not None else int(time.time() * 1000) + n
        self.snapshots.append({
            "snapshot-id": snapshot_id, "timestamp-ms": ts,
            "sequence-number": n + 1,
            "manifest-list": self.uri(ml_rel),
            "summary": {"operation": "append"}, "schema-id": 0})
        self.snapshot_log.append({"snapshot-id": snapshot_id,
                                  "timestamp-ms": ts})
        self._write_metadata(version=n + 1)

    def _write_metadata(self, version: int, extra=None) -> None:
        meta = {
            "format-version": 2, "table-uuid": "0" * 32,
            "location": f"file://{self.root}",
            "last-sequence-number": self._n,
            "last-updated-ms": int(time.time() * 1000),
            "last-column-id": max(f["id"] for f in self.schema_fields),
            "schemas": [{"schema-id": 0, "type": "struct",
                         "fields": self.schema_fields}],
            "current-schema-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "default-spec-id": 0,
            "current-snapshot-id": self.snapshots[-1]["snapshot-id"],
            "snapshots": self.snapshots,
            "snapshot-log": self.snapshot_log,
            "properties": {},
        }
        meta.update(extra or {})
        with open(os.path.join(self.root, "metadata",
                               f"v{version}.metadata.json"), "w") as fh:
            json.dump(meta, fh)
        with open(os.path.join(self.root, "metadata",
                               "version-hint.text"), "w") as fh:
            fh.write(str(version))


KS = [{"id": 1, "name": "k", "required": False, "type": "long"},
      {"id": 2, "name": "s", "required": False, "type": "string"}]


def _t(ks, ss):
    return pa.table({"k": pa.array(ks, pa.int64()),
                     "s": pa.array(ss, pa.string())})


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "ice")


def test_basic_v2_read(spark, root):
    fx = Fixture(root, KS)
    fx.add_file("data/f1.parquet", _t([1, 2], ["a", "b"]), seq=1)
    fx.add_file("data/f2.parquet", _t([3], ["c"]), seq=1)
    fx.commit(snapshot_id=100)
    got = I.read_iceberg(spark, root).orderBy("k").collect()
    assert [(r.k, r.s) for r in got] == [(1, "a"), (2, "b"), (3, "c")]


def test_schema_from_metadata_old_files_null_fill(spark, root):
    """A column added after a file was written reads as NULL from that
    file (metadata schema wins over file footers)."""
    fx = Fixture(root, KS)
    old = pa.table({"k": pa.array([7], pa.int64())})  # no 's' column
    fx.add_file("data/old.parquet", old, seq=1)
    fx.commit(snapshot_id=1)
    got = I.read_iceberg(spark, root).collect()
    assert got[0].k == 7 and got[0].s is None


def test_time_travel_by_snapshot_and_timestamp(spark, root):
    fx = Fixture(root, KS)
    fx.add_file("data/f1.parquet", _t([1], ["a"]), seq=1)
    fx.commit(snapshot_id=11, ts_ms=1000)
    fx.add_file("data/f2.parquet", _t([2], ["b"]), seq=2)
    fx.commit(snapshot_id=22, ts_ms=2000)
    assert I.read_iceberg(spark, root).count() == 2
    old = I.read_iceberg(spark, root, snapshot_id=11).collect()
    assert [r.k for r in old] == [1]
    old2 = I.read_iceberg(spark, root, timestamp_ms=1500).collect()
    assert [r.k for r in old2] == [1]
    hist = I.iceberg_history(root)
    assert [h["snapshot-id"] for h in hist] == [22, 11]


def test_partition_pruning_never_opens_pruned_files(spark, root):
    """The pruned file is CORRUPT on disk: if pruning were row-level
    instead of metadata-level, the scan would fail."""
    fx = Fixture(root, KS,
                 part_avro_fields=[{"name": "part",
                                    "type": ["null", "string"]}])
    fx.add_file("data/a.parquet", _t([1], ["a"]), seq=1,
                partition={"part": "keep"})
    corrupt = os.path.join(root, "data", "b.parquet")
    fx.entries.append({
        "status": 1, "snapshot_id": None, "sequence_number": 1,
        "file_sequence_number": 1,
        "data_file": {"content": 0, "file_path": fx.uri("data/b.parquet"),
                      "file_format": "PARQUET",
                      "partition": {"part": "drop"},
                      "record_count": 1, "file_size_in_bytes": 13,
                      "equality_ids": None}})
    with open(corrupt, "wb") as fh:
        fh.write(b"NOT A PARQUET")
    fx.commit(snapshot_id=5)
    got = I.read_iceberg(
        spark, root,
        partition_filter=lambda p: p.get("part") == "keep").collect()
    assert [r.k for r in got] == [1]
    with pytest.raises(Exception):  # unpruned read meets the corruption
        I.read_iceberg(spark, root).count()


def test_position_deletes_with_sequence_rule(spark, root):
    fx = Fixture(root, KS)
    fx.add_file("data/f1.parquet", _t([1, 2, 3], ["a", "b", "c"]), seq=2)
    # delete at seq 5 kills row pos=1 of f1 (5 >= 2: applies)
    d_apply = pa.table({"file_path": pa.array([fx.uri("data/f1.parquet")]),
                        "pos": pa.array([1], pa.int64())})
    fx.add_file("data/d1.parquet", d_apply, seq=5, content=1)
    # delete at seq 1 targets pos=0 but came BEFORE the data (1 < 2):
    # per spec it must NOT apply
    d_stale = pa.table({"file_path": pa.array([fx.uri("data/f1.parquet")]),
                        "pos": pa.array([0], pa.int64())})
    fx.add_file("data/d0.parquet", d_stale, seq=1, content=1)
    fx.commit(snapshot_id=9)
    got = I.read_iceberg(spark, root).orderBy("k").collect()
    assert [(r.k, r.s) for r in got] == [(1, "a"), (3, "c")]


def test_equality_deletes_strictly_smaller_rule(spark, root):
    fx = Fixture(root, KS)
    fx.add_file("data/f1.parquet", _t([1, 2, 3], ["a", "b", "c"]), seq=1)
    # equality delete on k=2 at seq 2: applies to f1 (1 < 2)
    fx.add_file("data/e1.parquet",
                pa.table({"k": pa.array([2], pa.int64())}),
                seq=2, content=2, equality_ids=[1])
    # re-insert k=2 at seq 3: data seq 3 is NOT < 2 → survives
    fx.add_file("data/f2.parquet", _t([2], ["b2"]), seq=3)
    fx.commit(snapshot_id=7)
    got = I.read_iceberg(spark, root).orderBy("k", "s").collect()
    assert [(r.k, r.s) for r in got] == [(1, "a"), (2, "b2"), (3, "c")]


def test_deleted_status_entries_excluded(spark, root):
    fx = Fixture(root, KS)
    fx.add_file("data/f1.parquet", _t([1], ["a"]), seq=1)
    fx.add_file("data/f2.parquet", _t([2], ["b"]), seq=1, status=2)
    fx.commit(snapshot_id=3)
    got = I.read_iceberg(spark, root).collect()
    assert [r.k for r in got] == [1]


def test_rename_and_name_mapping_reject(spark, root):
    fx = Fixture(root, KS)
    fx.add_file("data/f1.parquet", _t([1], ["a"]), seq=1)
    fx.commit(snapshot_id=1)
    # historical schema where field id 2 was called 'txt' → renamed
    meta_path = I.current_metadata_path(root)
    meta = json.load(open(meta_path))
    meta["schemas"].insert(0, {
        "schema-id": 99, "type": "struct", "fields": [
            {"id": 1, "name": "k", "required": False, "type": "long"},
            {"id": 2, "name": "txt", "required": False, "type": "string"}]})
    json.dump(meta, open(meta_path, "w"))
    with pytest.raises(I.IcebergError, match="renamed"):
        I.read_iceberg(spark, root)
    meta["schemas"].pop(0)
    meta["properties"]["schema.name-mapping.default"] = "[]"
    json.dump(meta, open(meta_path, "w"))
    with pytest.raises(I.IcebergError, match="name-mapping"):
        I.read_iceberg(spark, root)


def test_v1_layout_reads(spark, root):
    """v1: singular 'schema', 'partition-spec', no sequence numbers."""
    fx = Fixture(root, KS)
    fx.add_file("data/f1.parquet", _t([4], ["d"]), seq=0)
    # null sequence numbers exercise v2 inheritance / v1 absence
    fx.entries[0]["sequence_number"] = None
    fx.entries[0]["file_sequence_number"] = None
    fx.commit(snapshot_id=2)
    meta_path = I.current_metadata_path(root)
    meta = json.load(open(meta_path))
    meta["format-version"] = 1
    meta["schema"] = meta.pop("schemas")[0]
    meta.pop("current-schema-id")
    meta["partition-spec"] = []
    json.dump(meta, open(meta_path, "w"))
    got = I.read_iceberg(spark, root).collect()
    assert [(r.k, r.s) for r in got] == [(4, "d")]


def test_unsupported_format_version_rejects(spark, root):
    fx = Fixture(root, KS)
    fx.add_file("data/f1.parquet", _t([1], ["a"]), seq=1)
    fx.commit(snapshot_id=1)
    meta_path = I.current_metadata_path(root)
    meta = json.load(open(meta_path))
    meta["format-version"] = 3
    json.dump(meta, open(meta_path, "w"))
    with pytest.raises(I.IcebergError, match="format-version"):
        I.read_iceberg(spark, root)


def test_non_parquet_data_file_rejects(spark, root):
    fx = Fixture(root, KS)
    fx.add_file("data/f1.parquet", _t([1], ["a"]), seq=1)
    fx.entries[0]["data_file"]["file_format"] = "ORC"
    fx.commit(snapshot_id=1)
    with pytest.raises(I.IcebergError, match="ORC"):
        I.read_iceberg(spark, root)


def test_type_mapping():
    from pyspark.sql import types as T

    st = I.iceberg_schema_to_spark({"fields": [
        {"id": 1, "name": "a", "required": True, "type": "long"},
        {"id": 2, "name": "b", "required": False,
         "type": "decimal(10, 2)"},
        {"id": 3, "name": "c", "required": False, "type": "timestamptz"},
        {"id": 4, "name": "d", "required": False,
         "type": {"type": "list", "element": "string"}},
        {"id": 5, "name": "e", "required": False,
         "type": {"type": "map", "key": "string", "value": "double"}},
    ]})
    assert isinstance(st["a"].dataType, T.LongType) and not st["a"].nullable
    assert st["b"].dataType == T.DecimalType(10, 2)
    assert isinstance(st["c"].dataType, T.TimestampType)
    assert isinstance(st["d"].dataType, T.ArrayType)
    assert isinstance(st["e"].dataType, T.MapType)
    with pytest.raises(I.IcebergError, match="unsupported"):
        I.iceberg_type_to_spark("geometry")


def test_lake_routing_reads_native_iceberg(spark, root):
    from apache_pinot_spark.sources import lake as L

    if L.lake_format_available(spark, "iceberg"):
        pytest.skip("connector present: native routing inert")
    fx = Fixture(root, KS)
    fx.add_file("data/f1.parquet", _t([6], ["z"]), seq=1)
    fx.commit(snapshot_id=4)
    got = L.read_lake(spark, root, "iceberg").collect()
    assert [(r.k, r.s) for r in got] == [(6, "z")]
