"""Native Apache Iceberg table READS — no connector jar required.

Counterpart of sources/delta.py for the second lakehouse format: the
Iceberg **table spec** (iceberg.apache.org/spec, v1 + v2) is public,
its metadata is JSON + Avro — and this repo now has a from-scratch Avro
reader (sources/avroio.py) — and its data files are plain parquet.

Read path, exactly the spec's:

  1. resolve the current metadata file (``version-hint.text`` →
     ``vN.metadata.json``, else the newest ``*.metadata.json``);
  2. pick the snapshot (current, by ``snapshot_id=``, or by
     ``timestamp_ms=`` through the snapshot log);
  3. read the snapshot's **manifest list** (Avro) driver-side — it is
     metadata-scale (one row per manifest);
  4. read each **manifest** (Avro): live entries (status ≠ DELETED),
     v2 sequence-number inheritance, split into data files and delete
     files; ``partition_filter`` prunes at THIS level, so skipped files
     are never opened or scheduled (1% selection ≈ 1% I/O — the same
     contract as the Delta tier and the CDX tier);
  5. ONE parquet scan over the selected data files with the schema from
     table metadata (Iceberg data files store every column, including
     identity-partition columns — no reconstitution join needed);
  6. v2 **position deletes** apply as an anti-join on
     ``(file_path, _metadata.row_index)`` with the spec's sequence rule
     (delete_seq ≥ data_seq); **equality deletes** as per-group
     anti-joins on the equality columns (delete_seq > data_seq).

Honest limits, stated loudly rather than silently wrong: columns
resolve BY NAME, not by parquet field-id — a table whose columns were
renamed after data was written would misread, so the reader REJECTS
metadata whose current schema carries a name-mapping or whose schema
log shows a rename (same stance as Delta column-mapping). Iceberg
WRITES need the connector (sources/lake.py routes and says so).
"""

from __future__ import annotations

import json
import os
import re
import urllib.parse
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from apache_pinot_spark.sources import avroio
from apache_pinot_spark.sources.delta import decoded_file_path

_STATUS_DELETED = 2
_CONTENT_DATA = 0
_CONTENT_POSITION_DELETES = 1
_CONTENT_EQUALITY_DELETES = 2


class IcebergError(RuntimeError):
    """Unreadable/unsupported Iceberg table state."""


# ---------------------------------------------------------------------------
# Metadata resolution
# ---------------------------------------------------------------------------

def _metadata_dir(table: str) -> str:
    return os.path.join(table, "metadata")


def current_metadata_path(table: str) -> str:
    md = _metadata_dir(table)
    if not os.path.isdir(md):
        raise FileNotFoundError(
            f"{table!r} is not an Iceberg table (no metadata/ directory)")
    hint = os.path.join(md, "version-hint.text")
    if os.path.exists(hint):
        v = open(hint, encoding="utf-8").read().strip()
        for cand in (f"v{v}.metadata.json", f"{v}.metadata.json", v):
            p = os.path.join(md, cand)
            if os.path.exists(p):
                return p
    cands = [n for n in os.listdir(md) if n.endswith(".metadata.json")]
    if not cands:
        raise FileNotFoundError(f"no *.metadata.json under {md!r}")

    def key(name: str):
        m = re.match(r"v(\d+)\.metadata\.json$", name)
        if m:
            return (1, int(m.group(1)), name)
        return (0, os.path.getmtime(os.path.join(md, name)), name)

    return os.path.join(md, max(cands, key=key))


def load_metadata(table: str) -> dict[str, Any]:
    with open(current_metadata_path(table), encoding="utf-8") as fh:
        meta = json.load(fh)
    fv = int(meta.get("format-version", 1))
    if fv not in (1, 2):
        raise IcebergError(f"format-version {fv} not supported (v1/v2 only)")
    return meta


def _current_schema(meta: dict[str, Any]) -> dict[str, Any]:
    if "schemas" in meta:
        sid = meta.get("current-schema-id", 0)
        for s in meta["schemas"]:
            if s.get("schema-id", 0) == sid:
                return s
        raise IcebergError(f"current-schema-id {sid} not in schemas")
    if "schema" in meta:
        return meta["schema"]
    raise IcebergError("metadata carries no schema")


def _reject_renames(meta: dict[str, Any]) -> None:
    """Name-based column resolution is only safe when names never
    changed: compare every historical schema's id→name map against the
    current one and reject on conflict (missing ids are fine — added
    columns read as NULL from older files, the parquet mergeSchema
    semantics)."""
    props = meta.get("properties") or {}
    if "schema.name-mapping.default" in props:
        raise IcebergError(
            "table carries a name-mapping (field-id resolution required); "
            "this native reader resolves by name — use the connector")
    current = {f["id"]: f["name"]
               for f in _current_schema(meta).get("fields", [])}
    for s in meta.get("schemas", []):
        for f in s.get("fields", []):
            cur = current.get(f["id"])
            if cur is not None and cur != f["name"]:
                raise IcebergError(
                    f"column id {f['id']} was renamed "
                    f"({f['name']!r} → {cur!r}); name-based resolution "
                    "would misread old files — use the connector")


# ---------------------------------------------------------------------------
# Type mapping (spec "Schemas and Data Types")
# ---------------------------------------------------------------------------

def iceberg_type_to_spark(t: Any, depth: int = 0) -> T.DataType:
    if depth > 64:
        raise IcebergError("type nesting past depth 64")
    if isinstance(t, str):
        prim = {"boolean": T.BooleanType(), "int": T.IntegerType(),
                "long": T.LongType(), "float": T.FloatType(),
                "double": T.DoubleType(), "date": T.DateType(),
                "timestamp": T.TimestampNTZType(),
                "timestamptz": T.TimestampType(),
                "string": T.StringType(), "uuid": T.StringType(),
                "binary": T.BinaryType()}
        if t in prim:
            return prim[t]
        m = re.match(r"decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)$", t)
        if m:
            return T.DecimalType(int(m.group(1)), int(m.group(2)))
        m = re.match(r"fixed\[(\d+)\]$", t)
        if m:
            return T.BinaryType()
        if t == "time":
            return T.LongType()  # micros since midnight; Spark has no TIME
        raise IcebergError(f"unsupported Iceberg type {t!r}")
    kind = t.get("type")
    if kind == "struct":
        return T.StructType([
            T.StructField(f["name"],
                          iceberg_type_to_spark(f["type"], depth + 1),
                          not f.get("required", False))
            for f in t["fields"]])
    if kind == "list":
        return T.ArrayType(iceberg_type_to_spark(t["element"], depth + 1),
                           not t.get("element-required", False))
    if kind == "map":
        return T.MapType(iceberg_type_to_spark(t["key"], depth + 1),
                         iceberg_type_to_spark(t["value"], depth + 1),
                         not t.get("value-required", False))
    raise IcebergError(f"unsupported Iceberg type {kind!r}")


def iceberg_schema_to_spark(schema: dict[str, Any]) -> T.StructType:
    return iceberg_type_to_spark({"type": "struct",
                                  "fields": schema["fields"]})


# ---------------------------------------------------------------------------
# Snapshot + manifest walk
# ---------------------------------------------------------------------------

@dataclass
class _DataFile:
    path: str            # as written in the manifest (URI)
    local: str           # resolved local filesystem path
    content: int
    seq: int
    partition: dict[str, Any]
    record_count: int
    equality_ids: list[int] = field(default_factory=list)


@dataclass
class IcebergSnapshot:
    snapshot_id: int
    schema: T.StructType
    data_files: list[_DataFile]
    position_delete_files: list[_DataFile]
    equality_delete_files: list[_DataFile]
    metadata: dict[str, Any]


def _resolve_path(table: str, meta: dict[str, Any], p: str) -> str:
    """Manifest paths are absolute URIs pinned at write time; tables
    move (and our fixtures live in tmp dirs), so relocate through the
    recorded table location when the absolute path is stale."""
    raw = urllib.parse.unquote(p)
    if raw.startswith("file:"):
        raw = re.sub(r"^file:/+", "/", raw)
    if os.path.exists(raw):
        return raw
    loc = meta.get("location") or ""
    loc = re.sub(r"^file:/+", "/", urllib.parse.unquote(loc)).rstrip("/")
    if loc and raw.startswith(loc + "/"):
        cand = os.path.join(table, raw[len(loc) + 1:])
        if os.path.exists(cand):
            return cand
    raise IcebergError(f"referenced file missing: {p!r}")


def _read_manifest_avro(path: str) -> list[dict]:
    with open(path, "rb") as fh:
        blob = fh.read()
    return avroio.read_container(blob).records


def _pick_snapshot(meta: dict[str, Any], snapshot_id: int | None,
                   timestamp_ms: int | None) -> dict[str, Any]:
    snaps = meta.get("snapshots") or []
    if not snaps:
        raise IcebergError("table has no snapshots (empty)")
    if snapshot_id is not None and timestamp_ms is not None:
        raise ValueError("pass snapshot_id OR timestamp_ms, not both")
    if snapshot_id is None and timestamp_ms is not None:
        log = sorted(meta.get("snapshot-log") or [],
                     key=lambda e: e["timestamp-ms"])
        best = None
        for e in log:
            if e["timestamp-ms"] <= timestamp_ms:
                best = e["snapshot-id"]
        if best is None:
            raise ValueError(f"no snapshot at or before {timestamp_ms}")
        snapshot_id = best
    if snapshot_id is None:
        snapshot_id = meta.get("current-snapshot-id")
        if snapshot_id in (None, -1):
            raise IcebergError("metadata has no current snapshot")
    for s in snaps:
        if s["snapshot-id"] == snapshot_id:
            return s
    raise ValueError(f"snapshot {snapshot_id} not found")


def snapshot(table: str, *, snapshot_id: int | None = None,
             timestamp_ms: int | None = None,
             partition_filter: Callable[[dict[str, Any]], bool] | None = None,
             ) -> IcebergSnapshot:
    meta = load_metadata(table)
    _reject_renames(meta)
    schema = iceberg_schema_to_spark(_current_schema(meta))
    snap = _pick_snapshot(meta, snapshot_id, timestamp_ms)

    # v2: manifest-list Avro; v1 may inline a "manifests" list of paths
    manifests: list[tuple[str, int]] = []  # (path, manifest_seq)
    if snap.get("manifest-list"):
        ml_path = _resolve_path(table, meta, snap["manifest-list"])
        for row in _read_manifest_avro(ml_path):
            manifests.append((row["manifest_path"],
                              int(row.get("sequence_number") or 0)))
    elif snap.get("manifests"):
        manifests = [(p, 0) for p in snap["manifests"]]
    else:
        raise IcebergError("snapshot carries neither manifest-list nor "
                           "manifests")

    data: list[_DataFile] = []
    pos_del: list[_DataFile] = []
    eq_del: list[_DataFile] = []
    for mpath, mseq in manifests:
        local = _resolve_path(table, meta, mpath)
        for entry in _read_manifest_avro(local):
            if int(entry.get("status") or 0) == _STATUS_DELETED:
                continue
            df_rec = entry.get("data_file") or {}
            seq = entry.get("sequence_number")
            seq = int(seq) if seq is not None else mseq  # v2 inheritance
            content = int(df_rec.get("content") or _CONTENT_DATA)
            part = df_rec.get("partition") or {}
            if (partition_filter is not None
                    and content == _CONTENT_DATA
                    and not partition_filter(dict(part))):
                continue
            fmt = (df_rec.get("file_format") or "PARQUET").upper()
            if fmt != "PARQUET":
                raise IcebergError(f"data file format {fmt!r} unsupported")
            rec = _DataFile(
                path=df_rec["file_path"],
                local=_resolve_path(table, meta, df_rec["file_path"]),
                content=content, seq=seq, partition=dict(part),
                record_count=int(df_rec.get("record_count") or 0),
                equality_ids=list(df_rec.get("equality_ids") or []))
            (data if content == _CONTENT_DATA
             else pos_del if content == _CONTENT_POSITION_DELETES
             else eq_del).append(rec)
    data.sort(key=lambda f: f.local)
    return IcebergSnapshot(snapshot_id=snap["snapshot-id"], schema=schema,
                           data_files=data, position_delete_files=pos_del,
                           equality_delete_files=eq_del, metadata=meta)


# ---------------------------------------------------------------------------
# Read path
# ---------------------------------------------------------------------------

def read_iceberg(spark: SparkSession, table: str, *,
                 snapshot_id: int | None = None,
                 timestamp_ms: int | None = None,
                 partition_filter=None) -> DataFrame:
    """Iceberg table → DataFrame at a snapshot (v1 and v2, parquet data,
    position + equality deletes). ``partition_filter`` sees each data
    file's typed partition record and prunes before any file is opened.
    """
    snap = snapshot(table, snapshot_id=snapshot_id,
                    timestamp_ms=timestamp_ms,
                    partition_filter=partition_filter)
    if not snap.data_files:
        return spark.createDataFrame([], snap.schema)
    cols = [f.name for f in snap.schema.fields]
    df = spark.read.schema(snap.schema).parquet(
        *[f.local for f in snap.data_files])

    if not snap.position_delete_files and not snap.equality_delete_files:
        return df.select(cols)

    # attach each row's manifest path + data sequence number through the
    # (tiny, broadcast) file map — needed by both delete kinds
    fmap = spark.createDataFrame(
        [{"__ib_file": os.path.realpath(f.local), "__ib_path": f.path,
          "__ib_seq": f.seq} for f in snap.data_files],
        T.StructType([T.StructField("__ib_file", T.StringType(), False),
                      T.StructField("__ib_path", T.StringType(), False),
                      T.StructField("__ib_seq", T.LongType(), False)]))
    df = (df
          .withColumn("__ib_file", decoded_file_path())
          .withColumn("__ib_pos", F.col("_metadata.row_index"))
          .join(F.broadcast(fmap), "__ib_file", "left"))

    if snap.position_delete_files:
        del_schema = T.StructType([
            T.StructField("file_path", T.StringType()),
            T.StructField("pos", T.LongType())])
        seq_rows = [{"__pd_file": os.path.realpath(f.local),
                     "__pd_seq": f.seq}
                    for f in snap.position_delete_files]
        seq_map = spark.createDataFrame(
            seq_rows,
            T.StructType([T.StructField("__pd_file", T.StringType(), False),
                          T.StructField("__pd_seq", T.LongType(), False)]))
        dels = (spark.read.schema(del_schema).parquet(
                    *[f.local for f in snap.position_delete_files])
                .withColumn("__pd_file", decoded_file_path())
                .join(F.broadcast(seq_map), "__pd_file", "left")
                .select("file_path", "pos", "__pd_seq"))
        # spec: a position delete applies to data files whose data
        # sequence number is <= the delete file's sequence number
        df = df.join(
            dels,
            (df["__ib_path"] == dels["file_path"])
            & (df["__ib_pos"] == dels["pos"])
            & (dels["__pd_seq"] >= df["__ib_seq"]),
            "left_anti")

    for eq_ids, files in _group_equality(snap).items():
        eq_cols = [snap.schema.fields[i].name
                   for i in _ids_to_field_indexes(snap, eq_ids)]
        eq_schema = T.StructType(
            [snap.schema[c] for c in eq_cols])
        seq_map = spark.createDataFrame(
            [{"__ed_file": os.path.realpath(f.local), "__ed_seq": f.seq}
             for f in files],
            T.StructType([T.StructField("__ed_file", T.StringType(), False),
                          T.StructField("__ed_seq", T.LongType(), False)]))
        dels = (spark.read.schema(eq_schema).parquet(
                    *[f.local for f in files])
                .withColumn("__ed_file", decoded_file_path())
                .join(F.broadcast(seq_map), "__ed_file", "left")
                .select(*eq_cols, "__ed_seq"))
        # spec: equality deletes apply to data files with a STRICTLY
        # SMALLER data sequence number
        cond = (dels["__ed_seq"] > df["__ib_seq"])
        for c in eq_cols:
            cond = cond & df[c].eqNullSafe(dels[c])
        df = df.join(dels, cond, "left_anti")

    return df.select(cols)


def _group_equality(snap: IcebergSnapshot) -> dict[tuple[int, ...],
                                                   list[_DataFile]]:
    groups: dict[tuple[int, ...], list[_DataFile]] = {}
    for f in snap.equality_delete_files:
        if not f.equality_ids:
            raise IcebergError(
                f"equality delete file {f.path!r} lists no equality_ids")
        groups.setdefault(tuple(sorted(f.equality_ids)), []).append(f)
    return groups


def _ids_to_field_indexes(snap: IcebergSnapshot,
                          eq_ids: tuple[int, ...]) -> list[int]:
    meta_fields = _current_schema(snap.metadata)["fields"]
    by_id = {f["id"]: i for i, f in enumerate(meta_fields)}
    out = []
    for fid in eq_ids:
        if fid not in by_id:
            raise IcebergError(f"equality field id {fid} not in schema")
        out.append(by_id[fid])
    return out


def iceberg_history(table: str) -> list[dict[str, Any]]:
    """Snapshot log (snapshot-id, timestamp) — newest first."""
    meta = load_metadata(table)
    log = list(meta.get("snapshot-log") or [])
    if not log:
        log = [{"snapshot-id": s["snapshot-id"],
                "timestamp-ms": s.get("timestamp-ms", 0)}
               for s in meta.get("snapshots") or []]
    return sorted(log, key=lambda e: -e["timestamp-ms"])
