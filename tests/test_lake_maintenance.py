"""Lake maintenance actions (r13): Delta VACUUM (vacuum_data_files),
OPTIMIZE-style compaction (compact_delta), and Iceberg snapshot expiry
(expire_snapshots) — retention windows, current-snapshot protection,
shared-file safety, and post-maintenance readability."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row

from apache_pinot_spark.sources import delta as D
from apache_pinot_spark.sources import iceberg as I

pytestmark = pytest.mark.slow  # excluded from the default driver-verify lane (see pytest.ini)


def _mkdf(spark, rows):
    return spark.createDataFrame([Row(**r) for r in rows])


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _all_parquet(table):
    out = []
    for dirpath, dirs, names in os.walk(table):
        dirs[:] = [d for d in dirs if d != "_delta_log"]
        out += [os.path.relpath(os.path.join(dirpath, n), table)
                for n in names if n.endswith(".parquet")]
    return sorted(out)


# ---------------------------------------------------------------------------
# Delta VACUUM
# ---------------------------------------------------------------------------

def test_vacuum_removes_only_expired_tombstones(spark, table):
    D.write_delta(_mkdf(spark, [{"k": 1}]).coalesce(1), table)
    D.write_delta(_mkdf(spark, [{"k": 2}]).coalesce(1), table,
                  mode="overwrite")  # v0's file becomes a tombstone
    live = {af.path for af in D.snapshot(spark, table).files}
    now = D.snapshot(spark, table)  # noqa: F841 — sanity that reads work
    all_files = set(_all_parquet(table))
    assert all_files - live  # the removed file is still on disk

    # inside the retention window: nothing happens
    assert D.vacuum_data_files(spark, table) == []
    # zero retention: the tombstoned file goes; live stays
    removed = D.vacuum_data_files(spark, table, retain_ms=0)
    assert removed and set(removed) == all_files - live
    assert set(_all_parquet(table)) == live
    assert [r.k for r in D.read_delta(spark, table).collect()] == [2]


def test_vacuum_dry_run_and_orphans(spark, table):
    D.write_delta(_mkdf(spark, [{"k": 1}]).coalesce(1), table)
    orphan = os.path.join(table, "orphan-stray.parquet")
    with open(orphan, "wb") as fh:
        fh.write(b"junk")
    old = 1  # epoch seconds → far past any retention
    os.utime(orphan, (old, old))
    would = D.vacuum_data_files(spark, table, retain_ms=1000,
                                dry_run=True)
    assert would == ["orphan-stray.parquet"]
    assert os.path.exists(orphan)  # dry run touched nothing
    got = D.vacuum_data_files(spark, table, retain_ms=1000)
    assert got == ["orphan-stray.parquet"]
    assert not os.path.exists(orphan)


def test_vacuum_protects_live_dv_sidecars(spark, table):
    """A deletion-vector sidecar referenced by the CURRENT snapshot
    must survive vacuum even at zero retention."""
    import json as _json
    import struct
    import urllib.parse as up
    import uuid as uuid_mod
    import zlib

    D.write_delta(_mkdf(spark, [{"k": i} for i in range(4)]).coalesce(1),
                  table)
    af = D.snapshot(spark, table).files[0]
    # independent mini DV serializer (array container, one bucket)
    vals = [1]
    out = struct.pack("<II", 12346, 1) + struct.pack("<HH", 0, 0)
    out += struct.pack("<I", 16) + struct.pack("<H", vals[0])
    data = struct.pack("<iq", 1681511377, 1) + struct.pack("<i", 0) + out
    u = uuid_mod.uuid5(uuid_mod.NAMESPACE_URL, "vac-dv")
    blob = b"\x01" + struct.pack(">i", len(data)) + data \
        + struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
    dv_name = f"deletion_vector_{u}.bin"
    with open(os.path.join(table, dv_name), "wb") as fh:
        fh.write(blob)
    z85 = "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"

    def z85e(b):
        s = ""
        for i in range(0, len(b), 4):
            acc = int.from_bytes(b[i:i + 4], "big")
            chunk = ""
            for _ in range(5):
                chunk = z85[acc % 85] + chunk
                acc //= 85
            s += chunk
        return s

    dv = {"storageType": "u", "pathOrInlineDv": z85e(u.bytes),
          "offset": 1, "sizeInBytes": len(data), "cardinality": 1}
    with open(os.path.join(table, "_delta_log",
                           "00000000000000000001.json"), "w") as fh:
        fh.write(_json.dumps({"remove": {
            "path": up.quote(af.path), "deletionTimestamp": 1,
            "dataChange": True}}) + "\n")
        fh.write(_json.dumps({"add": {
            "path": up.quote(af.path), "partitionValues": {},
            "size": af.size, "modificationTime": 1, "dataChange": True,
            "deletionVector": dv}}) + "\n")
    removed = D.vacuum_data_files(spark, table, retain_ms=0)
    assert removed == []  # data file AND its DV sidecar are live
    assert os.path.exists(os.path.join(table, dv_name))
    assert sorted(r.k for r in D.read_delta(spark, table).collect()) \
        == [0, 2, 3]


# ---------------------------------------------------------------------------
# Delta OPTIMIZE (compaction)
# ---------------------------------------------------------------------------

def test_compact_unpartitioned(spark, table):
    for i in range(4):
        D.write_delta(_mkdf(spark, [{"k": i}]).coalesce(1), table)
    assert D.snapshot(spark, table).num_files == 4
    v = D.compact_delta(spark, table)
    assert v == 4
    snap = D.snapshot(spark, table)
    assert snap.num_files == 1
    assert sorted(r.k for r in D.read_delta(spark, table).collect()) \
        == [0, 1, 2, 3]
    # idempotent: a second pass finds nothing to do
    assert D.compact_delta(spark, table) is None
    # old files are vacuumable now, and the table still reads after
    removed = D.vacuum_data_files(spark, table, retain_ms=0)
    assert len(removed) == 4
    assert sorted(r.k for r in D.read_delta(spark, table).collect()) \
        == [0, 1, 2, 3]


def test_compact_partitioned_respects_partitions(spark, table):
    for i in range(3):
        D.write_delta(
            _mkdf(spark, [{"k": 10 * i + j, "tag": t}
                          for j in range(2) for t in ("a", "b")]),
            table, partition_by=["tag"])
    before = D.snapshot(spark, table)
    assert before.num_files > 2
    assert D.compact_delta(spark, table) is not None
    snap = D.snapshot(spark, table)
    assert snap.num_files == 2  # one file per partition value
    got = {(r.k, r.tag) for r in D.read_delta(spark, table).collect()}
    want = {(10 * i + j, t) for i in range(3) for j in range(2)
            for t in ("a", "b")}
    assert got == want


def test_compact_time_travel_preserved(spark, table):
    """dataChange=False: pre-compaction versions still time-travel to
    the same rows (old files remain until VACUUM)."""
    D.write_delta(_mkdf(spark, [{"k": 1}]).coalesce(1), table)
    D.write_delta(_mkdf(spark, [{"k": 2}]).coalesce(1), table)
    D.compact_delta(spark, table)
    old = D.read_delta(spark, table, version=1).orderBy("k").collect()
    assert [r.k for r in old] == [1, 2]


# ---------------------------------------------------------------------------
# Iceberg expire_snapshots
# ---------------------------------------------------------------------------

def _wdf(spark, rows):
    return spark.createDataFrame([Row(**r) for r in rows])


def test_expire_snapshots_keeps_current_and_deletes_unreachable(
        spark, tmp_path):
    root = str(tmp_path / "ice")
    s1 = I.write_iceberg(_wdf(spark, [{"k": 1}]), root)
    s2 = I.write_iceberg(_wdf(spark, [{"k": 2}]), root, mode="overwrite")
    s3 = I.write_iceberg(_wdf(spark, [{"k": 3}]), root)
    dry = I.expire_snapshots(root, keep_last=2, dry_run=True)
    assert dry["snapshots"] == [s1]
    assert len(I.load_metadata(root)["snapshots"]) == 3  # untouched
    got = I.expire_snapshots(root, keep_last=2)
    assert got["snapshots"] == [s1]
    # snapshot-1's data file was orphaned by the overwrite → deleted;
    # snapshot-2's file is shared with snapshot 3 → survives
    meta = I.load_metadata(root)
    assert [s["snapshot-id"] for s in meta["snapshots"]] == [s2, s3]
    rows = sorted(r.k for r in I.read_iceberg(spark, root).collect())
    assert rows == [2, 3]
    # the expired snapshot's time travel is gone; retained ones work
    with pytest.raises(ValueError):
        I.read_iceberg(spark, root, snapshot_id=s1)
    assert sorted(r.k for r in
                  I.read_iceberg(spark, root, snapshot_id=s2)
                  .collect()) == [2]
    for p in got["files"]:
        assert not os.path.exists(p)


def test_expire_snapshots_older_than_protects_recent(spark, tmp_path):
    root = str(tmp_path / "ice2")
    I.write_iceberg(_wdf(spark, [{"k": 1}]), root)
    I.write_iceberg(_wdf(spark, [{"k": 2}]), root)
    # cutoff before every snapshot: nothing expires even with keep_last=1
    got = I.expire_snapshots(root, keep_last=1, older_than_ms=0)
    assert got == {"snapshots": [], "files": []}
    with pytest.raises(ValueError, match="keep_last"):
        I.expire_snapshots(root, keep_last=0)


# ---------------------------------------------------------------------------
# DELETE via deletion vectors (delete_where)
# ---------------------------------------------------------------------------

def test_delete_where_writes_dvs_not_files(spark, table):
    D.write_delta(_mkdf(spark, [{"k": i, "s": f"v{i}"}
                                for i in range(10)]).coalesce(1), table)
    files_before = set(_all_parquet(table))
    v = D.delete_where(spark, table, "k % 3 = 0")
    assert v == 1
    assert set(_all_parquet(table)) == files_before  # no rewrite
    got = sorted(r.k for r in D.read_delta(spark, table).collect())
    assert got == [i for i in range(10) if i % 3 != 0]
    af = D.snapshot(spark, table).files[0]
    assert af.deletion_vector["cardinality"] == 4
    assert af.deletion_vector["storageType"] == "u"


def test_delete_where_merges_existing_dv(spark, table):
    D.write_delta(_mkdf(spark, [{"k": i} for i in range(8)]).coalesce(1),
                  table)
    assert D.delete_where(spark, table, "k = 1") == 1
    assert D.delete_where(spark, table, "k IN (2, 3)") == 2
    got = sorted(r.k for r in D.read_delta(spark, table).collect())
    assert got == [0, 4, 5, 6, 7]
    af = D.snapshot(spark, table).files[0]
    assert af.deletion_vector["cardinality"] == 3  # 1 ∪ {2,3}
    # an already-deleted row matching again is a no-op union
    assert D.delete_where(spark, table, "k <= 2") == 3
    got = sorted(r.k for r in D.read_delta(spark, table).collect())
    assert got == [4, 5, 6, 7]
    # time travel sees the pre-delete states
    assert len(D.read_delta(spark, table, version=0).collect()) == 8
    assert len(D.read_delta(spark, table, version=1).collect()) == 7


def test_delete_where_no_match_and_multi_file(spark, table):
    for i in range(3):
        D.write_delta(_mkdf(spark, [{"k": 10 * i + j} for j in range(4)])
                      .coalesce(1), table)
    assert D.delete_where(spark, table, "k > 999") is None
    v = D.delete_where(spark, table, "k % 10 = 0")  # one row per file
    assert v == 3
    snap = D.snapshot(spark, table)
    assert all(af.deletion_vector for af in snap.files)
    got = sorted(r.k for r in D.read_delta(spark, table).collect())
    assert got == sorted(10 * i + j for i in range(3) for j in range(1, 4))


def test_delete_where_partitioned_and_roundtrip_serializer(spark, table):
    rows = [{"k": i, "tag": "a" if i < 5 else "b"} for i in range(10)]
    D.write_delta(_mkdf(spark, rows), table, partition_by=["tag"])
    v = D.delete_where(spark, table, "tag = 'a' AND k < 2")
    assert v == 1
    got = sorted(r.k for r in D.read_delta(spark, table).collect())
    assert got == list(range(2, 10))
    # serializer/parser round trip incl. a high bucket
    pos = [0, 5, (1 << 32) + 123]
    data = D._serialize_dv_bitmaps(pos)
    back = D._parse_dv_bitmaps(data, expected_cardinality=3)
    assert list(back) == sorted(pos)


def test_delete_where_then_vacuum_keeps_sidecar(spark, table):
    D.write_delta(_mkdf(spark, [{"k": i} for i in range(6)]).coalesce(1),
                  table)
    D.delete_where(spark, table, "k = 5")
    removed = D.vacuum_data_files(spark, table, retain_ms=0)
    assert removed == []  # data file + live sidecar both protected
    assert sorted(r.k for r in D.read_delta(spark, table).collect()) \
        == [0, 1, 2, 3, 4]


def test_compact_purges_deletion_vectors(spark, table):
    """OPTIMIZE over DV-carrying files: deleted rows are dropped
    physically, the rewritten files carry no DV, and the logical rows
    are unchanged — even a single-file table qualifies when it has a
    DV (the purge trigger)."""
    D.write_delta(_mkdf(spark, [{"k": i} for i in range(8)]).coalesce(1),
                  table)
    D.delete_where(spark, table, "k >= 6")
    v = D.compact_delta(spark, table)  # 1 file, but DV'd → rewritten
    assert v == 2
    snap = D.snapshot(spark, table)
    assert snap.num_files == 1
    assert snap.files[0].deletion_vector is None
    got = sorted(r.k for r in D.read_delta(spark, table).collect())
    assert got == list(range(6))
    # vacuum can now drop the pre-purge file AND its sidecar
    removed = D.vacuum_data_files(spark, table, retain_ms=0)
    assert any(r.endswith(".parquet") for r in removed)
    assert any(r.startswith("deletion_vector_") for r in removed)
    assert sorted(r.k for r in D.read_delta(spark, table).collect()) \
        == list(range(6))


def test_compact_mixed_dv_and_plain_partitioned(spark, table):
    rows = [{"k": i, "tag": "a" if i < 6 else "b"} for i in range(12)]
    D.write_delta(_mkdf(spark, rows), table, partition_by=["tag"])
    D.write_delta(_mkdf(spark, [{"k": 100, "tag": "a"}]), table,
                  partition_by=["tag"])
    D.delete_where(spark, table, "k = 3")
    assert D.compact_delta(spark, table) is not None
    snap = D.snapshot(spark, table)
    assert all(af.deletion_vector is None for af in snap.files)
    got = sorted(r.k for r in D.read_delta(spark, table).collect())
    assert got == [0, 1, 2, 4, 5, 6, 7, 8, 9, 10, 11, 100]


def test_expire_snapshots_preserves_streaming_epoch_guard(spark, tmp_path):
    """Expiring snapshots that carry the streaming sink's epoch stamps
    must not regress committed_epoch — a replayed old epoch would
    otherwise double-commit after table maintenance."""
    root = str(tmp_path / "ice3")
    sink = I._epoch_sink(root, "qA", None)
    df = spark.createDataFrame([(1,)], "k long")
    for epoch in (0, 1, 2):
        sink(df, epoch)
    I.write_iceberg(_wdf(spark, [{"k": 9}]), root)  # unstamped snapshot
    assert I.committed_epoch(root, "qA") == 2
    got = I.expire_snapshots(root, keep_last=1)
    assert len(got["snapshots"]) == 3  # all stamped snapshots expired
    assert I.committed_epoch(root, "qA") == 2  # guard survives
    sink(df, 2)  # replay of the highest expired epoch: still a no-op
    assert len(I.load_metadata(root)["snapshots"]) == 1
    sink(df, 3)  # a genuinely new epoch commits
    assert I.committed_epoch(root, "qA") == 3


def test_compact_iceberg_purges_deletes_and_merges_files(spark, tmp_path):
    root = str(tmp_path / "ice4")
    s1 = I.write_iceberg(_wdf(spark, [{"k": 1}, {"k": 2}]).coalesce(1),
                         root)
    I.write_iceberg(_wdf(spark, [{"k": 3}]).coalesce(1), root)
    assert len(I.snapshot(root).data_files) == 2
    sid = I.compact_iceberg(spark, root)
    assert sid is not None
    snap = I.snapshot(root)
    assert len(snap.data_files) == 1
    got = sorted(r.k for r in I.read_iceberg(spark, root).collect())
    assert got == [1, 2, 3]
    # time travel to the pre-compaction snapshots still works
    assert sorted(r.k for r in
                  I.read_iceberg(spark, root, snapshot_id=s1)
                  .collect()) == [1, 2]
    # idempotent
    assert I.compact_iceberg(spark, root) is None
    # expiry then physically retires the old files
    got2 = I.expire_snapshots(root, keep_last=1)
    assert got2["snapshots"]
    assert sorted(r.k for r in I.read_iceberg(spark, root).collect()) \
        == [1, 2, 3]


def test_catalog_views_over_dv_and_cm_tables(spark, tmp_path):
    """register_lake_table routes through the native readers, so views
    over deletion-vector tables read the post-delete rows."""
    from apache_pinot_spark.catalog import PinotCatalog

    table = str(tmp_path / "dvtbl")
    D.write_delta(_mkdf(spark, [{"k": i} for i in range(6)]).coalesce(1),
                  table)
    D.delete_where(spark, table, "k >= 4")
    cat = PinotCatalog(spark, str(tmp_path / "wh"))
    cat.register_lake_table("dv_view", table, "delta")
    got = sorted(r.k for r in spark.sql(
        "SELECT k FROM dv_view").collect())
    assert got == [0, 1, 2, 3]
    # a time-travel-pinned view sees the pre-delete state
    cat.register_lake_table("dv_view_v0", table, "delta", version=0)
    assert spark.sql("SELECT COUNT(*) c FROM dv_view_v0").collect()[0].c == 6
