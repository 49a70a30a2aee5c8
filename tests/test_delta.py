"""Native Delta Lake tier (sources/delta.py): log reconstruction per
the published protocol, partition reconstitution + metadata-level
pruning, time travel, checkpoints, overwrite semantics, protocol-gate
rejects, atomic commit race, and an independent-reimplementation
cross-check of the state-reconstruction rule."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from apache_pinot_spark.sources import delta as D


def _mkdf(spark, rows):
    return spark.createDataFrame([Row(**r) for r in rows])


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def test_create_append_read_round_trip(spark, table):
    v0 = D.write_delta(_mkdf(spark, [
        {"k": 1, "s": "a"}, {"k": 2, "s": "b"}]), table)
    assert v0 == 0
    v1 = D.write_delta(_mkdf(spark, [{"k": 3, "s": "c"}]), table)
    assert v1 == 1
    got = D.read_delta(spark, table).orderBy("k").collect()
    assert [(r.k, r.s) for r in got] == [(1, "a"), (2, "b"), (3, "c")]
    # log layout follows the spec naming
    names = sorted(os.listdir(os.path.join(table, "_delta_log")))
    assert names[0] == "00000000000000000000.json"


def test_partitioned_write_and_reconstitution(spark, table):
    rows = [{"k": i, "part": f"p{i % 3}", "v": float(i)} for i in range(30)]
    D.write_delta(_mkdf(spark, rows), table, partition_by=["part"])
    df = D.read_delta(spark, table)
    assert set(df.columns) == {"k", "part", "v"}
    got = df.orderBy("k").collect()
    assert [r.part for r in got] == [f"p{i % 3}" for i in range(30)]
    # partition column really is directory-encoded, not in the files
    snap = D.snapshot(spark, table)
    assert all(af.partition_values.get("part") for af in snap.files)
    assert all(af.path.startswith("part=") for af in snap.files)


def test_metadata_level_partition_pruning(spark, table):
    rows = [{"k": i, "part": f"p{i % 4}"} for i in range(40)]
    D.write_delta(_mkdf(spark, rows), table, partition_by=["part"])
    pruned = D.read_delta(spark, table,
                          partition_filter=lambda pv: pv["part"] == "p1")
    got = pruned.collect()
    assert len(got) == 10 and all(r.part == "p1" for r in got)
    # the pruned plan must scan FEWER files than the table holds
    snap = D.snapshot(spark, table)
    n_selected = len([af for af in snap.files
                      if af.partition_values["part"] == "p1"])
    assert 0 < n_selected < snap.num_files
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # every scheduled path is a p1 path (file list baked at metadata time)
    assert "part=p2" not in plan


def test_typed_partition_values(spark, table):
    rows = [{"k": i, "day": i % 2} for i in range(8)]
    D.write_delta(_mkdf(spark, rows), table, partition_by=["day"])
    df = D.read_delta(spark, table,
                      partition_filter=lambda pv: pv["day"] == 1)
    got = df.collect()
    assert len(got) == 4 and all(r.day == 1 for r in got)
    assert df.schema["day"].dataType.typeName() == "long"


def test_overwrite_removes_previous_files(spark, table):
    D.write_delta(_mkdf(spark, [{"k": 1}]), table)
    D.write_delta(_mkdf(spark, [{"k": 2}]), table)
    D.write_delta(_mkdf(spark, [{"k": 99}]), table, mode="overwrite")
    got = D.read_delta(spark, table).collect()
    assert [r.k for r in got] == [99]
    # time travel still sees the pre-overwrite state
    old = D.read_delta(spark, table, version=1).orderBy("k").collect()
    assert [r.k for r in old] == [1, 2]


def test_time_travel_by_timestamp(spark, table):
    D.write_delta(_mkdf(spark, [{"k": 1}]), table)
    t0 = int(time.time() * 1000)
    # force a distinct commitInfo timestamp for the second commit
    time.sleep(0.05)
    D.write_delta(_mkdf(spark, [{"k": 2}]), table)
    got = D.read_delta(spark, table, timestamp_ms=t0).collect()
    assert [r.k for r in got] == [1]
    hist = D.delta_history(table)
    assert [h["version"] for h in hist] == [1, 0]
    assert hist[0]["operation"] == "WRITE"


def test_checkpoint_write_and_resume(spark, table):
    for i in range(6):
        D.write_delta(_mkdf(spark, [{"k": i}]), table,
                      checkpoint_interval=5)
    log = os.path.join(table, "_delta_log")
    assert "00000000000000000005.checkpoint.parquet" in os.listdir(log)
    assert json.load(open(os.path.join(log, "_last_checkpoint")))[
        "version"] == 5
    # drop the pre-checkpoint commits: reconstruction must still work
    assert D.vacuum_expired_commits(table, keep_last=2) > 0
    got = D.read_delta(spark, table).orderBy("k").collect()
    assert [r.k for r in got] == list(range(6))


def test_schema_comes_from_metadata_not_inference(spark, table):
    D.write_delta(_mkdf(spark, [{"k": 1, "s": "x"}]), table)
    snap = D.snapshot(spark, table)
    assert [f.name for f in snap.schema.fields] == ["k", "s"]
    assert snap.metadata["format"]["provider"] == "parquet"
    assert snap.protocol["minReaderVersion"] == 1


def test_protocol_gate_rejects_unknown_features(spark, table):
    """deletionVectors/columnMapping/timestampNtz reader features are
    now implemented and ACCEPTED; a genuinely unimplemented feature
    still rejects with its name."""
    D.write_delta(_mkdf(spark, [{"k": 1}]), table)
    log = os.path.join(table, "_delta_log")
    with open(os.path.join(log, "00000000000000000001.json"), "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors", "columnMapping",
                               "timestampNtz"]}}) + "\n")
    assert D.read_delta(spark, table).count() == 1  # all supported
    with open(os.path.join(log, "00000000000000000002.json"), "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["v2Checkpoint"]}}) + "\n")
    with pytest.raises(D.DeltaProtocolError, match="v2Checkpoint"):
        D.read_delta(spark, table)
    # reader version 2 (column mapping) is accepted now
    with open(os.path.join(log, "00000000000000000002.json"), "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 2, "minWriterVersion": 5}}) + "\n")
    assert D.read_delta(spark, table).count() == 1
    # a NON-SPEC column mapping mode still rejects
    with open(os.path.join(log, "00000000000000000003.json"), "w") as fh:
        snap_meta = {"id": "x", "format": {"provider": "parquet",
                                           "options": {}},
                     "schemaString": json.dumps(
                         {"type": "struct", "fields": []}),
                     "partitionColumns": [],
                     "configuration": {"delta.columnMapping.mode": "bogus"}}
        fh.write(json.dumps({"metaData": snap_meta}) + "\n")
    with pytest.raises(D.DeltaProtocolError, match="columnMapping"):
        D.read_delta(spark, table)


def test_deletion_vector_bad_descriptor_rejects(spark, table):
    """Unknown storageType and malformed 'u' payloads raise instead of
    returning deleted rows."""
    import urllib.parse as up

    D.write_delta(_mkdf(spark, [{"k": 1}]).coalesce(1), table)
    real = up.quote(D.snapshot(spark, table).files[0].path)
    log = os.path.join(table, "_delta_log")
    with open(os.path.join(log, "00000000000000000001.json"), "w") as fh:
        fh.write(json.dumps({"add": {
            "path": real, "partitionValues": {}, "size": 1,
            "modificationTime": 0, "dataChange": True,
            "deletionVector": {"storageType": "zz", "pathOrInlineDv": "d",
                               "offset": 0, "sizeInBytes": 1,
                               "cardinality": 1}}}) + "\n")
    with pytest.raises(D.DeltaProtocolError, match="storageType"):
        D.read_delta(spark, table).collect()
    with open(os.path.join(log, "00000000000000000001.json"), "w") as fh:
        fh.write(json.dumps({"add": {
            "path": real, "partitionValues": {}, "size": 1,
            "modificationTime": 0, "dataChange": True,
            "deletionVector": {"storageType": "u", "pathOrInlineDv": "d",
                               "offset": 0, "sizeInBytes": 1,
                               "cardinality": 1}}}) + "\n")
    with pytest.raises(D.DeltaProtocolError, match="20 chars"):
        D.read_delta(spark, table).collect()


def test_not_a_delta_table(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="_delta_log"):
        D.read_delta(spark, str(tmp_path / "nope"))


def test_commit_race_is_atomic(spark, table):
    """Two pre-computed commits racing for the same version: both land,
    at different versions, and both rows survive."""
    D.write_delta(_mkdf(spark, [{"k": 0}]), table)
    # simulate the loser: occupy version 1, then write_delta must slide
    # to version 2 instead of clobbering
    log = os.path.join(table, "_delta_log")
    with open(os.path.join(log, "00000000000000000001.json"), "w") as fh:
        fh.write(json.dumps({"commitInfo": {"timestamp": 0,
                                            "operation": "NOOP"}}) + "\n")
    v = D.write_delta(_mkdf(spark, [{"k": 1}]), table)
    assert v == 2
    got = D.read_delta(spark, table).orderBy("k").collect()
    assert [r.k for r in got] == [0, 1]


def test_url_encoded_paths_round_trip(spark, table):
    """Partition values with URL-hostile characters survive the
    quote/unquote cycle (spec: paths are url-encoded)."""
    rows = [{"k": 1, "tag": "a b"}, {"k": 2, "tag": "c/d"}]
    D.write_delta(_mkdf(spark, rows), table, partition_by=["tag"])
    got = {r.k: r.tag for r in D.read_delta(spark, table).collect()}
    assert got == {1: "a b", 2: "c/d"}


def test_independent_reconstruction_cross_check(spark, table):
    """Replay the log with a from-first-principles reimplementation of
    the reconstruction rule (adds minus later removes, last metaData
    wins) and compare the live file set — guards the reader against
    drifting from the spec it claims."""
    for i in range(3):
        D.write_delta(_mkdf(spark, [{"k": i}]), table)
    D.write_delta(_mkdf(spark, [{"k": 100}]), table, mode="overwrite")
    D.write_delta(_mkdf(spark, [{"k": 101}]), table)

    import urllib.parse
    live: dict[str, dict] = {}
    log = os.path.join(table, "_delta_log")
    for name in sorted(p for p in os.listdir(log) if p.endswith(".json")):
        for line in open(os.path.join(log, name)):
            a = json.loads(line)
            if "add" in a:
                live[urllib.parse.unquote(a["add"]["path"])] = a["add"]
            elif "remove" in a:
                live.pop(urllib.parse.unquote(a["remove"]["path"]), None)
    snap = D.snapshot(spark, table)
    assert sorted(live) == [af.path for af in snap.files]
    got = D.read_delta(spark, table).orderBy("k").collect()
    assert [r.k for r in got] == [100, 101]


def test_num_records_stats_written(spark, table):
    D.write_delta(_mkdf(spark, [{"k": i} for i in range(7)]), table)
    snap = D.snapshot(spark, table)
    assert sum(af.num_records or 0 for af in snap.files) == 7


def test_lake_entrypoint_uses_native_fallback(spark, table):
    """sources/lake.py read/write route to the native implementation
    when the connector jar is absent (and to the jar when present)."""
    from apache_pinot_spark.sources import lake as L

    df = _mkdf(spark, [{"k": 5}])
    L.write_lake(df, table, "delta", mode="append")
    back = L.read_lake(spark, table, "delta")
    assert [r.k for r in back.collect()] == [5]


def test_txn_idempotent_writes(spark, table):
    """The spec's txn action: a replayed (appId, version) commit is a
    no-op, and txn state survives checkpointing."""
    df1 = _mkdf(spark, [{"k": 1}])
    v0 = D.write_delta(df1, table, txn=("app", 0))
    assert v0 == 0
    # replay of version 0: no new commit, no duplicate rows
    v_replay = D.write_delta(df1, table, txn=("app", 0))
    assert v_replay == 0
    assert D.read_delta(spark, table).count() == 1
    v1 = D.write_delta(_mkdf(spark, [{"k": 2}]), table, txn=("app", 1))
    assert v1 == 1
    # a DIFFERENT app at the same version still writes
    v2 = D.write_delta(_mkdf(spark, [{"k": 3}]), table, txn=("app2", 0))
    assert v2 == 2
    snap = D.snapshot(spark, table)
    assert snap.txns == {"app": 1, "app2": 0}
    # txn state persists through a checkpoint + log vacuum
    D._write_checkpoint(spark, table, snap.version)
    assert D.vacuum_expired_commits(table, keep_last=0) > 0
    snap2 = D.snapshot(spark, table)
    assert snap2.txns == {"app": 1, "app2": 0}
    assert D.write_delta(df1, table, txn=("app", 1)) == snap2.version


def test_stream_to_delta_exactly_once(spark, tmp_path):
    """File stream → native Delta sink: every input row lands exactly
    once, and the per-epoch txn actions are recorded."""
    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        (src / f"f{i}.jsonl").write_text(
            "\n".join(json.dumps({"k": 10 * i + j}) for j in range(4)))
    from pyspark.sql import types as T

    stream = (spark.readStream
              .schema(T.StructType([T.StructField("k", T.LongType())]))
              .option("maxFilesPerTrigger", "1")
              .json(str(src)))
    table = str(tmp_path / "dtbl")
    q = D.stream_to_delta(stream, table, query_name="ingest_k",
                          checkpoint_dir=str(tmp_path / "ckpt"),
                          trigger={"availableNow": True})
    q.awaitTermination(120)
    got = sorted(r.k for r in D.read_delta(spark, table).collect())
    assert got == sorted(10 * i + j for i in range(3) for j in range(4))
    snap = D.snapshot(spark, table)
    assert "ingest_k" in snap.txns and snap.txns["ingest_k"] >= 1


def test_zone_map_stats_written_and_skip_rules(spark, table):
    D.write_delta(_mkdf(spark, [{"k": i, "s": f"v{i}"}
                                for i in range(10)]), table)
    snap = D.snapshot(spark, table)
    stats = [af.stats for af in snap.files if af.stats]
    assert stats and all("minValues" in st for st in stats)
    assert min(st["minValues"]["k"] for st in stats) == 0
    assert max(st["maxValues"]["k"] for st in stats) == 9
    assert min(st["minValues"]["s"] for st in stats) == "v0"
    assert max(st["maxValues"]["s"] for st in stats) == "v9"
    # exclusion rule boundaries
    s = {"minValues": {"k": 10}, "maxValues": {"k": 20}}
    assert D.stats_exclude(s, [("k", "=", 9)])
    assert not D.stats_exclude(s, [("k", "=", 10)])
    assert D.stats_exclude(s, [("k", "<", 10)])
    assert not D.stats_exclude(s, [("k", "<=", 10)])
    assert D.stats_exclude(s, [("k", ">", 20)])
    assert not D.stats_exclude(s, [("k", ">=", 20)])
    assert not D.stats_exclude(None, [("k", "=", 999)])
    assert not D.stats_exclude({}, [("k", "=", 999)])
    # incomparable types keep the file
    assert not D.stats_exclude(s, [("k", "=", "abc")])


def test_zone_map_skipping_never_opens_excluded_files(spark, table):
    """Two disjoint-range files; the excluded one is CORRUPTED on disk,
    so only metadata-level skipping can make the filtered read work."""
    import urllib.parse as up

    D.write_delta(_mkdf(spark, [{"k": i} for i in range(100)]), table)
    D.write_delta(_mkdf(spark, [{"k": i} for i in range(1000, 1100)]),
                  table)
    snap = D.snapshot(spark, table)
    low_file = next(af for af in snap.files
                    if af.stats["maxValues"]["k"] < 1000)
    with open(os.path.join(table, up.unquote(low_file.path)), "wb") as fh:
        fh.write(b"NOT PARQUET ANYMORE")
    got = D.read_delta(spark, table,
                       data_filters=[("k", ">=", 1000)]).collect()
    assert sorted(r.k for r in got) == list(range(1000, 1100))
    with pytest.raises(Exception):  # unfiltered read meets the corruption
        D.read_delta(spark, table).count()


def test_racing_overwrite_raises_concurrent_modification(spark, table):
    """A TRUE lost race (the winner lands AFTER our snapshot read, i.e.
    the slot we computed is occupied at commit time) with a non-append
    action set must raise instead of committing a merged state whose
    remove list misses the winner's adds."""
    D.write_delta(_mkdf(spark, [{"k": 0}]), table)
    log = os.path.join(table, "_delta_log")
    # the winner occupies the slot the overwrite would target (v1)
    with open(os.path.join(log, "00000000000000000001.json"), "w") as fh:
        fh.write(json.dumps({"commitInfo": {"timestamp": 0,
                                            "operation": "NOOP"}}) + "\n")
    overwrite_actions = [
        {"commitInfo": {"timestamp": 0, "operation": "WRITE"}},
        {"remove": {"path": "f0.parquet", "deletionTimestamp": 0,
                    "dataChange": True}},
        {"add": {"path": "f1.parquet", "partitionValues": {},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ]
    with pytest.raises(D.DeltaConcurrentModificationError):
        D._commit_atomically(table, overwrite_actions, 1)
    # the loser did NOT slide into version 2
    assert not os.path.exists(
        os.path.join(log, "00000000000000000002.json"))


def test_racing_append_still_retries(table, tmp_path):
    """Append-only action sets keep the safe slide-to-next-slot retry."""
    os.makedirs(os.path.join(table, "_delta_log"), exist_ok=True)
    log = os.path.join(table, "_delta_log")
    with open(os.path.join(log, "00000000000000000000.json"), "w") as fh:
        fh.write(json.dumps({"commitInfo": {"timestamp": 0}}) + "\n")
    v = D._commit_atomically(table, [
        {"commitInfo": {"timestamp": 1, "operation": "WRITE"}},
        {"add": {"path": "a.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}}], 0)
    assert v == 1


def test_racing_txn_replay_revalidates_post_race(table):
    """txn idempotence is re-checked against the POST-race log: if the
    commit that won our slot already recorded our (appId, version), the
    retry becomes a no-op returning the winner's version instead of
    double-committing the batch."""
    os.makedirs(os.path.join(table, "_delta_log"), exist_ok=True)
    log = os.path.join(table, "_delta_log")
    # the winner: a racing replay of OUR batch (same appId/version 1)
    with open(os.path.join(log, "00000000000000000001.json"), "w") as fh:
        fh.write(json.dumps({"txn": {"appId": "app", "version": 1,
                                     "lastUpdated": 0}}) + "\n")
    v = D._commit_atomically(table, [
        {"commitInfo": {"timestamp": 1, "operation": "WRITE"}},
        {"txn": {"appId": "app", "version": 1, "lastUpdated": 1}},
        {"add": {"path": "a.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}}], 1)
    assert v == 1  # the winner's version, not a new slot
    assert not os.path.exists(
        os.path.join(log, "00000000000000000002.json"))
    # a DIFFERENT app racing the same slot slides forward normally
    v2 = D._commit_atomically(table, [
        {"txn": {"appId": "other", "version": 1, "lastUpdated": 1}},
        {"add": {"path": "b.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}}], 1)
    assert v2 == 2


def test_symlinked_table_root_partition_reconstitution(spark, tmp_path):
    """Reading through a symlinked table root must still reconstitute
    partition columns (the file-map join keys and _metadata.file_path
    are normalized identically; a miss raises instead of NULL-filling)."""
    real = tmp_path / "real"
    real.mkdir()
    table = str(real / "tbl")
    D.write_delta(_mkdf(spark, [{"k": 1, "tag": "a"}, {"k": 2, "tag": "b"}]),
                  table, partition_by=["tag"])
    link = tmp_path / "link"
    os.symlink(str(real), str(link))
    got = {r.k: r.tag
           for r in D.read_delta(spark, str(link / "tbl")).collect()}
    assert got == {1: "a", 2: "b"}
