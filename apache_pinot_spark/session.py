"""SparkSession factory with scale-oriented defaults.

Tuned for the driver harness (local[N], 128 GiB, single JVM) but every
setting is chosen to also be the right call on a 1000-executor cluster:
AQE for runtime re-planning + skew-join splitting, partition coalescing so
small SFs don't pay 200-task overheads, broadcast threshold sized for the
dimension tables of a star schema, UTC session timezone for deterministic
time semantics (Pinot stores epoch millis — TZ-free; see
reference configuration-reference/schema.md:69-72).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime (non-static) confs that must hold on ANY session we are handed,
# including the driver's. Applied by `configure()`.
RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Star-schema dims (region/nation/supplier/part/customer) are tiny at any
    # SF relative to fact tables; broadcast aggressively.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.parquet.aggregatePushdown": "true",
    # shuffle.partitions IS runtime-settable: applying it here means the
    # driver's vanilla session also runs right-sized shuffles (AQE
    # coalescing then adapts upward at real scale) instead of the 200
    # default per tiny aggregate.
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Split-size floor for file scans. The 4 MiB default caps small-SF
    # scan parallelism at ~3 tasks for a 12 MiB parquet file; 512 KiB lets
    # local[32] use its cores. At cluster scale this conf is inert: split
    # size is then governed by totalBytes/defaultParallelism and
    # maxPartitionBytes, both far above the floor.
    "spark.sql.files.openCostInBytes": str(512 * 1024),
}

def _default_driver_mem() -> str:
    """min(8g, 40% of MemTotal), floor 4g. local[N] runs every executor
    thread inside the driver JVM: the heap must hold N concurrent task
    working sets plus short-lived persisted frames (dedup/ANN operators
    cache intermediates for the duration of one call — see
    operators/lifecycle.py for the deterministic release). Sized from the
    host rather than hardcoded so smaller machines aren't OOM-killed.

    The cap is DELIBERATELY small, not "as much as the host has" — two
    rounds of A/B established that on this VM, suite latency variance
    scales with resident set size, not with heap headroom:
      * 32g ceiling (round 3): G1 almost never collected, kept committing
        fresh pages; page-fault/compaction storms cost ~150 CPU-s of
        kernel time and hit random queries with 3-10x spikes.
      * 16g pinned (round 4): stable immediately after start, but a
        kernel page-scanning daemon on this host charges time
        proportional to process RSS — the longer the JVM lives, the
        slower identical queries get (observed: a pure-JVM query 1.3 s →
        64 s between adjacent passes, zero GC, 195 CPU-s of kernel time).
      * 8g pinned (round 5 A/B): identical best-pass throughput at sf0.1
        (best_total 35.4 vs 35.3 s), run-to-run worst ratio 1.9x vs up
        to 71x — half the RSS, half the scan exposure.
    6g was NOT safe: the blocked-GEMM ANN operators spilled (55 s vs
    2 s). On a real cluster this maps to executor memory, where the same
    sizing logic (working set per core x cores + cached partitions)
    applies and the host-daemon concern is moot."""
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("MemTotal:"):
                    gib = int(line.split()[1]) / (1024 * 1024)
                    return f"{max(4, min(8, int(gib * 0.4)))}g"
    except OSError:
        pass
    return "8g"


# Static confs — only settable at session build time.
_DRIVER_MEM = os.environ.get("SPARK_GRAFT_DRIVER_MEM", _default_driver_mem())

STATIC_CONFS = {
    "spark.sql.parquet.filterPushdown": "true",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.driver.memory": _DRIVER_MEM,
    # PIN the heap (-Xms == -Xmx, pre-touched). A dynamically-sized heap
    # commits and uncommits pages as G1 grows/shrinks; on this VM that
    # churn intermittently cost 100+ CPU-seconds of *kernel* time
    # (page-fault/reclaim storms) and showed up as random 3-10x query
    # spikes. With the heap committed once at startup the storms are
    # gone (6-round A/B: max 4.0s vs a 15.1s spike). Same reasoning
    # applies to executor JVMs on a real cluster.
    # MetaspaceSize raises the threshold that triggers a metaspace-induced
    # full GC: whole-stage codegen loads thousands of janino classes per
    # suite run, and the default ~21 MB high-water mark forces periodic
    # stop-the-world collections mid-query.
    "spark.driver.extraJavaOptions": (
        f"-Xms{_DRIVER_MEM} -XX:+AlwaysPreTouch -XX:MetaspaceSize=256m"
    ),
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (driver-provided or ours)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf may be static on this session; accept its value
    return spark


def get_spark(app_name: str = "apache-pinot-spark", cpus: int | None = None) -> SparkSession:
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    b = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    for k, v in STATIC_CONFS.items():
        b = b.config(k, v)
    for k, v in RUNTIME_CONFS.items():
        b = b.config(k, v)
    return configure(b.getOrCreate())
