"""RoaringBitmap BYTES wire interop: byte-identical serialization vs
the REAL RoaringBitmap jar (RoaringBitmap-1.3.0 ships on Spark's
classpath), portable-spec parsing of all three container types, and the
DISTINCTCOUNTBITMAP SQL surface over registered serialized columns.

Recorded goldens pin the format even where the jar is absent; when the
jar is present the tests additionally round-trip through the library
both directions (including runOptimize parity — the library's
container-selection rule reproduced bit-for-bit)."""

from __future__ import annotations

import random

import numpy as np
import pytest

from apache_pinot_spark.functions import bitmap_wire as BW

pytestmark = pytest.mark.slow  # excluded from the default driver-verify lane (see pytest.ini)


def _jser(jvm, bm) -> bytes:
    baos = jvm.java.io.ByteArrayOutputStream()
    bm.serialize(jvm.java.io.DataOutputStream(baos))
    return bytes(x & 0xFF for x in baos.toByteArray())


def _jbitmap(jvm, vals):
    bm = jvm.org.roaringbitmap.RoaringBitmap()
    for v in vals:
        bm.add(v if v < 2**31 else v - 2**32)  # java int is signed
    return bm


_CASES = [
    [0],
    [1, 2, 3, 100_000, 2**31, 2**32 - 1],
    "array5000",  # 5000 sampled values in [0, 2^20): array containers
    "dense9000",  # 9000 consecutive: bitmap container / run candidate
    "sparse3000",  # 3000 sampled over the full uint32 range
    "mixed",  # full low chunk + sampled high chunk
]


def _case_values(case) -> list[int]:
    r = random.Random(7)
    if case == "array5000":
        return sorted(r.sample(range(0, 1 << 20), 5000))
    if case == "dense9000":
        return list(range(100_000, 109_000))
    if case == "sparse3000":
        return sorted(r.sample(range(0, 1 << 32), 3000))
    if case == "mixed":
        return list(range(0, 70_000)) + sorted(
            r.sample(range(1 << 30, (1 << 30) + 100_000), 8000)
        )
    return list(case)


# --------------------------------------------------------------------------
# Format goldens that hold with NO jvm: hand-checked against the
# published RoaringFormatSpec (cookie/headers/array container).
# --------------------------------------------------------------------------
def test_recorded_golden_no_jvm():
    bm = BW.RoaringBitmap32.from_values(np.array([1, 2, 3, 0x10001]))
    blob = BW.serialize(bm)
    # cookie 12346, 2 containers; keys 0 (card 3) and 1 (card 1);
    # offsets 8 + 8 + 8 = 24 and 24 + 6 = 30; then sorted uint16 arrays
    assert blob == bytes.fromhex(
        "3a30000002000000" "0000020001000000" "18000000" "1e000000"
        "010002000300" "0100"
    )
    back = BW.deserialize(blob)
    assert back.cardinality() == 4
    assert np.array_equal(back.to_values(), np.array([1, 2, 3, 0x10001], np.uint32))


def test_run_container_golden_no_jvm():
    # 0..9999 is one run: runOptimize must emit cookie 12347, one run
    # container (nbruns=1, start=0, len-1=9999), no offset header
    # (size 1 < NO_OFFSET_THRESHOLD)
    bm = BW.RoaringBitmap32.from_values(np.arange(10_000))
    blob = BW.serialize(bm, run_optimize=True)
    assert blob == bytes.fromhex("3b300000" "01" "00000f27" "0100" "00000f27")
    back = BW.deserialize(blob)
    assert back.cardinality() == 10_000
    assert back.contains(0) and back.contains(9999) and not back.contains(10_000)


def test_hostile_blobs_rejected():
    good = BW.serialize(BW.RoaringBitmap32.from_values(np.array([1, 2, 3])))
    with pytest.raises(ValueError):
        BW.deserialize(b"\x00")  # too short
    with pytest.raises(ValueError):
        BW.deserialize(b"\xff\xff\xff\xff" + good[4:])  # bad cookie
    with pytest.raises(ValueError):
        BW.deserialize(good[:-2])  # truncated payload
    with pytest.raises(ValueError):
        # descriptive header truncated
        BW.deserialize(good[:10])
    # duplicate container key
    dup = bytearray(
        BW.serialize(BW.RoaringBitmap32.from_values(np.array([1, 0x10001])))
    )
    dup[12:14] = dup[8:10]  # second key := first key
    with pytest.raises(ValueError):
        BW.deserialize(bytes(dup))
    with pytest.raises(ValueError):
        BW.RoaringBitmap32.from_values(np.array([-1]))
    with pytest.raises(ValueError):
        BW.RoaringBitmap32.from_values(np.array([2**32]))


def test_merge_blobs_and_membership():
    a = BW.serialize(BW.RoaringBitmap32.from_values(np.arange(0, 6000)))
    b = BW.serialize(BW.RoaringBitmap32.from_values(np.arange(3000, 9000)))
    u = BW.merge_blobs([a, None, b])
    assert u.cardinality() == 9000
    assert u.contains(0) and u.contains(8999) and not u.contains(9000)
    # union blob re-parses to the same set (two-phase merge safety)
    again = BW.deserialize(BW.serialize(u))
    assert again.cardinality() == 9000


@pytest.mark.parametrize("case", _CASES, ids=[str(c)[:20] for c in _CASES])
def test_wire_parity_with_java(spark, case):
    """Byte-identical both directions vs org.roaringbitmap, plain AND
    runOptimize()d serialization."""
    jvm = spark._jvm
    try:
        _jbitmap(jvm, [1])
    except Exception:
        pytest.skip("RoaringBitmap jar not on the Spark classpath")
    vals = _case_values(case)
    jbm = _jbitmap(jvm, vals)
    ours = BW.RoaringBitmap32.from_values(np.array(vals, dtype=np.int64))
    # java blob -> us: same set
    parsed = BW.deserialize(_jser(jvm, jbm))
    assert parsed.cardinality() == jbm.getCardinality()
    assert np.array_equal(parsed.to_values(), ours.to_values())
    # us -> bytes identical to java's, no runOptimize
    assert BW.serialize(ours) == _jser(jvm, jbm)
    # runOptimize parity: same container-selection decisions, same bytes
    jbm.runOptimize()
    assert BW.serialize(ours, run_optimize=True) == _jser(jvm, jbm)
    # and java can load OUR run-optimized blob back
    j2 = jvm.org.roaringbitmap.RoaringBitmap()
    j2.deserialize(
        jvm.java.io.DataInputStream(
            jvm.java.io.ByteArrayInputStream(
                bytearray(BW.serialize(ours, run_optimize=True))
            )
        )
    )
    assert j2.getCardinality() == len(set(vals))


def test_distinctcountbitmap_sql_surface(spark):
    """End-to-end DISTINCTCOUNTBITMAP over a migrated serialized-bitmap
    BYTES column: build wire blobs per (group, segment) like a migrating
    user's table holds them, register, and the union-count answer equals
    the exact distinct count of the underlying values."""
    import pandas as pd
    from pyspark.sql import functions as F

    from apache_pinot_spark.sqlfront import PinotEngine

    r = random.Random(11)
    rows = [
        (f"g{i % 3}", i % 7, r.randrange(0, 50_000)) for i in range(4000)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "seg", "uid"]))
    blobs = BW.bitmap_aggregate(df, ["g", "seg"], "uid").withColumnRenamed(
        "bitmap", "uid_bitmap"
    )
    eng = PinotEngine(spark)
    eng.register("bitmap_t", blobs)
    eng.register_bitmap_column("uid_bitmap")
    got = {
        row["g"]: row["dc"]
        for row in eng.sql(
            "SELECT g, DISTINCTCOUNTBITMAP(uid_bitmap) AS dc FROM bitmap_t "
            "GROUP BY g ORDER BY g"
        ).collect()
    }
    want = {
        row["g"]: row["dc"]
        for row in df.groupBy("g")
        .agg(F.countDistinct("uid").alias("dc"))
        .collect()
    }
    assert got == want
    # RAW form: merged blob parses to the global distinct count, and the
    # real Java library loads it too (when present)
    raw_hex = eng.sql(
        "SELECT DISTINCTCOUNTRAWBITMAP(uid_bitmap) AS blob FROM bitmap_t"
    ).collect()[0]["blob"]
    merged = BW.deserialize(bytes.fromhex(raw_hex))
    assert merged.cardinality() == df.select("uid").distinct().count()
    try:
        j = spark._jvm.org.roaringbitmap.RoaringBitmap()
        j.deserialize(
            spark._jvm.java.io.DataInputStream(
                spark._jvm.java.io.ByteArrayInputStream(
                    bytearray(bytes.fromhex(raw_hex))
                )
            )
        )
        assert j.getCardinality() == merged.cardinality()
    except Exception:
        pass  # jar absent: the format goldens above still pin the bytes
    # unregistered raw column stays on the exact JVM path
    eng.register("raw_t", df)
    n = eng.sql(
        "SELECT DISTINCTCOUNTBITMAP(uid) AS dc FROM raw_t"
    ).collect()[0]["dc"]
    assert n == df.select("uid").distinct().count()
    with pytest.raises(ValueError):
        eng.rewrite("SELECT DISTINCTCOUNTRAWBITMAP(uid) FROM raw_t")


def test_null_and_two_phase_union(spark):
    """All-NULL groups return 0 distinct (empty union), and a union of
    partial-union blobs equals the direct union (losslessly re-mergeable
    wire state — the property map-side partials rely on)."""
    import pandas as pd

    from apache_pinot_spark.functions.bitmap_wire import register_bitmap_udfs

    register_bitmap_udfs(spark)
    b1 = BW.serialize(BW.RoaringBitmap32.from_values(np.arange(0, 5000)))
    b2 = BW.serialize(BW.RoaringBitmap32.from_values(np.arange(2500, 7500)))
    b3 = BW.serialize(BW.RoaringBitmap32.from_values(np.arange(7000, 7600)))
    pdf = pd.DataFrame(
        {"g": ["a", "a", "a", "b"], "bm": [b1, b2, b3, None]}
    )
    df = spark.createDataFrame(pdf)
    df.createOrReplaceTempView("bm_nulls")
    out = {
        r["g"]: r["dc"]
        for r in spark.sql(
            "SELECT g, pinot_bitmap_card(bm) AS dc FROM bm_nulls GROUP BY g"
        ).collect()
    }
    assert out == {"a": 7600, "b": 0}
    # two-phase: partial unions then a final union
    p12 = BW.serialize(BW.merge_blobs([b1, b2]))
    direct = BW.merge_blobs([b1, b2, b3])
    twop = BW.merge_blobs([p12, b3])
    assert BW.serialize(twop) == BW.serialize(direct)


def test_fuzz_wire_parity_with_java(spark):
    """Seeded fuzz: random container mixes (sparse arrays, dense
    runs, full-container spans, random strides across distant high
    keys) must serialize byte-identically to the jar, both plain and
    runOptimize()d, and parse back to the same set."""
    jvm = spark._jvm
    try:
        _jbitmap(jvm, [1])
    except Exception:
        pytest.skip("RoaringBitmap jar not on the Spark classpath")
    import numpy as np

    rng = np.random.default_rng(19)
    for trial in range(12):
        chunks = []
        for _ in range(rng.integers(1, 5)):
            base = int(rng.integers(0, 2**32 - 70_000))
            kind = rng.integers(0, 4)
            if kind == 0:  # sparse scatter
                chunks.append(base + rng.choice(60_000, rng.integers(1, 300), replace=False))
            elif kind == 1:  # dense run
                n = int(rng.integers(1, 30_000))
                chunks.append(np.arange(base, base + n))
            elif kind == 2:  # strided (run-hostile)
                chunks.append(base + np.arange(0, 40_000, int(rng.integers(2, 9))))
            else:  # several short runs
                for _ in range(int(rng.integers(2, 6))):
                    s = base + int(rng.integers(0, 50_000))
                    chunks.append(np.arange(s, s + int(rng.integers(1, 50))))
        vals = np.unique(np.concatenate(chunks) % (2**32)).astype(np.int64)
        ours = BW.RoaringBitmap32.from_values(vals)
        jbm = _jbitmap(jvm, [int(v) for v in vals])
        assert BW.serialize(ours) == _jser(jvm, jbm), f"plain trial {trial}"
        jbm.runOptimize()
        opt = BW.serialize(ours, run_optimize=True)
        assert opt == _jser(jvm, jbm), f"runopt trial {trial}"
        back = BW.deserialize(opt)
        assert back.cardinality() == vals.size
        assert np.array_equal(back.to_values(), vals.astype(np.uint32))
