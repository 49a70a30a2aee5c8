"""CLP-style log encoding (functions/clp.py): in-place template
extraction, variable typing, byte-exact round-trip (including a
randomized punctuation-heavy batch), plan shape, and the compression
claim (logtype cardinality collapses)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from apache_pinot_spark.functions import clp as C


def test_encode_splits_template_and_vars(spark):
    df = spark.createDataFrame(
        [("Task task_123 failed after 500 ms with code -1",)], "msg string"
    )
    r = C.clp_encode(df, "msg").collect()[0]
    assert r["msg_logtype"] == "Task \x12 failed after \x11 ms with code \x11"
    assert r["msg_dictionaryVars"] == ["task_123"]
    assert r["msg_encodedVars"] == [500, -1]


def test_encode_extracts_variables_in_place(spark):
    """The CLP point: ints embedded in punctuation still become encoded
    variables; every delimiter stays verbatim in the logtype."""
    df = spark.createDataFrame(
        [("user=1234, path=/a/b1 [INFO] 99%",)], "msg string"
    )
    r = C.clp_encode(df, "msg").collect()[0]
    assert r["msg_logtype"] == "user=\x11, path=/a/\x12 [INFO] \x11%"
    assert r["msg_dictionaryVars"] == ["b1"]
    assert r["msg_encodedVars"] == [1234, 99]


def test_decode_round_trip_exact(spark):
    msgs = [
        "Task task_123 failed after 500 ms with code -1",
        "plain words only",
        "double  space   and uuid 550e8400-e29b 41d4",
        "float 0.50 encodes packed",  # canonical decimal → encodedVars (r6)
        "user=1234,path=/a/b9?q=3&r=0x7f",
        "",
        "42",
        "\x11 raw placeholder bytes \x12",  # escape: whole-message dict var
    ]
    df = spark.createDataFrame([(m,) for m in msgs], "msg string")
    enc = C.clp_encode(df, "msg", drop_original=False)
    out = enc.withColumn(
        "back", C.clp_decode("msg_logtype", "msg_dictionaryVars", "msg_encodedVars")
    ).collect()
    for r in out:
        assert r["back"] == r["msg"], (r["msg"], r["back"])


def test_round_trip_randomized_batch(spark):
    """300 random messages mixing words, embedded ints, hexes, floats,
    punctuation, repeated spaces, and placeholder bytes — one Spark job,
    every row must round-trip byte-exactly."""
    rng = random.Random(3)
    vocab = ["error", "GET", "/api/v2", "took", "ok", "", " ", "a=5,b=77",
             "1234", "-7", "0.25", "0xdeadbeef", "id_42x", "[WARN]", "(3)",
             "x:9;y:10", "\x11", "\x12weird", "50%..", "t=-3"]
    msgs = [" ".join(rng.choices(vocab, k=rng.randrange(0, 12))) for _ in range(300)]
    df = spark.createDataFrame([(m,) for m in msgs], "msg string")
    bad = (
        C.clp_encode(df, "msg", drop_original=False)
        .withColumn(
            "back",
            C.clp_decode("msg_logtype", "msg_dictionaryVars", "msg_encodedVars"),
        )
        .where(F.col("back") != F.col("msg"))
        .count()
    )
    assert bad == 0


def test_logtype_cardinality_collapses(spark):
    """The compression premise: many distinct messages, few templates —
    including ids embedded in key=value punctuation."""
    df = spark.range(5000).select(
        F.concat(
            F.lit("req id="), F.col("id").cast("string"),
            F.lit(" served in "), (F.col("id") % 97).cast("string"), F.lit("ms"),
        ).alias("msg")
    )
    enc = C.clp_encode(df, "msg")
    assert enc.select("msg_logtype").distinct().count() == 1
    assert enc.count() == 5000
    # variable search runs on slim arrays, not message text
    hits = enc.where(F.array_contains(F.col("msg_encodedVars"), 4321)).count()
    assert hits == 1


def test_clp_plan_is_jvm_only(spark):
    df = spark.createDataFrame([("a 1 b",)], "msg string")
    plan = (
        C.clp_encode(df, "msg", drop_original=False)
        .withColumn(
            "back",
            C.clp_decode("msg_logtype", "msg_dictionaryVars", "msg_encodedVars"),
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "Exchange" not in plan  # pure map-side


def test_clpdecode_sql_surface(spark):
    from apache_pinot_spark.sqlfront import PinotEngine

    msgs = ["Task task_9 failed after 42 ms", "no vars here", "k=7,v=xy3"]
    df = spark.createDataFrame([(m,) for m in msgs], "msg string")
    eng = PinotEngine(spark)
    eng.register("logs", C.clp_encode(df, "msg", drop_original=False))
    out = eng.sql(
        "SELECT msg, CLPDECODE(msg_logtype, msg_dictionaryVars, msg_encodedVars) AS back "
        "FROM logs LIMIT 10"
    ).collect()
    assert all(r["back"] == r["msg"] for r in out) and len(out) == 3


def test_float_variables_pack_into_encoded_stream(spark):
    """Canonical decimals get the CLP float-to-long treatment: packed
    longs in the SAME encodedVars stream as ints (appearance order),
    '\\x13' placeholders, dictionary untouched; non-canonical numerics
    still fall to the dictionary."""
    df = spark.createDataFrame(
        [("lat=-3.14 n=42 pct=0.500 v=007.5 r=1.2.3",)], "msg string"
    )
    r = C.clp_encode(df, "msg").collect()[0]
    assert r["msg_logtype"] == "lat=\x13 n=\x11 pct=\x13 v=\x12 r=\x12"
    assert r["msg_dictionaryVars"] == ["007.5", "1.2.3"]
    evs = r["msg_encodedVars"]
    assert len(evs) == 3 and evs[1] == 42  # -3.14, 42, 0.500 in order
    # the packed values decode to the exact renderings
    back = spark.range(1).select(
        *[
            C.unpack_float_str(F.lit(v)).alias(f"f{i}")
            for i, v in ((0, evs[0]), (2, evs[2]))
        ]
    ).collect()[0]
    assert (back["f0"], back["f2"]) == ("-3.14", "0.500")


def test_float_round_trip_randomized(spark):
    """500 random float-bearing messages — trailing zeros, negatives,
    long mantissas straddling the 15-digit cutoff, non-canonical forms —
    must round-trip byte-exactly through BOTH the DataFrame decode and
    the CLPDECODE SQL surface."""
    from apache_pinot_spark.sqlfront import PinotEngine

    rng = random.Random(11)

    def rand_float():
        ip = str(rng.randrange(0, 10 ** rng.randrange(1, 9)))
        fp = "".join(rng.choice("0123456789") for _ in range(rng.randrange(1, 9)))
        return f"{'-' if rng.random() < 0.4 else ''}{ip}.{fp}"

    vocab = ["x", "=", " ", ",", "[ok]", "007.5", "1e-3", "9.", ".25",
             "123456789012345.5", "12345678901234.5", "0.000"]
    msgs = [
        " ".join(
            rng.choice([rand_float(), rng.choice(vocab)])
            for _ in range(rng.randrange(1, 10))
        )
        for _ in range(500)
    ]
    df = spark.createDataFrame([(m,) for m in msgs], "msg string")
    enc = C.clp_encode(df, "msg", drop_original=False)
    bad = (
        enc.withColumn(
            "back",
            C.clp_decode("msg_logtype", "msg_dictionaryVars", "msg_encodedVars"),
        )
        .where(F.col("back") != F.col("msg"))
        .count()
    )
    assert bad == 0
    eng = PinotEngine(spark)
    eng.register("flogs", enc)
    sql_bad = eng.sql(
        "SELECT COUNT(*) AS c FROM flogs WHERE "
        "CLPDECODE(msg_logtype, msg_dictionaryVars, msg_encodedVars) <> msg"
    ).collect()[0]["c"]
    assert sql_bad == 0
