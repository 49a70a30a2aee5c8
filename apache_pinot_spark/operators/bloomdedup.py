"""Bloom-filter cross-snapshot dedup — the Dolma recipe's deduper shape.

Exact-hash dedup (operators/dedup.py) answers "is this text duplicated
WITHIN this corpus" with one shuffle. The question an incremental
corpus build asks is different: "was this text already in the LAST
release" — and joining every new snapshot against every old one grows
without bound. The published answer (Dolma's deduper; also the CCNet
dedup tier) is a Bloom filter: a fixed-size bit array the old corpus is
folded into ONCE, then probed at O(k) per new document with a bounded,
broadcastable artifact. No false negatives ever (a seen text always
probes seen); false positives at a tunable, accounted rate.

Spark shape:
  * **build**: k bit positions per key (double hashing, Kirsch-
    Mitzenmacher: pos_i = h1 + i*h2 mod m with h2 forced odd, m a power
    of two) → posexplode → ONE groupBy(word_idx) bit_or — the filter IS
    a DataFrame of (word_idx, bits) words, saved as parquet + JSON meta.
  * **probe**: k chained BROADCAST joins (one per hash, each a map-side
    lookup) — ZERO shuffles over the corpus being filtered; the
    automatic fallback for filters past ``broadcast_cap_bytes`` is the
    posexplode + one-shuffle aggregate form.
  * **hashes**: 'xxhash64' (JVM fast path) or 'md5' (the repo's
    portable-oracle convention — every position is replayable in DuckDB
    with md5/substring/conv arithmetic, so membership itself is
    hash-checkable cross-engine).
  * **paragraph granularity**: build/probe over exploded paragraphs;
    ``dedup_paragraphs`` rewrites documents keeping only unseen
    paragraphs (the Dolma paragraph mode), preserving order.

All positions are computed as JVM expressions; NULL/empty keys are
never inserted and never match (xxhash64(NULL) would otherwise alias
the seed hash — the standing gotcha).
"""

from __future__ import annotations

import json
import math
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: filters at or under this many BYTES of bit-array take the zero-shuffle
#: broadcast probe; bigger ones fall back to the explode+aggregate form
_DEFAULT_BROADCAST_CAP = 64 << 20


def _check_spec(m_bits: int, k: int) -> None:
    if m_bits <= 0 or m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two, got {m_bits}")
    if m_bits < 64:
        raise ValueError("m_bits must be at least one 64-bit word")
    if not 1 <= k <= 16:
        raise ValueError(f"k must be in 1..16, got {k}")


def _hash_pair(col: F.Column, hash_mode: str) -> tuple[F.Column, F.Column]:
    """(h1, h2) for double hashing (_positions reduces both mod m and
    forces the stride odd so it cycles the full power-of-two table).
    md5 mode uses 60-bit hex prefixes — the portable convention DuckDB
    replays with md5/substr and a '0x' cast."""
    if hash_mode == "xxhash64":
        h1 = F.xxhash64(col)
        h2 = F.xxhash64(col, F.lit(1))
    elif hash_mode == "md5":
        hx = F.md5(col)
        h1 = F.conv(F.substring(hx, 1, 15), 16, 10).cast("long")
        h2 = F.conv(F.substring(hx, 17, 15), 16, 10).cast("long")
    else:
        raise ValueError("hash_mode must be 'xxhash64' or 'md5'")
    return h1, h2


def _positions(col: F.Column, m_bits: int, k: int,
               hash_mode: str) -> F.Column:
    h1, h2 = _hash_pair(col, hash_mode)
    # reduce mod m BEFORE the linear combination: identical positions
    # (mod-arithmetic identity), and i*h2p stays far under 2^63 so ANSI
    # mode cannot overflow (raw xxhash64 values are full 64-bit)
    h1p = F.pmod(h1, F.lit(m_bits))
    h2p = F.pmod(h2, F.lit(m_bits)).bitwiseOR(F.lit(1))
    return F.array(*[
        F.pmod(h1p + F.lit(i) * h2p, F.lit(m_bits)) for i in range(k)])


def build_bloom(df: DataFrame, key_col: str, *, m_bits: int = 1 << 24,
                k: int = 7, hash_mode: str = "xxhash64") -> DataFrame:
    """Fold a corpus's keys into a Bloom filter: a DataFrame of
    (word_idx BIGINT, bits BIGINT) — only set words materialize (sparse
    for small corpora, dense-bounded at m_bits/64 rows). One shuffle."""
    _check_spec(m_bits, k)
    key = F.col(key_col)
    pos = F.explode(_positions(key, m_bits, k, hash_mode)).alias("pos")
    words = (df
             .where(key.isNotNull() & (F.length(key) > 0))
             .select(pos)
             .select(F.shiftright("pos", 6).alias("word_idx"),
                     # SQL-level shiftleft: the Python wrapper only takes
                     # literal shift amounts
                     F.expr("shiftleft(1L, CAST(pos & 63 AS INT))")
                     .alias("mask"))
             .groupBy("word_idx")
             .agg(F.bit_or("mask").alias("bits")))
    return words


def update_bloom(bloom: DataFrame, df: DataFrame, key_col: str,
                 meta: dict[str, Any]) -> DataFrame:
    """Fold another snapshot's keys into an existing filter (the
    incremental-release flow): union + one re-aggregate."""
    extra = build_bloom(df, key_col, m_bits=meta["m_bits"], k=meta["k"],
                        hash_mode=meta["hash_mode"])
    return (bloom.unionByName(extra)
            .groupBy("word_idx").agg(F.bit_or("bits").alias("bits")))


def save_bloom(bloom: DataFrame, path: str, *, m_bits: int, k: int,
               hash_mode: str, n_items: int | None = None) -> dict[str, Any]:
    """Persist filter words as parquet + a JSON meta sidecar. Returns
    the meta dict (m/k/hash plus the theoretical FPP when n is known)."""
    bloom.write.mode("overwrite").parquet(os.path.join(path, "words"))
    meta: dict[str, Any] = {"m_bits": m_bits, "k": k,
                            "hash_mode": hash_mode, "n_items": n_items}
    if n_items is not None:
        meta["theoretical_fpp"] = theoretical_fpp(n_items, m_bits, k)
    with open(os.path.join(path, "bloom_meta.json"), "w",
              encoding="utf-8") as fh:
        json.dump(meta, fh)
    return meta


def load_bloom(spark: SparkSession, path: str) -> tuple[DataFrame,
                                                        dict[str, Any]]:
    with open(os.path.join(path, "bloom_meta.json"), encoding="utf-8") as fh:
        meta = json.load(fh)
    return spark.read.parquet(os.path.join(path, "words")), meta


def theoretical_fpp(n: int, m_bits: int, k: int) -> float:
    """(1 - e^{-kn/m})^k — the standard Bloom false-positive estimate."""
    if n <= 0:
        return 0.0
    return (1.0 - math.exp(-k * n / m_bits)) ** k


def mark_seen(df: DataFrame, key_col: str, bloom: DataFrame,
              meta: dict[str, Any], *, flag_col: str = "bloom_seen",
              broadcast_cap_bytes: int = _DEFAULT_BROADCAST_CAP,
              mode: str = "auto") -> DataFrame:
    """Add ``flag_col``: True iff all k bit positions of the key are set
    (possibly-seen; false positives at the accounted rate), False for
    definitely-new. NULL/empty keys flag False.

    mode='broadcast' chains k broadcast joins — zero shuffles over df;
    'shuffle' uses posexplode + one aggregate (for filters too big to
    broadcast); 'auto' picks by the filter's worst-case bit-array size.
    """
    m_bits, k, hash_mode = meta["m_bits"], meta["k"], meta["hash_mode"]
    _check_spec(m_bits, k)
    if mode == "auto":
        mode = ("broadcast" if m_bits // 8 <= broadcast_cap_bytes
                else "shuffle")
    if mode not in ("broadcast", "shuffle"):
        raise ValueError("mode must be auto/broadcast/shuffle")
    key = F.col(key_col)
    pos_arr = _positions(key, m_bits, k, hash_mode)

    if mode == "broadcast":
        # PERSIST the filter words before fanning out into k broadcast
        # sides: each side aliases the columns differently, so exchange
        # reuse never fires and the whole bloom-build subtree (snapshot
        # scan → position explode → bit_or aggregate) would execute k
        # times — measured as k copies of the build in the
        # dedup_bloom_excision plan. The cached frame is bounded by the
        # broadcast cap (≤ m_bits/64 rows ≤ 64 MB of words); its
        # lifetime is tied to the returned frame (release_on_death), the
        # repo's deterministic-release convention.
        from pyspark import StorageLevel

        from apache_pinot_spark.operators.lifecycle import release_on_death

        bloom = bloom.persist(StorageLevel.MEMORY_AND_DISK)
        out = df.withColumn("__bl_pos", pos_arr)
        seen = F.lit(True)
        for i in range(k):
            wi = F.shiftright(F.col("__bl_pos")[i], 6)
            side = F.broadcast(
                bloom.select(F.col("word_idx").alias(f"__bl_w{i}"),
                             F.col("bits").alias(f"__bl_b{i}")))
            out = out.join(side, wi == F.col(f"__bl_w{i}"), "left")
            seen = seen & F.coalesce(
                F.expr(f"(shiftright(__bl_b{i}, "
                       f"CAST(__bl_pos[{i}] & 63 AS INT)) & 1) = 1"),
                F.lit(False))
        out = out.withColumn(
            flag_col,
            F.when(key.isNull() | (F.length(key) == 0), F.lit(False))
            .otherwise(seen))
        out = out.drop("__bl_pos",
                       *[c for i in range(k)
                         for c in (f"__bl_w{i}", f"__bl_b{i}")])
        return release_on_death(out, bloom)

    # shuffle mode: explode positions, one join + per-row aggregate
    rid = F.monotonically_increasing_id()
    base = df.withColumn("__bl_rid", rid)
    probe = (base
             .where(key.isNotNull() & (F.length(key) > 0))
             .select("__bl_rid",
                     F.posexplode(pos_arr).alias("__bl_i", "__bl_pos"))
             .select("__bl_rid",
                     F.shiftright("__bl_pos", 6).alias("word_idx"),
                     F.col("__bl_pos").bitwiseAND(F.lit(63)).cast("int")
                     .alias("__bl_bit"))
             .join(bloom, "word_idx", "left")
             .groupBy("__bl_rid")
             .agg(F.min(
                 F.coalesce(
                     F.expr("(shiftright(bits, __bl_bit) & 1) = 1"),
                     F.lit(False)))
                 .alias(flag_col)))
    return (base.join(probe, "__bl_rid", "left")
            .withColumn(flag_col, F.coalesce(F.col(flag_col), F.lit(False)))
            .drop("__bl_rid"))


def filter_unseen(df: DataFrame, key_col: str, bloom: DataFrame,
                  meta: dict[str, Any], **kwargs) -> DataFrame:
    """Keep only definitely-new rows (drops possibly-seen; the Bloom
    guarantee makes this safe for dedup — a dropped row is a true
    duplicate except at the accounted false-positive rate)."""
    flag_col = kwargs.get("flag_col", "bloom_seen")
    flagged = mark_seen(df, key_col, bloom, meta, **kwargs)
    out = flagged.where(~F.col(flag_col)).drop(flag_col)
    # keep the probe frame (and through it the persisted bloom words —
    # see mark_seen's release_on_death tie) alive until the caller's
    # frame dies
    out._bloom_probe_keepalive = flagged
    return out


# ---------------------------------------------------------------------------
# Paragraph granularity (the Dolma deduper's second mode)
# ---------------------------------------------------------------------------

def explode_paragraphs(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       sep: str = "\n") -> DataFrame:
    """(id, para_idx, paragraph) rows; blank paragraphs dropped (they
    would all collide in the filter and carry no dedup signal)."""
    return (df.select(
                id_col,
                F.posexplode(F.split(F.col(text_col), sep))
                .alias("para_idx", "paragraph"))
            .where(F.length(F.trim("paragraph")) > 0))


def build_paragraph_bloom(df: DataFrame, *, text_col: str = "text",
                          id_col: str = "doc_id", sep: str = "\n",
                          m_bits: int = 1 << 24, k: int = 7,
                          hash_mode: str = "xxhash64") -> DataFrame:
    return build_bloom(
        explode_paragraphs(df, text_col, id_col, sep), "paragraph",
        m_bits=m_bits, k=k, hash_mode=hash_mode)


def dedup_paragraphs(df: DataFrame, bloom: DataFrame, meta: dict[str, Any],
                     *, text_col: str = "text", id_col: str = "doc_id",
                     sep: str = "\n", **kwargs) -> DataFrame:
    """Rewrite each document keeping only paragraphs NOT in the filter
    (order preserved); emits ``n_paragraphs_removed`` and refreshes
    ``n_chars`` when present. Documents whose every paragraph was seen
    come back with empty text (caller gates on length, the pipeline
    convention).

    Blank segments (empty lines / paragraph separators) are PRESERVED
    during reassembly — only bloom-seen non-blank paragraphs are
    excised, so a document with zero removals round-trips its text
    byte-identically (the Dolma deduper excises only removed spans;
    blanks are never inserted into the filter by ``build_bloom``, and
    any false-positive probe on a blank is ignored here)."""
    flag_col = kwargs.get("flag_col", "bloom_seen")
    segs = df.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), sep))
        .alias("para_idx", "paragraph"))
    flagged = mark_seen(segs, "paragraph", bloom, meta, **kwargs)
    blank = F.length(F.trim("paragraph")) == 0
    kept = (flagged
            .withColumn("__keep", blank | ~F.col(flag_col))
            .groupBy(id_col)
            .agg(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(F.when(
                             F.col("__keep"),
                             F.struct("para_idx", "paragraph")))),
                         lambda s: s["paragraph"]),
                     sep).alias("__new_text"),
                 F.sum(F.when(~F.col("__keep"), 1).otherwise(0))
                 .alias("n_paragraphs_removed")))
    out = (df.join(kept, id_col, "left")
           .withColumn(text_col, F.coalesce("__new_text", F.lit("")))
           .withColumn("n_paragraphs_removed",
                       F.coalesce("n_paragraphs_removed", F.lit(0)))
           .drop("__new_text"))
    if "n_chars" in df.columns:
        out = out.withColumn("n_chars", F.length(text_col))
    # keep the probe frame (and through it the persisted bloom words —
    # see mark_seen's release_on_death tie) alive until the caller's
    # frame dies
    out._bloom_probe_keepalive = flagged
    return out


# ---------------------------------------------------------------------------
# Oracle replay (md5 mode)
# ---------------------------------------------------------------------------

def bloom_positions_oracle_sql(key_expr: str, m_bits: int, k: int) -> str:
    """DuckDB expression LIST of the k bit positions for md5 mode —
    term-for-term the Spark arithmetic (15-hex-digit prefixes, odd h2,
    pmod), so filter membership replays cross-engine."""
    h1p = (f"(CAST('0x' || substr(md5({key_expr}), 1, 15) AS BIGINT)"
           f" % {m_bits})")
    h2p = (f"((CAST('0x' || substr(md5({key_expr}), 17, 15) AS BIGINT)"
           f" % {m_bits}) | 1)")
    terms = ",\n      ".join(
        f"(({h1p}) + {i} * ({h2p})) % {m_bits}" for i in range(k))
    return f"[\n      {terms}\n    ]"
