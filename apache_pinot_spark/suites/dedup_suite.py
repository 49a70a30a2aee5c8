"""Driver-gate queries for deduplication operators, with DuckDB oracles
reproducing the md5-portable hash pipeline exactly."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from apache_pinot_spark.catalog import load_tables
from apache_pinot_spark.operators import dedup
from apache_pinot_spark.querysuite import df_query

# Shared DuckDB fragments mirroring tokens_expr(stop_words=∅) and 3-gram
# shingles (dedup keeps stop words for byte-level fidelity).
_TOKS = """
  list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')
"""
_SHINGLES_CTE = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
),
sh AS (
  SELECT doc_id,
         list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                        i -> array_to_string(t[i:i+2], ' ')) AS sh
  FROM toks
  WHERE len(t) >= 3
)
"""
# Mirror of minhash_bands(portable=True): hash i is the 8-hex-char slice
# (i%4) of md5('(i//4)|' || shingle); band b hashes (mh[2b], mh[2b+1]).
_MH_EXPRS = ",\n         ".join(
    f"list_min(list_transform(sh, x -> substr(md5('{i // 4}|' || x), {8 * (i % 4) + 1}, 8))) AS mh{i}"
    for i in range(8)
)
_BAND_ROWS = "\n  UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, md5(mh{2 * b} || '|' || mh{2 * b + 1}) AS band_hash FROM sig"
    for b in range(4)
)
_SIG_CTE = (
    _SHINGLES_CTE
    + f""",
sig AS (
  SELECT doc_id,
         {_MH_EXPRS}
  FROM sh
),
bands AS (
  {_BAND_ROWS}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS key_a, b.doc_id AS key_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_hash = b.band_hash
  WHERE a.doc_id < b.doc_id
)
"""
)


def _docs(spark: SparkSession, sf_dir: str):
    return load_tables(spark, sf_dir, ["documents"])["documents"]


def _exact_groups(spark, sf_dir):
    """Groups AND the kept-survivor summary in one output: group_size /
    keep_key per duplicate fingerprint plus the total kept count, covering
    both exact_duplicate_groups and dedupe_exact semantics (dedupe_exact
    itself keeps a dedicated equivalence test in tests/test_operators.py)."""
    groups = dedup.exact_duplicate_groups(_docs(spark, sf_dir), prefix_tokens=8)
    kept = dedup.dedupe_exact(_docs(spark, sf_dir), prefix_tokens=8)
    n_kept = kept.agg(F.count("*").alias("kept"))
    return groups.crossJoin(n_kept).orderBy("fp")


df_query(
    "dedup_exact_groups",
    _exact_groups,
    """
    WITH kept AS (
      SELECT COUNT(*) AS kept FROM (
        SELECT MIN(doc_id) FROM documents
        GROUP BY md5(array_to_string(string_split(text, ' ')[1:8], ' '))
      )
    )
    SELECT md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS fp,
           COUNT(*) AS group_size, MIN(doc_id) AS keep_key,
           (SELECT kept FROM kept) AS kept
    FROM documents
    GROUP BY 1 HAVING COUNT(*) > 1
    ORDER BY fp
    """,
    tables=["documents"],
    doc="Exact (prefix-8) duplicate groups via hash-groupBy + dedupe survivor count",
)

# (The standalone MinHash+LSH candidate-pair query was folded into
# dedup_jaccard_verified below: its oracle's `pairs` CTE IS the banding
# pipeline, so the verified query checks banding and verification at once.)


def _jaccard_verified(spark, sf_dir):
    # combined pipeline: one tokenize+shingle pass feeds both the LSH
    # banding and the Jaccard verify joins (see dedup.lsh_verified_pairs)
    return dedup.lsh_verified_pairs(
        _docs(spark, sf_dir), num_hashes=8, band_size=2, shingle_n=3, threshold=0.02
    ).orderBy("key_a", "key_b")


df_query(
    "dedup_jaccard_verified",
    _jaccard_verified,
    _SIG_CTE
    + """,
shset AS (
  SELECT doc_id, list_distinct(sh) AS shset FROM sh
)
SELECT p.key_a, p.key_b,
       CAST(len(list_intersect(a.shset, b.shset)) AS DOUBLE)
         / len(list_distinct(a.shset || b.shset)) AS jaccard
FROM pairs p
JOIN shset a ON a.doc_id = p.key_a
JOIN shset b ON b.doc_id = p.key_b
WHERE CAST(len(list_intersect(a.shset, b.shset)) AS DOUBLE)
        / len(list_distinct(a.shset || b.shset)) >= 0.02
ORDER BY key_a, key_b
    """,
    tables=["documents"],
    doc="n-gram Jaccard verification of LSH candidates",
)


def _simhash(spark, sf_dir):
    return (
        dedup.simhash16_portable(_docs(spark, sf_dir))
        .groupBy((F.col("simhash") % 16).alias("bucket"))
        .agg(F.count("*").alias("cnt"))
        .orderBy("bucket")
    )


df_query(
    "dedup_simhash_buckets",
    _simhash,
    """
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                        x -> x <> '')) AS t
      FROM documents
    ),
    h AS (SELECT doc_id, md5(t) AS m FROM tok),
    sums AS (
      SELECT doc_id,
             {sums}
      FROM h GROUP BY doc_id
    ),
    sim AS (
      SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM sums
    )
    SELECT simhash % 16 AS bucket, COUNT(*) AS cnt FROM sim GROUP BY 1 ORDER BY bucket
    """.format(
        sums=",\n             ".join(
            f"SUM(CASE WHEN substr(m, {i + 1}, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS b{i}"
            for i in range(16)
        ),
        bits=" + ".join(f"(CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(16)),
    ),
    tables=["documents"],
    doc="Portable 16-bit SimHash bucket histogram",
)


# --------------------------------------------------------------------------
# Bloom-filter cross-snapshot dedup (operators/bloomdedup.py, the Dolma
# deduper) — r13 gate promotion (verdict #3; the slot freed by folding
# tx_fingerprint_overlap into tx_token_accounting). Exercises the FULL
# build → probe → paragraph-excision flow in md5-portable mode: the
# oracle replays the k double-hash bit positions term-for-term
# (bloom_positions_oracle_sql), so filter membership — INCLUDING false
# positives — is bit-identical cross-engine. Paragraphs are synthesized
# deterministically (8-word chunks; the corpus is single-line), the
# reference snapshot is doc_id % 7 = 0, and the probe is the WHOLE
# corpus, so reference docs fully excise (the cross-snapshot contract)
# while shared chunks + accounted FPs excise elsewhere.
# --------------------------------------------------------------------------

_BL_M, _BL_K = 1 << 24, 5


def _chunked_text():
    words = F.split(F.trim(F.col("text")), r"\s+")
    nchunks = F.ceil(F.size(words) / F.lit(8.0)).cast("int")
    return F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.greatest(nchunks - 1, F.lit(0))),
            lambda c: F.array_join(F.slice(words, c * 8 + 1, 8), " ")),
        "\n")


def _bloom_excision(spark, sf_dir):
    from apache_pinot_spark.operators import bloomdedup as B

    d = load_tables(spark, sf_dir, ["documents"])["documents"]
    d2 = d.select("doc_id", _chunked_text().alias("text"))
    meta = {"m_bits": _BL_M, "k": _BL_K, "hash_mode": "md5"}
    ref = d2.filter(F.col("doc_id") % 7 == 0)
    bloom = B.build_paragraph_bloom(ref, m_bits=_BL_M, k=_BL_K,
                                    hash_mode="md5")
    out = B.dedup_paragraphs(d2, bloom, meta)
    return (
        out.groupBy((F.col("doc_id") % 8).alias("bucket"))
        .agg(F.count("*").cast("bigint").alias("docs"),
             F.sum("n_paragraphs_removed").cast("bigint").alias("removed"),
             F.sum(F.length("text")).cast("bigint").alias("chars_after"),
             F.sum(F.when(F.length(F.trim("text")) > 0, 1).otherwise(0))
             .cast("bigint").alias("survivors"))
        .orderBy("bucket"))


def _bl_oracle() -> str:
    from apache_pinot_spark.operators.bloomdedup import (
        bloom_positions_oracle_sql)

    pos = bloom_positions_oracle_sql("para", _BL_M, _BL_K)
    return f"""
    WITH d2 AS (
      SELECT doc_id,
             array_to_string(list_transform(
               range(0, greatest(CAST(ceil(len(ws) / 8.0) AS INT), 1)),
               c -> coalesce(array_to_string(ws[c*8+1 : c*8+8], ' '), '')),
               chr(10)) AS text
      FROM (SELECT doc_id,
                   list_filter(regexp_split_to_array(trim(text), '\\s+'),
                               x -> x <> '') AS ws
            FROM documents)
    ),
    exp AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(text, chr(10))) AS para,
             unnest(range(1, len(regexp_split_to_array(text, chr(10))) + 1))
               AS idx
      FROM d2
    ),
    ref_pos AS (
      SELECT DISTINCT unnest({pos}) AS pos
      FROM exp WHERE doc_id % 7 = 0 AND trim(para) <> ''
    ),
    probe_pos AS (
      SELECT doc_id, idx, unnest({pos}) AS pos
      FROM exp WHERE trim(para) <> ''
    ),
    seen AS (
      SELECT p.doc_id, p.idx, bool_and(r.pos IS NOT NULL) AS is_seen
      FROM probe_pos p LEFT JOIN ref_pos r ON r.pos = p.pos
      GROUP BY p.doc_id, p.idx
    ),
    marked AS (
      SELECT e.doc_id, e.idx, e.para,
             COALESCE(s.is_seen, FALSE) AS removed
      FROM exp e LEFT JOIN seen s
        ON s.doc_id = e.doc_id AND s.idx = e.idx
    ),
    rebuilt AS (
      SELECT doc_id,
             COALESCE(array_to_string(
               list(para ORDER BY idx) FILTER (WHERE NOT removed),
               chr(10)), '') AS new_text,
             SUM(CASE WHEN removed THEN 1 ELSE 0 END) AS n_removed
      FROM marked GROUP BY doc_id
    )
    SELECT doc_id % 8 AS bucket, COUNT(*) AS docs,
           CAST(SUM(n_removed) AS BIGINT) AS removed,
           CAST(SUM(length(new_text)) AS BIGINT) AS chars_after,
           CAST(SUM(CASE WHEN length(trim(new_text)) > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS survivors
    FROM rebuilt GROUP BY 1 ORDER BY 1
    """


df_query(
    "dedup_bloom_excision",
    _bloom_excision,
    _bl_oracle(),
    tables=["documents"],
    doc="Bloom cross-snapshot dedup gate: build a md5-portable filter "
        "over the doc_id%7=0 snapshot's synthesized paragraphs, probe "
        "the whole corpus, excise seen paragraphs (blanks preserved), "
        "account rows/removed/chars/survivors per doc_id%8 bucket; the "
        "oracle replays the k bit positions term-for-term so membership "
        "(incl. false positives) is bit-identical",
)
