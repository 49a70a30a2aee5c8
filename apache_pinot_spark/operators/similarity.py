"""Embedding similarity search — brute-force exact top-k and LSH-bucketed
approximate variants over an array<float> column.

Scale design (100 TB / billions of vectors):
  * Brute-force: the query set is small and BROADCAST; the corpus scan is
    embarrassingly parallel (per-partition top-k via window). Cosine is a
    JVM fold (zip_with + aggregate in DOUBLE) — no Python in the loop.
  * Norms are precomputed once per side (map-side column), not per pair.
  * LSH (random hyperplanes): signature is sign-bit packing of h
    deterministic pseudo-projections (hash-derived weights, no RNG state
    to ship); candidates join on bucket id then exact-rescore. Recall is
    tunable via (num_planes, num_tables).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in DOUBLE — deterministic and
    reproducible across engines (oracle parity)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column, a_norm: Column | None = None, b_norm: Column | None = None) -> Column:
    an = a_norm if a_norm is not None else norm_expr(a)
    bn = b_norm if b_norm is not None else norm_expr(b)
    return dot_expr(a, b) / (an * bn)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries is broadcast (it's the small side by construction); the big
    corpus is scanned once, partition-parallel. Output:
    (query_id, neighbor_id, score, rank), score rounded to 6 decimals.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _to_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", norm_expr(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _to_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", norm_expr(F.col("cv")))
    joined = c.join(F.broadcast(q), how="cross")
    if exclude_self:
        joined = joined.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        "neighbor_id",
        cosine_expr(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("score", 6).alias("score"), "rank")
    )


def near_duplicate_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold (id_a < id_b). The full cross
    join is for small/blocked inputs — at scale, feed LSH buckets through
    this instead (see lsh_candidate_pairs)."""
    v = corpus.select(
        F.col(id_col).alias("id"), _to_double(F.col(vec_col)).alias("v")
    ).withColumn("n", norm_expr(F.col("v")))
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine_expr(F.col("a.v"), F.col("b.v"), F.col("a.n"), F.col("b.n")).alias("score"),
        )
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", F.round("score", 6).alias("score"))
    )


# --------------------------------------------------------------------------
# LSH (random hyperplanes) — the scale path
# --------------------------------------------------------------------------


def _plane_weight(plane: int, dim: int, table: int) -> float:
    """Deterministic pseudo-random weight in [-1, 1): derived from md5 so
    every executor (and any re-run) builds identical hyperplanes with no
    RNG state to broadcast."""
    import hashlib

    h = hashlib.md5(f"{table}:{plane}:{dim}".encode()).hexdigest()
    return (int(h[:8], 16) / 0x7FFFFFFF) - 1.0


def lsh_signature_expr(vec: Column, dim: int, num_planes: int = 16, table: int = 0) -> Column:
    """Pack sign bits of num_planes projections into one INT bucket id.

    Each projection is a JVM fold (`zip_with` the vector against a literal
    weight array, then `aggregate`) — a compact expression tree that codegen
    handles at any (dim, num_planes), unlike a fully unrolled sum which
    blows up compilation memory at dim*planes terms."""
    sig = F.lit(0)
    for p in range(num_planes):
        weights = F.array(*[F.lit(_plane_weight(p, d, table)) for d in range(dim)])
        proj = F.aggregate(
            F.zip_with(vec, weights, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
        sig = sig.bitwiseOR(bit)
    return sig


def lsh_candidate_pairs(
    corpus: DataFrame,
    dim: int,
    num_planes: int = 12,
    num_tables: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Candidate pairs sharing an LSH bucket in ANY of num_tables tables.
    Shuffles on (table, bucket); bucket population ~ N / 2^num_planes."""
    v = corpus.select(F.col(id_col).alias("id"), _to_double(F.col(vec_col)).alias("v"))
    # Only (id, tbl, bucket) rides through the self-join — vectors stay out
    # of the shuffle/broadcast (rescoring rejoins them by id if needed).
    sigs = v.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        lsh_signature_expr(F.col("v"), dim, num_planes, t).alias("bucket"),
                    )
                    for t in range(num_tables)
                ]
            )
        ).alias("s"),
    ).select("id", F.col("s.tbl").alias("tbl"), F.col("s.bucket").alias("bucket"))
    a, b = sigs.alias("a"), sigs.alias("b")
    return (
        a.join(b, on=["tbl", "bucket"], how="inner")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    num_planes: int = 10,
    num_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: bucket-join queries to corpus in num_tables LSH
    tables, exact-rescore candidates, take top-k. Same output schema as
    brute_force_topk (so recall is directly measurable)."""
    def sigs(df, name):
        """Slim (id, tbl, bucket) rows — vectors do NOT ride the bucket
        join; they are rejoined by id for the rescore stage."""
        v = df.select(F.col(id_col).alias(name), _to_double(F.col(vec_col)).alias("__v"))
        return v.select(
            name,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("tbl"),
                            lsh_signature_expr(F.col("__v"), dim, num_planes, t).alias(
                                "bucket"
                            ),
                        )
                        for t in range(num_tables)
                    ]
                )
            ).alias("s"),
        ).select(name, F.col("s.tbl").alias("tbl"), F.col("s.bucket").alias("bucket"))

    qs = sigs(queries, "query_id")
    cs = sigs(corpus, "neighbor_id")
    cand = (
        cs.join(F.broadcast(qs), on=["tbl", "bucket"], how="inner")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), _to_double(F.col(vec_col)).alias("qv")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), _to_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        cand.join(cv, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_expr(F.col("qv"), F.col("cv")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("score", 6).alias("score"), "rank")
    )
