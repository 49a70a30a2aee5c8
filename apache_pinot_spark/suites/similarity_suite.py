"""Driver-gate queries for embedding similarity search. Brute-force top-k
and threshold near-dup carry full DuckDB oracles (double-fold dot products
reproduce bit-for-bit modulo last-ulp summation order, absorbed by
round-6); LSH variants are rows-only (approximate by design) with recall
measured in tests/test_similarity.py."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from apache_pinot_spark.catalog import load_tables
from apache_pinot_spark.operators import similarity
from apache_pinot_spark.querysuite import df_query

_N_CTE = """
WITH e AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
"""


def _emb(spark: SparkSession, sf_dir: str):
    return load_tables(spark, sf_dir, ["embeddings"])["embeddings"]


def _topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 3)
    # dim=None → HOF fold: only |queries|×|corpus| pairs are scored here,
    # so the ~2-3 s Janino compile of the unrolled dot would dominate the
    # query. (Pass dim=64 for big all-pairs runs; identical scores.)
    return similarity.brute_force_topk(emb, queries, k=5).orderBy("query_id", "rank")


df_query(
    "sim_bruteforce_topk",
    _topk,
    _N_CTE
    + """,
s AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS score
  FROM n q JOIN n c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < 3
),
r AS (
  SELECT query_id, neighbor_id, score,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS INT) AS rank
  FROM s
)
SELECT query_id, neighbor_id, round(score, 6) AS score, rank
FROM r WHERE rank <= 5 ORDER BY query_id, rank
    """,
    tables=["embeddings"],
    doc="Exact top-5 cosine neighbors, broadcast query side",
)


def _near_dups(spark, sf_dir):
    # blocked-GEMM scale path (mapInPandas BLAS per block pair) with exact
    # sequential-fold rescoring — bit-identical to the pairwise-join form
    return similarity.near_duplicate_pairs_blocked(
        _emb(spark, sf_dir), threshold=0.40, dim=64
    ).orderBy("id_a", "id_b")


df_query(
    "sim_cosine_near_dup_pairs",
    _near_dups,
    _N_CTE
    + """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS score
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.40
ORDER BY id_a, id_b
    """,
    tables=["embeddings"],
    doc="Embedding-cosine near-duplicate pairs at threshold 0.40",
)


def _centroid_sim(spark, sf_dir):
    """Per-label mean-vector similarity structure: avg cosine of members to
    other members of the same label (exact, decimal-free but deterministic:
    sums over fixed 64-dim folds then one division per group pair)."""
    emb = _emb(spark, sf_dir)
    v = emb.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).withColumn("n", similarity.norm_expr(F.col("v")))
    a, b = similarity._spread(v).alias("a"), v.alias("b")
    # Join ON the label equality so Catalyst picks a hash join partitioned
    # by label (pairs generated per label only), not a nested-loop join on
    # the id inequality over ALL pairs. HOF-fold cosine (no dim): pair
    # counts here are small, Janino compile would dominate; same fold
    # order, identical scores.
    pair = (
        a.join(b, F.col("a.label") == F.col("b.label"))
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.label").alias("label"),
            similarity.cosine_expr(
                F.col("a.v"), F.col("b.v"), F.col("a.n"), F.col("b.n")
            ).alias("score"),
        )
    )
    return (
        pair.groupBy("label")
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(F.sum(F.round("score", 6)), 4).alias("sum_score_r"),
        )
        .orderBy("label")
    )


df_query(
    "sim_intra_label_cosine",
    _centroid_sim,
    _N_CTE
    + """
SELECT a.label AS label, COUNT(*) AS n_pairs,
       round(SUM(round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6)), 4) AS sum_score_r
FROM n a JOIN n b ON a.vec_id < b.vec_id AND a.label = b.label
GROUP BY a.label ORDER BY label
    """,
    tables=["embeddings"],
    doc="Intra-label pairwise cosine aggregate (self-join on label)",
)


def _lsh_pairs(spark, sf_dir):
    return (
        similarity.lsh_candidate_pairs(_emb(spark, sf_dir), dim=64, num_planes=12, num_tables=3)
        .agg(F.count("*").alias("n_candidates"))
    )


df_query(
    "sim_lsh_candidates",
    _lsh_pairs,
    None,  # approximate/bucketed: rows-only check; recall asserted in tests
    tables=["embeddings"],
    doc="LSH (random hyperplane) candidate pair count — scale path",
)


def _lsh_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 3)
    return similarity.lsh_topk(emb, queries, dim=64, k=5, num_planes=4, num_tables=8).orderBy(
        "query_id", "rank"
    )


df_query(
    "sim_lsh_topk",
    _lsh_topk,
    None,  # approximate by design
    tables=["embeddings"],
    doc="LSH-bucketed approximate top-k (recall vs brute force in tests)",
)


def _ivf_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 3)
    return similarity.ivf_topk(
        emb, queries, dim=64, k=5, num_clusters=16, nprobe=6
    ).orderBy("query_id", "rank")


df_query(
    "sim_ivf_topk",
    _ivf_topk,
    None,  # approximate by design; recall vs brute force in tests
    tables=["embeddings"],
    doc="IVF (inverted-file) cluster-probed approximate top-k — the "
        "partition-pruned ANN scale path (probe nprobe/num_clusters of data)",
)
