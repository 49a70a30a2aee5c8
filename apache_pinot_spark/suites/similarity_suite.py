"""Driver-gate queries for embedding similarity search — ALL fully
oracle-checked, including the ANN paths.

The LSH hyperplanes and IVF centroid selection are deterministic
constructions (md5-derived weights / md5-ordered sample — see
operators/similarity.py), so a DuckDB oracle can reproduce the candidate
generation EXACTLY: the plane weights are inlined as SQL literals and the
projections/rescoring use list_dot_product (a sequential fold, matching
the Spark-side summation; last-ulp sign flips would need a projection
within ~1e-13 of zero, which real-valued data doesn't produce).

Cut from round 1's declared set (still implemented + unit-tested):
sim_lsh_candidates (subsumed by sim_lsh_topk's bucket pipeline) and
sim_intra_label_cosine (subsumed by sim_cosine_near_dup_pairs' exact
pairwise scoring)."""

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
    # blocked-GEMM scale path (mapInPandas BLAS per bounded block pair)
    # with exact sequential-fold rescoring — bit-identical to the
    # pairwise-join form; blocking is internal, output is all pairs
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


# --------------------------------------------------------------------------
# LSH top-k — the hyperplanes are md5-derived constants, inlined below as
# SQL literals so DuckDB rebuilds the identical (tbl, bucket) table.
# --------------------------------------------------------------------------

_LSH_DIM, _LSH_K, _LSH_PLANES, _LSH_TABLES = 64, 5, 4, 8


def _weights_sql(table: int, plane: int, dim: int) -> str:
    return "[" + ",".join(repr(similarity._plane_weight(plane, d, table)) for d in range(dim)) + "]"


def _bucket_sql(table: int, num_planes: int, dim: int, vec: str = "v") -> str:
    """Sum of disjoint sign bits == the engine's bitwise-OR packing."""
    return "(" + " + ".join(
        f"(CASE WHEN list_dot_product({vec}, {_weights_sql(table, p, dim)}) > 0 "
        f"THEN {1 << p} ELSE 0 END)"
        for p in range(num_planes)
    ) + ")"


_SIG_CTE = ",\nsig AS (\n" + "\n  UNION ALL ".join(
    f"SELECT vec_id, {t} AS tbl, {_bucket_sql(t, _LSH_PLANES, _LSH_DIM)} AS bucket FROM e"
    for t in range(_LSH_TABLES)
) + "\n)"


def _lsh_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 3)
    return similarity.lsh_topk(
        emb, queries, dim=_LSH_DIM, k=_LSH_K, num_planes=_LSH_PLANES, num_tables=_LSH_TABLES
    ).orderBy("query_id", "rank")


df_query(
    "sim_lsh_topk",
    _lsh_topk,
    _N_CTE
    + _SIG_CTE
    + f""",
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM sig q JOIN sig c ON q.tbl = c.tbl AND q.bucket = c.bucket
  WHERE q.vec_id < 3 AND c.vec_id <> q.vec_id
),
sc AS (
  SELECT cand.query_id, cand.neighbor_id,
         list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS score
  FROM cand
  JOIN n a ON a.vec_id = cand.query_id
  JOIN n b ON b.vec_id = cand.neighbor_id
),
r AS (
  SELECT query_id, neighbor_id, score,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS INT) AS rank
  FROM sc
)
SELECT query_id, neighbor_id, round(score, 6) AS score, rank
FROM r WHERE rank <= {_LSH_K} ORDER BY query_id, rank
    """,
    tables=["embeddings"],
    doc="LSH-bucketed approximate top-k; deterministic md5-derived "
        "hyperplanes reproduced as oracle literals (recall vs brute force "
        "additionally asserted in tests)",
)


# --------------------------------------------------------------------------
# IVF top-k — centroids are the num_clusters vectors with smallest
# md5(vec_id) (hash-order sample), reproducible as ORDER BY md5(...) LIMIT k.
# --------------------------------------------------------------------------

_IVF_K, _IVF_CLUSTERS, _IVF_NPROBE = 5, 16, 6


def _ivf_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 3)
    return similarity.ivf_topk(
        emb, queries, dim=64, k=_IVF_K, num_clusters=_IVF_CLUSTERS, nprobe=_IVF_NPROBE
    ).orderBy("query_id", "rank")


df_query(
    "sim_ivf_topk",
    _ivf_topk,
    _N_CTE
    + f""",
cent AS (
  SELECT v AS cv, sqrt(list_dot_product(v, v)) AS cnrm, cidx FROM (
    SELECT vec_id, v,
           CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS INT) - 1 AS cidx
    FROM e
  ) WHERE cidx < {_IVF_CLUSTERS}
),
assign AS (
  SELECT id, cluster FROM (
    SELECT a.vec_id AS id, cent.cidx AS cluster,
           row_number() OVER (PARTITION BY a.vec_id
                              ORDER BY list_dot_product(a.v, cent.cv) / cent.cnrm DESC, cent.cidx) AS rn
    FROM e a CROSS JOIN cent
  ) WHERE rn = 1
),
probes AS (
  SELECT query_id, cluster FROM (
    SELECT q.vec_id AS query_id, cent.cidx AS cluster,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY list_dot_product(q.v, cent.cv) / cent.cnrm DESC, cent.cidx) AS rn
    FROM e q CROSS JOIN cent WHERE q.vec_id < 3
  ) WHERE rn <= {_IVF_NPROBE}
),
cand AS (
  SELECT DISTINCT p.query_id, a.id AS neighbor_id
  FROM probes p JOIN assign a ON a.cluster = p.cluster
  WHERE a.id <> p.query_id
),
sc AS (
  SELECT cand.query_id, cand.neighbor_id,
         list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS score
  FROM cand
  JOIN n a ON a.vec_id = cand.query_id
  JOIN n b ON b.vec_id = cand.neighbor_id
),
r AS (
  SELECT query_id, neighbor_id, score,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS INT) AS rank
  FROM sc
)
SELECT query_id, neighbor_id, round(score, 6) AS score, rank
FROM r WHERE rank <= {_IVF_K} ORDER BY query_id, rank
    """,
    tables=["embeddings"],
    doc="IVF (inverted-file) cluster-probed approximate top-k — the "
        "partition-pruned ANN scale path (probe nprobe/num_clusters of "
        "data); deterministic hash-sample centroids reproduced in the oracle",
)
