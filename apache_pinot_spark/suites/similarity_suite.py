"""Driver-gate queries for embedding similarity search — ALL fully
oracle-checked, including the ANN paths.

The LSH hyperplanes and IVF centroid selection are deterministic
constructions (md5-derived weights / md5-ordered sample — see
operators/similarity.py), so a DuckDB oracle can reproduce the candidate
generation EXACTLY: the plane weights are inlined as SQL literals and the
projections/rescoring use list_dot_product (a sequential fold, matching
the Spark-side summation; last-ulp sign flips would need a projection
within ~1e-13 of zero, which real-valued data doesn't produce).

Round-7 fold: the three ANN top-k queries (brute-force / LSH / IVF —
identical output schema, one rescoring contract) are ONE driver slot,
``sim_ann_family``, each variant keeping its full engine path and its
full oracle (union-tagged). The two freed slots promote the round-7
operator families into the driver gate: ``dedup_semantic_survivors``
(SemDeDup, registered here — embeddings table) and ``dsir_doc_scores``
(textanalysis_suite — documents table).

Cut from round 1's declared set (still implemented + unit-tested):
sim_lsh_candidates (subsumed by the LSH bucket pipeline) and
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
# sim_ann_family — brute-force + LSH + IVF top-k in one driver slot.
# LSH hyperplanes are md5-derived constants, inlined below as SQL literals
# so DuckDB rebuilds the identical (tbl, bucket) table; IVF centroids are
# the num_clusters vectors with smallest md5(vec_id), reproducible as
# ORDER BY md5(...) LIMIT k.
# --------------------------------------------------------------------------

_LSH_DIM, _LSH_K, _LSH_PLANES, _LSH_TABLES = 64, 5, 4, 8
_IVF_K, _IVF_CLUSTERS, _IVF_NPROBE = 5, 16, 6
# PQ leg: refine_factor*k (640) >= the correctness-SF corpus (500 rows), so
# the exact-rescore window provably covers EVERY probed candidate — the
# emitted rows are then the exact top-k over the probed cells, which the
# oracle reproduces in SQL. The full compressed path (codebook train,
# encode, ADC scoring, rescore) still executes; ADC's ORDERING only decides
# which candidates survive the window, and here the window is total. At
# larger corpora the window narrows and recall is pinned by tests/test_pq.py
# instead (>= 0.9 vs brute force).
_PQ_K, _PQ_CLUSTERS, _PQ_NPROBE, _PQ_M, _PQ_KSUB, _PQ_REFINE = 5, 16, 4, 8, 64, 128


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


def _ann_family(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 3)
    # dim=None → HOF fold: only |queries|×|corpus| pairs are scored in the
    # brute/LSH/IVF rescores, so the ~2-3 s Janino compile of the unrolled
    # dot would dominate. (Pass dim=64 for big all-pairs runs.)
    brute = similarity.brute_force_topk(emb, queries, k=5)
    lsh = similarity.lsh_topk(
        emb, queries, dim=_LSH_DIM, k=_LSH_K, num_planes=_LSH_PLANES, num_tables=_LSH_TABLES
    )
    # ONE centroid TakeOrdered serves both cluster-probed tiers; the
    # assignment frame stays LAZY (each tier's assign pass rides the one
    # union job as a parallel subtree — persisting it measured +3 s at
    # bench scale: the cache barrier cuts the scan→assign→encode python
    # pipeline in half). Serving layers with REPEATED query batches
    # should persist before passing `assignment=`.
    from apache_pinot_spark.operators.pq import ivfpq_topk

    assignment = similarity.ivf_assign(emb, 64, _IVF_CLUSTERS)
    ivf = similarity.ivf_topk(
        emb, queries, dim=64, k=_IVF_K, num_clusters=_IVF_CLUSTERS,
        nprobe=_IVF_NPROBE, assignment=assignment,
    )
    pq = ivfpq_topk(
        emb, queries, dim=64, k=_PQ_K, num_clusters=_PQ_CLUSTERS,
        nprobe=_PQ_NPROBE, m=_PQ_M, ksub=_PQ_KSUB, iterations=1,
        refine_factor=_PQ_REFINE, assignment=assignment,
    )
    out = (
        brute.select(F.lit("brute").alias("variant"), "*")
        .unionByName(lsh.select(F.lit("lsh").alias("variant"), "*"))
        .unionByName(ivf.select(F.lit("ivf").alias("variant"), "*"))
        .unionByName(pq.select(F.lit("pq").alias("variant"), "*"))
    )
    return out.orderBy("variant", "query_id", "rank")


df_query(
    "sim_ann_family",
    _ann_family,
    _N_CTE
    + _SIG_CTE
    + f""",
bf_s AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS score
  FROM n q JOIN n c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < 3
),
bf_r AS (
  SELECT query_id, neighbor_id, score,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS INT) AS rank
  FROM bf_s
),
lsh_cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM sig q JOIN sig c ON q.tbl = c.tbl AND q.bucket = c.bucket
  WHERE q.vec_id < 3 AND c.vec_id <> q.vec_id
),
lsh_sc AS (
  SELECT lsh_cand.query_id, lsh_cand.neighbor_id,
         list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS score
  FROM lsh_cand
  JOIN n a ON a.vec_id = lsh_cand.query_id
  JOIN n b ON b.vec_id = lsh_cand.neighbor_id
),
lsh_r AS (
  SELECT query_id, neighbor_id, score,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS INT) AS rank
  FROM lsh_sc
),
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
ivf_cand AS (
  SELECT DISTINCT p.query_id, a.id AS neighbor_id
  FROM probes p JOIN assign a ON a.cluster = p.cluster
  WHERE a.id <> p.query_id
),
ivf_sc AS (
  SELECT ivf_cand.query_id, ivf_cand.neighbor_id,
         list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS score
  FROM ivf_cand
  JOIN n a ON a.vec_id = ivf_cand.query_id
  JOIN n b ON b.vec_id = ivf_cand.neighbor_id
),
ivf_r AS (
  SELECT query_id, neighbor_id, score,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS INT) AS rank
  FROM ivf_sc
),
pq_probes AS (
  SELECT query_id, cluster FROM (
    SELECT q.vec_id AS query_id, cent.cidx AS cluster,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY list_dot_product(q.v, cent.cv) / cent.cnrm DESC, cent.cidx) AS rn
    FROM e q CROSS JOIN cent WHERE q.vec_id < 3
  ) WHERE rn <= {_PQ_NPROBE}
),
pq_cand AS (
  SELECT DISTINCT p.query_id, a.id AS neighbor_id
  FROM pq_probes p JOIN assign a ON a.cluster = p.cluster
  WHERE a.id <> p.query_id
),
pq_sc AS (
  SELECT pq_cand.query_id, pq_cand.neighbor_id,
         list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS score
  FROM pq_cand
  JOIN n a ON a.vec_id = pq_cand.query_id
  JOIN n b ON b.vec_id = pq_cand.neighbor_id
),
pq_r AS (
  SELECT query_id, neighbor_id, score,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS INT) AS rank
  FROM pq_sc
)
SELECT 'brute' AS variant, query_id, neighbor_id, round(score, 6) AS score, rank
FROM bf_r WHERE rank <= 5
UNION ALL
SELECT 'lsh' AS variant, query_id, neighbor_id, round(score, 6) AS score, rank
FROM lsh_r WHERE rank <= {_LSH_K}
UNION ALL
SELECT 'ivf' AS variant, query_id, neighbor_id, round(score, 6) AS score, rank
FROM ivf_r WHERE rank <= {_IVF_K}
UNION ALL
SELECT 'pq' AS variant, query_id, neighbor_id, round(score, 6) AS score, rank
FROM pq_r WHERE rank <= {_PQ_K}
ORDER BY variant, query_id, rank
    """,
    tables=["embeddings"],
    doc="ANN family in one slot: exact brute-force top-k (broadcast query "
        "side), LSH-bucketed top-k (md5-derived hyperplanes inlined as "
        "oracle literals), IVF cluster-probed top-k (hash-sample "
        "centroids), and IVF+PQ compressed top-k (codebook train + ADC + "
        "exact rescore; gate config's refine window covers every probed "
        "candidate, making the retrieved set the SQL-expressible "
        "probed-cell top-k) — each variant its full engine path + full "
        "oracle; recall vs brute force additionally asserted in tests",
)


# --------------------------------------------------------------------------
# SemDeDup — semantic dedup survivors (operators/similarity.semantic_dedup):
# cluster with the deterministic IVF centroids, drop every vector with a
# same-cluster near-duplicate of smaller id.
# --------------------------------------------------------------------------

_SD_THRESHOLD, _SD_CLUSTERS = 0.35, 8


def _semantic_survivors(spark, sf_dir):
    return (
        similarity.semantic_dedup(
            _emb(spark, sf_dir), dim=64, threshold=_SD_THRESHOLD, num_clusters=_SD_CLUSTERS
        )
        .select("vec_id", "label")
        .orderBy("vec_id")
    )


df_query(
    "dedup_semantic_survivors",
    _semantic_survivors,
    _N_CTE
    + f""",
cent AS (
  SELECT v AS cv, sqrt(list_dot_product(v, v)) AS cnrm, cidx FROM (
    SELECT vec_id, v,
           CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS INT) - 1 AS cidx
    FROM e
  ) WHERE cidx < {_SD_CLUSTERS}
),
assign AS (
  SELECT id, cluster FROM (
    SELECT a.vec_id AS id, cent.cidx AS cluster,
           row_number() OVER (PARTITION BY a.vec_id
                              ORDER BY list_dot_product(a.v, cent.cv) / cent.cnrm DESC, cent.cidx) AS rn
    FROM e a CROSS JOIN cent
  ) WHERE rn = 1
),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM n a JOIN n b ON a.vec_id < b.vec_id
  JOIN assign aa ON aa.id = a.vec_id
  JOIN assign ab ON ab.id = b.vec_id AND ab.cluster = aa.cluster
  WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= {_SD_THRESHOLD}
)
SELECT vec_id, label FROM embeddings
WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
ORDER BY vec_id
    """,
    tables=["embeddings"],
    doc="SemDeDup survivors: deterministic-centroid clustering, "
        "within-cluster blocked-GEMM cosine pairs, keep-lowest-id "
        "exemplars (operators/similarity.semantic_dedup)",
)
