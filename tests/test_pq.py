"""IVF+PQ (operators/pq.py): codebook determinism, code bounds and
compression shape, reconstruction improvement under Lloyd iterations,
exact-rescore score parity with brute force, and recall floors on the
embeddings table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_pinot_spark.operators import pq
from apache_pinot_spark.operators.similarity import brute_force_topk
from tests.conftest import SF_SMOKE

DIM = 64


def _emb(spark):
    from apache_pinot_spark.catalog import load_tables

    return load_tables(spark, SF_SMOKE, ["embeddings"])["embeddings"]


def test_train_is_deterministic_and_bounded(spark):
    emb = _emb(spark)
    b1 = pq.pq_train(emb, DIM, m=8, ksub=16, iterations=1)
    b2 = pq.pq_train(emb, DIM, m=8, ksub=16, iterations=1)
    assert (b1.m, b1.ksub, b1.dsub) == (8, 16, 8)
    assert b1.books == b2.books  # hash-order init + fixed Lloyd steps
    # shuffling the input partitioning must not change the codebooks
    b3 = pq.pq_train(emb.repartition(7), DIM, m=8, ksub=16, iterations=1)
    assert b3.books == b1.books
    with pytest.raises(ValueError, match="divisible"):
        pq.pq_train(emb, DIM, m=7)
    with pytest.raises(ValueError, match="ksub"):
        pq.pq_train(emb, DIM, m=8, ksub=0)


def test_encode_shape_and_determinism(spark):
    emb = _emb(spark)
    books = pq.pq_train(emb, DIM, m=8, ksub=16, iterations=1)
    codes = pq.pq_encode(emb, books).collect()
    assert len(codes) == emb.count()
    for r in codes[:50]:
        assert len(r.codes) == 8 and all(0 <= c < 16 for c in r.codes)
    again = {r.id: list(r.codes) for r in pq.pq_encode(emb, books).collect()}
    assert all(again[r.id] == list(r.codes) for r in codes)


def test_lloyd_iterations_reduce_reconstruction_error(spark):
    import numpy as np

    emb = _emb(spark)
    rows = emb.select("vec_id", "embedding").collect()
    X = np.asarray([list(r.embedding) for r in rows], dtype=np.float64)
    X = X / np.linalg.norm(X, axis=1, keepdims=True)

    def recon_err(books):
        bks = np.asarray(books.books)
        ids = {r.id: list(r.codes)
               for r in pq.pq_encode(emb, books).collect()}
        err = 0.0
        for r, x in zip(rows, X):
            codes = ids[r.vec_id]
            xr = np.concatenate([bks[j][codes[j]] for j in range(books.m)])
            err += float(((x - xr) ** 2).sum())
        return err / len(rows)

    e0 = recon_err(pq.pq_train(emb, DIM, m=8, ksub=16, iterations=0))
    e2 = recon_err(pq.pq_train(emb, DIM, m=8, ksub=16, iterations=2))
    assert e2 < e0  # Lloyd steps strictly improve the sampled-init quantizer


def test_ivfpq_scores_match_bruteforce_on_retrieved_pairs(spark):
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") % 100 == 7).limit(5)
    got = pq.ivfpq_topk(
        emb, queries, DIM, k=5, num_clusters=8, nprobe=8, m=8, ksub=16,
        iterations=1, refine_factor=4,
    ).collect()
    brute = {
        (r.query_id, r.neighbor_id): r.score
        for r in brute_force_topk(emb, queries, k=emb.count(), dim=DIM).collect()
    }
    assert got, "ivfpq returned nothing"
    for r in got:
        assert brute[(r.query_id, r.neighbor_id)] == r.score  # exact rescore
    # output contract matches the other ANN tiers
    assert {f for f in got[0].asDict()} == {"query_id", "neighbor_id", "score", "rank"}
    per_q = {}
    for r in got:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_q.values())


def test_ivfpq_recall_floor(spark):
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") % 50 == 3).limit(10)
    k = 5
    truth = {}
    for r in brute_force_topk(emb, queries, k=k, dim=DIM).collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    got = {}
    # probe everything: recall loss then comes ONLY from PQ quantization,
    # which the refine step must largely recover
    for r in pq.ivfpq_topk(
        emb, queries, DIM, k=k, num_clusters=8, nprobe=8, m=16, ksub=32,
        iterations=2, refine_factor=16,
    ).collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    recall = hits / sum(len(v) for v in truth.values())
    # measured 1.00 at these settings (sweep in SCALE.md §19); the floor
    # leaves headroom for data regeneration
    assert recall >= 0.9, f"recall@{k} {recall:.2f} below floor"


def test_query_bound_raises(spark):
    emb = _emb(spark)
    with pytest.raises(ValueError, match="max_query_rows"):
        pq.ivfpq_topk(emb, emb, DIM, k=2, max_query_rows=10)


def test_index_reuse_matches_one_shot(spark):
    """ivfpq_index + ivfpq_query (the serving contract: build once,
    query many) returns exactly what the one-shot operator returns,
    across two different query batches against ONE built index."""
    emb = _emb(spark)
    idx = pq.ivfpq_index(emb, DIM, num_clusters=8, m=8, ksub=16, iterations=1)
    q1 = emb.filter(F.col("vec_id") % 100 == 7).limit(4)
    q2 = emb.filter(F.col("vec_id") % 100 == 23).limit(4)
    for q in (q1, q2):
        got = sorted(
            tuple(r) for r in pq.ivfpq_query(idx, q, k=3, nprobe=8,
                                             refine_factor=4).collect()
        )
        want = sorted(
            tuple(r) for r in pq.ivfpq_topk(emb, q, DIM, k=3, num_clusters=8,
                                            nprobe=8, m=8, ksub=16,
                                            iterations=1,
                                            refine_factor=4).collect()
        )
        assert got == want
    # the materialized index is a plain bounded frame
    assert idx.index.columns == ["id", "codes", "cluster"]
    assert idx.index.count() == emb.count()
