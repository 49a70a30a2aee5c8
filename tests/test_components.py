"""Connected components (operators/components.py): randomized
differentials against a pure-Python union-find, worst-case chain
diameters, the non-convergence guard, and the lsh_verified_pairs →
dedup_keep_canonical integration."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from apache_pinot_spark.operators.components import (
    connected_components,
    dedup_keep_canonical,
)


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min member of the component
    comp = {}
    for v in range(n_nodes):
        r = find(v)
        comp.setdefault(r, []).append(v)
    out = {}
    for members in comp.values():
        m = min(members)
        for v in members:
            out[v] = m
    return out


def test_components_match_union_find_randomized(spark):
    rng = random.Random(99)
    for case in range(5):
        n = rng.randint(10, 60)
        m = rng.randint(5, 2 * n)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        df = spark.createDataFrame(edges, "key_a long, key_b long")
        got = {
            r["key"]: r["component"]
            for r in connected_components(df).collect()
        }
        want_all = _union_find(n, edges)
        touched = {a for a, b in edges} | {b for _, b in edges}
        want = {v: want_all[v] for v in touched}
        assert got == want, f"case {case}: {sorted(got.items())[:10]}"


def test_components_chain_worst_case_diameter(spark):
    """A 12-node chain (diameter 11) — min-label propagation needs about
    diameter iterations; the default bound covers it."""
    edges = [(i, i + 1) for i in range(11)]
    df = spark.createDataFrame(edges, "key_a long, key_b long")
    got = {r["key"]: r["component"] for r in connected_components(df).collect()}
    assert got == {i: 0 for i in range(12)}


def test_components_nonconvergence_raises(spark):
    edges = [(i, i + 1) for i in range(11)]
    df = spark.createDataFrame(edges, "key_a long, key_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        # small_graph_edges=0 forces the distributed loop (the union-find
        # fast path has no iteration bound to hit)
        connected_components(df, max_iter=3, small_graph_edges=0)


def test_dedup_keep_canonical_end_to_end(spark):
    """lsh_verified_pairs over a corpus with two near-dup clusters and
    independent docs → one survivor per cluster (the min doc_id),
    singletons untouched."""
    from apache_pinot_spark.operators.dedup import lsh_verified_pairs

    base_a = "the quick brown fox jumps over the lazy dog again and again today"
    base_b = "structured streaming powers realtime analytics with watermarks and state"
    rows = [
        (10, base_a),
        (11, base_a + " extra"),
        (12, base_a + " padding word"),
        (20, base_b),
        (21, base_b + " tail"),
        (30, "completely unrelated text about volcanoes and geology and basalt"),
        (31, "another standalone document mentioning databases and indexes only"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = lsh_verified_pairs(
        docs, num_hashes=16, band_size=2, shingle_n=3, threshold=0.3
    )
    kept = dedup_keep_canonical(docs, pairs)
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert 10 in ids and 20 in ids            # canonical = min of each cluster
    assert 30 in ids and 31 in ids            # singletons survive
    assert 11 not in ids and 12 not in ids and 21 not in ids


def test_components_plan_is_scale_clean(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3)], "key_a long, key_b long")
    # force the distributed loop — the union-find fast path would reduce
    # this to a LocalRelation and the assertions would be vacuous
    out = connected_components(edges, small_graph_edges=0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


def test_components_string_keys(spark):
    """Non-integral keys use the changed-count convergence path; the
    canonical member is the lexicographic minimum."""
    edges = [("docB", "docA"), ("docB", "docC"), ("x", "y")]
    df = spark.createDataFrame(edges, "key_a string, key_b string")
    got = {r["key"]: r["component"] for r in connected_components(df).collect()}
    assert got == {
        "docA": "docA", "docB": "docA", "docC": "docA", "x": "x", "y": "x",
    }


def test_small_graph_fast_path_matches_distributed(spark):
    """The union-find fast path and the distributed min-label loop give
    identical (key, component) labels on the same graph."""
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "key_a long, key_b long")
    fast = {(r.key, r.component) for r in connected_components(df).collect()}
    dist = {
        (r.key, r.component)
        for r in connected_components(df, small_graph_edges=0).collect()
    }
    assert fast == dist
