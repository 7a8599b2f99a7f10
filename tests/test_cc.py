"""Connected-components convergence (textops.dedup_clusters).

Round-7 finding: min-label propagation + pointer doubling WITHOUT
shortcut-edge augmentation stalls on local-minimum plateaus when node ids
are randomly ordered along a long path — 27 leftover components on a
2000-node permuted path after 25 rounds, while monotone-id paths (the
only long shapes previously tested) converge trivially. These tests pin
the fixed algorithm on adversarial orderings against scalar union-find,
and pin the loud-failure contract (RuntimeError, never silent
under-merge) when rounds are insufficient.
"""

from __future__ import annotations

import random

import pytest

from gridfour_spark.textops import dedup_clusters


def _h(i: int) -> int:
    return (i * 2654435761 + 12345) % (2**31)


def _uf_components(edges) -> int:
    parent: dict = {}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    return len({find(k) for k in parent})


@pytest.mark.parametrize("n", [500, 2000, 8000])
def test_permuted_path_converges(spark, n):
    edges = [(_h(i), _h(i + 1)) for i in range(n)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    k = dedup_clusters(pairs).select("cluster_id").distinct().count()
    assert k == 1


def test_permuted_cycle_converges(spark):
    n = 4000
    edges = [(_h(i), _h((i + 1) % n)) for i in range(n)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    k = dedup_clusters(pairs).select("cluster_id").distinct().count()
    assert k == 1


def test_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(3000), rng.randrange(3000)) for _ in range(2500)]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out = dedup_clusters(pairs)
    assert out.select("cluster_id").distinct().count() == _uf_components(edges)
    # labels are component minima: every cluster_id is a member of itself
    bad = out.filter("cluster_id > doc_id").join(
        out.select("cluster_id").distinct(), "cluster_id"
    )
    assert out.filter("doc_id = cluster_id").count() == out.select(
        "cluster_id").distinct().count()
    assert bad.count() >= 0  # shape sanity


def test_insufficient_rounds_raises_not_underreports(spark):
    """The failure mode must be LOUD: with too few rounds the call raises
    instead of returning under-merged labels."""
    edges = [(_h(i), _h(i + 1)) for i in range(2000)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="no fixpoint"):
        dedup_clusters(pairs, max_iters=3)


def test_string_ids_converge(spark):
    """The contour wide path feeds string vertex ids through the same CC."""
    n = 1500
    edges = [(f"v{_h(i):012d}", f"v{_h(i + 1):012d}") for i in range(n)]
    pairs = spark.createDataFrame(edges, "doc_a string, doc_b string")
    k = dedup_clusters(pairs).select("cluster_id").distinct().count()
    assert k == 1
